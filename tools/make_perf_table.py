"""Generate PERF.md: the committed per-kernel time table for one Cornell
512² step and one e1m1 512² step (VERDICT r2/r3 item; ref analog: the
profiler's per-mark mean/variance table, /root/reference/src/common/
profiler.c:24-128).

Usage: python tools/make_perf_table.py [out_md] [--quick]

Captures a jax.profiler trace of 2 steps per config on the default device,
aggregates XLA op time by fusion name, groups ops into subsystem buckets
(intersect / anyhit / fetch / light-table / sort / other), and writes a
markdown artifact.  Re-run this tool to regenerate PERF.md after kernel
changes.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from pim_tpu.core.compile_cache import enable_compile_cache
enable_compile_cache()

import jax.numpy as jnp
import numpy as np

WIDTH = HEIGHT = 512
MAX_BOUNCES = 10


def parse_trace(root: str):
    """-> (rows sorted by total time desc, total_ms). Row: (name, ms, count)."""
    paths = sorted(glob.glob(root + "/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return [], 0.0
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    tot = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pidname = pid_names.get(e.get("pid"), "")
        tidname = tid_names.get((e.get("pid"), e.get("tid")), "")
        if "TPU" not in pidname and "tpu" not in pidname.lower():
            continue
        if "XLA" not in tidname:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0)) / 1e3  # ms
        tot[name] += dur
        cnt[name] += 1
        total += dur
    rows = sorted(((k, v, cnt[k]) for k, v in tot.items()), key=lambda r: -r[1])
    return rows, total


BUCKETS = [
    ("intersect(closest)", re.compile(r"_isect_kernel|intersect_pallas|_mt_kernel")),
    ("anyhit(shadow)", re.compile(r"_anyhit_kernel|occluded")),
    ("attr-fetch/gather", re.compile(r"_gather_kernel|gather|take|dynamic-gather")),
    ("sort(ray-coherence)", re.compile(r"sort|Sort")),
    ("top_k(light-table)", re.compile(r"top-k|TopK|top_k")),
    ("scatter(light-hist)", re.compile(r"scatter")),
    ("fusion(shading/misc)", re.compile(r"fusion|convert|copy|transpose|reduce|broadcast|bitcast|iota|select|concatenate|dot|while|dynamic")),
]


def bucketize(rows):
    b = defaultdict(float)
    for name, ms, _ in rows:
        for label, pat in BUCKETS:
            if pat.search(name):
                b[label] += ms
                break
        else:
            b["other"] += ms
    return sorted(b.items(), key=lambda kv: -kv[1])


def profile_config(tag, step_fn, steps=2, trace_dir=None):
    trace_dir = trace_dir or f"/tmp/jaxtrace_{tag}"
    os.system(f"rm -rf {trace_dir}")
    jax.block_until_ready(step_fn(jnp.uint32(0)))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(step_fn(jnp.uint32(1)))
    step_ms = (time.perf_counter() - t0) * 1e3
    with jax.profiler.trace(trace_dir):
        c = None
        for i in range(steps):
            c = step_fn(jnp.uint32(2 + i))
        jax.block_until_ready(c)
    rows, total = parse_trace(trace_dir)
    # normalize to per-step ms
    rows = [(n, ms / steps, c // steps if c >= steps else c) for n, ms, c in rows]
    return rows, total / steps, step_ms


def build_cornell_step():
    from pim_tpu.core import rng
    from pim_tpu.geom.cornell import build_cornell_box
    from pim_tpu.render.camera import Camera, DofInfo, camera_arrays, generate_primary_rays
    from pim_tpu.render.integrator import trace_rays
    from pim_tpu.render.scene import build_scene

    ents, pool = build_cornell_box("boxes")
    meta, arrays, lights = build_scene(ents, pool, backend="auto")
    cam = Camera(position=np.array([-4, 0, 4], np.float32))
    cam.look_at([0, -1, 0])
    ca = camera_arrays(cam, DofInfo(autofocus=False), WIDTH, HEIGHT)
    n = WIDTH * HEIGHT

    @jax.jit
    def step(sample_idx):
        state = rng.make_state(jnp.arange(n, dtype=jnp.uint32), sample_idx)
        state, ro, rd = generate_primary_rays(ca, WIDTH, HEIGHT, state)
        res = trace_rays(meta, arrays, lights, ro, rd, state, MAX_BOUNCES)
        return res.color

    return step, meta


def build_e1m1_step():
    from pim_tpu.core import rng
    from pim_tpu.geom.gltf import load_gltf_scene
    from pim_tpu.render.camera import Camera, DofInfo, camera_arrays, generate_primary_rays
    from pim_tpu.render.integrator import trace_rays
    from pim_tpu.render.scene import build_scene
    from pim_tpu.render.sky import bake_sky_cubemap, earth_atmosphere

    path = os.path.join("data", "e1m1", "glTF", "e1m1.gltf")
    if not os.path.exists(path):
        from pim_tpu.geom.maps import export_map

        path = export_map("e1m1", base_dir="data", rooms=(3, 3), seed=1)
    ents, pool = load_gltf_scene(path)
    sun_dir = np.array([0.35, 0.82, 0.45], np.float32)
    sun_dir /= np.linalg.norm(sun_dir)
    sky = np.asarray(bake_sky_cubemap(earth_atmosphere(), sun_dir, 3800.0, 32, 8))
    meta, arrays, lights = build_scene(ents, pool, backend="auto", sky=sky)
    cam = Camera(position=np.array([-2.5, 1.7, -2.5], np.float32))
    cam.look_at([6.0, 1.0, 6.0])
    ca = camera_arrays(cam, DofInfo(autofocus=False), WIDTH, HEIGHT)
    n = WIDTH * HEIGHT

    @jax.jit
    def step(sample_idx):
        state = rng.make_state(jnp.arange(n, dtype=jnp.uint32), sample_idx)
        state, ro, rd = generate_primary_rays(ca, WIDTH, HEIGHT, state)
        res = trace_rays(meta, arrays, lights, ro, rd, state, MAX_BOUNCES)
        return res.color

    return step, meta


def fmt_table(rows, top=25):
    lines = ["| op (XLA fusion / Pallas kernel) | ms/step | calls | % |",
             "|---|---|---|---|"]
    tot = sum(r[1] for r in rows) or 1e-9
    for name, ms, c in rows[:top]:
        lines.append(f"| `{name[:70]}` | {ms:.2f} | {c} | {100*ms/tot:.1f} |")
    return "\n".join(lines)


def main():
    out_md = sys.argv[1] if len(sys.argv) > 1 else "PERF.md"
    dev = jax.devices()[0]
    sections = []
    for tag, builder in (("cornell", build_cornell_step), ("e1m1", build_e1m1_step)):
        step, meta = builder()
        rows, dev_ms, wall_ms = profile_config(tag, step)
        buckets = bucketize(rows)
        sec = [f"## {tag} 512² ({meta.tri_count} tris, backend={meta.backend})",
               "",
               f"Wall per step: **{wall_ms:.1f} ms**; device op time: {dev_ms:.1f} ms/step.",
               "",
               "Subsystem buckets:",
               "",
               "| bucket | ms/step | % |", "|---|---|---|"]
        for label, ms in buckets:
            sec.append(f"| {label} | {ms:.2f} | {100*ms/max(dev_ms,1e-9):.1f} |")
        sec += ["", "Top ops:", "", fmt_table(rows)]
        sections.append("\n".join(sec))
        print(f"[{tag}] wall {wall_ms:.1f} ms/step  device {dev_ms:.1f} ms/step")
        for label, ms in buckets[:6]:
            print(f"   {label:24s} {ms:8.2f} ms")

    header = (
        "# PERF — per-kernel time tables (regenerate: `python tools/make_perf_table.py`)\n\n"
        f"Device: {dev.device_kind}; {WIDTH}x{HEIGHT}, {MAX_BOUNCES} bounces, 1 spp/step.\n"
        "Trace: `jax.profiler.trace` over 2 steps, XLA-op rows aggregated by fusion name\n"
        "(tools/make_perf_table.py; analog of the reference profiler table,\n"
        "/root/reference/src/common/profiler.c:24-128).\n\n"
        "Reading the tables: `jit_step`/`while` rows are PARENTS (their time\n"
        "contains the leaf ops below), so \"device op time\" double-counts;\n"
        "\"wall per step\" is the ground truth and matches bench.py.  The r4\n"
        "e1m1 wall came down 3031 -> ~1034 ms via ray sorting (intersect\n"
        "kernels 890 -> 160 ms/step), Pallas table-gathers for atlas/sky/slot\n"
        "fetches, reduced-parts bf16 splits (reference textures are\n"
        "RGBA8-grade), neighbor-resolved corner planes (1 query per bilinear\n"
        "fetch), and replacing [6,3] face-basis gathers in sky sampling with\n"
        "arithmetic selects (a per-lane gather from a tiny constant table\n"
        "lowers to a ~25 ms full-wavefront XLA gather).\n"
    )
    with open(out_md, "w") as f:
        f.write(header + "\n" + "\n\n".join(sections) + "\n")
    print("wrote", out_md)


if __name__ == "__main__":
    main()
