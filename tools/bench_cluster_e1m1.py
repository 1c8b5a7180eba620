"""Cluster-kernel parameter experiments on the REAL e1m1 geometry +
camera-primary rays (sorted like the integrator sorts them).

Usage: python tools/bench_cluster_e1m1.py [CB CPS RB]
Edits pim_tpu.render.cluster constants before building, so each run
measures one (CB, CPS, RAY_BLOCK) point without touching the source.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from pim_tpu.core.compile_cache import enable_compile_cache
enable_compile_cache()

import jax.numpy as jnp
import numpy as np


def main():
    import pim_tpu.render.cluster as cl

    if len(sys.argv) > 3:
        cl.CB = int(sys.argv[1])
        cl.CPS = int(sys.argv[2])
        cl.RAY_BLOCK = int(sys.argv[3])
    print(f"CB={cl.CB} CPS={cl.CPS} RB={cl.RAY_BLOCK}")

    from pim_tpu.geom.gltf import load_gltf_scene
    from pim_tpu.geom.entities import flatten
    from pim_tpu.math.grid import make_grid
    from pim_tpu.math.vec3 import V3
    from pim_tpu.render.camera import Camera, DofInfo, camera_arrays, generate_primary_rays
    from pim_tpu.render.raysort import sort_rays_key, sorted_rays
    from pim_tpu.core import rng
    from pim_tpu.math.grid import GridSpec

    path = os.path.join("data", "e1m1", "glTF", "e1m1.gltf")
    ents, pool = load_gltf_scene(path)
    flat = flatten(ents)
    t0 = time.perf_counter()
    arrs = cl.build_clusters(flat.positions, cb=cl.CB, cps=cl.CPS)
    print(f"build {time.perf_counter()-t0:.1f}s  tris lanes {arrs.tris.shape}")

    w = h = 512
    n = w * h
    cam = Camera(position=np.array([-2.5, 1.7, -2.5], np.float32))
    cam.look_at([6.0, 1.0, 6.0])
    ca = camera_arrays(cam, DofInfo(autofocus=False), w, h)
    state = rng.make_state(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(0))
    _, ro, rd = generate_primary_rays(ca, w, h, state)

    lo = flat.positions.min(axis=0)
    hi = flat.positions.max(axis=0)
    grid = make_grid(lo, hi, 1.0 / 1.5)
    gs = GridSpec(lo=jnp.asarray(grid.lo), size=grid.size, cells_per_meter=grid.cells_per_meter)

    big = jnp.float32(3e38)

    @jax.jit
    def isect_sorted(ro_a, rd_a):
        ro_v = V3(ro_a[0], ro_a[1], ro_a[2])
        rd_v = V3(rd_a[0], rd_a[1], rd_a[2])
        ro_s, rd_s, tn, tf, pos = sorted_rays(gs, ro_v, rd_v, 0.0, big)
        return cl.intersect_cluster_raw(arrs, ro_s, rd_s, tn, tf)

    @jax.jit
    def anyhit_sorted(ro_a, rd_a, tf_in):
        ro_v = V3(ro_a[0], ro_a[1], ro_a[2])
        rd_v = V3(rd_a[0], rd_a[1], rd_a[2])
        ro_s, rd_s, tn, tf, pos = sorted_rays(gs, ro_v, rd_v, 0.0, tf_in)
        return cl.occluded_cluster(arrs, ro_s, rd_s, tn, tf)

    ro_a = jnp.stack([ro.x, ro.y, ro.z])
    rd_a = jnp.stack([rd.x, rd.y, rd.z])

    # secondary-like rays: origins at primary hit points, shuffled dirs
    t, tri = jax.block_until_ready(isect_sorted(ro_a, rd_a))
    hitp = np.asarray(ro_a) + np.asarray(rd_a) * np.maximum(np.asarray(t), 0.0)[None, :]
    rng_np = np.random.default_rng(3)
    d2 = rng_np.normal(size=(3, n)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=0, keepdims=True)
    ro2 = jnp.asarray(hitp - np.asarray(rd_a) * 1e-3)
    rd2 = jnp.asarray(d2)
    tf2 = jnp.where(jnp.arange(n) % 2 == 0, big, jnp.float32(3.0))

    for tag, fn, args in (
        ("primary-isect", isect_sorted, (ro_a, rd_a)),
        ("second-isect", isect_sorted, (ro2, rd2)),
        ("second-anyhit", anyhit_sorted, (ro2, rd2, jnp.full((n,), 3.0))),
    ):
        out = jax.block_until_ready(fn(*args))
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(*args))
            times.append((time.perf_counter() - t0) * 1e3)
        best = min(times)
        print(f"{tag:14s} {best:7.2f} ms  ({n/best/1e3:.1f} Mrays/s)")


if __name__ == "__main__":
    main()
