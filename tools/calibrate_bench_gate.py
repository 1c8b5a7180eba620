"""Calibrate the bench.py correctness gate (VERDICT r4 asks #2/#8).

Two bands, written to pim_tpu/render/bench_gate_bands.json:

  cornell512: ABSOLUTE cross-backend anchor.  The CPU-backend framework
    render (itself certified against the numpy reference oracle by
    tests/test_parity.py at the statistical suite's budget) renders the
    exact bench config (512 x 512, 10 bounces) for several seeds; the
    band is cpu_mean +- max(1%, 6 sigma).  bench.py then requires the
    TPU accumulated image mean to sit inside it — certifying parity at
    BASELINE resolution on every bench run (the chain: oracle <-> CPU
    framework at 32^2 statistics, CPU <-> TPU at 512^2 means).
  e1m1_512: DRIFT band (honest label): the CPU brute intersector cannot
    render 81k tris at 512^2 in reasonable time, so the band is seeded
    from the TPU render itself across seeds — it catches regressions
    (a silently-broken render can no longer publish a Mrays/s number),
    not an always-been-wrong bias; the textured+sky oracle config plus
    the map golden carry that burden at test scale.

Usage:
  JAX_PLATFORMS=cpu python tools/calibrate_bench_gate.py cornell
  python tools/calibrate_bench_gate.py e1m1        (on the TPU)

Ref analog: CmdPtTest's scripted gate, render_system.c:1348-1410.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BANDS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pim_tpu", "render", "bench_gate_bands.json")


def _load():
    if os.path.exists(BANDS_PATH):
        with open(BANDS_PATH) as f:
            return json.load(f)
    return {}


def _save(bands):
    with open(BANDS_PATH, "w") as f:
        json.dump(bands, f, indent=1, sort_keys=True)
    print("wrote", BANDS_PATH, json.dumps(bands))


def _render_means(build, seeds, spp):
    import jax
    import jax.numpy as jnp
    import numpy as np

    step, meta = build()
    means = []
    for seed in seeds:
        acc = None
        t0 = time.perf_counter()
        for s in range(spp):
            c = step(jnp.uint32(seed * 4096 + s))
            acc = c if acc is None else acc + c
        m = float(jnp.mean(acc)) / spp
        means.append(m)
        print(f"seed {seed}: mean {m:.6f}  ({time.perf_counter()-t0:.0f}s)")
    return np.asarray(means)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    if which == "cornell":
        # the CPU anchor must render on the CPU backend even under the
        # axon sitecustomize (which re-points jax_platforms at the TPU)
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from tools.make_perf_table import build_cornell_step, build_e1m1_step

    bands = _load()
    if which == "cornell":
        seeds, spp = (1, 2, 3, 4, 5, 6), 32
        means = _render_means(build_cornell_step, seeds=seeds, spp=spp)
        center = float(means.mean())
        sigma = float(means.std(ddof=1) / np.sqrt(len(means)))
        half = max(0.01 * center, 4.0 * sigma)
        bands["cornell512"] = {
            "kind": "absolute(cpu-framework anchor)",
            "backend": __import__("jax").default_backend(),
            "mean": center, "half": half, "seed_sigma": sigma,
            "seeds": len(seeds), "spp": spp,
        }
    elif which == "e1m1":
        means = _render_means(build_e1m1_step, seeds=(1, 2, 3), spp=16)
        center = float(means.mean())
        sigma = float(means.std(ddof=1) / np.sqrt(len(means)))
        half = max(0.015 * center, 6.0 * sigma)
        bands["e1m1_512"] = {
            "kind": "drift(tpu-seeded)",
            "backend": __import__("jax").default_backend(),
            "mean": center, "half": half, "seed_sigma": sigma,
            "seeds": 3, "spp": 16,
        }
    else:
        raise SystemExit(f"unknown config {which}")
    _save(bands)


if __name__ == "__main__":
    main()
