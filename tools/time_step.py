"""Quick wall-clock timing of the Cornell/e1m1 512² step (the perf
iteration loop tool: no profiler, just compile + N timed steps).

Usage: python tools/time_step.py [e1m1|cornell|both] [steps]
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

from tools.make_perf_table import build_cornell_step, build_e1m1_step


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "e1m1"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    builders = {"cornell": build_cornell_step, "e1m1": build_e1m1_step}
    tags = ["cornell", "e1m1"] if which == "both" else [which]
    for tag in tags:
        step, meta = builders[tag]()
        t0 = time.perf_counter()
        jax.block_until_ready(step(jnp.uint32(0)))
        compile_s = time.perf_counter() - t0
        times = []
        for i in range(steps):
            t0 = time.perf_counter()
            jax.block_until_ready(step(jnp.uint32(1 + i)))
            times.append((time.perf_counter() - t0) * 1e3)
        best = min(times)
        print(f"[{tag}] compile {compile_s:.1f}s  steps(ms): "
              + " ".join(f"{t:.1f}" for t in times)
              + f"  best {best:.1f} ms")


if __name__ == "__main__":
    main()
