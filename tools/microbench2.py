"""Isolated microbenchmarks of the per-bounce hot components (TPU).

Run: python tools/microbench2.py
Answers, with measurements instead of guesses:
  1. dense Pallas intersect kernel cost (per call, 262144 rays x Cornell tris)
  2. one-hot matmul fetch vs Pallas fused-gather fetch
  3. lane-permutation gather cost (compaction feasibility)
  4. VPU elementwise throughput sanity number
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    N = 512 * 512
    print("backend:", jax.default_backend(), flush=True)

    # --- scene ---------------------------------------------------------------
    from pim_tpu.geom.cornell import build_cornell_box
    from pim_tpu.geom.entities import flatten

    ents, pool = build_cornell_box("boxes")
    flat = flatten(ents)
    T = flat.mat_ids.shape[0]
    print(f"tris={T}")

    from pim_tpu.render.pallas_kernels import pack_tris, intersect_pallas_raw, occluded_pallas

    tris12 = pack_tris(flat.positions)
    print("tris12 shape:", tris12.shape)

    key = jax.random.PRNGKey(0)
    ro = jax.random.uniform(key, (N, 3), jnp.float32, -2, 2)
    rd = jax.random.normal(jax.random.PRNGKey(1), (N, 3), jnp.float32)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

    f = jax.jit(lambda ro, rd: intersect_pallas_raw(tris12, ro, rd, 0.0, 1e9)[0])
    ms = timeit(f, ro, rd)
    print(f"dense intersect (closest): {ms:.3f} ms  ({N/ms/1e3:.1f} Mrays/s)")

    f2 = jax.jit(lambda ro, rd: occluded_pallas(tris12, ro, rd, 0.0, 3.0))
    ms = timeit(f2, ro, rd)
    print(f"dense occluded (any-hit):  {ms:.3f} ms")

    # --- one-hot fetch vs gather ----------------------------------------------
    table = jax.random.normal(jax.random.PRNGKey(2), (48, T), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(3), (N,), 0, T)

    from pim_tpu.render import fetch as F

    f3 = jax.jit(lambda idx: F.fetch_cols(table, idx))
    ms = timeit(f3, idx)
    print(f"one-hot fetch [48,{T}] x [{N}]: {ms:.3f} ms")

    # light-grid-sized table
    G = 343
    table_g = jax.random.normal(jax.random.PRNGKey(4), (26, G), jnp.float32)
    cell = jax.random.randint(jax.random.PRNGKey(5), (N,), 0, G)
    f4 = jax.jit(lambda c: F.fetch_cols(table_g, c))
    ms = timeit(f4, cell)
    print(f"one-hot fetch [26,{G}] x [{N}]: {ms:.3f} ms")

    # --- permutation gather ----------------------------------------------------
    perm = jax.random.permutation(jax.random.PRNGKey(6), N)
    x1 = jax.random.normal(jax.random.PRNGKey(7), (N,), jnp.float32)

    f5 = jax.jit(lambda x, p: x[p])
    ms = timeit(f5, x1, perm)
    print(f"lane permute [N] f32 (1 array, 1MB): {ms:.3f} ms")

    x16 = jax.random.normal(jax.random.PRNGKey(8), (16, N), jnp.float32)
    f6 = jax.jit(lambda x, p: x[:, p])
    ms = timeit(f6, x16, perm)
    print(f"lane permute [16,N] f32 (16MB, minor-dim gather): {ms:.3f} ms")

    xr = jax.random.normal(jax.random.PRNGKey(9), (N, 16), jnp.float32)
    f7 = jax.jit(lambda x, p: x[p])
    ms = timeit(f7, xr, perm)
    print(f"row permute [N,16] f32 (16MB, row gather): {ms:.3f} ms")

    # partition-by-alive permutation build
    alive = jax.random.uniform(jax.random.PRNGKey(10), (N,)) < 0.4

    @jax.jit
    def build_partition(alive):
        na = jnp.cumsum(alive.astype(jnp.int32))
        total = na[-1]
        nd = jnp.cumsum((~alive).astype(jnp.int32))
        pos = jnp.where(alive, na - 1, total + nd - 1)
        out = jnp.zeros((N,), jnp.int32).at[pos].set(jnp.arange(N, dtype=jnp.int32))
        return out, total

    ms = timeit(build_partition, alive)
    print(f"partition permutation build: {ms:.3f} ms")

    # --- VPU sanity: 100 fused elementwise ops over [N] -----------------------
    @jax.jit
    def vpu(x):
        for _ in range(100):
            x = x * 1.000001 + 0.5
        return x

    ms = timeit(vpu, x1)
    flops = 200 * N / (ms / 1e3)
    print(f"VPU chain: {ms:.3f} ms -> {flops/1e12:.2f} Tflop/s (fused fma chain)")

    # --- argsort cost ----------------------------------------------------------
    keys = jax.random.randint(jax.random.PRNGKey(11), (N,), 0, 1 << 30)
    f8 = jax.jit(lambda k: jnp.argsort(k))
    ms = timeit(f8, keys)
    print(f"argsort [N] i32: {ms:.3f} ms")


if __name__ == "__main__":
    main()
