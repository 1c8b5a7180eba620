"""Microbenchmark: ray-sort-key costs on the current default device.

Quantifies the building blocks of sort_rays_key (VERDICT r3 item 1b):
  1. key computation (cell id + direction octant)
  2. jax.lax.sort_key_val over [N] i32 (perm production)
  3. applying the perm to an [8, N] stacked ray block (one take)
  4. inverse-scatter of 2 result rows
against N = 512² rays, on whatever jax.default_backend() is.

Usage: python tools/bench_sort.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512 * 512


def timeit(tag, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag:40s} {ms:8.3f} ms")
    return ms


def main():
    print(f"device={jax.devices()[0].device_kind} N={N}")
    k = jax.random.PRNGKey(0)
    keys = jax.random.randint(k, (N,), 0, 7000, dtype=jnp.int32)
    rays8 = jax.random.normal(jax.random.PRNGKey(1), (8, N), jnp.float32)
    perm = jax.random.permutation(jax.random.PRNGKey(2), N)

    @jax.jit
    def sort_keys(keys):
        iota = jnp.arange(N, dtype=jnp.int32)
        k2, p = jax.lax.sort_key_val(keys, iota)
        return k2, p

    @jax.jit
    def argsort_keys(keys):
        return jnp.argsort(keys)

    @jax.jit
    def apply_perm(rays8, perm):
        return jnp.take(rays8, perm, axis=1)

    @jax.jit
    def inv_scatter(t, perm):
        return jnp.zeros((2, N), jnp.float32).at[:, perm].set(t)

    @jax.jit
    def inv_gather(t, perm):
        # inverse permutation applied as a second gather
        inv = jnp.zeros((N,), jnp.int32).at[perm].set(jnp.arange(N, dtype=jnp.int32))
        return jnp.take(t, inv, axis=1), inv

    t2 = jax.random.normal(jax.random.PRNGKey(3), (2, N), jnp.float32)

    timeit("sort_key_val(i32 keys, iota)", sort_keys, keys)
    timeit("argsort(i32 keys)", argsort_keys, keys)
    timeit("take([8,N], perm, axis=1)", apply_perm, rays8, perm)
    timeit("scatter-back [2,N] .at[:,perm].set", inv_scatter, t2, perm)
    timeit("inverse-perm + take [2,N]", inv_gather, t2, perm)

    # full pipeline: key + sort + gather + unsort
    @jax.jit
    def pipeline(rays8, keys):
        iota = jnp.arange(N, dtype=jnp.int32)
        _, p = jax.lax.sort_key_val(keys, iota)
        rs = jnp.take(rays8, p, axis=1)
        t = rs[0:2]  # stand-in for kernel output
        return jnp.zeros((2, N), jnp.float32).at[:, p].set(t)

    timeit("full sort pipeline (key..unsort)", pipeline, rays8, keys)


if __name__ == "__main__":
    main()
