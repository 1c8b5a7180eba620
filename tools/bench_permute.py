"""Measure lane-permutation strategies on TPU (compaction feasibility).

In one jit, applies a random permutation K times to a carry of R rows x N
lanes, via:
  a) per-row 1D take           (what _permute_carry did)
  b) one stacked [R, N] take along axis=1
  c) lax.sort with key + payload rows
Prints per-application ms.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 512 * 512
R = 64
K = 10

rng = np.random.default_rng(0)
perm = jnp.asarray(rng.permutation(N).astype(np.int32))
x2d = jnp.asarray(rng.random((R, N), np.float32))


def timeit(fn, *a, iters=3):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters / K * 1e3


@jax.jit
def per_row(x, p):
    def body(c, _):
        rows = [jnp.take(c[i], p) for i in range(R)]
        return jnp.stack(rows), None
    y, _ = jax.lax.scan(body, x, jnp.arange(K))
    return y


@jax.jit
def stacked(x, p):
    def body(c, _):
        return jnp.take(c, p, axis=1), None
    y, _ = jax.lax.scan(body, x, jnp.arange(K))
    return y


@jax.jit
def sorted_scatter(x, p):
    # scatter formulation y[:, p] = x == sort by key p carrying payloads
    def body(c, _):
        ops = jax.lax.sort((p,) + tuple(c), num_keys=1)
        return tuple(ops[1:]), None
    y, _ = jax.lax.scan(body, tuple(x), jnp.arange(K))
    return y


print("backend:", jax.default_backend())
print(f"stacked [R={R}, N={N}] take axis=1: {timeit(stacked, x2d, perm):8.2f} ms")
try:
    print(f"sort key+{R} payloads:             {timeit(sorted_scatter, x2d, perm):8.2f} ms")
except Exception as e:
    print("sort failed:", str(e)[:200])
print(f"per-row 1D take x{R}:              {timeit(per_row, x2d, perm):8.2f} ms")
