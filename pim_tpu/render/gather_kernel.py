"""Fused table-gather Pallas kernel: `table_t[:, idx]` without HBM one-hots.

The XLA one-hot fetch (render/fetch.py) materializes a [T, N] f32 one-hot
operand in HBM for every fetch (~130 MB per call at 512² with T=128); at
5 fetches/bounce that is GBs of pure overhead traffic per frame.  This
kernel computes the same `table_t @ one_hot(idx)` contraction per ray
block with the one-hot built *in VMEM* from an iota comparison, so HBM
only ever sees the [F, N] result.

  table_t [F, T]  f32, whole table VMEM-resident (T ≤ ~4096)
  idx     [1, N]  i32, blocked [1, R]
  out     [F, N]  f32, blocked [F, R]

Inside a block: oh[t, r] = (t == idx[r]) as bf16 — a [T, R] VMEM tensor —
then MXU dots `table_t @ oh`.  Exactness without f32-HIGHEST passes
(which cost 6 MXU passes; measured 265 us for the [48, N] fetch at 512²):
the table is pre-split into three bf16 terms hi + mid + lo == f32 exactly
(8+8+8 mantissa bits cover f32's 24; each residual subtraction is exact),
and because the one-hot makes every product x*1 or x*0 with exactly one
nonzero per output, the three bf16 dots sum to the stored f32 value
BIT-EXACTLY (required: vertex positions ride through this path) in 3 MXU
passes — 2x fewer passes and half the operand bandwidth of HIGHEST.

Used on the TPU backend for every per-hit attribute fetch and the light
grid cdf/pdf fetch (ref analog: the pointer chases in GetSurface /
LightSelect, src/rendering/path_tracer.c:1180-1419, 1735-1764).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GATHER_RAY_BLOCK = 2048
# above this many table columns the whole-table VMEM residency breaks down;
# callers fall back to fetch.py's gather path
GATHER_MAX_T = 4096


def _split_bf16_3(x: jnp.ndarray):
    """Exact 3-term bf16 split of f32 via bit masking: hi+mid+lo == x for
    every |x| in [2^-100, 3.38e38] (domain gate applied by callers).

    Each term keeps the sign/exponent and the top 7 mantissa bits of the
    running residual (== truncation onto the bf16 grid, so the bf16 convert
    below is exact); three 8-bit significand windows cover f32's 24.

    Deliberately NOT written as `x - f32(bf16(x))`: under XLA's default
    `xla_allow_excess_precision` the down-then-up convert pair is treated
    as value-preserving and the subtraction folds to ZERO on TPU, which
    silently dropped the mid/lo terms and made the r3 kernel return
    bf16-rounded values on device (found by the adversarial exactness
    sweep this round; CPU/interpret never trips it).  Integer masking has
    no such rewrite."""
    mask = jnp.uint32(0xFFFF0000)

    def trunc(v):
        bits = jax.lax.bitcast_convert_type(v, jnp.uint32)
        return jax.lax.bitcast_convert_type(bits & mask, jnp.float32)

    hi = trunc(x)
    r1 = x - hi
    mid = trunc(r1)
    lo = r1 - mid
    return (hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
            lo.astype(jnp.bfloat16))


def _gather_kernel(table_ref, idx_ref, out_ref, *, t: int, tchunk: int,
                   f: int):
    """table_ref: [3*F, T] bf16 (hi/mid/lo stacked); see module doc."""
    idx = idx_ref[0:1, :]  # [1, R] i32
    r = idx.shape[1]

    def chunk(c, acc):
        ds = pl.ds(pl.multiple_of(c * tchunk, tchunk), tchunk)
        iota = jax.lax.broadcasted_iota(jnp.int32, (tchunk, r), 0) + c * tchunk
        oh = (iota == idx).astype(jnp.bfloat16)  # [TC, R]
        for part in range(3):
            sub = table_ref[part * f : (part + 1) * f, ds]  # [F, TC] bf16
            acc = acc + jnp.dot(sub, oh, preferred_element_type=jnp.float32)
        return acc

    nchunks = t // tchunk
    if nchunks == 1:
        out_ref[:, :] = chunk(0, jnp.zeros((f, r), jnp.float32))
    else:
        out_ref[:, :] = jax.lax.fori_loop(
            0, nchunks, chunk, jnp.zeros((f, r), jnp.float32)
        )


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_cols_pallas(table_t: jnp.ndarray, idx: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """table_t [F, T] f32, idx [N] i32 -> [F, N] f32 == table_t[:, idx].

    Out-of-range idx yields zeros (callers clamp; padding lanes may carry
    arbitrary indices).
    """
    f, t = table_t.shape
    n = idx.shape[0]
    tpad = max(128, -(-t // 128) * 128)
    if tpad != t:
        table_t = jnp.pad(table_t, ((0, 0), (0, tpad - t)))
    fpad = max(8, -(-f // 8) * 8)
    if fpad != f:
        table_t = jnp.pad(table_t, ((0, fpad - f), (0, 0)))
    npad = -(-n // GATHER_RAY_BLOCK) * GATHER_RAY_BLOCK
    idx2 = idx.astype(jnp.int32).reshape(1, n)
    if npad != n:
        idx2 = jnp.pad(idx2, ((0, 0), (0, npad - n)), constant_values=-1)

    tchunk = min(tpad, 512)

    # Domain gate for the bf16 split: magnitudes in (3.3895e38, 3.4028e38]
    # round to bf16 inf (hi+mid+lo = NaN), and below ~2^-100 the residual
    # terms fall out of bf16's normal range and lose bits.  Clamp the top
    # and flush the bottom — the FTZ/DAZ semantics of the reference's
    # workers (src/threading/task.c:73-74); no physical table value
    # (radiance, position, f32-encoded id) lives in either band.  For
    # |x| in [2^-100, 3.38e38] the gather is bit-exact.
    table_t = jnp.clip(table_t, -3.38e38, 3.38e38)
    table_t = jnp.where(jnp.abs(table_t) < 2.0**-100, 0.0, table_t)

    # exact 3-term bf16 split (see module doc): hi+mid+lo == f32 bit-exact
    table3 = jnp.concatenate(_split_bf16_3(table_t), axis=0)  # [3*fpad, tpad]

    # VMEM-aware ray block: table + output block + in-VMEM one-hot must fit
    # the ~16 MB scoped budget (tall fused light tables at map scale push
    # F past 1k; a fixed 2048-ray block then overflows).  bf16 words count
    # as half an f32 word.
    budget = (10 << 20) // 4  # f32 words; out blocks are double-buffered
    rblock = GATHER_RAY_BLOCK

    def vmem_words(rb):
        return 3 * fpad * tpad // 2 + (2 * fpad + tchunk) * rb

    while rblock > 128 and vmem_words(rblock) > budget:
        rblock //= 2
    if vmem_words(rblock) > budget:
        # table too large for VMEM residency: plain XLA gather fallback
        return jnp.take(table_t[:f], idx.astype(jnp.int32), axis=1,
                        mode="fill", fill_value=0.0)

    npad = -(-n // rblock) * rblock
    if npad != idx2.shape[1]:
        idx2 = idx2[:, :n]
        idx2 = jnp.pad(idx2, ((0, 0), (0, npad - n)), constant_values=-1)

    kernel = functools.partial(_gather_kernel, t=tpad, tchunk=tchunk, f=fpad)
    out = pl.pallas_call(
        kernel,
        grid=(npad // rblock,),
        in_specs=[
            pl.BlockSpec((3 * fpad, tpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rblock), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((fpad, rblock), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((fpad, npad), jnp.float32),
        interpret=interpret,
    )(table3, idx2)
    return out[:f, :n]
