"""Per-lane small-table gather: `planes[:, idx]` for K index sets, on MXU.

The r3 PERF.md trace showed XLA's dynamic-index gather running at ~1.4 GB/s
inside the bounce scan (9 ms for a [4, 262144] corner fetch from a 32k-texel
atlas plane; 75-90 ms per bilinear fetch round).  At e1m1 512² the atlas +
sky + slot-id gathers cost ~2.0 s of the 3.06 s step.  This kernel replaces
them with a two-level one-hot contraction computed entirely in VMEM:

  idx = hi * 128 + lo
  gather(plane, idx) = e_hi^T · P · e_lo          P = plane.reshape(Thi, 128)

For a ray block R: Q = OH_hi [R, CH] @ P_chunk [CH, C*128] rides the MXU
(CH = 128 hi-rows per chunk, range-gated to the block's [min, max] hi-row —
sorted/coherent ray blocks touch 1-2 chunks), then out = Σ_lane Q * OH_lo
on the VPU.  Bit-exactness (vertex-grade): P is pre-split into three bf16
terms hi+mid+lo == f32 exactly; each matmul output element has exactly one
nonzero product (one-hot), so the three f32 accumulations reconstruct the
stored f32 bit-exactly (same argument as render/gather_kernel.py).  Values
must stay below bf16 max; planes are clamped to ±3e38 at prep (the r3
ADVICE boundary note).

Used by: surface.sample_atlas_bilinear (4 corners × 4 channels),
sky.sample_sky_cubemap_soa (4 corners × 3 channels), cluster slot→tri id
resolution (1×1).  Ref analog: the CPU pointer-chase samplers,
/root/reference/src/rendering/sampler.h:176-249 and Cubemap_Read.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_BLOCK = 1024
CHUNK_ROWS = 128          # hi-rows per MXU pass (full K-dim tiles)
# 3 bf16 copies of [Thi, C*128] must stay well under VMEM
MAX_TABLE_WORDS = 2 << 20  # Thi * C * 128 f32-equivalent words


def _gather_kernel(p3_ref, idx_ref, out_ref, *, thi: int, c: int, k: int,
                   nchunks: int, parts: int):
    """p3_ref [parts*Thi, C*128] bf16; idx_ref [R, K] i32;
    out_ref [R, C*K] f32."""
    r = idx_ref.shape[0]
    cw = c * 128

    for kk in range(k):
        idx = idx_ref[:, kk : kk + 1]              # [R, 1] i32
        ihi = idx // 128                           # [R, 1]
        ilo = idx - ihi * 128
        lane = jax.lax.broadcasted_iota(jnp.int32, (r, 128), 1)
        oh_lo = (lane == ilo).astype(jnp.float32)  # [R, 128]

        c_lo = jnp.min(ihi) // CHUNK_ROWS
        c_hi = jnp.max(ihi) // CHUNK_ROWS

        def chunk(ci, q):
            row0 = ci * CHUNK_ROWS
            sub = jax.lax.broadcasted_iota(jnp.int32, (r, CHUNK_ROWS), 1) + row0
            oh_hi = (sub == ihi).astype(jnp.bfloat16)  # [R, CH]
            for part in range(parts):
                pc = p3_ref[pl.ds(part * thi + row0, CHUNK_ROWS), :]  # [CH, CW]
                q = q + jnp.dot(oh_hi, pc, preferred_element_type=jnp.float32)
            return q

        q0 = jnp.zeros((r, cw), jnp.float32)
        if nchunks == 1:
            q = chunk(0, q0)
        else:
            q = jax.lax.fori_loop(c_lo, c_hi + 1, chunk, q0)

        # per-channel lo-select + 1-wide stores.  A "fused" variant
        # (reshape [R, C, 128] * oh_lo[:, None, :] + one axis-2 reduce +
        # one c-wide store) was measured 1.7x SLOWER end-to-end on e1m1
        # (1351 vs 1070 ms/step, r4) — Mosaic materializes the 3D
        # broadcast temp badly; keep the 2D slice loop.
        for cc in range(c):
            val = jnp.sum(q[:, cc * 128 : (cc + 1) * 128] * oh_lo,
                          axis=1, keepdims=True)   # [R, 1]
            out_ref[:, kk * c + cc : kk * c + cc + 1] = val


@functools.partial(jax.jit, static_argnames=("interpret", "parts"))
def gather_texels_pallas(planes: jnp.ndarray, idx: jnp.ndarray,
                         interpret: bool = False,
                         parts: int = 3) -> jnp.ndarray:
    """planes [C, T] f32, idx [K, N] i32 -> [C, K, N] f32 == planes[:, idx].

    Out-of-range indices are clamped into [0, T).  Table values outside
    ±3e38 are clamped (bf16-split domain).

    parts: bf16 split terms, trading MXU passes for mantissa bits.
      3 = bit-exact f32 (24 bits; f32-encoded ids, vertex-grade data)
      2 = 16 mantissa bits (relative error < 2^-16)
      1 = plain bf16 (8 bits) — EXACTLY the reference's texture-grade
          precision: pim stores textures as RGBA8 and samples u8/255
          (texture.h:15-60, sampler.h:52-90), so a bf16 fetch of
          [0,1]-range texels loses nothing the reference ever had.
          3x fewer MXU passes; the r4 e1m1 profile showed these
          gathers FLOP-bound at ~560 ms/step.
    """
    c, t = planes.shape
    k, n = idx.shape
    tpad = max(CHUNK_ROWS * 128, -(-t // (CHUNK_ROWS * 128)) * (CHUNK_ROWS * 128))
    thi = tpad // 128
    if thi * c * 128 > MAX_TABLE_WORDS:
        # table too large for VMEM residency — XLA fallback
        return jnp.take(planes, jnp.clip(idx, 0, t - 1), axis=1)

    # clamp top / flush bottom: the bf16-split domain gate (same contract
    # as gather_kernel.py — FTZ/DAZ analog of ref task.c:73-74)
    pp = jnp.clip(planes, -3.38e38, 3.38e38)
    pp = jnp.where(jnp.abs(pp) < 2.0**-100, 0.0, pp)
    if tpad != t:
        pp = jnp.pad(pp, ((0, 0), (0, tpad - t)))
    # [C, Thi, 128] -> [Thi, C*128]; bit-masked split (NOT a bf16 convert
    # round-trip, which XLA's excess-precision rewrite folds to zero on
    # TPU — see gather_kernel._split_bf16_3)
    from pim_tpu.render.gather_kernel import _split_bf16_3

    p = pp.reshape(c, thi, 128).transpose(1, 0, 2).reshape(thi, c * 128)
    p3 = jnp.concatenate(_split_bf16_3(p)[:parts], axis=0)  # [parts*Thi, CW]

    idx2 = jnp.clip(idx, 0, t - 1).astype(jnp.int32).T  # [N, K]
    # VMEM-aware ray block: the per-query accumulator q is [R, C*128] f32
    # and must fit beside the bf16 table and the out block (wide-channel
    # corner tables at C=16 overflow the ~16MB budget at R=1024 — the
    # remote compiler rejects the kernel)
    rblock = RAY_BLOCK
    budget = (10 << 20) // 4  # f32 words
    table_words = parts * thi * c * 128 // 2
    while rblock > 256 and table_words + rblock * (2 * c * 128 + k + c * k) > budget:
        rblock //= 2
    npad = -(-n // rblock) * rblock
    if npad != n:
        idx2 = jnp.pad(idx2, ((0, npad - n), (0, 0)))
    kpad = max(8, -(-k // 8) * 8)
    if kpad != k:
        idx2 = jnp.pad(idx2, ((0, 0), (0, kpad - k)))

    kernel = functools.partial(
        _gather_kernel, thi=thi, c=c, k=k, nchunks=thi // CHUNK_ROWS,
        parts=parts)
    ck = c * k
    ckpad = max(8, -(-ck // 8) * 8)

    def out_index(i):
        return (i, 0)

    out = pl.pallas_call(
        kernel,
        grid=(npad // rblock,),
        in_specs=[
            pl.BlockSpec((parts * thi, c * 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rblock, kpad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rblock, ckpad), out_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, ckpad), jnp.float32),
        interpret=interpret,
    )(p3, idx2)
    # [N, K*C] (kk-major columns) -> [C, K, N]
    return out[:n, :ck].T.reshape(k, c, n).transpose(1, 0, 2)


def _bilinear_kernel(p3t_ref, idx_ref, w_ref, out_ref, q_ref, *, thi: int,
                     c: int, k: int, nchunks: int, parts: int):
    """Fused bilinear filtering gather, TRANSPOSED layout (rays on LANES —
    r5): p3t_ref [4C*128, parts*Thi] bf16 corner planes (row = channel
    group * 128 + lo-lane; corner-major channel groups corner*C + ch);
    idx_ref [Kpad, R] i32 (the i00 query); w_ref [3Kpad, R] f32 (tx, ty,
    valid per query, row-stacked); out_ref [CKpad, R] f32 FILTERED texels.

    Everything stays SoA [rows, N]: callers pass [K, N] index/weight rows
    and consume [C*K, N] rows directly — the [K, N] -> [N, K] relayout
    transposes + pads of the ray-major kernel cost ~45 ms/step on e1m1
    (r5 profile: 8 'pad'/'slice_bitcast' fusions at ~4-8 ms each).

    The 4-corner weighting happens in VMEM right after the one-hot
    contraction (output 4x smaller than the 16-plane gather), `valid`
    masks let blocks with no live lane skip all matmuls, and chunks
    inside [c_lo, c_hi] untouched by any valid lane are skipped too."""
    r = idx_ref.shape[1]
    cw4 = 4 * c * 128
    # zero-init (skipped queries / masked lanes stay 0)
    out_ref[:, :] = jnp.zeros_like(out_ref)

    for kk in range(k):
        valid = w_ref[2 * k + kk : 2 * k + kk + 1, :] > 0.0   # [1, R]

        @pl.when(jnp.any(valid))
        def _():
            tx = w_ref[kk : kk + 1, :]
            ty = w_ref[k + kk : k + kk + 1, :]
            # sanitized weights: masked lanes contribute exact zeros even
            # when their uv/idx carry NaN payloads
            zero = jnp.float32(0.0)
            one = jnp.float32(1.0)
            txv = jnp.where(valid, tx, zero)
            tyv = jnp.where(valid, ty, zero)
            w00 = jnp.where(valid, (one - txv) * (one - tyv), zero)
            w10 = txv * (one - tyv)
            w01 = (one - txv) * tyv
            w11 = txv * tyv

            idx = idx_ref[kk : kk + 1, :]
            ihi = idx // 128
            ilo = idx - ihi * 128
            sub = jax.lax.broadcasted_iota(jnp.int32, (128, r), 0)
            oh_lo = (sub == ilo).astype(jnp.float32)   # [128, R]

            big = jnp.int32(2**30)
            c_lo = jnp.min(jnp.where(valid, ihi, big)) // CHUNK_ROWS
            c_hi = jnp.max(jnp.where(valid, ihi, -1)) // CHUNK_ROWS
            ichunk = ihi // CHUNK_ROWS

            def accum_chunk(ci):
                row0 = ci * CHUNK_ROWS
                subh = jax.lax.broadcasted_iota(
                    jnp.int32, (CHUNK_ROWS, r), 0) + row0
                oh_hi = ((subh == ihi) & valid).astype(jnp.bfloat16)
                for part in range(parts):
                    pc = p3t_ref[:, pl.ds(pl.multiple_of(
                        (part * (thi // CHUNK_ROWS) + ci) * CHUNK_ROWS,
                        CHUNK_ROWS), CHUNK_ROWS)]     # [CW4, CH]
                    q_ref[:, :] = q_ref[:, :] + jnp.dot(
                        pc, oh_hi, preferred_element_type=jnp.float32)

            q_ref[:, :] = jnp.zeros_like(q_ref)
            if nchunks == 1:
                accum_chunk(0)
            else:
                # per-chunk gating on top of the [c_lo, c_hi] range: blocks
                # whose valid lanes touch a bimodal set of chunks (e.g. a
                # sky texture and a wall texture far apart in the atlas)
                # skip the untouched interior chunks' matmuls.  q lives in
                # a scratch ref so the gate is a pl.when, not a lax.cond
                # carrying a [CW, R] value copy (VMEM stack OOM).
                def gated_chunk(ci, carry):
                    needed = jnp.max(jnp.where(
                        (ichunk == ci) & valid, 1.0, 0.0)) > 0.0

                    @pl.when(needed)
                    def _():
                        accum_chunk(ci)

                    return carry

                jax.lax.fori_loop(c_lo, c_hi + 1, gated_chunk, 0)
            q = q_ref[:, :]

            # per-channel: weighted corner combine on [128, R] vregs, then
            # ONE lo-select sublane-reduce + a full-lane row store
            for cc in range(c):
                acc = (
                    w00 * q[(0 * c + cc) * 128 : (0 * c + cc + 1) * 128, :]
                    + w10 * q[(1 * c + cc) * 128 : (1 * c + cc + 1) * 128, :]
                    + w01 * q[(2 * c + cc) * 128 : (2 * c + cc + 1) * 128, :]
                    + w11 * q[(3 * c + cc) * 128 : (3 * c + cc + 1) * 128, :]
                )
                val = jnp.sum(acc * oh_lo, axis=0, keepdims=True)  # [1, R]
                out_ref[kk * c + cc : kk * c + cc + 1, :] = val


@functools.partial(jax.jit, static_argnames=("interpret", "parts", "c"))
def gather_bilinear_pallas(corner_planes: jnp.ndarray, idx: jnp.ndarray,
                           tx: jnp.ndarray, ty: jnp.ndarray,
                           valid: jnp.ndarray, c: int,
                           interpret: bool = False,
                           parts: int = 1) -> jnp.ndarray:
    """Filtered bilinear fetch from corner-resolved planes.

    corner_planes [4C, T] f32 (rows corner*C + channel, corners in
    (00, 10, 01, 11) order — scene._build_atlas_corner_planes layout),
    idx [K, N] i32 (i00 texel), tx/ty [K, N] f32 lerp weights,
    valid [K, N] bool -> [C, K, N] f32 filtered texels (0 where invalid).
    """
    c4, t = corner_planes.shape
    assert c4 == 4 * c
    k, n = idx.shape
    tpad = max(CHUNK_ROWS * 128, -(-t // (CHUNK_ROWS * 128)) * (CHUNK_ROWS * 128))
    thi = tpad // 128
    if thi * c4 * 128 > MAX_TABLE_WORDS:
        out = jnp.take(corner_planes, jnp.clip(idx, 0, t - 1), axis=1)
        out = out.reshape(4, c, k, n)
        vf = valid.astype(jnp.float32)
        w00 = (1.0 - tx) * (1.0 - ty) * vf
        w10 = tx * (1.0 - ty) * vf
        w01 = (1.0 - tx) * ty * vf
        w11 = tx * ty * vf
        return (out[0] * w00 + out[1] * w10 + out[2] * w01 + out[3] * w11)

    pp = jnp.clip(corner_planes, -3.38e38, 3.38e38)
    pp = jnp.where(jnp.abs(pp) < 2.0**-100, 0.0, pp)
    if tpad != t:
        pp = jnp.pad(pp, ((0, 0), (0, tpad - t)))
    from pim_tpu.render.gather_kernel import _split_bf16_3

    # table TRANSPOSED: [4C*128, parts*Thi] (row = chgroup*128 + lo-lane,
    # part-major columns) — a one-time per-step relayout of the (small)
    # table instead of per-bounce relayouts of the [K, N] ray data
    p = pp.reshape(c4, thi, 128).transpose(1, 0, 2).reshape(thi, c4 * 128)
    p3 = jnp.concatenate(
        [s.T for s in _split_bf16_3(p)[:parts]], axis=1)  # [CW4, parts*Thi]

    idx2 = jnp.clip(idx, 0, t - 1).astype(jnp.int32)     # [K, N]
    w2 = jnp.concatenate(
        [tx, ty, valid.astype(jnp.float32)], axis=0)     # [3K, N]

    rblock = RAY_BLOCK
    budget = (10 << 20) // 4
    table_words = parts * thi * c4 * 128 // 2
    while rblock > 256 and table_words + rblock * (2 * c4 * 128 + 4 * k + c * k) > budget:
        rblock //= 2
    npad = -(-n // rblock) * rblock
    if npad != n:
        idx2 = jnp.pad(idx2, ((0, 0), (0, npad - n)))
        w2 = jnp.pad(w2, ((0, 0), (0, npad - n)))
    kpad = max(8, -(-k // 8) * 8)
    if kpad != k:
        idx2 = jnp.pad(idx2, ((0, kpad - k), (0, 0)))
    k3pad = max(8, -(-(3 * k) // 8) * 8)
    if k3pad != 3 * k:
        w2 = jnp.pad(w2, ((0, k3pad - 3 * k), (0, 0)))

    kernel = functools.partial(
        _bilinear_kernel, thi=thi, c=c, k=k, nchunks=thi // CHUNK_ROWS,
        parts=parts)
    ck = c * k
    ckpad = max(8, -(-ck // 8) * 8)

    out = pl.pallas_call(
        kernel,
        grid=(npad // rblock,),
        in_specs=[
            pl.BlockSpec((c4 * 128, parts * thi), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kpad, rblock), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k3pad, rblock), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ckpad, rblock), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ckpad, npad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4 * c * 128, rblock), jnp.float32)],
        interpret=interpret,
    )(p3, idx2, w2)
    # [K*C, N] (kk-major rows) -> [C, K, N]
    return out[:ck, :n].reshape(k, c, n).transpose(1, 0, 2)


def use_texel_kernel() -> bool:
    return jax.default_backend() == "tpu"


def fits_texel_kernel(planes) -> bool:
    """Static check that the VMEM-residency budget holds (the kernel
    itself falls back to jnp.take past it, but callers can branch at
    trace time to avoid building the prep graph)."""
    c, t = planes.shape
    tpad = max(CHUNK_ROWS * 128, -(-t // (CHUNK_ROWS * 128)) * (CHUNK_ROWS * 128))
    return (tpad // 128) * c * 128 <= MAX_TABLE_WORDS


def gather_texels(planes: jnp.ndarray, idx: jnp.ndarray,
                  parts: int = 3) -> jnp.ndarray:
    """Dispatch: Pallas on TPU, plain (clamped) take elsewhere."""
    if use_texel_kernel():
        return gather_texels_pallas(planes, idx, parts=parts)
    t = planes.shape[1]
    return jnp.take(planes, jnp.clip(idx, 0, t - 1), axis=1)
