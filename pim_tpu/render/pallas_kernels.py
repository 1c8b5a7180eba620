"""Pallas TPU kernels for the intersection hot path.

The XLA-level brute intersector materializes every [rays, tris] Möller-
Trumbore intermediate in HBM (~17 GB/bounce at 512² on the cornell box —
measured, see git history).  This kernel computes the same dense test
entirely in VMEM.  This is the Embree-replacement speed path (SURVEY.md §7
'hard part #1').

Layout (all SoA, no trailing small dims anywhere):
  rays   [8, N]      rows: rox roy roz tnear rdx rdy rdz tfar
                     blocked [8, R] -> per-ray component slices [1, R]
  tris   [Tpad, 12]  rows of (ax ay az e1x e1y e1z e2x e2y e2z pad pad pad),
                     VMEM-resident; chunk slices [TB, 1]
  out    t [N], tri [N]  blocked [R]
Compute tiles are [TB, R]: triangles on sublanes, rays on lanes — both
dimensions fully utilize the (8, 128) f32 tile.
Grid: (N // R,) ray blocks; inner fori_loop over triangle chunks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_BLOCK = 512
TRI_BLOCK = 256
_BIG = 3.0e38
_IBIG = 2**31 - 1


def _isect_kernel(tri_ref, rays_ref, t_out, idx_out, *,
                  tri_chunks: int, tri_block: int, any_hit: bool):
    rox = rays_ref[0:1, :]
    roy = rays_ref[1:2, :]
    roz = rays_ref[2:3, :]
    tnear = rays_ref[3:4, :]
    rdx = rays_ref[4:5, :]
    rdy = rays_ref[5:6, :]
    rdz = rays_ref[6:7, :]
    tfar = rays_ref[7:8, :]
    r = rox.shape[1]

    def chunk_body(c, carry):
        best_t, best_i = carry
        ds = pl.ds(pl.multiple_of(c * tri_block, tri_block), tri_block)
        ax = tri_ref[ds, 0:1]
        ay = tri_ref[ds, 1:2]
        az = tri_ref[ds, 2:3]
        e1x = tri_ref[ds, 3:4]
        e1y = tri_ref[ds, 4:5]
        e1z = tri_ref[ds, 5:6]
        e2x = tri_ref[ds, 6:7]
        e2y = tri_ref[ds, 7:8]
        e2z = tri_ref[ds, 8:9]

        # pvec = cross(rd, e2): [TB, R]
        px = rdy * e2z - rdz * e2y
        py = rdz * e2x - rdx * e2z
        pz = rdx * e2y - rdy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvx = rox - ax
        tvy = roy - ay
        tvz = roz - az
        u = (tvx * px + tvy * py + tvz * pz) * inv_det
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        v = (rdx * qx + rdy * qy + rdz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det

        valid = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > tnear)
            & (t < tfar)
            & (t < best_t)
        )
        t = jnp.where(valid, t, _BIG)
        tmin = jnp.min(t, axis=0, keepdims=True)  # [1, R]
        subl = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
        imin = jnp.min(
            jnp.where((t == tmin) & valid, subl + c * tri_block, _IBIG),
            axis=0,
            keepdims=True,
        )
        better = tmin < best_t
        best_i = jnp.where(better, imin, best_i)
        best_t = jnp.where(better, tmin, best_t)
        return best_t, best_i

    init = (jnp.full((1, r), _BIG, jnp.float32), jnp.full((1, r), -1, jnp.int32))

    # whole-block dead-lane skip: callers mark dead lanes with t_far <= 0,
    # so a block whose every lane is dead (late-bounce RR, sky regions)
    # skips all triangle work (the wavefront-compaction dividend without
    # any lane permutation)
    block_active = jnp.max(tfar) > 0.0

    def run_block():
        if any_hit:
            def cond(carry):
                c, (bt, bi) = carry
                return (c < tri_chunks) & jnp.any(bi < 0)

            def body(carry):
                c, acc = carry
                return c + 1, chunk_body(c, acc)

            _, out = jax.lax.while_loop(cond, body, (0, init))
            return out
        return jax.lax.fori_loop(0, tri_chunks, chunk_body, init)

    best_t, best_i = jax.lax.cond(block_active, run_block, lambda: init)

    t_out[:, :] = jnp.where(best_i >= 0, best_t, -1.0)
    idx_out[:, :] = best_i


@functools.partial(jax.jit, static_argnames=("any_hit",))
def _isect_call(tris12, rays8, any_hit: bool):
    """tris12: [Tpad, 12]; rays8: [8, Npad]."""
    n = rays8.shape[1]
    tpad = tris12.shape[0]
    tri_block = min(TRI_BLOCK, tpad)
    tri_chunks = tpad // tri_block
    grid = (n // RAY_BLOCK,)

    kernel = functools.partial(
        _isect_kernel, tri_chunks=tri_chunks, tri_block=tri_block, any_hit=any_hit
    )
    t, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tpad, 12), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
    )(tris12, rays8)
    return t[0], idx[0]


def pack_tris(positions) -> jnp.ndarray:
    """positions [V, 3] -> [Tpad, 12] (a, e1, e2, pad) rows, sublane-padded
    with degenerate triangles."""
    tri_count = positions.shape[0] // 3
    import numpy as _np

    pos = _np.asarray(positions, _np.float32)
    tris = pos[: tri_count * 3].reshape(max(tri_count, 1), 3, 3) if tri_count else _np.zeros((1, 3, 3), _np.float32)
    a = tris[:, 0]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    packed = _np.concatenate([a, e1, e2, _np.zeros_like(a)], axis=-1)  # [T, 12]
    # pad only to the 8-sublane tile, or to a TRI_BLOCK multiple when chunking
    # kicks in — padding 108 tris to 256 would double the kernel's VPU work
    if packed.shape[0] <= TRI_BLOCK:
        tpad = max(8, int(_np.ceil(packed.shape[0] / 8)) * 8)
    else:
        tpad = int(_np.ceil(packed.shape[0] / TRI_BLOCK)) * TRI_BLOCK
    pad = tpad - packed.shape[0]
    if pad:
        packed = _np.pad(packed, ((0, pad), (0, 0)))
    return jnp.asarray(packed)


def _pack_rays(ro, rd, t_near, t_far):
    """V3/[N,3] rays -> ([8, Npad], n)."""
    from pim_tpu.math.vec3 import V3

    if not isinstance(ro, V3):
        ro = V3.from_aos(ro)
    if not isinstance(rd, V3):
        rd = V3.from_aos(rd)
    n = ro.x.shape[0]
    t_near = jnp.broadcast_to(jnp.asarray(t_near, jnp.float32), (n,))
    t_far = jnp.broadcast_to(jnp.asarray(t_far, jnp.float32), (n,))
    rays8 = jnp.stack([ro.x, ro.y, ro.z, t_near, rd.x, rd.y, rd.z, t_far], axis=0)
    npad = int(np.ceil(n / RAY_BLOCK)) * RAY_BLOCK
    if npad != n:
        rays8 = jnp.pad(rays8, ((0, 0), (0, npad - n)))
    return rays8, n


def intersect_pallas_raw(tris12, ro, rd, t_near, t_far):
    """Closest-hit kernel invocation; returns (t [N], tri [N]).

    Hit completion happens in the caller via the fused tri-table fetch
    (scene._finalize_hit_fused)."""
    rays8, n = _pack_rays(ro, rd, t_near, t_far)
    t, tri = _isect_call(tris12, rays8, False)
    return t[:n], tri[:n]


def occluded_pallas(tris12, ro, rd, t_near, t_far):
    rays8, n = _pack_rays(ro, rd, t_near, t_far)
    t, tri = _isect_call(tris12, rays8, True)
    return (tri >= 0)[:n]


def intersect_pallas(tris12, positions, ro, rd, t_near, t_far):
    """Closest-hit with standard Hit completion (gather-based; used by
    tests — the frame path uses intersect_pallas_raw + fused finalize)."""
    from pim_tpu.render.intersect import _finalize_hit, _moller_trumbore, _tri_verts

    n = ro.shape[0]
    t_far_b = jnp.broadcast_to(jnp.asarray(t_far, jnp.float32), (n,))
    t, tri = intersect_pallas_raw(tris12, ro, rd, t_near, t_far)
    safe = jnp.maximum(tri, 0)
    a, b, c = _tri_verts(positions, safe)
    tt, u, v, det = _moller_trumbore(ro, rd, a, b - a, c - a)
    miss = tri < 0
    t_final = jnp.where(miss, t_far_b, t)
    return _finalize_hit(positions, t_final, tri, u, v, det, t_far_b * 2.0, rd)
