"""Pallas TPU kernels for the intersection hot path.

The XLA-level brute intersector materializes every [rays, tris] Möller-
Trumbore intermediate in HBM (~17 GB/bounce at 512² on the cornell box —
measured, see git history).  This kernel computes the same dense test
entirely in VMEM: rays blocked on sublanes, triangles on lanes, one
[R, TB] tile of arithmetic per chunk, nothing but the per-ray result ever
touching HBM.  This is the Embree-replacement speed path (SURVEY.md §7
'hard part #1').

Layout:
  tris   [9, Tpad]  (ax ay az e1x e1y e1z e2x e2y e2z), VMEM-resident
  rays   [N, 3] ro / rd, blocked [R, 3]
  out    t [N, 1], tri [N, 1]  blocked [R, 1]
Grid: (N // R,) ray blocks; inner fori_loop over triangle chunks.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_BLOCK = 256
TRI_BLOCK = 512
_BIG = 3.0e38
_IBIG = 2**31 - 1


def _isect_kernel(tri_ref, ro_ref, rd_ref, rng_ref, t_out, idx_out, *,
                  tri_chunks: int, tri_block: int, any_hit: bool):
    r = ro_ref.shape[0]
    rox = ro_ref[:, 0:1]
    roy = ro_ref[:, 1:2]
    roz = ro_ref[:, 2:3]
    rdx = rd_ref[:, 0:1]
    rdy = rd_ref[:, 1:2]
    rdz = rd_ref[:, 2:3]
    tnear = rng_ref[:, 0:1]
    tfar = rng_ref[:, 1:2]

    def chunk_body(c, carry):
        best_t, best_i = carry
        ds = pl.ds(pl.multiple_of(c * tri_block, tri_block), tri_block)
        ax = tri_ref[0:1, ds]
        ay = tri_ref[1:2, ds]
        az = tri_ref[2:3, ds]
        e1x = tri_ref[3:4, ds]
        e1y = tri_ref[4:5, ds]
        e1z = tri_ref[5:6, ds]
        e2x = tri_ref[6:7, ds]
        e2y = tri_ref[7:8, ds]
        e2z = tri_ref[8:9, ds]

        # pvec = cross(rd, e2): [R, TB]
        px = rdy * e2z - rdz * e2y
        py = rdz * e2x - rdx * e2z
        pz = rdx * e2y - rdy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        # tvec = ro - a
        tvx = rox - ax
        tvy = roy - ay
        tvz = roz - az
        u = (tvx * px + tvy * py + tvz * pz) * inv_det
        # qvec = cross(tvec, e1)
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
        tmin = jnp.min(t, axis=1, keepdims=True)  # [R, 1]
        lanes = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        imin = jnp.min(
            jnp.where((t == tmin) & valid, lanes + c * tri_block, _IBIG),
            axis=1,
            keepdims=True,
        )
        better = tmin < best_t
        best_i = jnp.where(better, imin, best_i)
        best_t = jnp.where(better, tmin, best_t)
        return best_t, best_i

    init = (jnp.full((r, 1), _BIG, jnp.float32), jnp.full((r, 1), -1, jnp.int32))
    if any_hit:
        # early-exit variant: stop scanning chunks once every ray has a hit
        def cond(carry):
            c, (bt, bi) = carry
            return (c < tri_chunks) & jnp.any(bi < 0)

        def body(carry):
            c, acc = carry
            return c + 1, chunk_body(c, acc)

        _, (best_t, best_i) = jax.lax.while_loop(cond, body, (0, init))
    else:
        best_t, best_i = jax.lax.fori_loop(0, tri_chunks, chunk_body, init)

    t_out[:, :] = jnp.where(best_i >= 0, best_t, -1.0)
    idx_out[:, :] = best_i


@functools.partial(jax.jit, static_argnames=("any_hit",))
def _isect_call(tris9, ro, rd, rng, any_hit: bool):
    """tris9: [9, Tpad]; ro/rd: [Npad, 3]; rng: [Npad, 2] (tnear, tfar)."""
    n = ro.shape[0]
    tpad = tris9.shape[1]
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
            pl.BlockSpec((9, tpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RAY_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
    )(tris9, ro, rd, rng)
    return t[:, 0], idx[:, 0]


def pack_tris(positions) -> jnp.ndarray:
    """positions [V, 3] -> [9, Tpad] (a, e1, e2 SoA), lane-padded with
    degenerate triangles."""
    tri_count = positions.shape[0] // 3
    tris = jnp.asarray(positions[: tri_count * 3]).reshape(tri_count, 3, 3)
    a = tris[:, 0]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    packed = jnp.concatenate([a, e1, e2], axis=-1).T  # [9, T]
    tpad = max(128, int(np.ceil(tri_count / 128)) * 128)
    pad = tpad - tri_count
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, pad)))
    return packed


def intersect_pallas_raw(tris9, ro, rd, t_near, t_far):
    """Closest-hit kernel invocation; returns (t [N], tri [N]) only.

    ro/rd may be SoA V3 or [N, 3] arrays.  Barycentrics/normals are
    completed by the caller via the fused tri-table fetch
    (scene._finalize_hit_fused)."""
    from pim_tpu.math.vec3 import V3

    if isinstance(ro, V3):
        ro = ro.aos()
    if isinstance(rd, V3):
        rd = rd.aos()
    n = ro.shape[0]
    npad = int(np.ceil(n / RAY_BLOCK)) * RAY_BLOCK
    t_near = jnp.broadcast_to(jnp.asarray(t_near, jnp.float32), (n,))
    t_far = jnp.broadcast_to(jnp.asarray(t_far, jnp.float32), (n,))
    rng = jnp.stack([t_near, t_far], axis=-1)
    if npad != n:
        ro = jnp.pad(ro, ((0, npad - n), (0, 0)))
        rd = jnp.pad(rd, ((0, npad - n), (0, 0)), constant_values=1.0)
        rng = jnp.pad(rng, ((0, npad - n), (0, 0)))
    t, tri = _isect_call(tris9, ro, rd, rng, False)
    return t[:n], tri[:n]


def intersect_pallas(tris9, positions, ro, rd, t_near, t_far):
    """Closest-hit with standard Hit completion (gather-based; used by
    tests — the frame path uses intersect_pallas_raw + fused finalize)."""
    from pim_tpu.render.intersect import _finalize_hit, _moller_trumbore, _tri_verts

    n = ro.shape[0]
    t_far_b = jnp.broadcast_to(jnp.asarray(t_far, jnp.float32), (n,))
    t, tri = intersect_pallas_raw(tris9, ro, rd, t_near, t_far)
    safe = jnp.maximum(tri, 0)
    a, b, c = _tri_verts(positions, safe)
    tt, u, v, det = _moller_trumbore(ro, rd, a, b - a, c - a)
    miss = tri < 0
    t_final = jnp.where(miss, t_far_b, t)
    return _finalize_hit(positions, t_final, tri, u, v, det, t_far_b * 2.0, rd)


def occluded_pallas(tris9, ro, rd, t_near, t_far):
    from pim_tpu.math.vec3 import V3

    if isinstance(ro, V3):
        ro = ro.aos()
    if isinstance(rd, V3):
        rd = rd.aos()
    n = ro.shape[0]
    npad = int(np.ceil(n / RAY_BLOCK)) * RAY_BLOCK
    t_near = jnp.broadcast_to(jnp.asarray(t_near, jnp.float32), (n,))
    t_far = jnp.broadcast_to(jnp.asarray(t_far, jnp.float32), (n,))
    rng = jnp.stack([t_near, t_far], axis=-1)
    if npad != n:
        ro = jnp.pad(ro, ((0, npad - n), (0, 0)))
        rd = jnp.pad(rd, ((0, npad - n), (0, 0)), constant_values=1.0)
        rng = jnp.pad(rng, ((0, npad - n), (0, 0)), constant_values=-1.0)
    t, tri = _isect_call(tris9, ro, rd, rng, True)
    return (tri >= 0)[:n]
