"""Pallas TPU kernels for the intersection hot path.

The XLA-level brute intersector materializes every [rays, tris] test
intermediate in HBM (~17 GB/bounce at 512² on the cornell box — measured,
see git history).  These kernels do the dense test entirely in VMEM.  This
is the Embree-replacement speed path (SURVEY.md §7 'hard part #1';
ref rtcIntersect1/rtcOccluded16 at src/rendering/path_tracer.c:448-553).

The per-(tri, ray) test is Baldwin-Weber (precomputed world-to-barycentric
affine rows; ~20 VPU ops) rather than inline Möller-Trumbore (~45 ops).
Per-triangle precompute (pack_tris, [T, 12], f64 host-side then f32):
  rows 0-2   n   = cross(e1, e2)      unnormalized geometric normal
  row  3     d   = dot(n, A)          plane offset
  rows 4-6   U   barycentric-u affine row:  u = U.p + uw
  row  7     uw
  rows 8-10  V   barycentric-v affine row:  v = V.p + vw
  row  11    vw
built by solving the in-plane 2x2 projected along the dominant normal axis
(Baldwin & Weber, JCGT 2016).  Degenerate (padding) triangles have n = 0,
whose NaN t fails every validity compare.

Layout (all SoA, no trailing small dims anywhere):
  rays   [8, N]      rows: rox roy roz tnear rdx rdy rdz tfar
                     blocked [8, R] -> per-ray component slices [1, R]
  tris   [Tpad, 12]  VMEM-resident; chunk slices [TB, 1]
  out    t [N], tri [N]  blocked [R]   (any-hit: i32 flag [N])
Compute tiles are [TB, R]: triangles on sublanes, rays on lanes.
Grid: (N // R,) ray blocks; inner loop over triangle chunks.

Dead lanes are marked by the caller with t_far <= 0; a ray block whose
every lane is dead skips all triangle work (pairs with the integrator's
alive-first lane compaction).  The any-hit kernel drops the argmin
machinery (an OR-reduce per chunk) and early-exits once every live lane
is blocked.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_BLOCK = 2048  # measured on v5e: ~15% faster closest-hit than 512
TRI_BLOCK = 256
_BIG = 3.0e38
_IBIG = 2**31 - 1


def bw_rows(positions) -> np.ndarray:
    """positions [V, 3] -> [T, 12] Baldwin-Weber rows, f64 precompute,
    f32 output, unpadded.  Degenerate triangles get n = 0 (their NaN t
    fails every validity compare in the kernels)."""
    pos = np.asarray(positions, np.float64)  # precompute in f64, store f32
    tri_count = pos.shape[0] // 3
    if tri_count == 0:
        return np.zeros((0, 12), np.float32)
    tris = pos[: tri_count * 3].reshape(tri_count, 3, 3)
    a = tris[:, 0]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    n = np.cross(e1, e2)
    d = np.sum(n * a, axis=-1)

    k = np.argmax(np.abs(n), axis=-1)  # dominant axis per tri
    u_row = np.zeros((tri_count, 3))
    v_row = np.zeros((tri_count, 3))
    uw = np.zeros(tri_count)
    vw = np.zeros(tri_count)
    for kk, (i, j) in enumerate(((1, 2), (2, 0), (0, 1))):
        m = k == kk
        if not m.any():
            continue
        nk = n[m, kk]
        nk = np.where(nk == 0.0, 1.0, nk)  # degenerate guard
        inv = 1.0 / nk
        # [p_i - a_i, p_j - a_j] = u*[e1_i, e1_j] + v*[e2_i, e2_j]
        u_row[m, i] = e2[m, j] * inv
        u_row[m, j] = -e2[m, i] * inv
        uw[m] = (e2[m, i] * a[m, j] - e2[m, j] * a[m, i]) * inv
        v_row[m, i] = -e1[m, j] * inv
        v_row[m, j] = e1[m, i] * inv
        vw[m] = (e1[m, j] * a[m, i] - e1[m, i] * a[m, j]) * inv

    degen = np.sum(n * n, axis=-1) == 0.0
    n[degen] = 0.0
    return np.concatenate(
        [n, d[:, None], u_row, uw[:, None], v_row, vw[:, None]], axis=-1
    ).astype(np.float32)


def pack_tris(positions) -> jnp.ndarray:
    """positions [V, 3] -> [Tpad, 12] Baldwin-Weber rows (see module doc),
    sublane-padded with degenerate triangles."""
    packed = bw_rows(positions)
    if packed.shape[0] == 0:
        return jnp.zeros((8, 12), jnp.float32)
    # pad only to the 8-sublane tile, or to a TRI_BLOCK multiple when
    # chunking kicks in — padding 108 tris to 256 would double the VPU work
    if packed.shape[0] <= TRI_BLOCK:
        tpad = max(8, -(-packed.shape[0] // 8) * 8)
    else:
        tpad = -(-packed.shape[0] // TRI_BLOCK) * TRI_BLOCK
    pad = tpad - packed.shape[0]
    if pad:
        packed = np.pad(packed, ((0, pad), (0, 0)))
    return jnp.asarray(packed)


def _bw_test(tri_ref, ds, rox, roy, roz, rdx, rdy, rdz, tnear):
    """Baldwin-Weber hit test of one tri chunk against the ray block.
    Returns (t, geometric-validity) [TB, R]; far-plane tests are the
    caller's (NaN t from degenerate tris fails every compare)."""
    nx = tri_ref[ds, 0:1]
    ny = tri_ref[ds, 1:2]
    nz = tri_ref[ds, 2:3]
    d = tri_ref[ds, 3:4]
    ux = tri_ref[ds, 4:5]
    uy = tri_ref[ds, 5:6]
    uz = tri_ref[ds, 6:7]
    uw = tri_ref[ds, 7:8]
    vx = tri_ref[ds, 8:9]
    vy = tri_ref[ds, 9:10]
    vz = tri_ref[ds, 10:11]
    vw = tri_ref[ds, 11:12]

    den = nx * rdx + ny * rdy + nz * rdz
    num = d - (nx * rox + ny * roy + nz * roz)
    t = num / den
    px = rox + t * rdx
    py = roy + t * rdy
    pz = roz + t * rdz
    u = ux * px + uy * py + uz * pz + uw
    v = vx * px + vy * py + vz * pz + vw
    ok = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > tnear)
    return t, ok


def _ray_rows(rays_ref):
    return (
        rays_ref[0:1, :], rays_ref[1:2, :], rays_ref[2:3, :], rays_ref[3:4, :],
        rays_ref[4:5, :], rays_ref[5:6, :], rays_ref[6:7, :], rays_ref[7:8, :],
    )


def _isect_kernel(tri_ref, rays_ref, t_out, idx_out, *,
                  tri_chunks: int, tri_block: int):
    rox, roy, roz, tnear, rdx, rdy, rdz, tfar = _ray_rows(rays_ref)
    r = rox.shape[1]

    def chunk_body(c, carry):
        best_t, best_i = carry
        ds = pl.ds(pl.multiple_of(c * tri_block, tri_block), tri_block)
        t, ok = _bw_test(tri_ref, ds, rox, roy, roz, rdx, rdy, rdz, tnear)
        valid = ok & (t < tfar) & (t < best_t)
        t = jnp.where(valid, t, _BIG)
        tmin = jnp.min(t, axis=0, keepdims=True)  # [1, R]
        subl = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
        imin = jnp.min(
            jnp.where(t == tmin, subl + c * tri_block, _IBIG),
            axis=0,
            keepdims=True,
        )
        better = tmin < best_t
        best_i = jnp.where(better, imin, best_i)
        best_t = jnp.where(better, tmin, best_t)
        return best_t, best_i

    init = (jnp.full((1, r), _BIG, jnp.float32), jnp.full((1, r), -1, jnp.int32))
    block_active = jnp.max(tfar) > 0.0
    best_t, best_i = jax.lax.cond(
        block_active,
        lambda: jax.lax.fori_loop(0, tri_chunks, chunk_body, init),
        lambda: init,
    )
    t_out[:, :] = jnp.where(best_i >= 0, best_t, -1.0)
    idx_out[:, :] = best_i


def _anyhit_kernel(tri_ref, rays_ref, hit_out, *,
                   tri_chunks: int, tri_block: int):
    rox, roy, roz, tnear, rdx, rdy, rdz, tfar = _ray_rows(rays_ref)
    r = rox.shape[1]

    def chunk_body(carry):
        c, hit = carry
        ds = pl.ds(pl.multiple_of(c * tri_block, tri_block), tri_block)
        t, ok = _bw_test(tri_ref, ds, rox, roy, roz, rdx, rdy, rdz, tnear)
        valid = ok & (t < tfar)
        return c + 1, hit | jnp.any(valid, axis=0, keepdims=True).astype(jnp.int32)

    # dead lanes (t_far <= 0) start as "done" so the all-lanes-blocked
    # early exit can still fire for partially-dead blocks
    init = (tfar <= 0.0).astype(jnp.int32)
    block_active = jnp.max(tfar) > 0.0

    def run_block():
        if tri_chunks == 1:  # no early-exit to be had; skip the while
            return chunk_body((0, init))[1]

        def cond(carry):
            c, hit = carry
            return (c < tri_chunks) & (jnp.min(hit) == 0)

        _, hit = jax.lax.while_loop(cond, chunk_body, (0, init))
        return hit

    hit = jax.lax.cond(block_active, run_block, lambda: init)
    hit_out[:, :] = hit


@jax.jit
def _isect_call(tris12, rays8):
    """tris12: [Tpad, 12] BW rows; rays8: [8, Npad]."""
    n = rays8.shape[1]
    tpad = tris12.shape[0]
    tri_block = min(TRI_BLOCK, tpad)
    tri_chunks = tpad // tri_block
    kernel = functools.partial(
        _isect_kernel, tri_chunks=tri_chunks, tri_block=tri_block
    )
    t, idx = pl.pallas_call(
        kernel,
        grid=(n // RAY_BLOCK,),
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


@jax.jit
def _anyhit_call(tris12, rays8):
    n = rays8.shape[1]
    tpad = tris12.shape[0]
    tri_block = min(TRI_BLOCK, tpad)
    tri_chunks = tpad // tri_block
    kernel = functools.partial(
        _anyhit_kernel, tri_chunks=tri_chunks, tri_block=tri_block
    )
    hit = pl.pallas_call(
        kernel,
        grid=(n // RAY_BLOCK,),
        in_specs=[
            pl.BlockSpec((tpad, 12), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
    )(tris12, rays8)
    return hit[0]


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
    t, tri = _isect_call(tris12, rays8)
    return t[:n], tri[:n]


def occluded_pallas(tris12, ro, rd, t_near, t_far):
    rays8, n = _pack_rays(ro, rd, t_near, t_far)
    return (_anyhit_call(tris12, rays8) > 0)[:n]


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
