"""Ray sorting for secondary-ray coherence (SURVEY §7 hard part #1).

The cluster intersector's divergence model is block-granular: a cluster's
triangles are tested whenever ANY ray in a 1024-ray block can touch its
bbox, so incoherent bounce-2+ rays wake nearly every cluster per block.
The reference never faces this — Embree gives each CPU ray its own BVH
stack (path_tracer.c:490-563).  The TPU answer is to SORT the wavefront
before the trace so rays sharing a block share origin locality and
direction octant, shrinking each block's cluster working set.

Key = (dead?, origin cell id, direction octant):
  * dead lanes (t_far <= 0) sort to the END — they pack into trailing
    blocks the kernels skip wholesale (t_far = 0 contract);
  * cell id comes from the scene's uniform light grid (pt_dist_meters
    cells — the locality granule the engine already maintains);
  * 3-bit octant splits opposing directions, the main divergence axis
    for cluster bbox rejection.

The permutation is applied to the 8 ray lanes with ONE stacked
barrier-pinned gather, and the 2 result lanes come back through the
precomputed inverse permutation (gather, not scatter — measured faster;
see tools/bench_sort.py).  Radiance is bit-identical either way: a lane's
RNG state and payload never move, only the order rays are presented to
the intersector.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pim_tpu.math.grid import grid_index_soa
from pim_tpu.math.vec3 import V3


def sort_rays_key(grid_spec, ro: V3, rd: V3, t_far) -> jnp.ndarray:
    """[N] i32 coherence keys: (alive, cell, octant) packed, dead last."""
    cell = grid_index_soa(grid_spec, ro).astype(jnp.int32)
    octant = (
        (rd.x < 0).astype(jnp.int32) * 4
        + (rd.y < 0).astype(jnp.int32) * 2
        + (rd.z < 0).astype(jnp.int32)
    )
    key = cell * 8 + octant
    dead = jnp.broadcast_to(jnp.asarray(t_far), ro.x.shape) <= 0.0
    # dead rays beyond every live key (grid_len * 8 is a static bound)
    nx, ny, nz = grid_spec.size
    return jnp.where(dead, jnp.int32(nx * ny * nz * 8), key)


def sort_perm(keys: jnp.ndarray):
    """Returns (perm, inv_perm): x[perm] is key-sorted; y[inv_perm]
    restores original order."""
    n = keys.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    _, perm = jax.lax.sort_key_val(keys, iota)
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(iota)
    return perm, inv


def _stacked_take(rows, perm):
    """One pinned [F, N] gather (XLA otherwise fuses per-row takes into
    serialized loop fusions inside the bounce scan — the integrator's
    _permute_carry pathology)."""
    stacked = jnp.stack(rows, axis=0)
    stacked, perm = jax.lax.optimization_barrier((stacked, perm))
    out = jnp.take(stacked, perm, axis=1)
    return jax.lax.optimization_barrier(out)


def sorted_rays(grid_spec, ro: V3, rd: V3, t_near, t_far):
    """Sort a wavefront for coherence.  Returns (ro', rd', t_near',
    t_far', inv_perm); apply `unsort_*` with inv_perm to results."""
    n = ro.x.shape[0]
    t_near = jnp.broadcast_to(jnp.asarray(t_near, jnp.float32), (n,))
    t_far = jnp.broadcast_to(jnp.asarray(t_far, jnp.float32), (n,))
    keys = sort_rays_key(grid_spec, ro, rd, t_far)
    perm, inv = sort_perm(keys)
    g = _stacked_take(
        [ro.x, ro.y, ro.z, t_near, rd.x, rd.y, rd.z, t_far], perm)
    ro2 = V3(g[0], g[1], g[2])
    rd2 = V3(g[4], g[5], g[6])
    return ro2, rd2, g[3], g[7], inv


def unsort_rows(rows, inv_perm):
    """Restore original lane order for a list of [N] result arrays.

    Rows are gathered in dtype groups: floats in one stacked take, ints
    (i32/u32/bool) in a second integer take.  NEVER bitcast ints through
    f32 for the gather: integer bit patterns like -1 (0xFFFFFFFF) are
    NaNs, and TPU float datapaths canonicalize NaN payloads — the r4 sort
    A/B caught tri ids being silently rewritten on device (CPU/interpret
    preserves payloads, so only hardware runs trip it)."""
    f_idx = [i for i, r in enumerate(rows) if r.dtype == jnp.float32]
    i_idx = [i for i, r in enumerate(rows) if r.dtype != jnp.float32]
    out = [None] * len(rows)
    if f_idx:
        g = _stacked_take([rows[i] for i in f_idx], inv_perm)
        for j, i in enumerate(f_idx):
            out[i] = g[j]
    if i_idx:
        def to_u32(a):
            if a.dtype == jnp.bool_:
                return a.astype(jnp.uint32)
            return jax.lax.bitcast_convert_type(a, jnp.uint32)

        g = _stacked_take([to_u32(rows[i]) for i in i_idx], inv_perm)
        for j, i in enumerate(i_idx):
            dt = rows[i].dtype
            if dt == jnp.bool_:
                out[i] = g[j] > 0
            else:
                out[i] = jax.lax.bitcast_convert_type(g[j], dt)
    return out
