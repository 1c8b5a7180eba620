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

Both directions ride `jax.lax.sort` with the lanes as payload operands
(see sorted_rays — in-scan XLA gathers cost ~1000x their standalone
time; sorts do not).  Radiance is bit-identical either way: a lane's
RNG state and payload never move, only the order rays are presented to
the intersector.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pim_tpu.math.grid import grid_index_soa
from pim_tpu.math.vec3 import V3


DIR_BINS = 96  # 6 cube faces x 4x4 sub-bins


def _dir_bin(rd: V3) -> jnp.ndarray:
    """Quantize a direction to one of 96 bins: dominant-axis cube face +
    a 4x4 grid on the face plane.  The old 3-bit octant leaves primary
    wavefronts (shared origin cell) in raster order, where a 512-ray
    block spans the full horizontal FOV — a beam that wakes most of the
    map's clusters.  96 bins cut each block's angular spread ~12x."""
    ax = jnp.abs(rd.x)
    ay = jnp.abs(rd.y)
    az = jnp.abs(rd.z)
    vmax = jnp.maximum(ax, jnp.maximum(ay, az))
    is_x = vmax == ax
    is_y = (~is_x) & (vmax == ay)
    face = jnp.where(
        is_x,
        jnp.where(rd.x < 0, 1, 0),
        jnp.where(is_y, jnp.where(rd.y < 0, 3, 2), jnp.where(rd.z < 0, 5, 4)),
    )
    inv = 0.5 / jnp.maximum(vmax, 1e-20)
    u = jnp.where(is_x, rd.y, rd.x) * inv + 0.5
    v = jnp.where(is_x | is_y, rd.z, rd.y) * inv + 0.5
    qu = jnp.clip((u * 4.0).astype(jnp.int32), 0, 3)
    qv = jnp.clip((v * 4.0).astype(jnp.int32), 0, 3)
    return face * 16 + qu * 4 + qv


def sort_rays_key(grid_spec, ro: V3, rd: V3, t_far) -> jnp.ndarray:
    """[N] i32 coherence keys: (alive, cell, dir-bin) packed, dead last."""
    cell = grid_index_soa(grid_spec, ro).astype(jnp.int32)
    key = cell * DIR_BINS + _dir_bin(rd)
    dead = jnp.broadcast_to(jnp.asarray(t_far), ro.x.shape) <= 0.0
    # dead rays beyond every live key (grid_len * DIR_BINS is static)
    nx, ny, nz = grid_spec.size
    return jnp.where(dead, jnp.int32(nx * ny * nz * DIR_BINS), key)


def sort_perm(keys: jnp.ndarray):
    """Returns (perm, inv_perm): x[perm] is key-sorted; y[inv_perm]
    restores original order."""
    n = keys.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    _, perm = jax.lax.sort_key_val(keys, iota)
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(iota)
    return perm, inv


def sorted_rays(grid_spec, ro: V3, rd: V3, t_near, t_far):
    """Sort a wavefront for coherence.  Returns (ro', rd', t_near',
    t_far', pos); apply `unsort_rows` with pos to results.

    The permutation is carried BY jax.lax.sort itself — the ray lanes
    ride as payload operands of the key sort, and `pos` (the original
    index of each sorted lane) key-sorts the results back.  NO gather is
    involved: measured in-scan, an XLA take of [8, N] by a permutation
    costs ~25 ms at 512² (the compiler picks a transposing gather layout
    inside the while body; the same take standalone is 0.027 ms —
    tools/bench_sort.py), while multi-operand sorts stay fast.  Payload
    ints ride natively, so no NaN-prone f32 bitcasts either (the r4 sort
    A/B caught TPU float datapaths canonicalizing -1 id payloads)."""
    n = ro.x.shape[0]
    t_near = jnp.broadcast_to(jnp.asarray(t_near, jnp.float32), (n,))
    t_far = jnp.broadcast_to(jnp.asarray(t_far, jnp.float32), (n,))
    keys = sort_rays_key(grid_spec, ro, rd, t_far)
    iota = jnp.arange(n, dtype=jnp.int32)
    (_, rox, roy, roz, tn2, rdx, rdy, rdz, tf2, pos) = jax.lax.sort(
        (keys, ro.x, ro.y, ro.z, t_near, rd.x, rd.y, rd.z, t_far, iota),
        num_keys=1,
    )
    return V3(rox, roy, roz), V3(rdx, rdy, rdz), tn2, tf2, pos


def unsort_rows(rows, pos):
    """Restore original lane order for a list of [N] result arrays by
    key-sorting them on `pos` (each sorted lane's original index) — the
    stable sort by a permutation of iota IS the inverse permutation,
    with every row as native-dtype payload (no gathers, no bitcasts)."""
    out = jax.lax.sort((pos, *rows), num_keys=1)
    return list(out[1:])
