"""Ray-sorting (render/raysort.py) correctness: a coherence sort is a pure
lane permutation — traced results must be bit-identical to the unsorted
path, dead lanes must pack last, and the cluster backend must return the
same hits with sorting forced on."""

import jax.numpy as jnp
import numpy as np
import pytest

from pim_tpu.core import rng as prng
from pim_tpu.geom.cornell import build_cornell_box
from pim_tpu.math.grid import GridSpec
from pim_tpu.math.sampling import sample_unit_sphere
from pim_tpu.math.vec3 import V3
from pim_tpu.render.raysort import sort_perm, sort_rays_key, sorted_rays, unsort_rows
from pim_tpu.render.scene import build_scene, scene_intersect


def _rays(n, seed):
    st = prng.make_state(jnp.arange(n), 0, seed=seed)
    st, (x, y, z) = prng.next_f32x3(st)
    st, (u, v) = prng.next_f32x2(st)
    ro = V3(x * 8 - 4, y * 8 - 4, z * 8 - 4)
    rd = sample_unit_sphere(u, v)
    return ro, rd


def _spec():
    return GridSpec(lo=jnp.asarray([-4.0, -4.0, -4.0]), size=(8, 8, 8),
                    cells_per_meter=1.0)


def test_sorted_rays_round_trip():
    """sort -> unsort restores every lane exactly."""
    ro, rd = _rays(1000, 3)
    t_far = jnp.where(jnp.arange(1000) % 5 == 0, 0.0, 100.0)
    ro2, rd2, tn2, tf2, inv = sorted_rays(_spec(), ro, rd, 0.0, t_far)
    back = unsort_rows([ro2.x, ro2.y, ro2.z, rd2.x, rd2.y, rd2.z, tf2], inv)
    for orig, rec in zip([ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, t_far], back):
        np.testing.assert_array_equal(np.asarray(orig), np.asarray(rec))


def test_dead_lanes_sort_last():
    ro, rd = _rays(4096, 9)
    t_far = jnp.where(jnp.arange(4096) % 3 == 0, 0.0, 50.0)
    keys = sort_rays_key(_spec(), ro, rd, t_far)
    perm, _ = sort_perm(keys)
    tf_sorted = np.asarray(t_far)[np.asarray(perm)]
    n_dead = int((np.asarray(t_far) <= 0).sum())
    assert np.all(tf_sorted[-n_dead:] == 0.0)
    assert np.all(tf_sorted[:-n_dead] > 0.0)


def test_keys_group_by_dirbin_and_cell():
    from pim_tpu.render.raysort import DIR_BINS, _dir_bin

    ro, rd = _rays(2048, 5)
    keys = np.asarray(sort_rays_key(_spec(), ro, rd, 100.0))
    perm, _ = sort_perm(jnp.asarray(keys))
    ks = keys[np.asarray(perm)]
    assert np.all(np.diff(ks) >= 0)
    # direction bin is the low mod-DIR_BINS part of the live keys (r5:
    # 6 cube faces x 4x4 sub-bins replaced the 3-bit octant)
    bins = np.asarray(_dir_bin(rd))
    assert bins.min() >= 0 and bins.max() < DIR_BINS
    np.testing.assert_array_equal(keys % DIR_BINS, bins.astype(keys.dtype))
    # the face (bin // 16) agrees with the dominant axis + sign
    rdx, rdy, rdz = np.asarray(rd.x), np.asarray(rd.y), np.asarray(rd.z)
    dom = np.argmax(np.abs(np.stack([rdx, rdy, rdz])), axis=0)
    sgn = np.stack([rdx, rdy, rdz])[dom, np.arange(rdx.size)] < 0
    np.testing.assert_array_equal(bins // 16, dom * 2 + sgn)


def test_unsort_rows_int_payloads():
    """unsort_rows key-sorts on `pos` (each sorted lane's original index,
    i.e. the forward perm) with native-dtype payloads."""
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.integers(-5, 1 << 30, 777).astype(np.int32))
    bools = jnp.asarray(rng.random(777) < 0.5)
    keys = jnp.asarray(rng.integers(0, 64, 777).astype(np.int32))
    perm, _ = sort_perm(keys)
    sorted_vals = jnp.take(vals, perm)
    sorted_bools = jnp.take(bools, perm)
    bi, bb = unsort_rows([sorted_vals, sorted_bools], perm)
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(vals))
    np.testing.assert_array_equal(np.asarray(bb), np.asarray(bools))


def test_cluster_backend_sorted_matches_unsorted():
    """Forcing sort_rays on the cluster backend returns identical hits
    (kernels in interpret mode on the CPU suite, like test_cluster.py)."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    ents, pool = build_cornell_box("boxes")
    ro, rd = _rays(128, 11)
    with pltpu.force_tpu_interpret_mode():
        # coarse light grid: the in-build visibility bake traces through
        # the interpret-mode cluster kernels too, and at the default
        # 1.5 m cells it dominated this test (26 s); the grid content is
        # irrelevant to the sorted-vs-unsorted hit comparison
        meta0, arrays, lights = build_scene(ents, pool, backend="cluster",
                                            sort_rays=False,
                                            cells_per_meter=0.12)
        meta1 = dataclasses.replace(meta0, sort_rays=True)
        h0 = scene_intersect(meta0, arrays, ro, rd, 0.0, 100.0)
        h1 = scene_intersect(meta1, arrays, ro, rd, 0.0, 100.0)
    np.testing.assert_array_equal(np.asarray(h0.tri), np.asarray(h1.tri))
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(h1.t))
