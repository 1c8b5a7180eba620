"""Cluster-kernel parity vs the brute oracle + builder invariants.

The cluster backend is the map-scale Embree replacement (ref traversal:
src/rendering/path_tracer.c:490-563); kernels run in interpret mode here,
perf evidence lives in tools/bench_cluster.py's committed table.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pim_tpu.render import cluster as CL
from pim_tpu.render import intersect as isect


def _soup(t, seed=1, extent=10.0, size=0.8):
    rng = np.random.default_rng(seed)
    a = rng.random((t, 3), np.float32) * extent
    e1 = (rng.random((t, 3), np.float32) - 0.5) * size
    e2 = (rng.random((t, 3), np.float32) - 0.5) * size
    return np.stack([a, a + e1, a + e2], axis=1).reshape(-1, 3).astype(np.float32)


def _rays(n, seed=3, extent=10.0):
    rng = np.random.default_rng(seed)
    ro = rng.random((n, 3), np.float32) * extent
    rd = rng.standard_normal((n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


@pytest.fixture(scope="module")
def soup3k():
    return _soup(3000)


@pytest.fixture(scope="module")
def clusters3k(soup3k):
    return CL.build_clusters(soup3k)


def test_builder_invariants(soup3k, clusters3k):
    cl = clusters3k
    t = soup3k.shape[0] // 3
    slot_tri = np.asarray(cl.slot_tri)
    real = slot_tri[slot_tri >= 0]
    # every triangle exactly once
    assert sorted(real.tolist()) == list(range(t))
    # cluster bounds contain their triangles
    n_sc = cl.clb.shape[0] // 6
    clb = np.asarray(cl.clb)
    tris = soup3k.reshape(t, 3, 3)
    for c in range(slot_tri.shape[0] // CL.CB):
        g = slot_tri[c * CL.CB : (c + 1) * CL.CB]
        g = g[g >= 0]
        if len(g) == 0:
            continue
        s, j = divmod(c, CL.CPS)
        lo = clb[[a * n_sc + s for a in range(3)], j]
        hi = clb[[(a + 3) * n_sc + s for a in range(3)], j]
        assert (tris[g].min(axis=(0, 1)) >= lo - 1e-4).all()
        assert (tris[g].max(axis=(0, 1)) <= hi + 1e-4).all()


def test_cluster_matches_brute(soup3k, clusters3k):
    ro, rd = _rays(512)
    pos = jnp.asarray(soup3k)
    with pltpu.force_tpu_interpret_mode():
        t, tri = CL.intersect_cluster_raw(clusters3k, ro, rd, 0.0, 1e9)
        occ = CL.occluded_cluster(clusters3k, ro, rd, 0.0, 1e9)
    hb = isect.intersect_brute(pos, np.asarray(ro), np.asarray(rd), 0.0, 1e9)
    t, tri, occ = np.asarray(t), np.asarray(tri), np.asarray(occ)
    tb, trib = np.asarray(hb.t), np.asarray(hb.tri)
    assert ((tri >= 0) == (trib >= 0)).all()
    both = (tri >= 0) & (trib >= 0)
    np.testing.assert_allclose(t[both], tb[both], rtol=2e-4, atol=2e-5)
    assert (tri[both] == trib[both]).mean() > 0.999  # BW vs MT tie-breaks
    assert (occ == (trib >= 0)).all()


def test_dead_lanes_and_per_ray_tfar(soup3k, clusters3k):
    ro, rd = _rays(256, seed=9)
    n = ro.shape[0]
    hb = isect.intersect_brute(jnp.asarray(soup3k), np.asarray(ro),
                               np.asarray(rd), 0.0, 1e9)
    tb = np.asarray(hb.t)
    # kill even lanes; clip odd lanes to half their brute hit distance
    t_far = np.full(n, 1e9, np.float32)
    t_far[::2] = 0.0
    clip = (tb > 0) & (np.arange(n) % 2 == 1)
    t_far[clip] = tb[clip] * 0.5
    with pltpu.force_tpu_interpret_mode():
        t, tri = CL.intersect_cluster_raw(
            clusters3k, ro, rd, 0.0, jnp.asarray(t_far))
        occ = CL.occluded_cluster(clusters3k, ro, rd, 0.0, jnp.asarray(t_far))
    t, tri, occ = np.asarray(t), np.asarray(tri), np.asarray(occ)
    assert (tri[::2] == -1).all() and (t[::2] < 0).all()
    assert not occ[::2].any()
    # clipped lanes must not report the (now out-of-range) brute hit
    assert (t[clip] < 0).sum() == clip.sum() or (t[clip][t[clip] >= 0]
                                                 <= t_far[clip.nonzero()[0][
                                                     t[clip] >= 0]] + 1e-5).all()


def test_empty_and_tiny_scene():
    cl = CL.build_clusters(np.zeros((0, 3), np.float32))
    ro, rd = _rays(64)
    with pltpu.force_tpu_interpret_mode():
        t, tri = CL.intersect_cluster_raw(cl, ro, rd, 0.0, 1e9)
    assert (np.asarray(tri) == -1).all()

    one = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    cl1 = CL.build_clusters(one)
    ro1 = jnp.asarray(np.full((8, 3), [0.2, 0.2, 1.0], np.float32))
    rd1 = jnp.asarray(np.tile([0.0, 0.0, -1.0], (8, 1)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        t1, tri1 = CL.intersect_cluster_raw(cl1, ro1, rd1, 0.0, 1e9)
    np.testing.assert_allclose(np.asarray(t1), 1.0, rtol=1e-5)
    assert (np.asarray(tri1) == 0).all()


@pytest.mark.slow
def test_scene_backend_cluster_routes():
    """build_scene(backend='cluster') produces a scene whose intersect
    matches the brute backend on the cornell box."""
    from pim_tpu.geom.cornell import build_cornell_box
    from pim_tpu.math.vec3 import V3
    from pim_tpu.render.scene import build_scene, scene_intersect

    ents, pool = build_cornell_box("boxes")
    with pltpu.force_tpu_interpret_mode():
        meta_c, arrays_c, _ = build_scene(ents, pool, backend="cluster")
    meta_b, arrays_b, _ = build_scene(ents, pool, backend="brute")
    assert meta_c.backend == "cluster"

    ro, rd = _rays(256, seed=5, extent=1.0)
    ro3 = V3.from_aos(ro * 2.0 - 1.0)
    rd3 = V3.from_aos(rd)
    with pltpu.force_tpu_interpret_mode():
        hc = scene_intersect(meta_c, arrays_c, ro3, rd3, 0.0, 1e9)
    hb = scene_intersect(meta_b, arrays_b, ro3, rd3, 0.0, 1e9)
    assert (np.asarray(hc.tri >= 0) == np.asarray(hb.tri >= 0)).all()
    both = np.asarray((hc.tri >= 0) & (hb.tri >= 0))
    np.testing.assert_allclose(np.asarray(hc.t)[both], np.asarray(hb.t)[both],
                               rtol=2e-4, atol=2e-5)
