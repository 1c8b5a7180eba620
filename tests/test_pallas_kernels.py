"""Pallas kernel parity vs the XLA oracle (runs in interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pim_tpu.core import rng as prng
from pim_tpu.geom.cornell import build_cornell_box
from pim_tpu.geom.entities import flatten
from pim_tpu.math.sampling import sample_unit_sphere
from pim_tpu.render import intersect as isect


@pytest.fixture(scope="module")
def cornell_geom():
    ents, pool = build_cornell_box("boxes")
    flat = flatten(ents)
    return flat.positions


def _rays(n, seed):
    st = prng.make_state(jnp.arange(n), 0, seed=seed)
    st, (x, y, z) = prng.next_f32x3(st)
    st, (u, v) = prng.next_f32x2(st)
    ro = jnp.stack([x, y, z], -1) * 8.0 - 4.0
    rd = sample_unit_sphere(u, v).aos()
    return ro, rd


def test_pallas_intersect_matches_brute(cornell_geom, monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    from pim_tpu.render import pallas_kernels as pk

    pos = jnp.asarray(cornell_geom)
    tris9 = pk.pack_tris(cornell_geom)
    ro, rd = _rays(1024, 42)

    with pltpu.force_tpu_interpret_mode():
        hp = pk.intersect_pallas(tris9, pos, ro, rd, 0.0, 1e6)
    hb = isect.intersect_brute(pos, ro, rd, 0.0, 1e6)
    np.testing.assert_allclose(np.asarray(hb.t), np.asarray(hp.t), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(hb.tri), np.asarray(hp.tri))


def test_pallas_occluded_matches_brute(cornell_geom):
    from jax.experimental.pallas import tpu as pltpu

    from pim_tpu.render import pallas_kernels as pk

    pos = jnp.asarray(cornell_geom)
    tris9 = pk.pack_tris(cornell_geom)
    ro, rd = _rays(512, 7)
    with pltpu.force_tpu_interpret_mode():
        op = pk.occluded_pallas(tris9, ro, rd, 0.0, 3.0)
    ob = isect.occluded_brute(pos, ro, rd, 0.0, 3.0)
    np.testing.assert_array_equal(np.asarray(ob), np.asarray(op))
