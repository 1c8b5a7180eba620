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


def _adversarial_f32(rng, shape):
    """f32 values that stress the bf16 hi/mid/lo split: full 24-bit
    mantissas, negatives, near-bf16-max magnitudes, subnormal-scale tinies,
    and exact zeros (ADVICE r3: extremes must round-trip bit-exactly)."""
    mant = rng.integers(0, 1 << 24, shape).astype(np.float32)
    expo = np.exp2(rng.integers(-40, 40, shape).astype(np.float32))
    sign = np.where(rng.random(shape) < 0.5, -1.0, 1.0).astype(np.float32)
    vals = (sign * mant * expo).astype(np.float32)
    flat = vals.reshape(-1)
    n = flat.size
    flat[rng.integers(0, n, n // 16)] = 0.0
    flat[rng.integers(0, n, n // 32)] = 3.0e38      # near-clamp ceiling
    flat[rng.integers(0, n, n // 32)] = -2.9e38
    flat[rng.integers(0, n, n // 32)] = 1e-38       # f32 subnormal
    flat[rng.integers(0, n, n // 32)] = 2.0**-99    # just above flush gate
    return flat.reshape(shape)


def _gate_domain(table):
    """The kernels' documented domain gate: clamp |x| to bf16-max band and
    flush-to-zero below 2^-100 (FTZ/DAZ analog, ref task.c:73-74).  The
    bit-exactness contract holds for gated tables."""
    out = np.clip(table, -3.38e38, 3.38e38)
    return np.where(np.abs(out) < 2.0**-100, 0.0, out).astype(np.float32)


def test_gather_cols_pallas_bit_exact_interpret():
    """gather_cols_pallas == table[:, idx] BIT-EXACTLY over adversarial
    f32 (the split-bf16 contract; vertex positions ride this path)."""
    from pim_tpu.render.gather_kernel import gather_cols_pallas

    rng = np.random.default_rng(11)
    f, t, n = 48, 900, 3000
    table = _adversarial_f32(rng, (f, t))
    idx = rng.integers(0, t, (n,)).astype(np.int32)
    out = np.asarray(
        gather_cols_pallas(jnp.asarray(table), jnp.asarray(idx), interpret=True)
    )
    np.testing.assert_array_equal(out, _gate_domain(table)[:, idx])


def test_gather_cols_pallas_out_of_range_zeros():
    from pim_tpu.render.gather_kernel import gather_cols_pallas

    table = np.arange(12, dtype=np.float32).reshape(3, 4) + 1.0
    idx = np.array([-1, 0, 3, 4, 1000], np.int32)
    out = np.asarray(
        gather_cols_pallas(jnp.asarray(table), jnp.asarray(idx), interpret=True)
    )
    np.testing.assert_array_equal(out[:, [0, 3, 4]], 0.0)
    np.testing.assert_array_equal(out[:, 1], table[:, 0])
    np.testing.assert_array_equal(out[:, 2], table[:, 3])


def test_gather_texels_parts_precision():
    """parts=1/2 reduced-precision modes return the truncation-split
    partial sums exactly: parts=1 == top-16-bit truncation (RGBA8-grade),
    parts=2 == top-32-bit pair (16 mantissa bits)."""
    from pim_tpu.render.table_gather import gather_texels_pallas

    rng = np.random.default_rng(9)
    c, t, k, n = 2, 2048, 2, 500
    planes = rng.uniform(0.0, 1.0, (c, t)).astype(np.float32)
    idx = rng.integers(0, t, (k, n)).astype(np.int32)

    def trunc(x):
        return np.frombuffer(
            (np.frombuffer(x.tobytes(), np.uint32) & 0xFFFF0000).tobytes(),
            np.float32).reshape(x.shape)

    hi = trunc(planes)
    mid = trunc(planes - hi)
    for parts, ref in [(1, hi), (2, hi + mid), (3, planes)]:
        out = np.asarray(gather_texels_pallas(
            jnp.asarray(planes), jnp.asarray(idx), interpret=True,
            parts=parts))
        np.testing.assert_array_equal(out, ref[:, idx])
        if parts < 3:
            err = np.abs(ref - planes) / np.maximum(np.abs(planes), 1e-9)
            assert err.max() < 2.0 ** (-8 * parts + 1)


def test_gather_texels_pallas_bit_exact_interpret():
    """gather_texels_pallas (big-plane two-level kernel) == planes[:, idx]
    bit-exactly, including multi-chunk tables and clamped OOR indices."""
    from pim_tpu.render.table_gather import gather_texels_pallas

    rng = np.random.default_rng(5)
    for (c, t, k, n) in [(4, 32768, 4, 3000), (3, 6 * 32 * 32, 4, 2500),
                         (1, 2048, 1, 300)]:
        planes = _adversarial_f32(rng, (c, t))
        idx = rng.integers(-5, t + 5, (k, n)).astype(np.int32)
        out = np.asarray(
            gather_texels_pallas(jnp.asarray(planes), jnp.asarray(idx),
                                 interpret=True)
        )
        np.testing.assert_array_equal(
            out, _gate_domain(planes)[:, np.clip(idx, 0, t - 1)])
