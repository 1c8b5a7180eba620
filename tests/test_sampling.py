import jax
import jax.numpy as jnp
import numpy as np

from pim_tpu.core import rng
from pim_tpu.math import sampling
from pim_tpu.math.vec import dot, length


def _uniform2(n, seed=0):
    state = rng.make_state(jnp.arange(n), seed)
    _, xi = rng.next_f32x2(state)
    return xi


def test_normal_to_tbn_orthonormal():
    n = 4096
    d = np.asarray(sampling.sample_unit_sphere(_uniform2(n)))
    t, b = sampling.normal_to_tbn(jnp.asarray(d))
    t, b = np.asarray(t), np.asarray(b)
    assert np.abs(np.sum(t * d, -1)).max() < 1e-4
    assert np.abs(np.sum(b * d, -1)).max() < 1e-4
    assert np.abs(np.sum(t * b, -1)).max() < 1e-4
    assert np.abs(np.linalg.norm(t, axis=-1) - 1).max() < 1e-4
    assert np.abs(np.linalg.norm(b, axis=-1) - 1).max() < 1e-4


def test_cosine_hemisphere_distribution():
    n = 1 << 16
    d = np.asarray(sampling.sample_cosine_hemisphere(_uniform2(n)))
    assert (d[:, 2] >= 0).all()
    assert np.abs(np.linalg.norm(d, axis=-1) - 1).max() < 1e-3
    # E[cosθ] for pdf cosθ/π is 2/3
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 5e-3


def test_unit_sphere_uniform():
    n = 1 << 16
    d = np.asarray(sampling.sample_unit_sphere(_uniform2(n)))
    assert np.abs(np.linalg.norm(d, axis=-1) - 1).max() < 1e-3
    assert np.abs(d.mean(axis=0)).max() < 0.01


def test_ggx_microfacet_stats():
    """GGX-sampled half-vectors follow the D(h)cosθ distribution: for the
    analytic CDF, u2 = (1-cos²θ)... validate against inverse transform."""
    n = 1 << 16
    alpha = jnp.float32(0.25)
    xi = _uniform2(n)
    m = np.asarray(sampling.sample_ggx_microfacet(xi, alpha))
    assert (m[:, 2] > 0).all()
    # invert: xi2 = (1 - c^2) / (c^2 (a^2 - 1) + 1) should be uniform
    c2 = m[:, 2] ** 2
    a2 = float(alpha) ** 2
    u = (1 - c2) / (c2 * (a2 - 1) + 1)
    hist, _ = np.histogram(u, bins=16, range=(0, 1))
    assert hist.min() > 0.8 * n / 16


def test_power_heuristic():
    f = jnp.float32(2.0)
    g = jnp.float32(1.0)
    assert np.isclose(float(sampling.power_heuristic(f, g)), 4.0 / 5.0, atol=1e-6)


def test_bary_coord_valid():
    wuv = np.asarray(sampling.sample_bary_coord(_uniform2(4096)))
    assert np.allclose(wuv.sum(-1), 1.0, atol=1e-5)
    assert (wuv > -1e-6).all()


def test_ngon_inside_polygon():
    n = 4096
    xi = _uniform2(n)
    state = rng.make_state(jnp.arange(n), 9)
    _, side = rng.next_u32(state)
    pts = np.asarray(sampling.sample_ngon(xi, side, 6, 0.0))
    # all points inside unit circle (hexagon inscribed)
    assert (np.linalg.norm(pts, axis=-1) <= 1.0 + 1e-5).all()


def test_phase_functions_normalized():
    """Integral of phase over sphere = 1 (MC check)."""
    n = 1 << 16
    d = sampling.sample_unit_sphere(_uniform2(n))
    cos_t = np.asarray(d)[:, 2]
    for g in (0.0, 0.3, -0.5, 0.758):
        ph = np.asarray(sampling.hg_phase(jnp.asarray(cos_t), jnp.float32(g)))
        integral = ph.mean() * 4.0 * np.pi
        assert abs(integral - 1.0) < 0.02, (g, integral)
    phm = np.asarray(sampling.mie_phase(jnp.asarray(cos_t), jnp.float32(0.5)))
    integral = phm.mean() * 4.0 * np.pi
    # Mie normalization in the reference is approximate
    assert abs(integral - 1.0) < 0.1


def test_gauss_filter_matches_ref_formula():
    xi = jnp.asarray([[0.25, 0.5]], jnp.float32)
    got = np.asarray(sampling.sample_gauss_pixel_filter(xi, 1.0))[0]
    radius = np.sqrt(-np.log(0.5))
    want = np.array([np.cos(0.25 * 2 * np.pi), np.sin(0.25 * 2 * np.pi)]) * radius
    np.testing.assert_allclose(got, want, atol=1e-5)
