import jax.numpy as jnp
import numpy as np

from pim_tpu.core import rng
from pim_tpu.math.vec3 import V3
from pim_tpu.render import media


def test_media_defaults_near_vacuum():
    """The reference defaults (40km mfp) are near-vacuum at room scale —
    transmittance over 10m must be ~1."""
    desc = media.make_media_desc()
    n = 256
    state = rng.make_state(jnp.arange(n), 0)
    ro = V3.zeros((n,))
    rd = V3(jnp.ones(n), jnp.zeros(n), jnp.zeros(n))
    state, tr = media.calc_transmittance(desc, state, ro, rd, jnp.full(n, 10.0))
    t = np.asarray(tr.aos())
    # ratio tracking is an unbiased estimator: individual lanes may carry
    # 0.75 null-collision factors; the mean must match exp(-mu*t) ~ 0.9998
    assert t.mean() > 0.99
    assert (t > 0.5).all()


def test_dense_media_attenuates():
    desc = media.make_media_desc(constant_mfp=2.0, absorption=0.5)
    n = 512
    state = rng.make_state(jnp.arange(n), 1)
    ro = V3.zeros((n,))
    rd = V3(jnp.ones(n), jnp.zeros(n), jnp.zeros(n))
    state, tr = media.calc_transmittance(desc, state, ro, rd, jnp.full(n, 5.0))
    t = np.asarray(tr.aos())
    mean_tr = t.mean()
    # Beer-Lambert-ish: mu_t ~ (1/ (2*[0.5..2])) * 1.5 per channel -> clearly < 1
    assert 0.0 < mean_tr < 0.8


def test_scatter_ray_in_dense_media():
    desc = media.make_media_desc(constant_mfp=1.0)
    n = 1024
    state = rng.make_state(jnp.arange(n), 2)
    ro = V3.zeros((n,))
    rd = V3(jnp.ones(n), jnp.zeros(n), jnp.zeros(n))
    state, ms = media.scatter_ray(desc, state, ro, rd, jnp.full(n, 50.0))
    scattered = np.asarray(ms.scattered)
    assert scattered.mean() > 0.5  # dense medium scatters most rays
    # scattered rays moved off the origin along +x
    px = np.asarray(ms.pos.x)
    assert (px[scattered] > 0).all()
    # directions still unit-length
    d = np.asarray(ms.dir.aos())
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-3)


def test_phase_blend():
    desc = media.make_media_desc(phase_dir_a=0.5, phase_dir_b=-0.5, phase_blend=0.5)
    ct = jnp.asarray([1.0, 0.0, -1.0], jnp.float32)
    ph = np.asarray(media.calc_phase(desc, ct))
    assert np.isfinite(ph).all() and (ph > 0).all()
    # symmetric blend of opposite lobes -> forward ≈ backward
    np.testing.assert_allclose(ph[0], ph[2], rtol=1e-3)
