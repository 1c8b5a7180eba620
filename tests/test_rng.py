import jax.numpy as jnp
import numpy as np

from pim_tpu.core import rng


def _pcg4d_ref(v):
    """Scalar numpy model of the Jarzynski-Olano pcg4d permutation."""
    v = np.array(v, dtype=np.uint64)
    m = np.uint64(1664525)
    a = np.uint64(1013904223)
    mask = np.uint64(0xFFFFFFFF)
    v = (v * m + a) & mask
    x, y, z, w = v
    x = (x + y * w) & mask
    y = (y + z * x) & mask
    z = (z + x * y) & mask
    w = (w + y * z) & mask
    x ^= x >> np.uint64(16)
    y ^= y >> np.uint64(16)
    z ^= z >> np.uint64(16)
    w ^= w >> np.uint64(16)
    x = (x + y * w) & mask
    y = (y + z * x) & mask
    z = (z + x * y) & mask
    w = (w + y * z) & mask
    return np.array([x, y, z, w], dtype=np.uint64)


def test_pcg4d_matches_reference_permutation():
    v0 = np.array([1, 2, 3, 4], dtype=np.uint32)
    got = np.asarray(rng.pcg4d(jnp.asarray(v0)))
    want = _pcg4d_ref(v0).astype(np.uint32)
    np.testing.assert_array_equal(got, want)


def test_float_conversion_range():
    state = rng.make_state(jnp.arange(4096), 0)
    for _ in range(4):
        state, f = rng.next_f32(state)
        f = np.asarray(f)
        assert f.min() >= 0.0 and f.max() < 1.0


def test_uniformity():
    state = rng.make_state(jnp.arange(1 << 16), 0)
    state, f = rng.next_f32(state)
    f = np.asarray(f)
    # mean ~0.5, var ~1/12
    assert abs(f.mean() - 0.5) < 5e-3
    assert abs(f.var() - 1.0 / 12.0) < 5e-3
    # histogram should be flat-ish
    hist, _ = np.histogram(f, bins=16, range=(0, 1))
    assert hist.min() > 0.8 * (len(f) / 16)


def test_streams_decorrelated():
    state = rng.make_state(jnp.arange(10000), 0)
    _, a = rng.next_f32(state)
    state2 = rng.make_state(jnp.arange(10000), 1)
    _, b = rng.next_f32(state2)
    a, b = np.asarray(a), np.asarray(b)
    corr = np.corrcoef(a, b)[0, 1]
    assert abs(corr) < 0.05


def test_determinism_across_shapes():
    """Pixel 7's stream is identical whether drawn in a batch or alone —
    the property that makes results sharding-invariant."""
    batch = rng.make_state(jnp.arange(16), 3)
    single = rng.make_state(jnp.asarray([7]), 3)
    _, (bu, bv) = rng.next_f32x2(batch)
    _, (su, sv) = rng.next_f32x2(single)
    assert float(bu[7]) == float(su[0])
    assert float(bv[7]) == float(sv[0])
