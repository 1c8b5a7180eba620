"""Counter-based per-ray RNG streams (TPU-native replacement for per-thread PCG).

The reference keeps one mutable `Prng` per worker thread, advanced with the
Jarzynski-Olano pcg4d permutation (ref: src/math/pcg.h:126-176,
src/common/random.c:67).  On TPU there are no threads — every ray owns a
4-lane uint32 state tensor, seeded by hashing (pixel_id, sample_id, seed), so
results are deterministic under any sharding of the ray axis.  State advance
is the same pcg4d permutation, fully vectorized on the VPU.

All draw helpers are functional: they take a state [..., 4] uint32 and return
(new_state, values).
"""

from __future__ import annotations

import jax.numpy as jnp

_MUL = jnp.uint32(1664525)
_ADD = jnp.uint32(1013904223)


def pcg4d(v: jnp.ndarray) -> jnp.ndarray:
    """Jarzynski-Olano pcg4d permutation of a [..., 4] uint32 tensor.

    Matches the reference's Pcg4 (src/math/pcg.h:126-176) so per-draw
    statistics are identical.
    """
    v = v.astype(jnp.uint32)
    v = v * _MUL + _ADD
    x, y, z, w = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    w = w ^ (w >> 16)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return jnp.stack([x, y, z, w], axis=-1)


def pcg1(v: jnp.ndarray) -> jnp.ndarray:
    """Scalar PCG hash of uint32 (ref: src/math/pcg.h:26-32)."""
    v = v.astype(jnp.uint32)
    v = v * jnp.uint32(747796405) + jnp.uint32(2891336453)
    v = ((v >> ((v >> 28) + jnp.uint32(4))) ^ v) * jnp.uint32(277803737)
    return (v >> 22) ^ v


def to_float(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> float32 in [0, 1). Same mapping as ref Prng_ToFloat
    (src/common/random.h:108-111): top 24 bits scaled by 2^-24."""
    return (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def make_state(pixel_id: jnp.ndarray, sample_id, seed=0x9E3779B9) -> jnp.ndarray:
    """Seed a per-ray stream from (pixel_id, sample_id, seed).

    pixel_id: int array of any shape; returns state of shape [*shape, 4].
    Hashing the counters twice decorrelates adjacent pixels/samples.
    """
    pix = jnp.asarray(pixel_id, jnp.uint32)
    samp = jnp.broadcast_to(jnp.asarray(sample_id, jnp.uint32), pix.shape)
    sd = jnp.broadcast_to(jnp.asarray(seed, jnp.uint32), pix.shape)
    v = jnp.stack([pix, samp, sd, jnp.full_like(pix, jnp.uint32(0xDEADBEEF))], axis=-1)
    return pcg4d(pcg4d(v))


def next_u32x4(state: jnp.ndarray):
    state = pcg4d(state)
    return state, state


def next_f32(state: jnp.ndarray):
    """Draw one float in [0,1) per lane-batch. Returns (state, f32[...])."""
    state = pcg4d(state)
    return state, to_float(state[..., 0])


def next_f32x2(state: jnp.ndarray):
    """Draw a float2 in [0,1)^2. Returns (state, f32[..., 2])."""
    state = pcg4d(state)
    return state, to_float(state[..., 0:2])


def next_f32x3(state: jnp.ndarray):
    state = pcg4d(state)
    return state, to_float(state[..., 0:3])


def next_f32x4(state: jnp.ndarray):
    state = pcg4d(state)
    return state, to_float(state)


def next_u32(state: jnp.ndarray):
    state = pcg4d(state)
    return state, state[..., 0]
