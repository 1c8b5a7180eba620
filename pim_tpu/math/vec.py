"""Small vector helpers over [..., 3] float32 tensors.

Counterpart of the reference's float4_funcs.h value math — but idiomatic jnp:
broadcasting instead of SIMD lanes.  Epsilon constants mirror
src/common/macro.h / scalar.h so numeric guards match.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = jnp.float32(1e-6)        # kEpsilon (ref: src/math/scalar.h)
EPS_SQ = jnp.float32(1e-12)    # kEpsilonSq
RCP_EPS = jnp.float32(1e6)     # kRcpEpsilon — 'infinite' ray length
MILLI = jnp.float32(1e-3)
PI = jnp.float32(3.14159265358979323846)
TAU = jnp.float32(6.28318530717958647692)
LOG2_EPS = jnp.float32(-19.931568569324174)  # log2(kEpsilon)
SQRT5_CONJ = jnp.float32(0.61803398875)      # kSqrt5Conj (golden-ratio conjugate)


def dot(a, b, keepdims=False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def dotsat(a, b, keepdims=False):
    return jnp.clip(dot(a, b, keepdims), 0.0, 1.0)


def length(v, keepdims=False):
    return jnp.sqrt(jnp.maximum(dot(v, v, keepdims), EPS_SQ))


def normalize(v):
    return v / length(v, keepdims=True)


def cross(a, b):
    return jnp.cross(a, b)


def reflect(i, n):
    """Reflect incident dir i about normal n (both unit)."""
    return i - 2.0 * dot(i, n, keepdims=True) * n


def refract(i, n, eta):
    """Refract unit incident i through normal n with relative IOR eta.

    Matches GLSL/f4_refract3 semantics: returns 0 on total internal
    reflection.
    """
    cosi = -dot(i, n, keepdims=True)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    tir = k < 0.0
    k = jnp.maximum(k, 0.0)
    out = eta * i + (eta * cosi - jnp.sqrt(k)) * n
    return jnp.where(tir, jnp.zeros_like(out), out)


def lerp(a, b, t):
    return a + (b - a) * t


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def blend3(a, b, c, wuv):
    """Barycentric blend: wuv[..., 0]*a + wuv[..., 1]*b + wuv[..., 2]*c."""
    return (
        a * wuv[..., 0:1] + b * wuv[..., 1:2] + c * wuv[..., 2:3]
    )


def tri_area(a, b, c):
    """Area of 3D triangle (ref: TriArea3D, src/math/area.h)."""
    return 0.5 * length(jnp.cross(b - a, c - a))
