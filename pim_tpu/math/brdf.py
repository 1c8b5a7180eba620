"""Physically-based BRDF building blocks (GGX / Smith / Schlick / Burley).

Counterpart of the reference's src/math/lighting.h, plus the progressive
split-sum BRDF LUT bake from src/math/lighting.c:86-144.  All functions are
batched jnp; colors are [..., 3].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pim_tpu.math.sampling import (
    hammersley_2d,
    sample_ggx_microfacet,
)
from pim_tpu.math.vec import EPS, EPS_SQ, PI, dot, lerp, normalize, saturate

K_MIN_DENOM = jnp.float32(1.0 / (1 << 10))
K_MIN_ALPHA = K_MIN_DENOM


def brdf_alpha(roughness):
    """Perceptual roughness -> alpha (ref lighting.h:57-60)."""
    return jnp.maximum(roughness * roughness, K_MIN_ALPHA)


def f_0(albedo, metallic):
    """Reflectance at normal incidence (ref lighting.h:69-72)."""
    return lerp(jnp.float32(0.04), albedo, metallic[..., None])


def f_90(f0):
    """Grazing reflectance (ref lighting.h:75-78)."""
    return saturate(50.0 * jnp.sum(f0 * jnp.float32(0.33), axis=-1))


def f_schlick(f0, f90, cos_theta):
    """Schlick fresnel; f0 [..., 3], f90 [...], cosθ [...] (ref lighting.h:90-95)."""
    t = 1.0 - cos_theta
    t5 = t * t * t * t * t
    return lerp(f0, f90[..., None], t5[..., None])


def f_schlick1(f0, f90, cos_theta):
    t = 1.0 - cos_theta
    t5 = t * t * t * t * t
    return lerp(f0, f90, t5)


def f_dielectric(cos_theta_i, eta_i, eta_t):
    """Exact dielectric fresnel w/ TIR (ref lighting.h:138-162).

    Negative cosθ means transmission side (etas swap).
    """
    cos_theta_i = jnp.clip(cos_theta_i, -1.0, 1.0)
    trans = cos_theta_i < 0.0
    cos_i = jnp.abs(cos_theta_i)
    ei = jnp.where(trans, eta_t, eta_i)
    et = jnp.where(trans, eta_i, eta_t)
    sin_i = jnp.sqrt(jnp.maximum(1.0 - cos_i * cos_i, EPS_SQ))
    sin_t = (ei / et) * sin_i
    tir = sin_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t * sin_t, EPS_SQ))
    # denominators are sums of non-negative terms, only guard against 0
    r_parl = ((et * cos_i) - (ei * cos_t)) / jnp.maximum((et * cos_i) + (ei * cos_t), EPS)
    r_perp = ((ei * cos_i) - (et * cos_t)) / jnp.maximum((ei * cos_i) + (et * cos_t), EPS)
    f = saturate((r_parl * r_parl + r_perp * r_perp) * 0.5)
    return jnp.where(tir, jnp.float32(1.0), f)


def d_gtr(noh, alpha):
    """GGX Trowbridge-Reitz NDF (ref lighting.h:218-224)."""
    a2 = alpha * alpha
    f = lerp(jnp.float32(1.0), a2, noh * noh)
    f = f * f * PI
    return a2 / jnp.maximum(f, EPS)


def v_smith_correlated(nol, nov, alpha):
    """Height-correlated Smith visibility (ref lighting.h:246-253)."""
    a2 = alpha * alpha
    v = nol * jnp.sqrt(jnp.maximum(a2 + (nov - nov * a2) * nov, EPS_SQ))
    l = nov * jnp.sqrt(jnp.maximum(a2 + (nol - nol * a2) * nol, EPS_SQ))
    return 0.5 / jnp.maximum(v + l, EPS)


def fd_lambert():
    return 1.0 / PI


def fd_burley(nol, nov, hov, roughness):
    """Disney diffuse (ref lighting.h:266-276)."""
    fd90 = 0.5 + 2.0 * hov * hov * roughness
    light_scatter = f_schlick1(1.0, fd90, nol)
    view_scatter = f_schlick1(1.0, fd90, nov)
    return (light_scatter * view_scatter) / PI


def diffuse_color(albedo, metallic):
    return albedo * (1.0 - metallic[..., None])


def sigma_a_from_reflectance(albedo, beta_n):
    """Chiang et al. color reparameterization (ref lighting.h:193-206)."""
    r2 = beta_n * beta_n
    r3 = r2 * beta_n
    r4 = r3 * beta_n
    r5 = r4 * beta_n
    t = 5.969 - 0.215 * beta_n + 2.532 * r2 - 10.73 * r3 + 5.574 * r4 + 0.245 * r5
    sigma = jnp.log(jnp.maximum(albedo, EPS)) / jnp.maximum(t, EPS)[..., None]
    return sigma * sigma


def albedo_to_transmittance(albedo, roughness, thickness):
    """Beer-Lambert interior transmittance (ref lighting.h:208-212)."""
    sigma_a = sigma_a_from_reflectance(albedo, roughness)
    return jnp.exp(sigma_a * (-thickness)[..., None])


# ---------------------------------------------------------------------------
# Split-sum BRDF LUT (GGX energy compensation).
# The reference bakes this progressively on the task system
# (src/math/lighting.c:86-144, cvar r_brdflut_spf); on TPU one jitted
# QMC integration fills the whole LUT at init in milliseconds.
# ---------------------------------------------------------------------------


class BrdfLut(NamedTuple):
    # texels[..., 0] = integral of F * D * V * NoL ("reflectance")
    # texels[..., 1] = integral of D * V * NoL     ("visibility")
    texels: jnp.ndarray  # [size, size, 2] over (NoV, alpha)


def _integrate_brdf(nov, alpha, num_samples: int):
    """Split-sum integration for one (NoV, alpha) texel.

    Matches the reference integrand (src/math/lighting.c:58-81):
      x = ∫ Fc · D·V·NoL   with Fc = dielectric fresnel (air->glass)
      y = ∫ D·V·NoL
    under GGX half-vector importance sampling (D/pdf = 4·HoV/NoH).
    """
    v = jnp.stack([jnp.sqrt(jnp.maximum(1.0 - nov * nov, 0.0)), jnp.float32(0.0), nov])
    i = jnp.arange(num_samples, dtype=jnp.uint32)
    xi = hammersley_2d(i, num_samples)  # [S, 2]
    m = sample_ggx_microfacet(xi, alpha)  # [S, 3] tangent space, N=+Z
    # L = reflect(-V, m)
    l = 2.0 * jnp.sum(v * m, axis=-1, keepdims=True) * m - v
    nol = l[..., 2]
    noh = saturate(m[..., 2])
    voh = jnp.sum(v * m, axis=-1)
    valid = nol > EPS
    g = v_smith_correlated(jnp.maximum(nol, 0.0), jnp.maximum(nov, EPS), alpha)
    g_vis = jnp.where(valid, (g * voh * nol * 4.0) / jnp.maximum(noh, EPS), 0.0)
    fc = f_dielectric(voh, jnp.float32(1.000293), jnp.float32(1.52))
    a = jnp.sum(fc * g_vis)
    b = jnp.sum(g_vis)
    n = jnp.float32(num_samples)
    return jnp.stack([a / n, b / n])


def bake_brdf_lut(size: int = 32, num_samples: int = 1024) -> BrdfLut:
    """Bake the full split-sum LUT (axes: NoV in x, alpha in y).

    Texel i sits at coordinate i/(size-1) to match the bilinear fetch
    convention (sampler.h LinearClamp: x = sat(u)*(size-1))."""
    nov = jnp.clip(jnp.arange(size, dtype=jnp.float32) / (size - 1), EPS, 1.0 - EPS)
    alpha = jnp.clip(jnp.arange(size, dtype=jnp.float32) / (size - 1), K_MIN_ALPHA, 1.0)
    fn = jax.vmap(jax.vmap(lambda a, n: _integrate_brdf(n, a, num_samples), (None, 0)), (0, None))
    texels = fn(alpha, nov)  # [alpha, nov, 2]
    return BrdfLut(texels=jnp.swapaxes(texels, 0, 1))  # [nov, alpha, 2]


def brdf_lut_sample(lut: BrdfLut, nov, alpha):
    """Bilinear clamped fetch at (NoV, alpha) (ref lighting.h:52-55)."""
    size = lut.texels.shape[0]
    x = jnp.clip(nov * size - 0.5, 0.0, size - 1.0)
    y = jnp.clip(alpha * size - 0.5, 0.0, size - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, size - 1)
    y1 = jnp.minimum(y0 + 1, size - 1)
    fx = (x - x0.astype(jnp.float32))[..., None]
    fy = (y - y0.astype(jnp.float32))[..., None]
    t00 = lut.texels[x0, y0]
    t10 = lut.texels[x1, y0]
    t01 = lut.texels[x0, y1]
    t11 = lut.texels[x1, y1]
    return lerp(lerp(t00, t10, fx), lerp(t01, t11, fx), fy)


def ggx_energy_compensation(lut: BrdfLut, f0, nov, alpha):
    """Multi-scatter energy compensation (ref lighting.h:294-303)."""
    dv = brdf_lut_sample(lut, nov, alpha)[..., 1]
    t = (1.0 / jnp.maximum(dv, EPS)) - 1.0
    return f0 * t[..., None] + 1.0


def env_brdf(lut: BrdfLut, f0, nov, alpha):
    """Pre-integrated environment BRDF (ref lighting.h:278-291)."""
    dvf_dv = brdf_lut_sample(lut, nov, alpha)
    return (1.0 - f0) * dvf_dv[..., 0:1] + f0 * dvf_dv[..., 1:2]
