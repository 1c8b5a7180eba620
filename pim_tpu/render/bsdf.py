"""Principled BSDF: evaluation and sampling, batched over ray lanes.

Counterpart of Eval/Scatter_{Diffuse,Specular,Refractive,Principled}
(ref: src/rendering/path_tracer.c:1476-1707).  The principled surface is a
stochastic lobe mix: specular weight lerp(0.5, 1.0, metallic), the rest
diffuse; refractive materials switch to a GGX-microfacet dielectric with
Beer-Lambert interior transmittance.

All functions are branch-free over [N] lanes; per-lane discrete decisions
(lobe choice, reflect-vs-refract) are `where`-selected, matching what the
per-pixel C code does with `if`s.  Gradient note: lobe/termination decisions
are detached (they depend on uniforms only); the returned radiance weights
stay differentiable w.r.t. material parameters.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pim_tpu.core import rng
from pim_tpu.geom.material import MatFlag
from pim_tpu.math.brdf import (
    BrdfLut,
    albedo_to_transmittance,
    brdf_alpha,
    d_gtr,
    f_0,
    f_90,
    f_dielectric,
    fd_burley,
    ggx_energy_compensation,
    v_smith_correlated,
)
from pim_tpu.math.sampling import (
    ggx_pdf,
    lambert_pdf,
    sample_cosine_hemisphere,
    sample_ggx_microfacet,
    tan_to_world,
)
from pim_tpu.math.vec import EPS, MILLI, dot, dotsat, lerp, normalize, reflect, refract
from pim_tpu.render.surface import Surface, fix_shading_normal


class Scatter(NamedTuple):
    """One BSDF sample (ref PtScatter :74-81)."""

    pos: jnp.ndarray          # [N, 3]
    dir: jnp.ndarray          # [N, 3]
    attenuation: jnp.ndarray  # [N, 3] brdf * NoL
    pdf: jnp.ndarray          # [N]
    # luminance only used by media scattering
    luminance: jnp.ndarray    # [N, 3]


def eval_diffuse(surf: Surface, i, l):
    """Burley diffuse eval (ref Eval_Diffuse :1476-1497).
    Returns (attenuation [N,3], pdf [N])."""
    n = surf.n
    nol = dot(n, l)
    pdf = lambert_pdf(nol)
    valid = pdf > EPS
    v = -i
    h = normalize(v + l)
    hov = dotsat(h, v)
    nov = dotsat(n, v)
    fd = surf.albedo * fd_burley(nol, nov, hov, surf.roughness)[..., None]
    atten = fd * nol[..., None]
    return (
        jnp.where(valid[..., None], atten, 0.0),
        jnp.where(valid, pdf, 0.0),
    )


def eval_specular(lut: BrdfLut, surf: Surface, i, l):
    """GGX specular eval with energy compensation (ref Eval_Specular
    :1516-1548)."""
    n = surf.n
    nol = dot(n, l)
    alpha = brdf_alpha(surf.roughness)
    v = -i
    h = normalize(v + l)
    noh = dot(n, h)
    hov = dot(h, v)
    pdf = ggx_pdf(noh, hov, alpha)
    valid = (nol > EPS) & (pdf > EPS)
    nov = dotsat(n, v)
    f_d = f_dielectric(hov, jnp.float32(1.0), jnp.float32(1.5))
    f0 = f_0(surf.albedo, surf.metallic)
    f = lerp(f0, f_90(f0)[..., None], jnp.clip(f_d, 0.0, 1.0)[..., None])
    d = d_gtr(noh, alpha)
    g = v_smith_correlated(nol, nov, alpha)
    fr = f * (d * g)[..., None]
    fr = fr * ggx_energy_compensation(lut, f0, nov, alpha)
    atten = fr * nol[..., None]
    return (
        jnp.where(valid[..., None], atten, 0.0),
        jnp.where(valid, pdf, 0.0),
    )


def eval_principled(lut: BrdfLut, surf: Surface, i, l):
    """Mixed-lobe eval for NEE (ref Eval_Principled :1641-1668).
    Refractive lanes evaluate to zero."""
    nol = dot(surf.n, l)
    amt_spec = lerp(jnp.float32(0.5), jnp.float32(1.0), surf.metallic)
    amt_diff = 1.0 - amt_spec
    spec_a, spec_p = eval_specular(lut, surf, i, l)
    diff_a, diff_p = eval_diffuse(surf, i, l)
    atten = lerp(spec_a, diff_a, amt_diff[..., None])
    pdf = lerp(spec_p, diff_p, amt_diff)
    refractive = (surf.flags & int(MatFlag.REFRACTIVE)) != 0
    dead = refractive | (nol <= EPS)
    return (
        jnp.where(dead[..., None], 0.0, atten),
        jnp.where(dead, 0.0, pdf),
    )


def _scatter_specular(lut, surf: Surface, i, xi):
    """GGX importance sample (ref Scatter_Specular :1550-1565)."""
    alpha = brdf_alpha(surf.roughness)
    m = tan_to_world(surf.n, sample_ggx_microfacet(xi, alpha))
    m = fix_shading_normal(surf.m, m)
    l = reflect(i, m)
    atten, pdf = eval_specular(lut, surf, i, l)
    return l, atten, pdf


def _scatter_diffuse(surf: Surface, i, xi):
    """Cosine-hemisphere sample (ref Scatter_Diffuse :1499-1514)."""
    l = tan_to_world(surf.n, sample_cosine_hemisphere(xi))
    atten, pdf = eval_diffuse(surf, i, l)
    return l, atten, pdf


def scatter_principled(lut: BrdfLut, surf: Surface, i, state, occluded_fn=None):
    """One-sample lobe-mixed BSDF sample (ref Scatter_Principled
    :1670-1707).  Returns (state, Scatter).

    `occluded_fn(ro, rd) -> t_hit` supplies the interior thickness probe for
    refractive transmission; pass None for scenes without refractive
    materials (compile-time skip).
    """
    state, u_lobe = rng.next_f32(state)
    state, xi = rng.next_f32x2(state)
    amt_spec = lerp(jnp.float32(0.5), jnp.float32(1.0), surf.metallic)
    amt_diff = 1.0 - amt_spec
    use_spec = u_lobe < amt_spec

    # both lobes share the same 2D draw; lanes select their branch
    l_spec, a_spec, p_spec = _scatter_specular(lut, surf, i, xi)
    l_diff, a_diff, p_diff = _scatter_diffuse(surf, i, xi)

    l = jnp.where(use_spec[..., None], l_spec, l_diff)
    # cross-evaluate the other lobe at the chosen direction
    e_diff_a, e_diff_p = eval_diffuse(surf, i, l)
    e_spec_a, e_spec_p = eval_specular(lut, surf, i, l)

    atten_spec_branch = lerp(a_spec, e_diff_a, amt_diff[..., None])
    pdf_spec_branch = lerp(p_spec, e_diff_p, amt_diff)
    atten_diff_branch = lerp(a_diff, e_spec_a, amt_spec[..., None])
    pdf_diff_branch = lerp(p_diff, e_spec_p, amt_spec)

    atten = jnp.where(use_spec[..., None], atten_spec_branch, atten_diff_branch)
    pdf = jnp.where(use_spec, pdf_spec_branch, pdf_diff_branch)
    pos = surf.p
    lum = jnp.zeros_like(atten)

    refractive = (surf.flags & int(MatFlag.REFRACTIVE)) != 0
    if occluded_fn is not None:
        state, refr = _scatter_refractive(surf, i, state, occluded_fn)
        pos = jnp.where(refractive[..., None], refr.pos, pos)
        l = jnp.where(refractive[..., None], refr.dir, l)
        atten = jnp.where(refractive[..., None], refr.attenuation, atten)
        pdf = jnp.where(refractive, refr.pdf, pdf)

    return state, Scatter(pos=pos, dir=l, attenuation=atten, pdf=pdf, luminance=lum)


def _scatter_refractive(surf: Surface, i, state, thickness_fn):
    """GGX microfacet dielectric with Beer-Lambert interior transmittance
    (ref Scatter_Refractive :1576-1638).

    thickness_fn(ro, rd) -> t of the next surface along the refracted ray
    (the interior chord length); <0 when nothing is hit.
    """
    eta_i = jnp.float32(1.000277)
    eta_t = jnp.maximum(1.0, surf.ior)
    alpha = brdf_alpha(surf.roughness)

    state, xi = rng.next_f32x2(state)
    state, u_fresnel = rng.next_f32(state)

    v = -i
    m = tan_to_world(surf.n, sample_ggx_microfacet(xi, alpha))
    m = fix_shading_normal(surf.m, m)
    entering = ~surf.backface

    cos_i = jnp.clip(jnp.abs(dot(v, m)), 0.0, 1.0)
    fres = f_dielectric(jnp.where(entering, cos_i, -cos_i), eta_i, eta_t)

    do_reflect = u_fresnel < fres
    l_reflect = reflect(i, m)
    k = jnp.where(entering, eta_i / eta_t, eta_t / eta_i)
    l_refract = refract(i, m, k[..., None])
    # guard TIR zeros
    tir = jnp.sum(l_refract * l_refract, -1) < 1e-8
    l_refract = jnp.where(tir[..., None], l_reflect, l_refract)
    l = jnp.where(do_reflect[..., None], l_reflect, l_refract)
    pdf = jnp.where(do_reflect, fres, 1.0 - fres)

    # offset below the surface when the ray passes through
    below = dot(l, surf.m) < 0.0
    pos = jnp.where(
        below[..., None], surf.p - surf.m * (MILLI * 0.1), surf.p
    )

    # Beer-Lambert through the interior for entering refraction
    refracting_in = (~do_reflect) & entering & ~tir
    t_hit = thickness_fn(pos, l)
    thickness = jnp.where(t_hit >= 0.0, jnp.maximum(t_hit, EPS), jnp.float32(1e6))
    tr = albedo_to_transmittance(surf.albedo, surf.roughness, thickness)
    atten = jnp.where(
        refracting_in[..., None], tr * pdf[..., None],
        jnp.broadcast_to(pdf[..., None], tr.shape),
    )

    return state, Scatter(
        pos=pos, dir=l, attenuation=atten, pdf=pdf, luminance=jnp.zeros_like(atten)
    )
