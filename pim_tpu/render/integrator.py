"""The wavefront path-tracing integrator (SoA lanes).

Counterpart of Pt_TraceRay / TraceFn / Pt_Trace (ref: src/rendering/
path_tracer.c:2306-2585) — redesigned for the TPU execution model:

  reference                      this design
  ---------------------------    ------------------------------------------
  per-pixel while(bounce) loop   `lax.scan` over bounce index, all rays in
                                 lockstep with an `alive` mask
  64 worker threads              one dense [N]-lane wavefront (or a shard)
  per-thread PCG stream          per-ray counter RNG, (pixel, sample)-keyed
  Russian roulette `break`       RR folds into the alive mask
  atomic light histogram         scatter-add into the carried [G, E] tensor
  float4 SIMD values             SoA V3 over flat [N] arrays (vec3.py)

Radiance math is line-comparable per lane: RR scaling, NEE MIS weights,
emission gating on bounce==0 / prev-refractive, and the albedo/normal AOV
weighting all follow the reference (cited inline).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pim_tpu.core import rng
from pim_tpu.geom.material import MatFlag
from pim_tpu.math.brdf import BrdfLut
from pim_tpu.math.grid import grid_index_soa
from pim_tpu.math.vec3 import (
    EPS,
    PI,
    RCP_EPS,
    V3,
    avg_lum3,
    saturate,
    where3,
)
from pim_tpu.render import fetch as F
from pim_tpu.render.bsdf import scatter_principled
from pim_tpu.render.lights import estimate_direct, light_on_hit
from pim_tpu.render.scene import (
    LightState,
    SceneArrays,
    SceneMeta,
    scene_intersect,
)
from pim_tpu.render.surface import fetch_hit_attribs, get_surface


class TraceResult(NamedTuple):
    color: jnp.ndarray    # [N, 3] radiance (AoS at the API edge)
    albedo: jnp.ndarray   # [N, 3] AOV
    normal: jnp.ndarray   # [N, 3] AOV
    live: jnp.ndarray     # [G, E] u32 light-learning histogram delta
    rays_traced: jnp.ndarray  # scalar f32: total rays actually cast


def _evaluate_light(meta, arrays, lights, state, p: V3):
    """In-media NEE (ref EvaluateLight :1921-1942): select a light from the
    grid, sample a point on it, verify visibility with one ray.
    Returns (state, lum V3, dir V3, ok)."""
    from pim_tpu.math.sampling import light_pdf as _light_pdf
    from pim_tpu.math.sampling import sample_bary_coord
    from pim_tpu.math.vec3 import dot as dot3
    from pim_tpu.render import fetch as F
    from pim_tpu.render.lights import light_select
    from pim_tpu.render.surface import get_emission_from_attribs

    state, u_sel = rng.next_f32(state)
    emit, l_tri, select_pdf, sel_ok, _, _ = light_select(meta, arrays, lights, p, u_sel)
    state, (bu, bv) = rng.next_f32x2(state)
    w_, wu, wv = sample_bary_coord(bu, bv)
    rows = F.fetch_cols(arrays.tri_table, l_tri)
    a = F.v3_rows(rows, F.PA)
    bb = F.v3_rows(rows, F.PB)
    c = F.v3_rows(rows, F.PC)
    area = rows[F.AREA]
    target = a * w_ + bb * wu + c * wv
    delta = target - p
    dist_sq = jnp.maximum(dot3(delta, delta), 1e-12)
    dist = jnp.sqrt(dist_sq)
    rd = delta * (1.0 / dist)
    hit = scene_intersect(meta, arrays, p, rd, 0.0, dist + 1e-5)
    hit_ok = (hit.tri >= 0) & (hit.tri == l_tri)
    pdf = _light_pdf(area, jnp.abs(dot3(rd, hit.ng)), dist_sq)
    at = fetch_hit_attribs(meta, arrays, hit)
    emission = get_emission_from_attribs(meta, arrays, rd, at)
    denom = jnp.maximum(pdf * select_pdf, EPS)
    lum = emission * (1.0 / denom)
    ok = sel_ok & hit_ok & (pdf > EPS)
    return state, lum, rd, ok


def _sky_radiance(meta: SceneMeta, arrays: SceneArrays, rd: V3) -> V3:
    if meta.has_sky:
        from pim_tpu.render.sky import sample_sky_cubemap_soa

        return sample_sky_cubemap_soa(arrays.sky, rd)
    return V3.zeros(rd.x.shape)


def trace_rays(
    meta: SceneMeta,
    arrays: SceneArrays,
    lights: LightState,
    ro,
    rd,
    state,
    max_bounces: int,
    media_desc=None,
    mis_both: bool = False,
    use_rr: bool = True,
) -> TraceResult:
    """Trace a batch of rays to completion.

    ro/rd: V3 of [N] (or [N, 3] arrays, converted); state: rng.RngState.
    media_desc: MediaDesc when meta.media_enabled (captured statically).
    mis_both: deterministic two-ray full-MIS NEE (the differentiable
    path; see lights.estimate_direct) instead of stochastic selection.
    use_rr: Russian roulette termination (ref :2319-2331).  The
    differentiable path disables it — the survive/die comparison depends
    on the throughput, so parameter perturbations flip lanes discretely,
    which AD cannot follow (SURVEY.md §7 hard part #3); a fixed bounce
    budget keeps the estimator smooth.
    """
    if meta.media_enabled and media_desc is None:
        from pim_tpu.render.media import make_media_desc

        media_desc = make_media_desc()
    if not isinstance(ro, V3):
        ro = V3.from_aos(ro)
    if not isinstance(rd, V3):
        rd = V3.from_aos(rd)
    n = ro.x.shape[0]
    lut = BrdfLut(texels=arrays.brdf_lut)
    g, e = lights.live.shape

    init = dict(
        ro=ro,
        rd=rd,
        state=state,
        lum=V3.zeros((n,)),
        atten=V3.ones((n,)),
        alive=jnp.ones((n,), bool),
        prev_refractive=jnp.zeros((n,), bool),
        aov_albedo=V3.zeros((n,)),
        aov_normal=V3.zeros((n,)),
        aov_weight=jnp.zeros((n,), jnp.float32),
        live=jnp.zeros((g, e), jnp.uint32),
        rays=jnp.float32(0.0),
    )

    def bounce(carry, b):
        ro = carry["ro"]
        rd = carry["rd"]
        state = carry["state"]
        alive = carry["alive"]
        atten = carry["atten"]
        lum = carry["lum"]

        # --- Russian roulette (ref :2319-2331) -----------------------------
        state, u_rr = rng.next_f32(state)
        if use_rr:
            p = saturate(avg_lum3(atten))
            survive = u_rr < p
            scale = jnp.where(alive & survive, 1.0 / jnp.maximum(p, EPS), 1.0)
            atten = atten * scale
            alive = alive & survive

        # --- extend ray (ref :2333) ----------------------------------------
        rays = carry["rays"] + jnp.sum(alive.astype(jnp.float32))
        hit = scene_intersect(meta, arrays, ro, rd, 0.0, RCP_EPS)
        missed = hit.tri < 0

        # miss -> sky + die (ref :2334-2339)
        sky = _sky_radiance(meta, arrays, rd)
        add_sky = (alive & missed).astype(jnp.float32)
        lum = lum + atten * sky * add_sky

        # --- participating media (ref ScatterRay :2346-2367) ---------------
        media_scattered = jnp.zeros((n,), bool)
        if meta.media_enabled:
            from pim_tpu.render.media import scatter_ray

            ray_len = jnp.where(missed, RCP_EPS, hit.t)

            def eval_light_in_media(st, p):
                return _evaluate_light(meta, arrays, lights, st, p)

            state, ms = scatter_ray(
                media_desc, state, ro, rd, ray_len,
                evaluate_light=eval_light_in_media if e > 0 else None,
            )
            media_scattered = alive & ms.scattered
            msf = media_scattered.astype(jnp.float32)
            lum = lum + atten * ms.luminance * msf
            inv_mpdf = 1.0 / jnp.maximum(ms.pdf, EPS)
            # scattered lanes: redirect; others: apply the transmittance
            atten = where3(
                media_scattered,
                atten * ms.attenuation * inv_mpdf,
                where3(alive, atten * ms.attenuation, atten),
            )
            ro = where3(media_scattered, ms.pos, ro)
            rd = where3(media_scattered, ms.dir, rd)

        # --- fused surface fetch (one one-hot matmul; ref :2369) -----------
        at = fetch_hit_attribs(meta, arrays, hit)

        # backface of a non-refractive surface -> die (ref :2340-2343)
        refr_hit = (at.flags & int(MatFlag.REFRACTIVE)) != 0
        dead_backface = hit.backface & ~refr_hit
        alive = alive & (media_scattered | (~missed & ~dead_backface))
        # lanes redirected by a media scatter skip surface work this bounce
        # (ref :2358-2362 `continue`)
        surf_alive = alive & ~media_scattered

        surf = get_surface(meta, arrays, ro, rd, hit, attribs=at)

        # light learning (ref :2370-2373, only bounce > 0)
        live = carry["live"]
        if e > 0:
            cell = grid_index_soa(meta.grid_spec(arrays.grid_lo), ro)
            emit = at.rows[F.EMIT_IDX].astype(jnp.int32)
            live = jax.lax.cond(
                b > 0,
                lambda lv: light_on_hit(meta, lv, cell, emit, surf.emission, surf_alive),
                lambda lv: lv,
                live,
            )

        # emission only on primary hits or through refractive chains
        # (ref :2375-2378)
        emit_vis = (surf_alive & ((b == 0) | carry["prev_refractive"])).astype(jnp.float32)
        lum = lum + surf.emission * atten * emit_vis

        # sky-flagged surface terminates (ref :2379-2382)
        is_sky_surf = (surf.flags & int(MatFlag.SKY)) != 0
        surf_alive = surf_alive & ~is_sky_surf
        alive = alive & (media_scattered | ~is_sky_surf)

        # --- NEE (ref :2384-2387) ------------------------------------------
        nee_rays = 2.0 if mis_both else 1.0
        rays = rays + nee_rays * jnp.sum(surf_alive.astype(jnp.float32))
        state, li = estimate_direct(
            meta, arrays, lights, lut, surf, hit.tri, rd, state,
            both=mis_both,
        )
        lum = lum + li * atten * surf_alive.astype(jnp.float32)

        # --- continuation scatter (ref :2389-2398) -------------------------
        if meta.has_refractive:
            def thickness_fn(p, l):
                h = scene_intersect(meta, arrays, p, l, 0.0, RCP_EPS)
                return h.t
        else:
            thickness_fn = None
        state, scat = scatter_principled(lut, surf, rd, state, occluded_fn=thickness_fn)
        cont = surf_alive & (scat.pdf > EPS)
        inv_pdf = 1.0 / jnp.maximum(scat.pdf, EPS)
        atten = where3(cont, atten * scat.attenuation * inv_pdf, atten)
        ro = where3(cont, scat.pos, ro)
        rd = where3(cont, scat.dir, rd)
        prev_refractive = cont & ((surf.flags & int(MatFlag.REFRACTIVE)) != 0)
        alive = cont | media_scattered

        # --- AOV accumulation (ref :2400-2406) -----------------------------
        w = saturate(1.0 - avg_lum3(atten) * (1.0 / PI)) * cont.astype(jnp.float32)
        aov_albedo = carry["aov_albedo"] + surf.albedo * w
        aov_normal = carry["aov_normal"] + surf.n * w
        aov_weight = carry["aov_weight"] + w

        return (
            dict(
                ro=ro, rd=rd, state=state, lum=lum, atten=atten, alive=alive,
                prev_refractive=prev_refractive, aov_albedo=aov_albedo,
                aov_normal=aov_normal, aov_weight=aov_weight, live=live,
                rays=rays,
            ),
            None,
        )

    carry, _ = jax.lax.scan(bounce, init, jnp.arange(max_bounces))

    s = 1.0 / jnp.maximum(carry["aov_weight"], EPS)
    return TraceResult(
        color=carry["lum"].aos(),
        albedo=(carry["aov_albedo"] * s).aos(),
        normal=(carry["aov_normal"] * s).aos(),
        live=carry["live"],
        rays_traced=carry["rays"],
    )


# ---------------------------------------------------------------------------
# Progressive accumulation (ref Pt_Trace + TraceFn EMA :2550-2552)
# ---------------------------------------------------------------------------


class TraceBuffers(NamedTuple):
    """Progressive accumulation state (ref PtTrace, path_tracer.h:67-84)."""

    color: jnp.ndarray    # [H*W, 3]
    albedo: jnp.ndarray   # [H*W, 3]
    normal: jnp.ndarray   # [H*W, 3]


def make_trace_buffers(width: int, height: int) -> TraceBuffers:
    n = width * height
    z = jnp.zeros((n, 3), jnp.float32)
    return TraceBuffers(color=z, albedo=z, normal=z)


def accumulate(buffers: TraceBuffers, result: TraceResult, sample_weight) -> TraceBuffers:
    """Progressive EMA: lerp(prev, new, 1/sampleCount)."""
    sw = jnp.asarray(sample_weight, jnp.float32)
    return TraceBuffers(
        color=buffers.color + (result.color - buffers.color) * sw,
        albedo=buffers.albedo + (result.albedo - buffers.albedo) * sw,
        normal=buffers.normal + (result.normal - buffers.normal) * sw,
    )


def luminance_stddev(color: jnp.ndarray) -> jnp.ndarray:
    """pt_stddev convergence metric (ref CalcStdDev,
    render_system.c:1374-1394)."""
    lum = jnp.mean(color, axis=-1)
    n = lum.shape[0]
    mean = jnp.mean(lum)
    var = jnp.sum((lum - mean) ** 2) / (n - 1)
    return jnp.sqrt(var)
