"""Next-event estimation over the adaptive light grid (SoA).

Counterpart of LightSelect / SampleLight / LightEvalPdf / EstimateDirect /
LightOnHit (ref: src/rendering/path_tracer.c:1709-1942).

TPU re-design: the reference's two MIS strategies (sample the light grid vs
sample the BSDF) each trace one ray, so all lanes trace exactly ONE unified
NEE ray per bounce; attribute lookups are one-hot MXU fetches; LightOnHit's
atomic histogram is a scatter-add into the [G, E] live tensor, psum'd
across devices at frame end.
"""

from __future__ import annotations

import jax.numpy as jnp

from pim_tpu.core import rng
from pim_tpu.geom.material import MatFlag
from pim_tpu.math.grid import grid_index_soa
from pim_tpu.math.sampling import light_pdf, power_heuristic, sample_bary_coord
from pim_tpu.math.vec3 import (
    EPS,
    LOG2_EPS,
    MILLI,
    RCP_EPS,
    V3,
    avg_lum3,
    dot,
    lerp,
    max3,
    where3,
)
from pim_tpu.render import fetch as F
from pim_tpu.render.bsdf import eval_principled, scatter_principled
from pim_tpu.render.scene import LightState, SceneArrays, SceneMeta, scene_intersect
from pim_tpu.render.surface import Surface, fetch_hit_attribs, get_emission_from_attribs


def light_select(meta: SceneMeta, arrays: SceneArrays, lights: LightState,
                 position: V3, u):
    """Pick an emissive triangle from the cell's distribution
    (ref LightSelect :1735-1764).

    Returns (emit [N], tri [N], select_pdf [N], ok [N], pdf_rows [E, N],
    active [N])."""
    e = meta.emissive_count
    grid = meta.grid_spec(arrays.grid_lo)
    cell = grid_index_soa(grid, position)
    cdf_rows = F.fetch_cols(lights.cdf.T, cell)          # [E+1, N]
    emit = jnp.sum((cdf_rows <= u[None, :]).astype(jnp.int32), axis=0) - 1
    emit = jnp.clip(emit, 0, e - 1)
    pdf_rows = F.fetch_cols(lights.pdf.T, cell)          # [E, N]
    pdf = F.select_columns(pdf_rows, emit) / jnp.float32(e)
    active = F.fetch_cols(arrays.cell_active_f, cell)[0] > 0.5
    ok = active & (pdf > EPS)
    tri = F.fetch_cols(arrays.emit_to_tri_f, emit)[0].astype(jnp.int32)
    return emit, tri, pdf, ok, pdf_rows, active


def light_select_pdf_from_rows(pdf_rows, active, emit_of_hit, e: int):
    """Probability that light_select would pick the hit's emissive from the
    same cell (ref LightSelectPdf :1766-1783); 1.0 when not applicable."""
    valid = (emit_of_hit >= 0) & active
    pdf = F.select_columns(pdf_rows, jnp.maximum(emit_of_hit, 0)) / jnp.float32(e)
    return jnp.where(valid, pdf, 1.0)


def light_on_hit(meta: SceneMeta, live, cell, emit, emission: V3, active):
    """Accumulate the light-learning histogram (ref LightOnHit :1709-1733)."""
    lum = avg_lum3(emission)
    loglum = jnp.log2(jnp.maximum(lum, EPS)) - LOG2_EPS
    loglum = jnp.clip(loglum, 0.0, 46.0)
    amt = (loglum * (255.0 / 46.0) + 0.5).astype(jnp.uint32)
    ok = active & (emit >= 0) & (lum > EPS)
    amt = jnp.where(ok, amt, 0)
    cell = jnp.where(ok, cell, 0)
    emit = jnp.where(ok, jnp.maximum(emit, 0), 0)
    return live.at[cell, emit].add(amt)


def estimate_direct(
    meta: SceneMeta,
    arrays: SceneArrays,
    lights: LightState,
    lut,
    surf: Surface,
    src_tri,
    i_dir: V3,
    state,
    both: bool = False,
):
    """One-sample MIS direct lighting (ref EstimateDirect :1849-1919).

    `both=False` (default, the perf path): the reference's stochastic
    strategy selection — one unified ray, strategy picked with probability
    lerp(0.05, 0.95, roughness).  `both=True` (the differentiable path):
    deterministic full MIS — BOTH strategies trace a ray and both
    power-heuristic-weighted contributions are summed.  This removes the
    roughness-dependent discrete selection (whose boundary term AD cannot
    see), making the estimator smooth in the material parameters, and
    lowers variance at the cost of one extra ray per bounce.
    Returns (state, radiance V3)."""
    if meta.emissive_count == 0:
        return state, V3.zeros(src_tri.shape)

    p_rough = lerp(jnp.float32(0.05), jnp.float32(0.95), surf.roughness)
    p_smooth = 1.0 - p_rough
    state, u_strat = rng.next_f32(state)
    use_light = u_strat < p_rough
    if both:
        # both strategies always run: no selection probabilities
        p_rough = jnp.float32(1.0)
        p_smooth = jnp.float32(1.0)
        true_ = jnp.ones(src_tri.shape, bool)
        use_light = true_

    # --- light-strategy sample ---------------------------------------------
    state, u_sel = rng.next_f32(state)
    emit, l_tri, select_pdf, sel_ok, pdf_rows, cell_act = light_select(
        meta, arrays, lights, surf.p, u_sel
    )
    state, (bu, bv) = rng.next_f32x2(state)
    w_, wu, wv = sample_bary_coord(bu, bv)
    l_rows = F.fetch_cols(arrays.tri_table, l_tri)
    a = F.v3_rows(l_rows, F.PA)
    b = F.v3_rows(l_rows, F.PB)
    c = F.v3_rows(l_rows, F.PC)
    area = l_rows[F.AREA]
    target = a * w_ + b * wu + c * wv
    delta = target - surf.p
    dist_sq = jnp.maximum(dot(delta, delta), 1e-12)
    dist = jnp.sqrt(dist_sq)
    rd_light = delta * (1.0 / dist)

    # --- bsdf-strategy sample ----------------------------------------------
    state, scat = scatter_principled(lut, surf, i_dir, state, occluded_fn=None)

    # --- trace: one unified ray (stochastic) or two rays (full MIS) ---------
    if both:
        hit_l = scene_intersect(meta, arrays, surf.p, rd_light, 0.0,
                                dist + 0.01 * MILLI)
        at_l = fetch_hit_attribs(meta, arrays, hit_l)
        emission_l = get_emission_from_attribs(meta, arrays, rd_light, at_l)
        hit_b = scene_intersect(meta, arrays, surf.p, scat.dir, 0.0, RCP_EPS)
        at_b = fetch_hit_attribs(meta, arrays, hit_b)
        emission_b = get_emission_from_attribs(meta, arrays, scat.dir, at_b)
        hit_l_tri, hit_l_ng = hit_l.tri, hit_l.ng
        hit_b_tri, hit_b_ng, hit_b_t = hit_b.tri, hit_b.ng, hit_b.t
        hit_area = at_b.rows[F.AREA]
        hit_emit = at_b.rows[F.EMIT_IDX].astype(jnp.int32)
    else:
        rd = where3(use_light, rd_light, scat.dir)
        t_far = jnp.where(use_light, dist + 0.01 * MILLI, RCP_EPS)
        hit = scene_intersect(meta, arrays, surf.p, rd, 0.0, t_far)
        at = fetch_hit_attribs(meta, arrays, hit)
        emission = get_emission_from_attribs(meta, arrays, rd, at)
        hit_area = at.rows[F.AREA]
        hit_emit = at.rows[F.EMIT_IDX].astype(jnp.int32)
        hit_l_tri, hit_l_ng = hit.tri, hit.ng
        hit_b_tri, hit_b_ng, hit_b_t = hit.tri, hit.ng, hit.t
        emission_l = emission
        emission_b = emission

    # --- light-strategy MIS -------------------------------------------------
    hit_light = (hit_l_tri >= 0) & (hit_l_tri == l_tri)
    cos_theta = jnp.abs(dot(rd_light, hit_l_ng))
    sample_pdf = light_pdf(area, cos_theta, dist_sq)
    lp = sample_pdf * select_pdf * p_rough
    brdf_a, brdf_p = eval_principled(lut, surf, i_dir, rd_light)
    bp = brdf_p * p_smooth
    li_light = emission_l * brdf_a
    w_light = power_heuristic(lp, bp) / jnp.maximum(lp, EPS)
    ok_light = (
        use_light & sel_ok & hit_light & (src_tri != l_tri)
        & (lp > EPS) & (bp > EPS) & (max3(emission_l) > EPS)
    )
    contrib_light = li_light * (w_light * ok_light.astype(jnp.float32))

    # --- bsdf-strategy MIS --------------------------------------------------
    bp2 = scat.pdf * p_smooth
    hit_any = hit_b_tri >= 0
    h_dist_sq = jnp.maximum(hit_b_t * hit_b_t, EPS)
    lp2 = light_pdf(hit_area, jnp.abs(dot(scat.dir, hit_b_ng)), h_dist_sq) * p_rough
    lp2 = lp2 * light_select_pdf_from_rows(
        pdf_rows, cell_act, hit_emit, meta.emissive_count
    )
    li_brdf = emission_b * scat.attenuation
    w_brdf = power_heuristic(bp2, lp2) / jnp.maximum(bp2, EPS)
    ok_brdf = (
        (both | ~use_light) & hit_any & (bp2 > EPS) & (lp2 > EPS)
        & (max3(emission_b) > EPS)
    )
    contrib_brdf = li_brdf * (w_brdf * ok_brdf.astype(jnp.float32))

    refractive = (surf.flags & int(MatFlag.REFRACTIVE)) != 0
    if both:
        combined = contrib_light + contrib_brdf
    else:
        combined = where3(use_light, contrib_light, contrib_brdf)
    result = where3(refractive, V3.zeros(src_tri.shape), combined)
    return state, result
