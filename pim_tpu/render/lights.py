"""Next-event estimation over the adaptive light grid.

Counterpart of LightSelect / SampleLight / LightEvalPdf / EstimateDirect /
LightOnHit (ref: src/rendering/path_tracer.c:1709-1942).

TPU re-design of the branchy C: the reference's two MIS strategies (sample
the light grid vs sample the BSDF) each trace one ray, so all lanes trace
exactly ONE unified NEE ray per bounce — per-lane strategy choice selects
the ray and the MIS arithmetic, keeping the wavefront dense.  The light-hit
histogram (`LightOnHit`'s atomic fetch_add) becomes a scatter-add into the
[G, E] live tensor, summed across devices by psum at frame end.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from pim_tpu.core import rng
from pim_tpu.geom.material import MatFlag
from pim_tpu.math import dist1d
from pim_tpu.math.color import avg_lum
from pim_tpu.math.grid import grid_index
from pim_tpu.math.sampling import light_pdf, power_heuristic, sample_bary_coord
from pim_tpu.math.vec import EPS, LOG2_EPS, MILLI, RCP_EPS, dot, lerp, tri_area
from pim_tpu.render.bsdf import eval_principled, scatter_principled
from pim_tpu.render.scene import LightState, SceneArrays, SceneMeta, scene_intersect
from pim_tpu.render.surface import Surface, get_emission


def _light_dist(lights: LightState) -> dist1d.Dist1D:
    return dist1d.Dist1D(
        pdf=lights.pdf, cdf=lights.cdf, integral=lights.integral, sum=lights.sum
    )


def light_select(meta: SceneMeta, arrays: SceneArrays, lights: LightState,
                 position, u):
    """Pick an emissive triangle from the cell's distribution.

    Returns (emit_idx [N], tri [N], select_pdf [N], ok [N]).
    (ref LightSelect :1735-1764; cells outside the map have no distribution)
    """
    grid = meta.grid_spec(arrays.grid_lo)
    cell = grid_index(grid, position)
    d = _light_dist(lights)
    emit = dist1d.sample_discrete(d, cell, u)
    pdf = dist1d.pdf_discrete(d, cell, emit)
    ok = arrays.cell_active[cell] & (pdf > EPS)
    tri = arrays.emit_to_tri[jnp.clip(emit, 0, max(meta.emissive_count - 1, 0))]
    return emit, tri, pdf, ok, cell


def light_select_pdf(meta: SceneMeta, arrays: SceneArrays, lights: LightState,
                     tri, position):
    """Probability that light_select would pick `tri` from `position`'s cell
    (ref LightSelectPdf :1766-1783); 1.0 for non-emissive/inactive."""
    grid = meta.grid_spec(arrays.grid_lo)
    cell = grid_index(grid, position)
    emit = arrays.tri_to_emit[jnp.maximum(tri, 0)]
    d = _light_dist(lights)
    pdf = dist1d.pdf_discrete(d, cell, jnp.maximum(emit, 0))
    valid = (tri >= 0) & (emit >= 0) & arrays.cell_active[cell]
    return jnp.where(valid, pdf, 1.0)


def light_on_hit(meta: SceneMeta, arrays: SceneArrays, live, ro, emission, tri,
                 active):
    """Accumulate the light-learning histogram (ref LightOnHit :1709-1733):
    quantized log2 luminance scatter-added at (cell(ro), emit(tri))."""
    lum = avg_lum(emission)
    grid = meta.grid_spec(arrays.grid_lo)
    cell = grid_index(grid, ro)
    emit = arrays.tri_to_emit[jnp.maximum(tri, 0)]
    loglum = jnp.log2(jnp.maximum(lum, EPS)) - LOG2_EPS
    loglum = jnp.clip(loglum, 0.0, 46.0)
    amt = (loglum * (255.0 / 46.0) + 0.5).astype(jnp.uint32)
    ok = active & (tri >= 0) & (emit >= 0) & (lum > EPS)
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
    i_dir,
    state,
):
    """One-sample MIS direct lighting (ref EstimateDirect :1849-1919).

    Per lane: with probability pRough sample the light grid, else sample the
    BSDF; both strategies resolve through ONE traced ray; the power
    heuristic weights the winner against the counterfactual pdf.
    Returns (state, radiance [N, 3]).
    """
    if meta.emissive_count == 0:
        return state, jnp.zeros_like(surf.albedo)

    n = surf.p.shape[0]
    p_rough = lerp(jnp.float32(0.05), jnp.float32(0.95), surf.roughness)
    p_smooth = 1.0 - p_rough
    state, u_strat = rng.next_f32(state)
    use_light = u_strat < p_rough

    # --- light-strategy sample ---------------------------------------------
    state, u_sel = rng.next_f32(state)
    emit, l_tri, select_pdf, sel_ok, _cell = light_select(
        meta, arrays, lights, surf.p, u_sel
    )
    state, xi_bary = rng.next_f32x2(state)
    wuv = sample_bary_coord(xi_bary)
    base = l_tri * 3
    a = arrays.positions[base]
    b = arrays.positions[base + 1]
    c = arrays.positions[base + 2]
    target = a * wuv[..., 0:1] + b * wuv[..., 1:2] + c * wuv[..., 2:3]
    delta = target - surf.p
    dist_sq = jnp.maximum(jnp.sum(delta * delta, -1), 1e-12)
    dist = jnp.sqrt(dist_sq)
    rd_light = delta / dist[..., None]
    area = tri_area(a, b, c)

    # --- bsdf-strategy sample ----------------------------------------------
    state, scat = scatter_principled(lut, surf, i_dir, state, occluded_fn=None)

    # --- unified trace ------------------------------------------------------
    rd = jnp.where(use_light[..., None], rd_light, scat.dir)
    t_far = jnp.where(use_light, dist + 0.01 * MILLI, RCP_EPS)
    hit = scene_intersect(meta, arrays, surf.p, rd, 0.0, t_far)
    emission = get_emission(meta, arrays, surf.p, rd, hit)

    # --- light-strategy MIS -------------------------------------------------
    hit_light = (hit.tri >= 0) & (hit.tri == l_tri)
    cos_theta = jnp.abs(dot(rd, hit.ng))
    sample_pdf = light_pdf(area, cos_theta, dist_sq)
    lp = sample_pdf * select_pdf * p_rough
    brdf_a, brdf_p = eval_principled(lut, surf, i_dir, rd)
    bp = brdf_p * p_smooth
    li_light = emission * brdf_a
    w_light = power_heuristic(lp, bp) / jnp.maximum(lp, EPS)
    ok_light = (
        use_light & sel_ok & hit_light & (src_tri != l_tri)
        & (lp > EPS) & (bp > EPS)
        & (jnp.max(emission, axis=-1) > EPS)
    )
    contrib_light = li_light * (w_light * ok_light.astype(jnp.float32))[..., None]

    # --- bsdf-strategy MIS --------------------------------------------------
    bp2 = scat.pdf * p_smooth
    hit_any = hit.tri >= 0
    h_base = jnp.maximum(hit.tri, 0) * 3
    ha = arrays.positions[h_base]
    hb = arrays.positions[h_base + 1]
    hc = arrays.positions[h_base + 2]
    h_area = tri_area(ha, hb, hc)
    h_dist_sq = jnp.maximum(hit.t * hit.t, EPS)
    lp2 = light_pdf(h_area, jnp.abs(dot(rd, hit.ng)), h_dist_sq) * p_rough
    lp2 = lp2 * light_select_pdf(meta, arrays, lights, hit.tri, surf.p)
    li_brdf = emission * scat.attenuation
    w_brdf = power_heuristic(bp2, lp2) / jnp.maximum(bp2, EPS)
    ok_brdf = (
        (~use_light) & hit_any & (bp2 > EPS) & (lp2 > EPS)
        & (jnp.max(emission, axis=-1) > EPS)
    )
    contrib_brdf = li_brdf * (w_brdf * ok_brdf.astype(jnp.float32))[..., None]

    refractive = (surf.flags & int(MatFlag.REFRACTIVE)) != 0
    result = jnp.where(
        refractive[..., None], 0.0,
        jnp.where(use_light[..., None], contrib_light, contrib_brdf),
    )
    return state, result
