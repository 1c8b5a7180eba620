"""TraceScene: the device-resident flat scene + build pipeline.

TPU counterpart of PtScene (ref: src/rendering/path_tracer.c:122-166) and
its build steps PtScene_Update/FlattenDrawables/SetupEmissives/
SetupLightGrid (:618-1049).  The scene is split into:

  SceneArrays — a pytree of jnp arrays (geometry, materials, atlas, BVH,
                emissive tables, grid); passed as an argument to jitted
                kernels so scene swaps don't recompile.
  SceneMeta   — hashable static config (counts, grid dims, backend); a new
                meta means a new compile, like an Embree scene commit.
  LightState  — the mutable adaptive light-sampling state (batched Dist1D +
                live hit histograms); updated functionally every frame.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pim_tpu.core import rng
from pim_tpu.core.console import LogSev, con_logf
from pim_tpu.geom.bvh import BvhArrays, build_bvh
from pim_tpu.geom.entities import Entities, FlatScene, flatten
from pim_tpu.geom.material import MatFlag, TexturePool, material_soa
from pim_tpu.math import dist1d
from pim_tpu.math.brdf import BrdfLut, bake_brdf_lut
from pim_tpu.math.grid import GridSpec, grid_index, grid_len, grid_position, make_grid
from pim_tpu.math.sampling import hammersley_2d, sample_bary_coord, sample_unit_sphere
from pim_tpu.math.vec import MILLI, RCP_EPS
from pim_tpu.render import intersect as isect


class SceneArrays(NamedTuple):
    # geometry (world space soup; ref PtScene positions/normals/uvs/matIds)
    positions: jnp.ndarray   # [V, 3]
    normals: jnp.ndarray     # [V, 3]
    uvs: jnp.ndarray         # [V, 2]
    mat_ids: jnp.ndarray     # [T] i32 per-triangle
    tris9: jnp.ndarray       # [9, Tpad] packed (a, e1, e2) for the Pallas path
    # bvh
    bvh_lo: jnp.ndarray
    bvh_hi: jnp.ndarray
    bvh_a: jnp.ndarray
    bvh_b: jnp.ndarray
    tri_order: jnp.ndarray
    # materials SoA
    m_albedo_tex: jnp.ndarray  # [M] i32
    m_rome_tex: jnp.ndarray
    m_normal_tex: jnp.ndarray
    m_flags: jnp.ndarray       # [M] i32
    m_ior: jnp.ndarray         # [M] f32
    m_mfp: jnp.ndarray         # [M, 4] f32
    # texture atlas
    atlas: jnp.ndarray         # [H, W, 4] f32 (linear)
    tex_rec: jnp.ndarray       # [Ntex, 4] i32 (x0, y0, w, h)
    # emissives (ref vertToEmit/emitToVert, per-tri here)
    tri_to_emit: jnp.ndarray   # [T] i32, -1 = not emissive
    emit_to_tri: jnp.ndarray   # [E] i32
    # fused per-triangle attribute table (render/fetch.py layout)
    tri_table: jnp.ndarray     # [T, 48] f32
    # light grid
    grid_lo: jnp.ndarray       # [3]
    cell_active: jnp.ndarray   # [G] bool
    # BRDF LUT (split-sum energy compensation)
    brdf_lut: jnp.ndarray      # [L, L, 2]
    # sky cubemap, [6, R, R, 3]; R=1 zeros when absent (meta.has_sky False)
    sky: jnp.ndarray


@dataclass(frozen=True)
class SceneMeta:
    vert_count: int
    tri_count: int
    mat_count: int
    emissive_count: int
    grid_size: Tuple[int, int, int]
    cells_per_meter: float
    backend: str            # 'brute' | 'bvh' | 'pallas'
    max_leaf: int
    has_sky: bool
    has_refractive: bool
    media_enabled: bool
    textured: bool          # any non-1x1 texture -> atlas path compiled in
    has_normal_maps: bool

    @property
    def grid_len(self) -> int:
        return self.grid_size[0] * self.grid_size[1] * self.grid_size[2]

    def grid_spec(self, grid_lo) -> GridSpec:
        return GridSpec(lo=grid_lo, size=self.grid_size, cells_per_meter=self.cells_per_meter)


class LightState(NamedTuple):
    pdf: jnp.ndarray       # [G, E]
    cdf: jnp.ndarray       # [G, E+1]
    integral: jnp.ndarray  # [G]
    sum: jnp.ndarray       # [G] u32
    live: jnp.ndarray      # [G, E] u32 scatter-accumulated hit histogram


def _finalize_hit_fused(arrays: SceneArrays, t, tri, ro, rd, t_far):
    """Hit completion via the fused tri-table fetch (no serial gathers).

    Recomputes barycentrics + the geometric normal for the winning triangle
    with one one-hot matmul."""
    from pim_tpu.render import fetch as F
    from pim_tpu.render.intersect import Hit, _moller_trumbore

    rows = F.fetch_rows(arrays.tri_table, jnp.maximum(tri, 0))
    a = rows[:, F.PA]
    b = rows[:, F.PB]
    c = rows[:, F.PC]
    tt, u, v, det = _moller_trumbore(ro, rd, a, b - a, c - a)
    miss = tri < 0
    ng = jnp.cross(b - a, c - a)
    backface = det < 0.0
    norm = jnp.sqrt(jnp.maximum(jnp.sum(ng * ng, -1, keepdims=True), 1e-24))
    ng = ng / norm * jnp.where(backface, -1.0, 1.0)[:, None]
    u = jnp.clip(u, 0.0, 1.0)
    v = jnp.clip(v, 0.0, 1.0)
    return Hit(
        t=jnp.where(miss, -1.0, t),
        tri=tri,
        u=jnp.where(miss, 0.0, u),
        v=jnp.where(miss, 0.0, v),
        backface=jnp.where(miss, False, backface),
        ng=jnp.where(miss[:, None], 0.0, ng),
    )


def scene_intersect(meta: SceneMeta, arrays: SceneArrays, ro, rd, t_near, t_far) -> isect.Hit:
    if meta.backend == "bvh":
        bvh = BvhArrays(arrays.bvh_lo, arrays.bvh_hi, arrays.bvh_a, arrays.bvh_b, arrays.tri_order)
        return isect.intersect_bvh(bvh, arrays.positions, ro, rd, t_near, t_far, meta.max_leaf)
    if meta.backend == "pallas":
        from pim_tpu.render.pallas_kernels import intersect_pallas_raw

        t, tri = intersect_pallas_raw(arrays.tris9, ro, rd, t_near, t_far)
        return _finalize_hit_fused(arrays, t, tri, ro, rd, t_far)
    return isect.intersect_brute(arrays.positions, ro, rd, t_near, t_far)


def scene_occluded(meta: SceneMeta, arrays: SceneArrays, ro, rd, t_near, t_far) -> jnp.ndarray:
    if meta.backend == "bvh":
        bvh = BvhArrays(arrays.bvh_lo, arrays.bvh_hi, arrays.bvh_a, arrays.bvh_b, arrays.tri_order)
        return isect.occluded_bvh(bvh, arrays.positions, ro, rd, t_near, t_far, meta.max_leaf)
    if meta.backend == "pallas":
        from pim_tpu.render.pallas_kernels import occluded_pallas

        return occluded_pallas(arrays.tris9, ro, rd, t_near, t_far)
    return isect.occluded_brute(arrays.positions, ro, rd, t_near, t_far)


# ---------------------------------------------------------------------------
# Emissive detection (ref SetupEmissives :845-883, EmissionPdf :784-822)
# ---------------------------------------------------------------------------


def _emission_pdf_host(flat: FlatScene, pool_atlas, pool_rec, attempts: int = 1000) -> np.ndarray:
    """Per-triangle emissive probability: fraction of random surface samples
    whose rome alpha is > 0 (MC emissive-texel test).  Host numpy, one-time."""
    tri_count = flat.mat_ids.shape[0]
    pdfs = np.zeros(tri_count, np.float32)
    rng_np = np.random.default_rng(0xE)
    uvs = flat.uvs.reshape(tri_count, 3, 2)
    for mat_idx in np.unique(flat.mat_ids):
        mat = flat.materials[mat_idx]
        sel = np.nonzero(flat.mat_ids == mat_idx)[0]
        if mat.flags & MatFlag.SKY:
            pdfs[sel] = 1.0
            continue
        if mat.rome_tex < 0:
            continue
        x0, y0, w, h = pool_rec[mat.rome_tex]
        tex = pool_atlas[y0 : y0 + h, x0 : x0 + w, 3]  # alpha (emission)
        if w == 1 and h == 1:
            pdfs[sel] = 1.0 if tex[0, 0] > 0.0 else 0.0
            continue
        # MC: sample barycentric uv per tri, point-wrap fetch
        xi = rng_np.random((attempts, 2), dtype=np.float32)
        r1 = np.sqrt(np.maximum(xi[:, 0], 1e-12))
        u = r1 * (1 - xi[:, 1])
        v = xi[:, 1] * r1
        wgt = np.stack([1 - u - v, u, v], axis=-1)  # [S, 3]
        for ti in sel:
            uv = wgt @ uvs[ti]  # [S, 2]
            px = np.floor(uv[:, 0] * w).astype(np.int64) % w
            py = np.floor(uv[:, 1] * h).astype(np.int64) % h
            hits = (tex[py, px] > 0.0).mean()
            pdfs[ti] = hits
    return pdfs


# ---------------------------------------------------------------------------
# Light grid bake (ref SetupLightGrid :891-1009)
# ---------------------------------------------------------------------------


def _min_dist_to_tris(positions: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Unsigned min distance from each point [G,3] to any triangle.

    Replaces the Embree point query (ref RtcPointQuery :565-616 +
    sdTriangle3D).  Chunked over triangles.
    """
    tri_count = positions.shape[0] // 3
    tris = positions[: tri_count * 3].reshape(tri_count, 3, 3)

    def dist_chunk(carry, tri_chunk):
        a, b, c = tri_chunk[:, 0], tri_chunk[:, 1], tri_chunk[:, 2]
        d = _point_tri_dist(points[:, None, :], a[None], b[None], c[None])
        return jnp.minimum(carry, jnp.min(d, axis=-1)), None

    chunk = 128
    pad = (-tri_count) % chunk
    if pad:
        far = jnp.full((pad, 3, 3), 1e9, jnp.float32)
        tris = jnp.concatenate([tris, far])
    tris = tris.reshape(-1, chunk, 3, 3)
    init = jnp.full((points.shape[0],), jnp.inf, jnp.float32)
    out, _ = jax.lax.scan(dist_chunk, init, tris)
    return out


def _point_tri_dist(p, a, b, c):
    """Unsigned point-triangle distance, batched ([..., 3] operands)."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom_bc = jnp.maximum((d4 - d3) + (d5 - d6), 1e-12)
    # candidate closest points per region
    w_bc = jnp.clip((d4 - d3) / denom_bc, 0.0, 1.0)
    cand = [
        a,  # vertex regions handled by clamped edges below
        a + jnp.clip(d1 / jnp.maximum(d1 - d3, 1e-12), 0.0, 1.0)[..., None] * ab,
        a + jnp.clip(d2 / jnp.maximum(d2 - d6, 1e-12), 0.0, 1.0)[..., None] * ac,
        b + w_bc[..., None] * (c - b),
    ]
    # interior projection
    denom = jnp.maximum(va + vb + vc, 1e-12)
    v = vb / denom
    w = vc / denom
    interior = a + v[..., None] * ab + w[..., None] * ac
    inside = (va >= 0) & (vb >= 0) & (vc >= 0)

    d_best = jnp.where(
        inside,
        jnp.sum((p - interior) ** 2, -1),
        jnp.minimum(
            jnp.minimum(
                jnp.sum((p - cand[1]) ** 2, -1), jnp.sum((p - cand[2]) ** 2, -1)
            ),
            jnp.sum((p - cand[3]) ** 2, -1),
        ),
    )
    return jnp.sqrt(d_best)


def bake_light_grid(meta: SceneMeta, arrays: SceneArrays) -> Tuple[jnp.ndarray, LightState]:
    """Visibility-seeded per-cell light distributions.

    Per cell: (1) interior test — cells far from any surface shoot 16
    uniform rays; <50% hit ratio marks the cell outside the map (inactive);
    (2) per emissive, 16 shadow rays from jittered cell origins to random
    triangle points seed pdf[cell, emit] with the visible fraction.
    Returns (cell_active, LightState).
    """
    g = meta.grid_len
    e = meta.emissive_count
    grid = meta.grid_spec(arrays.grid_lo)
    radius = (1.0 / meta.cells_per_meter) * 0.666

    centers = grid_position(grid, jnp.arange(g, dtype=jnp.int32))  # [G, 3]

    if e == 0 or meta.tri_count == 0:
        state = dist1d.Dist1D(
            pdf=jnp.zeros((g, max(e, 1)), jnp.float32),
            cdf=jnp.zeros((g, max(e, 1) + 1), jnp.float32),
            integral=jnp.zeros((g,), jnp.float32),
            sum=jnp.zeros((g,), jnp.uint32),
        )
        return jnp.zeros((g,), bool), LightState(
            pdf=state.pdf, cdf=state.cdf, integral=state.integral,
            sum=state.sum, live=jnp.zeros((g, max(e, 1)), jnp.uint32),
        )

    # interior test
    dists = _min_dist_to_tris(arrays.positions, centers)
    near_surface = dists <= radius
    hamm = sample_unit_sphere(hammersley_2d(jnp.arange(16, dtype=jnp.uint32), 16))  # [16, 3]
    ro = jnp.repeat(centers, 16, axis=0)
    rd = jnp.tile(hamm, (g, 1))
    hit = scene_intersect(meta, arrays, ro, rd, 0.0, RCP_EPS)
    # count any triangle hit (front or back), like the ref interior test
    hit_ratio = jnp.mean((hit.t >= 0.0).reshape(g, 16).astype(jnp.float32), axis=-1)
    cell_active = near_surface | (hit_ratio >= 0.5)

    # visibility seeding: [G, E, S] rays
    s = 16
    key_state = rng.make_state(jnp.arange(g * e * s, dtype=jnp.uint32), 0, seed=0x11671)
    key_state, xi_o = rng.next_f32x4(key_state)
    key_state, xi_b = rng.next_f32x2(key_state)
    offs = (xi_o[..., :3] * 3.0 - 1.5) * radius
    origins = jnp.repeat(centers, e * s, axis=0) + offs  # [G*E*S, 3]

    tri = arrays.emit_to_tri  # [E]
    base = jnp.repeat(jnp.tile(tri, (g,)), s) * 3  # [G*E*S]
    a = arrays.positions[base]
    b = arrays.positions[base + 1]
    c = arrays.positions[base + 2]
    wuv = sample_bary_coord(xi_b)
    target = a * wuv[..., 0:1] + b * wuv[..., 1:2] + c * wuv[..., 2:3]
    delta = target - origins
    dist = jnp.sqrt(jnp.maximum(jnp.sum(delta * delta, -1), 1e-12))
    rd2 = delta / dist[:, None]
    blocked = scene_occluded(meta, arrays, origins, rd2, 0.0, dist - 0.01 * MILLI)
    vis = 1.0 - blocked.astype(jnp.float32)
    pdf = jnp.mean(vis.reshape(g, e, s), axis=-1)
    pdf = pdf * cell_active[:, None].astype(jnp.float32)

    baked = dist1d.bake(pdf)
    return cell_active, LightState(
        pdf=baked.pdf, cdf=baked.cdf, integral=baked.integral,
        sum=baked.sum, live=jnp.zeros((g, e), jnp.uint32),
    )


# ---------------------------------------------------------------------------
# Full build
# ---------------------------------------------------------------------------


def build_scene(
    entities: Entities,
    pool: TexturePool,
    cells_per_meter: Optional[float] = None,
    backend: str = "auto",
    max_leaf: int = 4,
    sky: Optional[np.ndarray] = None,
    media_enabled: bool = False,
    brute_threshold: int = 4096,
) -> Tuple[SceneMeta, SceneArrays, LightState]:
    """Entities + textures -> (meta, device arrays, light state)."""
    from pim_tpu.core.cvars import cv_pt_dist_meters

    if cells_per_meter is None:
        cells_per_meter = 1.0 / cv_pt_dist_meters.get()

    flat = flatten(entities)
    tri_count = flat.mat_ids.shape[0]
    atlas, tex_rec = pool.pack()

    # emissives
    pdfs = _emission_pdf_host(flat, atlas, tex_rec)
    emissive_tris = np.nonzero(pdfs > 0.01)[0].astype(np.int32)
    tri_to_emit = np.full(tri_count, -1, np.int32)
    tri_to_emit[emissive_tris] = np.arange(len(emissive_tris), dtype=np.int32)

    # backend choice: the Pallas dense kernel is the TPU speed path;
    # brute (pure XLA) is the CPU/test oracle; bvh wins on huge scenes
    if backend == "auto":
        on_tpu = jax.default_backend() not in ("cpu",)
        if on_tpu:
            backend = "pallas" if tri_count <= 65536 else "bvh"
        else:
            backend = "brute" if tri_count <= brute_threshold else "bvh"
    bvh = build_bvh(flat.positions, max_leaf=max_leaf)

    # grid bounds
    if tri_count > 0:
        lo = flat.positions.min(axis=0)
        hi = flat.positions.max(axis=0)
    else:
        lo = np.zeros(3, np.float32)
        hi = np.ones(3, np.float32)
    grid = make_grid(lo, hi, cells_per_meter)

    mats = material_soa(flat.materials)
    lut = bake_brdf_lut()

    if sky is None:
        sky_arr = jnp.zeros((6, 1, 1, 3), jnp.float32)
        has_sky = False
    else:
        sky_arr = jnp.asarray(sky, jnp.float32)
        has_sky = True

    meta = SceneMeta(
        vert_count=flat.positions.shape[0],
        tri_count=tri_count,
        mat_count=len(flat.materials),
        emissive_count=len(emissive_tris),
        grid_size=grid.size,
        cells_per_meter=float(cells_per_meter),
        backend=backend,
        max_leaf=max_leaf,
        has_sky=has_sky,
        has_refractive=any(
            m.flags & MatFlag.REFRACTIVE for m in flat.materials
        ),
        media_enabled=media_enabled,
        textured=any(
            (m.albedo_tex >= 0 and tuple(tex_rec[m.albedo_tex][2:]) != (1, 1))
            or (m.rome_tex >= 0 and tuple(tex_rec[m.rome_tex][2:]) != (1, 1))
            for m in flat.materials
        ),
        has_normal_maps=any(m.normal_tex >= 0 for m in flat.materials),
    )

    from pim_tpu.render.fetch import build_tri_table
    from pim_tpu.render.pallas_kernels import pack_tris

    arrays = SceneArrays(
        positions=jnp.asarray(flat.positions),
        normals=jnp.asarray(flat.normals),
        uvs=jnp.asarray(flat.uvs),
        mat_ids=jnp.asarray(flat.mat_ids),
        tris9=pack_tris(flat.positions),
        tri_table=build_tri_table(flat, flat.materials, tri_to_emit, atlas, tex_rec),
        bvh_lo=jnp.asarray(bvh.node_lo),
        bvh_hi=jnp.asarray(bvh.node_hi),
        bvh_a=jnp.asarray(bvh.node_a),
        bvh_b=jnp.asarray(bvh.node_b),
        tri_order=jnp.asarray(bvh.tri_order),
        m_albedo_tex=jnp.asarray(mats["albedo_tex"]),
        m_rome_tex=jnp.asarray(mats["rome_tex"]),
        m_normal_tex=jnp.asarray(mats["normal_tex"]),
        m_flags=jnp.asarray(mats["flags"]),
        m_ior=jnp.asarray(mats["ior"]),
        m_mfp=jnp.asarray(mats["mean_free_path"]),
        atlas=jnp.asarray(atlas),
        tex_rec=jnp.asarray(tex_rec),
        tri_to_emit=jnp.asarray(tri_to_emit),
        emit_to_tri=jnp.asarray(emissive_tris),
        grid_lo=jnp.asarray(grid.lo),
        cell_active=jnp.zeros((grid_len(grid),), bool),
        brdf_lut=lut.texels,
        sky=sky_arr,
    )

    cell_active, light_state = bake_light_grid(meta, arrays)
    arrays = arrays._replace(cell_active=cell_active)

    con_logf(
        LogSev.Info, "scene",
        "built scene: %d tris, %d mats, %d emissives, grid %s (%d cells), backend=%s",
        tri_count, meta.mat_count, meta.emissive_count, meta.grid_size,
        meta.grid_len, backend,
    )
    return meta, arrays, light_state


def update_light_state(state: LightState) -> LightState:
    """Per-frame adaptive fold of the live histograms (ref UpdateDists)."""
    d = dist1d.Dist1D(pdf=state.pdf, cdf=state.cdf, integral=state.integral, sum=state.sum)
    d2, live2 = dist1d.update(d, state.live)
    return LightState(pdf=d2.pdf, cdf=d2.cdf, integral=d2.integral, sum=d2.sum, live=live2)
