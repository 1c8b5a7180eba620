"""Surface interaction: fused attribute fetch + hit-point shading state.

Counterpart of GetSurface / GetNormal / GetUV / SampleAlbedo / SampleRome
(ref: src/rendering/path_tracer.c:1180-1419) and the CPU bilinear sampler
(src/rendering/sampler.h:176-249).

TPU design note: all per-hit attributes (vertices, normals, uvs, flat
material constants, ids) come from ONE one-hot matmul against the fused
[T, 48] triangle table (render/fetch.py) — a single MXU op replaces ~20
serial gathers (each ~1 ms at 262k lanes; measured).  The atlas bilinear
path only exists in the compiled program when the scene actually has
non-1x1 textures (meta.textured).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pim_tpu.geom.material import MatFlag
from pim_tpu.math.color import unpack_emission
from pim_tpu.math.sampling import tan_to_world
from pim_tpu.math.vec import MILLI, dot, normalize, reflect
from pim_tpu.render import fetch as F


class Surface(NamedTuple):
    """Per-lane surface description (ref PtSurfHit, path_tracer.c:58-72)."""

    p: jnp.ndarray          # [N, 3] offset hit position
    m: jnp.ndarray          # [N, 3] macro (geometric-interp) normal
    n: jnp.ndarray          # [N, 3] micro (shading) normal
    albedo: jnp.ndarray     # [N, 3]
    emission: jnp.ndarray   # [N, 3]
    roughness: jnp.ndarray  # [N]
    occlusion: jnp.ndarray  # [N]
    metallic: jnp.ndarray   # [N]
    ior: jnp.ndarray        # [N]
    flags: jnp.ndarray      # [N] i32
    mfp: jnp.ndarray        # [N, 4]
    backface: jnp.ndarray   # [N] bool


def sample_atlas_bilinear(atlas, rec, tex_id, uv, default):
    """Bilinear-wrap fetch of texture `tex_id` at uv; tex_id<0 -> default.

    atlas [H, W, 4]; rec [Ntex, 4] (x0, y0, w, h); uv [N, 2];
    default [4] constant; returns [N, 4].  Texel convention matches the
    reference sampler (LinearClamp: x = sat(u) * (size-1)).
    """
    safe_id = jnp.maximum(tex_id, 0)
    r = F.fetch_rows(rec.astype(jnp.float32), safe_id).astype(jnp.int32)
    x0 = r[..., 0].astype(jnp.float32)
    y0 = r[..., 1].astype(jnp.float32)
    w = r[..., 2]
    h = r[..., 3]

    def wrap(u):
        u = jnp.where(u >= 0.0, u, 1.0 - u)
        return u - jnp.floor(u)

    fx = wrap(uv[..., 0]) * jnp.maximum(w - 1, 0).astype(jnp.float32)
    fy = wrap(uv[..., 1]) * jnp.maximum(h - 1, 0).astype(jnp.float32)
    ax = jnp.floor(fx)
    ay = jnp.floor(fy)
    tx = (fx - ax)[..., None]
    ty = (fy - ay)[..., None]
    ax = ax.astype(jnp.int32)
    ay = ay.astype(jnp.int32)
    bx = jnp.minimum(ax + 1, w - 1)
    by = jnp.minimum(ay + 1, h - 1)

    wa = atlas.shape[1]
    flat = atlas.reshape(-1, atlas.shape[-1])
    xi0 = (x0 + ax.astype(jnp.float32)).astype(jnp.int32)
    xi1 = (x0 + bx.astype(jnp.float32)).astype(jnp.int32)
    yi0 = (y0 + ay.astype(jnp.float32)).astype(jnp.int32)
    yi1 = (y0 + by.astype(jnp.float32)).astype(jnp.int32)
    taa = flat[yi0 * wa + xi0]
    tba = flat[yi0 * wa + xi1]
    tab = flat[yi1 * wa + xi0]
    tbb = flat[yi1 * wa + xi1]
    top = taa + (tba - taa) * tx
    bot = tab + (tbb - tab) * tx
    val = top + (bot - top) * ty
    return jnp.where((tex_id < 0)[..., None], jnp.asarray(default, jnp.float32), val)


def fix_shading_normal(m, n):
    """Reflect shading normals that dip below the geometric hemisphere
    (ref FixShadingNormal :1354-1361)."""
    below = dot(m, n, keepdims=True) <= 0.0
    return jnp.where(below, reflect(n, m), n)


class HitAttribs(NamedTuple):
    """Everything the shading path needs about a hit, from one fused fetch."""

    rows: jnp.ndarray       # [N, 48] raw table rows
    p: jnp.ndarray          # [N, 3] interpolated position
    m: jnp.ndarray          # [N, 3] interpolated macro normal (side-fixed)
    uv: jnp.ndarray         # [N, 2]
    flags: jnp.ndarray      # [N] i32
    albedo: jnp.ndarray     # [N, 3]
    rome: jnp.ndarray       # [N, 4]
    emission: jnp.ndarray   # [N, 3]


def fetch_hit_attribs(meta, arrays, hit) -> HitAttribs:
    """Fused fetch + interpolation for a Hit batch.

    Macro normal = barycentric vertex-normal blend, flipped to the side of
    the geometric normal (ref GetNormal :1192-1204); sky handling is done
    by callers.
    """
    tri = jnp.maximum(hit.tri, 0)
    rows = F.fetch_rows(arrays.tri_table, tri)
    w = (1.0 - hit.u - hit.v)[..., None]
    u = hit.u[..., None]
    v = hit.v[..., None]
    p = rows[:, F.PA] * w + rows[:, F.PB] * u + rows[:, F.PC] * v
    n = rows[:, F.NA] * w + rows[:, F.NB] * u + rows[:, F.NC] * v
    flip = dot(hit.ng, n, keepdims=True) <= 0.0
    m = normalize(jnp.where(flip, -n, n))
    uv = rows[:, F.UVA] * w + rows[:, F.UVB] * u + rows[:, F.UVC] * v
    flags = rows[:, F.FLAGS].astype(jnp.int32)

    albedo4 = rows[:, F.ALBEDO]
    rome = rows[:, F.ROME]
    if meta.textured:
        a_tex = rows[:, F.ALBEDO_TEX].astype(jnp.int32)
        r_tex = rows[:, F.ROME_TEX].astype(jnp.int32)
        a_smp = sample_atlas_bilinear(
            arrays.atlas, arrays.tex_rec, a_tex, uv, jnp.zeros(4, jnp.float32)
        )
        r_smp = sample_atlas_bilinear(
            arrays.atlas, arrays.tex_rec, r_tex, uv, jnp.zeros(4, jnp.float32)
        )
        albedo4 = jnp.where((a_tex >= 0)[..., None], a_smp, albedo4)
        rome = jnp.where((r_tex >= 0)[..., None], r_smp, rome)

    albedo = albedo4[..., :3]
    emission = unpack_emission(albedo, rome[..., 3])
    return HitAttribs(
        rows=rows, p=p, m=m, uv=uv, flags=flags,
        albedo=albedo, rome=rome, emission=emission,
    )


def _apply_sky(meta, arrays, rd, is_sky, albedo, emission, m):
    if meta.has_sky:
        from pim_tpu.render.sky import sample_sky_cubemap

        sky_col = sample_sky_cubemap(arrays.sky, rd)
    else:
        sky_col = jnp.zeros_like(albedo)
    albedo = jnp.where(is_sky[..., None], 0.0, albedo)
    emission = jnp.where(is_sky[..., None], sky_col, emission)
    m = jnp.where(is_sky[..., None], -rd, m)
    return albedo, emission, m


def get_surface(meta, arrays, ro, rd, hit, attribs: HitAttribs = None) -> Surface:
    """Full surface fetch (ref GetSurface :1377-1419)."""
    at = attribs if attribs is not None else fetch_hit_attribs(meta, arrays, hit)
    p = at.p + at.m * (0.01 * MILLI)

    n = at.m
    if meta.has_normal_maps:
        nm_tex = at.rows[:, F.NORMAL_TEX].astype(jnp.int32)
        nm = sample_atlas_bilinear(
            arrays.atlas, arrays.tex_rec, nm_tex, at.uv,
            jnp.asarray([0.0, 0.0, 1.0, 0.0]),
        )
        nxy = nm[..., :2]
        nz = jnp.sqrt(jnp.maximum(1.0 - jnp.sum(nxy * nxy, -1), 1e-6))
        n_ts = jnp.concatenate([nxy, nz[..., None]], axis=-1)
        n_mapped = fix_shading_normal(at.m, tan_to_world(at.m, n_ts))
        n = jnp.where((nm_tex >= 0)[..., None], n_mapped, n)

    is_sky = (at.flags & int(MatFlag.SKY)) != 0
    albedo, emission, m = _apply_sky(meta, arrays, rd, is_sky, at.albedo, at.emission, at.m)
    n = jnp.where(is_sky[..., None], -rd, n)

    return Surface(
        p=p,
        m=m,
        n=n,
        albedo=albedo,
        emission=emission,
        roughness=jnp.where(is_sky, 1.0, at.rome[..., 0]),
        occlusion=jnp.where(is_sky, 0.0, at.rome[..., 1]),
        metallic=jnp.where(is_sky, 0.0, at.rome[..., 2]),
        ior=jnp.where(is_sky, 1.0, at.rows[:, F.IOR]),
        flags=at.flags,
        mfp=at.rows[:, F.MFP],
        backface=hit.backface,
    )


def get_emission_from_attribs(meta, arrays, rd, at: HitAttribs):
    """Emission-only view of a fetched hit (ref GetEmission :1293-1326)."""
    is_sky = (at.flags & int(MatFlag.SKY)) != 0
    if meta.has_sky:
        from pim_tpu.render.sky import sample_sky_cubemap

        return jnp.where(
            is_sky[..., None], sample_sky_cubemap(arrays.sky, rd), at.emission
        )
    return jnp.where(is_sky[..., None], 0.0, at.emission)


def get_emission(meta, arrays, ro, rd, hit):
    at = fetch_hit_attribs(meta, arrays, hit)
    return get_emission_from_attribs(meta, arrays, rd, at)
