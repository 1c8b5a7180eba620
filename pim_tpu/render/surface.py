"""Surface interaction: atlas texture sampling + hit-point shading state.

Counterpart of GetSurface / GetNormal / GetUV / SampleAlbedo / SampleRome
(ref: src/rendering/path_tracer.c:1180-1419) and the CPU bilinear sampler
(src/rendering/sampler.h:176-249 — note its texel convention: coordinate =
sat(u) * (size-1), fractional bilinear, wrap = mirror negatives then frac).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pim_tpu.geom.material import MatFlag
from pim_tpu.math.color import unpack_emission
from pim_tpu.math.sampling import tan_to_world
from pim_tpu.math.vec import MILLI, blend3, dot, normalize, reflect


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
    default [4] constant; returns [N, 4].
    """
    safe_id = jnp.maximum(tex_id, 0)
    r = rec[safe_id]  # [N, 4]
    x0 = r[..., 0].astype(jnp.float32)
    y0 = r[..., 1].astype(jnp.float32)
    w = r[..., 2]
    h = r[..., 3]

    def wrap(u):
        u = jnp.where(u >= 0.0, u, 1.0 - u)
        return u - jnp.floor(u)

    # ref LinearClamp: x = sat(u) * (size-1)
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

    xi0 = (x0 + ax).astype(jnp.int32)
    xi1 = (x0 + bx).astype(jnp.int32)
    yi0 = (y0 + ay).astype(jnp.int32)
    yi1 = (y0 + by).astype(jnp.int32)

    taa = atlas[yi0, xi0]
    tba = atlas[yi0, xi1]
    tab = atlas[yi1, xi0]
    tbb = atlas[yi1, xi1]
    top = taa + (tba - taa) * tx
    bot = tab + (tbb - tab) * tx
    val = top + (bot - top) * ty
    return jnp.where((tex_id < 0)[..., None], jnp.asarray(default, jnp.float32), val)


def fix_shading_normal(m, n):
    """Reflect shading normals that dip below the geometric hemisphere
    (ref FixShadingNormal :1354-1361)."""
    below = dot(m, n, keepdims=True) <= 0.0
    return jnp.where(below, reflect(n, m), n)


def interpolate_hit(meta, arrays, hit, rd):
    """Hit -> (position, macro normal, uv, mat_id, flags).

    Macro normal = barycentric vertex-normal blend, flipped to the side of
    the geometric normal (ref GetNormal :1192-1204).
    """
    tri = jnp.maximum(hit.tri, 0)
    base = tri * 3
    w = (1.0 - hit.u - hit.v)[..., None]
    u = hit.u[..., None]
    v = hit.v[..., None]
    pa = arrays.positions[base]
    pb = arrays.positions[base + 1]
    pc = arrays.positions[base + 2]
    p = pa * w + pb * u + pc * v
    na = arrays.normals[base]
    nb = arrays.normals[base + 1]
    nc = arrays.normals[base + 2]
    n = na * w + nb * u + nc * v
    flip = dot(hit.ng, n, keepdims=True) <= 0.0
    n = normalize(jnp.where(flip, -n, n))
    ua = arrays.uvs[base]
    ub = arrays.uvs[base + 1]
    uc = arrays.uvs[base + 2]
    uv = ua * w + ub * u + uc * v
    mat_id = arrays.mat_ids[tri]
    flags = arrays.m_flags[mat_id]
    return p, n, uv, mat_id, flags


def get_surface(meta, arrays, ro, rd, hit) -> Surface:
    """Full surface fetch (ref GetSurface :1377-1419).

    Sky-flagged hits get emission from the sky and a camera-facing normal.
    """
    p, m, uv, mat_id, flags = interpolate_hit(meta, arrays, hit, rd)
    p = p + m * (0.01 * MILLI)

    albedo4 = sample_atlas_bilinear(
        arrays.atlas, arrays.tex_rec, arrays.m_albedo_tex[mat_id], uv,
        jnp.asarray([1.0, 1.0, 1.0, 1.0]),
    )
    rome = sample_atlas_bilinear(
        arrays.atlas, arrays.tex_rec, arrays.m_rome_tex[mat_id], uv,
        jnp.asarray([0.5, 1.0, 0.0, 0.0]),
    )
    albedo = albedo4[..., :3]
    emission = unpack_emission(albedo, rome[..., 3])

    # normal mapping (xy16 tangent-space maps); z reconstructed
    has_nm = arrays.m_normal_tex[mat_id] >= 0
    nm = sample_atlas_bilinear(
        arrays.atlas, arrays.tex_rec, arrays.m_normal_tex[mat_id], uv,
        jnp.asarray([0.0, 0.0, 1.0, 0.0]),
    )
    nxy = nm[..., :2]
    nz = jnp.sqrt(jnp.maximum(1.0 - jnp.sum(nxy * nxy, -1), 1e-6))
    n_ts = jnp.concatenate([nxy, nz[..., None]], axis=-1)
    n_mapped = fix_shading_normal(m, tan_to_world(m, n_ts))
    n = jnp.where(has_nm[..., None], n_mapped, m)

    is_sky = (flags & int(MatFlag.SKY)) != 0
    if meta.has_sky:
        from pim_tpu.render.sky import sample_sky_cubemap

        sky_col = sample_sky_cubemap(arrays.sky, rd)
    else:
        sky_col = jnp.zeros_like(albedo)
    albedo = jnp.where(is_sky[..., None], 0.0, albedo)
    emission = jnp.where(is_sky[..., None], sky_col, emission)
    m = jnp.where(is_sky[..., None], -rd, m)
    n = jnp.where(is_sky[..., None], -rd, n)

    return Surface(
        p=p,
        m=m,
        n=n,
        albedo=albedo,
        emission=emission,
        roughness=jnp.where(is_sky, 1.0, rome[..., 0]),
        occlusion=jnp.where(is_sky, 0.0, rome[..., 1]),
        metallic=jnp.where(is_sky, 0.0, rome[..., 2]),
        ior=jnp.where(is_sky, 1.0, arrays.m_ior[mat_id]),
        flags=flags,
        mfp=arrays.m_mfp[mat_id],
        backface=hit.backface,
    )


def get_emission(meta, arrays, ro, rd, hit):
    """Emission-only fetch for NEE light evaluation (ref GetEmission
    :1293-1326): sky-flag hits return the sky radiance."""
    tri = jnp.maximum(hit.tri, 0)
    base = tri * 3
    w = (1.0 - hit.u - hit.v)[..., None]
    uv = (
        arrays.uvs[base] * w
        + arrays.uvs[base + 1] * hit.u[..., None]
        + arrays.uvs[base + 2] * hit.v[..., None]
    )
    mat_id = arrays.mat_ids[tri]
    flags = arrays.m_flags[mat_id]
    albedo4 = sample_atlas_bilinear(
        arrays.atlas, arrays.tex_rec, arrays.m_albedo_tex[mat_id], uv,
        jnp.asarray([1.0, 1.0, 1.0, 1.0]),
    )
    rome = sample_atlas_bilinear(
        arrays.atlas, arrays.tex_rec, arrays.m_rome_tex[mat_id], uv,
        jnp.asarray([0.5, 1.0, 0.0, 0.0]),
    )
    emission = unpack_emission(albedo4[..., :3], rome[..., 3])
    is_sky = (flags & int(MatFlag.SKY)) != 0
    if meta.has_sky:
        from pim_tpu.render.sky import sample_sky_cubemap

        emission = jnp.where(is_sky[..., None], sample_sky_cubemap(arrays.sky, rd), emission)
    else:
        emission = jnp.where(is_sky[..., None], 0.0, emission)
    return emission
