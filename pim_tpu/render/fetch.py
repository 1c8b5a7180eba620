"""Attribute fetch strategies: one-hot MXU matmul vs gather (SoA layout).

Measured on TPU v5e (see git history): data-dependent row gathers producing
[N, k] outputs are catastrophically slow (trailing-small-dim layouts), and
scattered lookups serialize.  So every per-hit attribute lives in ONE fused
TRANSPOSED [F, T] table, fetched as `table_T @ onehot[T, N]` — a single MXU
matmul yielding an [F, N] block whose row slices are perfectly-tiled [N]
arrays.  Plain gathers remain for large tables (big scenes route through
Pallas kernels instead).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# above this many rows, one-hot HBM traffic outweighs the win
ONEHOT_MAX_ROWS = 1024
# pallas fused-gather limits (see render/gather_kernel.py)
_PALLAS_GATHER_MAX_T = 4096
_PALLAS_GATHER_MIN_N = 2048


def _fetch_cols_onehot(table_t: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """XLA one-hot fallback (CPU tests, tiny batches, oversized tables).

    precision=HIGHEST is load-bearing: the MXU's DEFAULT precision
    truncates f32 operands to bf16, which would quantize every fetched
    attribute (vertex positions included — geometric cracks).  A one-hot
    fetch must reproduce the stored values exactly."""
    t = table_t.shape[1]
    if t > ONEHOT_MAX_ROWS:
        return table_t[:, idx]
    oh = jax.nn.one_hot(idx, t, dtype=table_t.dtype, axis=0)  # [T, N]
    return jnp.dot(table_t, oh, preferred_element_type=table_t.dtype,
                   precision=jax.lax.Precision.HIGHEST)


@partial(jax.custom_vjp, nondiff_argnums=())
def _fetch_cols_pallas(table_t: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    from pim_tpu.render.gather_kernel import gather_cols_pallas

    return gather_cols_pallas(table_t, idx)


def _fetch_cols_pallas_fwd(table_t, idx):
    return _fetch_cols_pallas(table_t, idx), (idx, table_t.shape[1])


def _fetch_cols_pallas_bwd(res, g):
    # d/dtable of table[:, idx] is a column scatter-add (backward runs only
    # on the differentiable path, never the hot forward frame)
    idx, t = res
    g_table = jnp.zeros((g.shape[0], t), g.dtype).at[:, jnp.clip(idx, 0, t - 1)].add(
        jnp.where((idx >= 0) & (idx < t), g, 0.0)
    )
    return g_table, None


_fetch_cols_pallas.defvjp(_fetch_cols_pallas_fwd, _fetch_cols_pallas_bwd)


def use_pallas_gather() -> bool:
    return jax.default_backend() == "tpu"


def fetch_cols(table_t: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table_t [F, T], idx int [N] -> [F, N] (columns of the table).

    On TPU this is a fused Pallas gather (one-hot built in VMEM, no [T, N]
    HBM operand; render/gather_kernel.py).  Elsewhere, or for oversized
    tables / tiny batches, the XLA one-hot matmul."""
    t = table_t.shape[1]
    n = idx.shape[0] if idx.ndim else 1
    if (
        use_pallas_gather()
        and t <= _PALLAS_GATHER_MAX_T
        and idx.ndim == 1
        and n >= _PALLAS_GATHER_MIN_N
        and table_t.dtype == jnp.float32
    ):
        return _fetch_cols_pallas(table_t, idx)
    return _fetch_cols_onehot(table_t, idx)


def select_columns(rows: jnp.ndarray, col_idx: jnp.ndarray):
    """rows [F, N], col_idx int [N] in [0, F) -> [N]: per-lane row select
    via a small one-hot multiply (no gather)."""
    f = rows.shape[0]
    oh = jax.nn.one_hot(col_idx, f, dtype=rows.dtype, axis=0)  # [F, N]
    return jnp.sum(rows * oh, axis=0)


# ---------------------------------------------------------------------------
# The fused per-triangle attribute table, stored TRANSPOSED [48, T].
# Row indices (ints are exact in f32 below 2^24):
# ---------------------------------------------------------------------------
PA = slice(0, 3)        # vertex A position
PB = slice(3, 6)
PC = slice(6, 9)
NA = slice(9, 12)       # vertex normals
NB = slice(12, 15)
NC = slice(15, 18)
UVA = slice(18, 20)     # vertex uvs
UVB = slice(20, 22)
UVC = slice(22, 24)
ALBEDO = slice(24, 28)  # flat material albedo (rgba)
ROME = slice(28, 32)    # flat material rome
IOR = 32
FLAGS = 33
MFP = slice(34, 38)
ALBEDO_TEX = 38
ROME_TEX = 39
NORMAL_TEX = 40
MAT_ID = 41
AREA = 42
EMIT_IDX = 43           # -1 when not emissive
TRI_TABLE_ROWS = 48     # padded to a multiple of 8


def v3_rows(block: jnp.ndarray, sl: slice):
    """[F, N] block + 3-row slice -> V3 of [N]."""
    from pim_tpu.math.vec3 import V3

    return V3(block[sl.start], block[sl.start + 1], block[sl.start + 2])


def build_tri_table(flat, mats, tri_to_emit, atlas, tex_rec) -> jnp.ndarray:
    """Host-side build of the fused attribute table, TRANSPOSED [48, T].

    Flat (1x1) textures are inlined as constants; textured materials store
    their atlas ids and get sampled through the atlas path.
    """
    import numpy as np

    tri_count = flat.mat_ids.shape[0]
    t = np.zeros((max(tri_count, 1), TRI_TABLE_ROWS), np.float32)
    if tri_count == 0:
        return jnp.asarray(t.T)
    pos = flat.positions.reshape(tri_count, 3, 3)
    nrm = flat.normals.reshape(tri_count, 3, 3)
    uv = flat.uvs.reshape(tri_count, 3, 2)
    t[:, PA] = pos[:, 0]
    t[:, PB] = pos[:, 1]
    t[:, PC] = pos[:, 2]
    t[:, NA] = nrm[:, 0]
    t[:, NB] = nrm[:, 1]
    t[:, NC] = nrm[:, 2]
    t[:, UVA] = uv[:, 0]
    t[:, UVB] = uv[:, 1]
    t[:, UVC] = uv[:, 2]

    def flat_texel(tex_id, default):
        if tex_id < 0:
            return np.asarray(default, np.float32)
        x0, y0, w, h = tex_rec[tex_id]
        if w == 1 and h == 1:
            return atlas[y0, x0]
        return None  # textured

    for m_idx, mat in enumerate(mats):
        sel = flat.mat_ids == m_idx
        alb = flat_texel(mat.albedo_tex, [1, 1, 1, 1])
        rom = flat_texel(mat.rome_tex, [0.5, 1, 0, 0])
        t[sel, ALBEDO] = alb if alb is not None else 0.0
        t[sel, ROME] = rom if rom is not None else 0.0
        t[sel, IOR] = mat.ior
        t[sel, FLAGS] = float(int(mat.flags))
        t[sel, MFP] = np.asarray(mat.mean_free_path, np.float32)
        t[sel, ALBEDO_TEX] = float(mat.albedo_tex if alb is None else -1)
        t[sel, ROME_TEX] = float(mat.rome_tex if rom is None else -1)
        t[sel, NORMAL_TEX] = float(mat.normal_tex)
        t[sel, MAT_ID] = float(m_idx)

    e1 = pos[:, 1] - pos[:, 0]
    e2 = pos[:, 2] - pos[:, 0]
    t[:, AREA] = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
    t[:, EMIT_IDX] = tri_to_emit.astype(np.float32)
    return jnp.asarray(t.T)  # [48, T]
