"""Reference-parity tests: framework integrator vs the numpy oracle.

The oracle (tests/oracle/pt_oracle.py) transliterates the reference's
Pt_TraceRay (path_tracer.c:2306-2420) with its own independent RNG and a
uniform light-selection strategy; both it and the framework integrator are
unbiased estimators of the same rendering equation, so their CONVERGED
images must agree (ref test shape: render_system.c:1348-1410; BASELINE
contract: image allclose vs reference integrator on Cornell).

Tolerance spec (documented per VERDICT): with S samples per side the
residual per-pixel Monte-Carlo noise dominates; we assert
  * image-mean relative error  < 2.5%
  * relative L1 error (mean|a-b| / mean a) < 6%
at 24x24 / the spp chosen below, which places both thresholds > 4 sigma
of the observed oracle-vs-oracle seed-to-seed variation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pim_tpu.core import rng as prng
from pim_tpu.geom.cornell import build_cornell_box
from pim_tpu.math.vec3 import V3
from pim_tpu.render.integrator import trace_rays
from pim_tpu.render.scene import build_scene

from tests.oracle import pt_oracle as oracle

W = H = 24
EYE = (-4.0, 0.0, 4.0)
AT = (0.0, -1.0, 0.0)
UP = (0.0, 1.0, 0.0)
FOV = 60.0
BOUNCES = 5


def _rays():
    fwd = np.asarray(AT, np.float64) - np.asarray(EYE, np.float64)
    return oracle.pinhole_rays(W, H, EYE, fwd, UP, FOV)


def _framework_render(ents, pool, ro, rd, spp, seed=0):
    meta, arrays, lights = build_scene(ents, pool)
    n = ro.shape[0]
    ro_v = V3(*(jnp.asarray(ro[:, i], jnp.float32) for i in range(3)))
    rd_v = V3(*(jnp.asarray(rd[:, i], jnp.float32) for i in range(3)))

    @jax.jit
    def sample(s):
        state = prng.make_state(
            jnp.arange(n, dtype=jnp.uint32), s, seed=seed
        )
        res = trace_rays(meta, arrays, lights, ro_v, rd_v, state, BOUNCES)
        return res.color

    acc = np.zeros((n, 3))
    for s in range(spp):
        acc += np.asarray(sample(jnp.uint32(s)))
    return acc / spp


def _override_materials(ents, pool, roughness, metallic):
    """Force every non-emissive material to a given roughness/metallic."""
    from pim_tpu.geom.material import Material

    for i in range(ents.count):
        m = ents.materials[i]
        rome = pool.get(m.rome_tex)[0, 0]
        if rome[3] > 0:
            continue
        ents.materials[i] = Material(
            albedo_tex=m.albedo_tex,
            rome_tex=pool.add_flat((roughness, 1.0, metallic, 0.0)),
            flags=m.flags, ior=m.ior,
        )
    ents.touch()


def _compare(img_fw, img_or, tag):
    mean_fw = img_fw.mean()
    mean_or = img_or.mean()
    rel_mean = abs(mean_fw - mean_or) / mean_or
    rel_l1 = np.abs(img_fw - img_or).mean() / mean_or
    print(f"[{tag}] mean fw={mean_fw:.4f} oracle={mean_or:.4f} "
          f"rel_mean={rel_mean:.4f} rel_l1={rel_l1:.4f}")
    assert rel_mean < 0.025, (tag, rel_mean)
    assert rel_l1 < 0.06, (tag, rel_l1)


@pytest.mark.slow
def test_parity_diffuse_cornell():
    """BASELINE config #1: diffuse-dominant Cornell (roughness 1)."""
    ents, pool = build_cornell_box("boxes")
    _override_materials(ents, pool, roughness=1.0, metallic=0.0)
    ro, rd = _rays()
    scene = oracle.scene_from_entities(ents, pool)
    img_or = oracle.render(scene, ro, rd, spp=192, max_bounces=BOUNCES, seed=3)
    img_fw = _framework_render(ents, pool, ro, rd, spp=192)
    _compare(img_fw, img_or, "diffuse")


@pytest.mark.slow
def test_parity_ggx_cornell():
    """BASELINE config #2: full principled BSDF (metal + plastic boxes)."""
    ents, pool = build_cornell_box("boxes")
    ro, rd = _rays()
    scene = oracle.scene_from_entities(ents, pool)
    img_or = oracle.render(scene, ro, rd, spp=256, max_bounces=BOUNCES, seed=5)
    img_fw = _framework_render(ents, pool, ro, rd, spp=256)
    _compare(img_fw, img_or, "ggx")


@pytest.mark.slow
def test_oracle_self_consistency():
    """Two oracle runs with different seeds agree within the tolerance the
    parity tests use — i.e. the thresholds exceed the MC noise floor."""
    ents, pool = build_cornell_box("boxes")
    ro, rd = _rays()
    scene = oracle.scene_from_entities(ents, pool)
    a = oracle.render(scene, ro, rd, spp=128, max_bounces=BOUNCES, seed=11)
    b = oracle.render(scene, ro, rd, spp=128, max_bounces=BOUNCES, seed=12)
    _compare(a, b, "self")
