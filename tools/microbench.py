"""Scratch profiling tool (run explicitly: python tools/microbench.py)."""
import time, sys, jax, jax.numpy as jnp, numpy as np
from pim_tpu.geom.cornell import build_cornell_box
from pim_tpu.render.scene import build_scene, scene_intersect
from pim_tpu.core import rng
from pim_tpu.math.vec3 import V3, RCP_EPS
from pim_tpu.render.surface import fetch_hit_attribs, get_surface
from pim_tpu.render.lights import light_on_hit, make_light_table, nee_light_strategy
from pim_tpu.render.bsdf import scatter_principled
from pim_tpu.math.brdf import BrdfLut
from pim_tpu.math.grid import grid_index_soa

def main():
    def log(*a):
        print(*a, flush=True)

    ents, pool = build_cornell_box("boxes")
    meta, arrays, lights = build_scene(ents, pool, backend="pallas")
    N = 512*512
    ro = V3.splat(jnp.asarray([-4.,0.,4.]), (N,))
    rd0 = jax.random.normal(jax.random.PRNGKey(1), (3, N))
    rd0 = rd0 / jnp.linalg.norm(rd0, axis=0)
    rd = V3(rd0[0], rd0[1], rd0[2])
    state = rng.make_state(jnp.arange(N, dtype=jnp.uint32), 0)
    lut = BrdfLut(texels=arrays.brdf_lut)

    hit = jax.jit(lambda ro, rd: scene_intersect(meta, arrays, ro, rd, 0.0, RCP_EPS))(ro, rd)
    jax.block_until_ready(hit); log("hit done")
    at = jax.jit(lambda h: fetch_hit_attribs(meta, arrays, h))(hit)
    surf = jax.jit(lambda ro, rd, h, a: get_surface(meta, arrays, ro, rd, h, attribs=a))(ro, rd, hit, at)
    jax.block_until_ready(surf); log("surf done")

    def bench(name, fn, reps=10):
        f = jax.jit(fn)
        t0=time.time(); r = f(); jax.block_until_ready(r)
        log(f"{name:24s} compile {time.time()-t0:6.1f}s")
        t0=time.time()
        for _ in range(reps): r = f()
        jax.block_until_ready(r)
        dt=(time.time()-t0)/reps
        log(f"{name:24s} {dt*1e3:7.2f} ms")
        return dt

    bench("scene_intersect", lambda: scene_intersect(meta, arrays, ro, rd, 0.0, RCP_EPS))
    bench("fetch_hit_attribs", lambda: fetch_hit_attribs(meta, arrays, hit))
    bench("get_surface", lambda: get_surface(meta, arrays, ro, rd, hit, attribs=at))
    bench("scatter_principled", lambda: scatter_principled(lut, surf, rd, state)[1])
    cell = grid_index_soa(meta.grid_spec(arrays.grid_lo), ro)
    g,e = lights.live.shape
    emit = jnp.zeros((N,),jnp.int32)
    bench("light_on_hit", lambda: light_on_hit(meta, jnp.zeros((g,e),jnp.uint32), cell, emit, surf.emission, jnp.ones((N,),bool)))
    bench("rng4", lambda: rng.next_f32x4(state)[1])
    lt = make_light_table(lights, arrays.cell_active_f)
    u3 = rng.next_f32x3(state)[1]
    bench("nee_light_strategy", lambda: nee_light_strategy(
        meta, arrays, lt, lut, surf, hit.tri, rd, u3[0], u3[1], u3[2])[0])



if __name__ == "__main__":
    main()
