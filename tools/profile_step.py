"""Scratch profiling tool (run explicitly: python tools/profile_step.py)."""
import glob, json, time, sys
import jax, jax.numpy as jnp, numpy as np
from pim_tpu.core import rng
from pim_tpu.geom.cornell import build_cornell_box
from pim_tpu.render.camera import Camera, DofInfo, camera_arrays, generate_primary_rays
from pim_tpu.render.integrator import trace_rays
from pim_tpu.render.scene import build_scene

def main():
    W = H = 512
    MAX_BOUNCES = 10
    ents, pool = build_cornell_box("boxes")
    meta, arrays, lights = build_scene(ents, pool, backend="pallas")
    cam = Camera(position=np.array([-4, 0, 4], np.float32))
    cam.look_at([0, -1, 0])
    ca = camera_arrays(cam, DofInfo(autofocus=False), W, H)
    n = W * H

    @jax.jit
    def step(arrays, lights, cam, sample_idx):
        state = rng.make_state(jnp.arange(n, dtype=jnp.uint32), sample_idx)
        state, ro, rd = generate_primary_rays(cam, W, H, state)
        res = trace_rays(meta, arrays, lights, ro, rd, state, MAX_BOUNCES)
        return res.color.sum(), res.rays_traced

    r = step(arrays, lights, ca, jnp.uint32(0)); jax.block_until_ready(r)
    t0=time.time()
    for i in range(3): r = step(arrays, lights, ca, jnp.uint32(i))
    jax.block_until_ready(r)
    print("frame ms:", (time.time()-t0)/3*1e3, "rays:", float(r[1]), flush=True)

    jax.profiler.start_trace("/tmp/jaxtrace")
    for i in range(2):
        r = step(arrays, lights, ca, jnp.uint32(i))
    jax.block_until_ready(r)
    jax.profiler.stop_trace()
    print("trace written", flush=True)



if __name__ == "__main__":
    main()
