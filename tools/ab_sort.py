"""A/B: ray sorting on/off on the e1m1 cluster scene — images must match
bit-for-bit (a sort is a pure lane permutation) and the timing delta is
the sort's real contribution.  Usage: python tools/ab_sort.py [res]"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pim_tpu.core.compile_cache import enable_compile_cache
enable_compile_cache()

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 128
BOUNCES = 10


def main():
    from pim_tpu.core import rng
    from pim_tpu.geom.gltf import load_gltf_scene
    from pim_tpu.render.camera import Camera, DofInfo, camera_arrays, generate_primary_rays
    from pim_tpu.render.integrator import trace_rays
    from pim_tpu.render.scene import build_scene
    from pim_tpu.render.sky import bake_sky_cubemap, earth_atmosphere

    path = os.path.join("data", "e1m1", "glTF", "e1m1.gltf")
    ents, pool = load_gltf_scene(path)
    sun = np.asarray([0.35, 0.82, 0.45], np.float32)
    sun /= np.linalg.norm(sun)
    sky = np.asarray(bake_sky_cubemap(earth_atmosphere(), sun, 3800.0, 32, 8))
    meta, arrays, lights = build_scene(ents, pool, backend="auto", sky=sky,
                                       sort_rays=False)
    print(f"backend={meta.backend} tris={meta.tri_count}", flush=True)

    cam = Camera(position=np.array([-2.5, 1.7, -2.5], np.float32))
    cam.look_at([6.0, 1.0, 6.0])
    ca = camera_arrays(cam, DofInfo(autofocus=False), RES, RES)
    n = RES * RES

    def make_step(m):
        @jax.jit
        def step(arrays, lights, cam, sample_idx):
            state = rng.make_state(jnp.arange(n, dtype=jnp.uint32), sample_idx)
            state, ro, rd = generate_primary_rays(cam, RES, RES, state)
            res = trace_rays(m, arrays, lights, ro, rd, state, BOUNCES)
            return res.color, res.rays_traced
        return step

    out = {}
    for tag, m in [("nosort", meta),
                   ("sort", dataclasses.replace(meta, sort_rays=True))]:
        step = make_step(m)
        t0 = time.perf_counter()
        c, r = step(arrays, lights, ca, jnp.uint32(0))
        c.block_until_ready()
        print(f"{tag}: compile+run {time.perf_counter()-t0:.0f}s", flush=True)
        t0 = time.perf_counter()
        iters = 5
        for i in range(iters):
            c, r = step(arrays, lights, ca, jnp.uint32(0))
        c.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        out[tag] = (np.asarray(c), float(r), dt)
        print(f"{tag}: {dt*1e3:.1f} ms/step rays={float(r):.0f} "
              f"mean={np.asarray(c).mean():.5f}", flush=True)

    a, ra, _ = out["nosort"]
    b, rb, _ = out["sort"]
    print("rays equal:", ra == rb)
    print("images equal:", np.array_equal(a, b),
          "maxdiff:", np.abs(a - b).max())


if __name__ == "__main__":
    main()
