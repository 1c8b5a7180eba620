#!/usr/bin/env python
"""Headline benchmark: path-tracing throughput (Mrays/s) on Cornell 512².

Measures the full progressive-frame wavefront (raygen -> RR -> extend ray ->
NEE ray -> shade -> accumulate) on the default device (the TPU chip under
the driver; CPU when forced), counting every ray actually cast.

The reference (Vethanis/pim) publishes no numbers (BASELINE.md); the
`vs_baseline` denominator is a documented estimate of the reference's
CPU/Embree class on this scene: ~30 Mrays/s on a modern 16-thread AVX2
desktop (Embree pathtracer-class throughput at 1 spp progressive).
"""

from __future__ import annotations

import json
import time

BASELINE_MRAYS = 30.0
WIDTH = HEIGHT = 512
MAX_BOUNCES = 10
WARMUP = 3
ITERS = 10


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pim_tpu.core import rng
    from pim_tpu.geom.cornell import build_cornell_box
    from pim_tpu.render.camera import Camera, DofInfo, camera_arrays, generate_primary_rays
    from pim_tpu.render.integrator import trace_rays
    from pim_tpu.render.scene import build_scene

    ents, pool = build_cornell_box("boxes")
    meta, arrays, lights = build_scene(ents, pool, backend="auto")

    cam = Camera(position=np.array([-4, 0, 4], np.float32))
    cam.look_at([0, -1, 0])
    ca = camera_arrays(cam, DofInfo(autofocus=False), WIDTH, HEIGHT)

    n = WIDTH * HEIGHT

    @jax.jit
    def step(arrays, lights, cam, sample_idx):
        state = rng.make_state(jnp.arange(n, dtype=jnp.uint32), sample_idx)
        state, ro, rd = generate_primary_rays(cam, WIDTH, HEIGHT, state)
        res = trace_rays(meta, arrays, lights, ro, rd, state, MAX_BOUNCES)
        return res.color, res.rays_traced

    for i in range(WARMUP):
        color, rays = step(arrays, lights, ca, jnp.uint32(i))
    color.block_until_ready()

    # dispatch all iterations asynchronously and sync ONCE — a per-step
    # float(rays) sync would serialize host round-trips into the device
    # timeline (measured: +35 ms/step through the axon tunnel)
    ray_handles = []
    t0 = time.perf_counter()
    for i in range(ITERS):
        color, rays = step(arrays, lights, ca, jnp.uint32(WARMUP + i))
        ray_handles.append(rays)
    color.block_until_ready()
    elapsed = time.perf_counter() - t0
    total_rays = sum(float(r) for r in ray_handles)

    mrays = total_rays / elapsed / 1e6
    print(
        json.dumps(
            {
                "metric": "cornell512_pathtrace_throughput",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
