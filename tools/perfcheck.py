"""Quick wall-clock check of one jitted trace step at a given size (TPU).

Usage: python tools/perfcheck.py [n] [iters] [backend]
Env: PIM_NO_PALLAS_GATHER=1 disables the fused gather kernel.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
backend = sys.argv[3] if len(sys.argv) > 3 else "brute"

if os.environ.get("PIM_NO_PALLAS_GATHER"):
    from pim_tpu.render import fetch
    fetch.use_pallas_gather = lambda: False

from pim_tpu.core import rng
from pim_tpu.geom.cornell import build_cornell_box
from pim_tpu.render.camera import Camera, DofInfo, camera_arrays, generate_primary_rays
from pim_tpu.render.integrator import trace_rays
from pim_tpu.render.scene import build_scene

ents, pool = build_cornell_box("boxes")
meta, arrays, lights = build_scene(ents, pool, backend=backend)
cam = Camera(position=np.array([-4, 0, 4], np.float32))
cam.look_at([0, -1, 0])
ca = camera_arrays(cam, DofInfo(autofocus=False), n, n)


@jax.jit
def step(sample):
    state = rng.make_state(jnp.arange(n * n, dtype=jnp.uint32), sample)
    state, ro, rd = generate_primary_rays(ca, n, n, state)
    res = trace_rays(meta, arrays, lights, ro, rd, state, max_bounces=10)
    return res.color, res.rays_traced

t0 = time.time()
c, r = step(jnp.uint32(0))
jax.block_until_ready(c)
print(f"compile+first: {time.time()-t0:.1f}s")

t0 = time.time()
handles = []
for i in range(iters):
    c, r = step(jnp.uint32(1 + i))
    handles.append(r)
jax.block_until_ready(c)
dt = time.time() - t0
tot = sum(float(r) for r in handles)
print(f"{n}x{n} {backend}: {dt/iters*1e3:.1f} ms/sample, "
      f"{tot/dt/1e6:.1f} Mrays/s")
