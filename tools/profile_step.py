"""Capture a jax.profiler trace of trace_rays at 512² and print top ops.

Usage: python tools/profile_step.py [n] [backend] [trace_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from pim_tpu.core.compile_cache import enable_compile_cache
enable_compile_cache()

import jax.numpy as jnp
import numpy as np

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
backend = sys.argv[2] if len(sys.argv) > 2 else "pallas"
trace_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/jaxtrace"

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
    return res.color

jax.block_until_ready(step(jnp.uint32(0)))

with jax.profiler.trace(trace_dir):
    for i in range(3):
        c = step(jnp.uint32(1 + i))
    jax.block_until_ready(c)

print("trace written to", trace_dir)
import importlib
at = importlib.import_module("tools.analyze_trace") if False else None
os.system(f"python {os.path.dirname(os.path.abspath(__file__))}/analyze_trace.py {trace_dir}")
