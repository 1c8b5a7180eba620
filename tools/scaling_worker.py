"""One process of the multi-host scaling harness (VERDICT r2 #2).

Launched by tools/scaling_bench.py with PIM_PROC_ID/PIM_NUM_PROCS/
PIM_COORDINATOR set.  Joins the jax.distributed world, builds the Cornell
scene (replicated), renders a 'dp'-sharded progressive frame over the
GLOBAL mesh (weak scaling: per-process pixel count is fixed), and rank 0
prints one JSON line with the timing.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    base_w = int(os.environ.get("PIM_SCALE_W", "64"))
    base_h = int(os.environ.get("PIM_SCALE_H", "64"))
    steps = int(os.environ.get("PIM_SCALE_STEPS", "8"))
    bounces = int(os.environ.get("PIM_SCALE_BOUNCES", "3"))

    from pim_tpu.parallel.dist import global_mesh, init_distributed, replicate

    info = init_distributed()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pim_tpu.geom.cornell import build_cornell_box
    from pim_tpu.parallel.shard import make_sharded_render_step
    from pim_tpu.render.camera import Camera, DofInfo, camera_arrays
    from pim_tpu.render.scene import build_scene

    mesh = global_mesh()
    n_dev = mesh.devices.size

    # weak scaling: H grows with the world so each process keeps base_w*base_h
    width = base_w
    height = base_h * info.num_processes

    ents, pool = build_cornell_box("boxes")
    meta, arrays, lights = build_scene(ents, pool, backend="auto")
    cam = Camera(position=np.array([-4, 0, 4], np.float32))
    cam.look_at([0, -1, 0])
    ca = camera_arrays(cam, DofInfo(autofocus=False), width, height)

    arrays, lights, ca = replicate((arrays, lights, ca), mesh)
    step = make_sharded_render_step(meta, mesh, width, height,
                                    max_bounces=bounces)

    for i in range(2):
        color, _, _, live = step(arrays, lights, ca, jnp.uint32(i))
    color.block_until_ready()

    if info.num_processes > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("scale-timer-start")

    t0 = time.perf_counter()
    for i in range(steps):
        color, _, _, live = step(arrays, lights, ca, jnp.uint32(2 + i))
    color.block_until_ready()
    wall = time.perf_counter() - t0

    if info.is_main:
        n = width * height
        print(json.dumps({
            "nprocs": info.num_processes,
            "devices": int(n_dev),
            "pixels": n,
            "steps": steps,
            "bounces": bounces,
            "wall_s": round(wall, 4),
            "mpaths_per_s": round(n * steps / wall / 1e6, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
