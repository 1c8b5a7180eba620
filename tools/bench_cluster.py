"""Cluster-kernel perf harness: Mrays/s vs scene size vs backend.

Measures the raw intersect kernels (closest + any-hit) on a procedural
multi-room soup at several triangle counts, for coherent (camera-like)
and incoherent (random sphere) ray sets.  This produces the measured
dense->cluster crossover that scene.DENSE_CROSSOVER_TRIS documents.

Run on the real chip:  python tools/bench_cluster.py [--n 262144]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rooms_soup(rooms_x: int, rooms_y: int, sub: int, seed: int = 7) -> np.ndarray:
    """Multi-room interior soup: a rooms_x x rooms_y grid of 4x3x4 m rooms
    with door openings, floors/ceilings, each wall subdivided sub x sub.
    Returns [V, 3] f32 (V = 3*T)."""
    rng = np.random.default_rng(seed)
    quads = []  # (origin, edge_u, edge_v)
    rw, rh, rd_ = 4.0, 3.0, 4.0

    def wall(o, u, v):
        quads.append((np.asarray(o, np.float64), np.asarray(u, np.float64),
                      np.asarray(v, np.float64)))

    for ix in range(rooms_x):
        for iy in range(rooms_y):
            x0, z0 = ix * rw, iy * rd_
            # floor + ceiling
            wall([x0, 0, z0], [rw, 0, 0], [0, 0, rd_])
            wall([x0, rh, z0], [rw, 0, 0], [0, 0, rd_])
            # south wall with door gap (two segments)
            wall([x0, 0, z0], [rw * 0.4, 0, 0], [0, rh, 0])
            wall([x0 + rw * 0.6, 0, z0], [rw * 0.4, 0, 0], [0, rh, 0])
            # west wall with door gap
            wall([x0, 0, z0], [0, 0, rd_ * 0.4], [0, rh, 0])
            wall([x0, 0, z0 + rd_ * 0.6], [0, 0, rd_ * 0.4], [0, rh, 0])
            # a pillar
            px, pz = x0 + rw * 0.5, z0 + rd_ * 0.5
            wall([px, 0, pz], [0.4, 0, 0], [0, rh, 0])
            wall([px, 0, pz], [0, 0, 0.4], [0, rh, 0])
    # outer north / east closure
    wall([0, 0, rooms_y * rd_], [rooms_x * rw, 0, 0], [0, rh, 0])
    wall([rooms_x * rw, 0, 0], [0, 0, rooms_y * rd_], [0, rh, 0])

    tris = []
    for o, u, v in quads:
        for i in range(sub):
            for j in range(sub):
                a = o + u * (i / sub) + v * (j / sub)
                b = a + u / sub
                c = a + v / sub
                d = a + u / sub + v / sub
                # jitter interior verts slightly for irregularity
                tris.append([a, b, d])
                tris.append([a, d, c])
    pos = np.asarray(tris, np.float64).reshape(-1, 3)
    pos += rng.normal(0, 1e-4, pos.shape)
    return pos.astype(np.float32)


def make_rays(n, lo, hi, coherent: bool, seed=3):
    rng = np.random.default_rng(seed)
    if coherent:
        # pinhole camera in the middle of the scene looking +x
        eye = (lo + hi) * 0.5
        eye[1] = 1.6
        w = int(np.sqrt(n))
        ys, xs = np.meshgrid(np.linspace(-0.5, 0.5, w), np.linspace(-0.5, 0.5, w),
                             indexing="ij")
        d = np.stack([np.ones_like(xs), ys * 0.8, xs * 0.8], -1).reshape(-1, 3)
        d = np.concatenate([d, d[: n - d.shape[0]]], 0) if d.shape[0] < n else d[:n]
        ro = np.broadcast_to(eye, (n, 3)).astype(np.float32).copy()
    else:
        ro = (rng.random((n, 3)) * (hi - lo) * 0.9 + lo + 0.05 * (hi - lo))
        d = rng.standard_normal((n, 3))
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    return ro.astype(np.float32), d


def bench(fn, *args, iters=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pim_tpu.geom.bvh import build_bvh
    from pim_tpu.render import cluster as CL
    from pim_tpu.render import intersect as isect
    from pim_tpu.render import pallas_kernels as pk

    n = args.n
    print(f"backend={jax.default_backend()} n_rays={n}")
    print(f"{'tris':>8} {'rays':>10} | {'dense':>9} {'cluster':>9} {'xla-bvh':>9} "
          f"| {'dense-occ':>9} {'clust-occ':>9}")

    for rx, ry, sub in [(1, 1, 3), (2, 2, 4), (4, 3, 6), (6, 5, 8), (8, 8, 10), (12, 10, 12)]:
        pos = rooms_soup(rx, ry, sub)
        t_count = pos.shape[0] // 3
        lo, hi = pos.min(0), pos.max(0)
        cl = CL.build_clusters(pos)
        posj = jnp.asarray(pos)
        bvh_np = build_bvh(pos)
        bvh = type(bvh_np)(*[jnp.asarray(a) for a in bvh_np])

        dense_ok = t_count <= 16384
        if dense_ok:
            tris9 = pk.pack_tris(pos)

        for coherent in (True, False):
            ro, rd = make_rays(n, lo, hi, coherent)
            roj, rdj = jnp.asarray(ro), jnp.asarray(rd)
            label = "coh" if coherent else "inc"

            tc = bench(lambda: CL.intersect_cluster_raw(cl, roj, rdj, 0.0, 1e9),
                       iters=args.iters)
            tco = bench(lambda: CL.occluded_cluster(cl, roj, rdj, 0.0, 5.0),
                        iters=args.iters)
            if dense_ok:
                td = bench(lambda: pk.intersect_pallas_raw(tris9, roj, rdj, 0.0, 1e9),
                           iters=args.iters)
                tdo = bench(lambda: pk.occluded_pallas(tris9, roj, rdj, 0.0, 5.0),
                            iters=args.iters)
            else:
                td = tdo = float("nan")
            if t_count <= 40000:
                tb = bench(lambda: isect.intersect_bvh(bvh, posj, roj, rdj, 0.0, 1e9),
                           iters=max(args.iters // 4, 2))
            else:
                tb = float("nan")

            def mrs(t):
                return n / t / 1e6

            print(f"{t_count:>8} {label:>10} | {mrs(td):>9.1f} {mrs(tc):>9.1f} "
                  f"{mrs(tb):>9.1f} | {mrs(tdo):>9.1f} {mrs(tco):>9.1f}")


if __name__ == "__main__":
    main()
