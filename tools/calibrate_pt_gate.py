"""Calibrate the pt_gate convergence bands (VERDICT r3 weak #4 / next #7).

Runs the exact pt_test scene config (cornell_box, teleport -4 0 4,
lookat 0 -1 0, exp_manual 1, exp_evoffset 5 — ref CmdPtTest,
/root/reference/src/rendering/render_system.c:1348-1372) for N independent
seeds at each resolution, snapshotting the luminance stddev and buffer
mean at every sample-count tier.  The band per tier is pooled over all
(seed, resolution) runs:

  maxstddev = max(sd)  * (1 + rel) + 6*sigma(sd)
  meanlo    = min(mean)* (1 - rel) - 6*sigma(mean)
  meanhi    = max(mean)* (1 + rel) + 6*sigma(mean)

with rel = 2% — wide enough for device/fp-reassociation drift, ~10x
tighter than the hand-waved r3 band (which tolerated a ±25% mean shift).

Writes pim_tpu/render/pt_gate_bands.json (committed; loaded by pt_gate).

Usage: python tools/calibrate_pt_gate.py [--seeds 5] [--res 128,256]
       [--tiers 8,16,64,256]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REL = 0.02


def run_seeds(width, height, seeds, tiers):
    """All seeded pt_test-config runs at one resolution, reusing the
    compiled frame step (cv_pt_seed is a traced input — no recompile);
    returns [{seed, tier: (stddev, mean)}...]."""
    import numpy as np

    from pim_tpu.core import cvars as cv
    from pim_tpu.render.render_system import RenderSystem

    cv.cv_pt_trace.set(True)
    cv.cv_exp_manual.set(True)
    cv.cv_exp_evoffset.set(5.0)
    cv.cv_pt_denoise.set(False)

    rs = RenderSystem(width=width, height=height)
    from pim_tpu.geom.cornell import build_cornell_box

    rs.entities, rs.pool = build_cornell_box("boxes")
    rs.camera.reset()
    rs.camera.position = np.asarray([-4, 0, 4], np.float32)
    rs.camera.look_at([0, -1, 0])

    results = []
    top = max(tiers)
    for seed in seeds:
        cv.cv_pt_seed.set(int(seed))
        out = {}
        # first update() notices the dirty seed and resets accumulation
        for frame in range(1, top + 1):
            rs.update()
            assert rs.sample_count == frame, (rs.sample_count, frame)
            if frame in tiers:
                out[frame] = (rs.stddev(),
                              float(np.asarray(rs.buffers.color).mean()))
        results.append((seed, out))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--res", default="128,256")
    ap.add_argument("--tiers", default="8,16,64,256")
    args = ap.parse_args()

    import jax

    resolutions = [int(r) for r in args.res.split(",")]
    tiers = sorted(int(t) for t in args.tiers.split(","))
    seeds = [0x9E3779B9] + [1000003 * (i + 1) for i in range(args.seeds - 1)]

    runs = {t: [] for t in tiers}
    for res in resolutions:
        for seed, snap in run_seeds(res, res, seeds, set(tiers)):
            for t, (sd, mean) in snap.items():
                runs[t].append({"res": res, "seed": seed,
                                "stddev": sd, "mean": mean})
                print(f"res={res} seed={seed:#x} n={t}: "
                      f"stddev={sd:.4f} mean={mean:.4f}", flush=True)

    import numpy as np

    entries = []
    for t in tiers:
        sds = np.array([r["stddev"] for r in runs[t]])
        means = np.array([r["mean"] for r in runs[t]])
        entries.append({
            "min_samples": t,
            "maxstddev": float(sds.max() * (1 + REL) + 6 * sds.std()),
            "meanlo": float(means.min() * (1 - REL) - 6 * means.std()),
            "meanhi": float(means.max() * (1 + REL) + 6 * means.std()),
        })

    out = {
        "scene": "pt_test cornell config (cornell_box boxes; teleport -4 0 4;"
                 " lookat 0 -1 0; exp_manual 1; exp_evoffset 5)",
        "device": jax.devices()[0].device_kind,
        "resolutions": resolutions,
        "seeds": [hex(s) for s in seeds],
        "rel_margin": REL,
        "entries": entries,
        "runs": {str(t): runs[t] for t in tiers},
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "pim_tpu", "render", "pt_gate_bands.json")
    with open(os.path.normpath(path), "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {os.path.normpath(path)}")
    for e in entries:
        print(e)


if __name__ == "__main__":
    main()
