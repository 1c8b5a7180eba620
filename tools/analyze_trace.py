"""Parse a jax.profiler trace and print the top TPU ops by total time.

Usage: python tools/analyze_trace.py /tmp/jaxtrace
"""
import glob
import gzip
import json
import sys
from collections import defaultdict


def main(root: str) -> None:
    paths = sorted(glob.glob(root + "/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace found under", root)
        return
    path = paths[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find TPU device pids (XLA Ops rows)
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

    tot = defaultdict(float)
    cnt = defaultdict(int)
    total_all = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pidname = pid_names.get(e.get("pid"), "")
        tidname = tid_names.get((e.get("pid"), e.get("tid")), "")
        if "TPU" not in pidname and "tpu" not in pidname.lower():
            continue
        if "XLA Op" not in tidname and "Steps" not in tidname and tidname != "":
            # keep only op rows when labeled; otherwise accept all X events
            if "XLA" not in tidname:
                continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))  # us
        tot[name] += dur
        cnt[name] += 1
        total_all += dur

    rows = sorted(tot.items(), key=lambda kv: -kv[1])
    print(f"{'op':70s} {'total_ms':>9s} {'count':>6s} {'avg_us':>8s} {'%':>6s}")
    for name, dur in rows[:45]:
        print(f"{name[:70]:70s} {dur/1e3:9.3f} {cnt[name]:6d} {dur/cnt[name]:8.1f} {100*dur/max(total_all,1e-9):6.2f}")
    print(f"TOTAL {total_all/1e3:.3f} ms across {sum(cnt.values())} events")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace")
