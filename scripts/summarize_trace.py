"""Summarize a jax.profiler trace: top device ops by total duration.

Usage: python scripts/summarize_trace.py /tmp/prof_decode [N]

Finds the newest ``*.trace.json.gz`` under the directory, groups
complete events by name, and prints the top-N by summed duration.
Op ids (fusion.N) are NOT comparable across differently-shaped programs
(CLAUDE.md) — compare within one trace only.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = sorted(glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        sys.exit(f"no *.trace.json.gz under {root}")
    path = paths[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    events = data.get("traceEvents", [])
    # device-op events live on TensorCore pids; keep complete events with
    # a duration and skip the host python/runtime rows
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "Core" not in pname \
                and "/device:" not in pname:
            continue
        dur[e["name"]] += e["dur"]
        cnt[e["name"]] += 1
    if not dur:        # fallback: no recognizable device pid → take all X
        for e in events:
            if e.get("ph") == "X" and "dur" in e:
                dur[e["name"]] += e["dur"]
                cnt[e["name"]] += 1

    total = sum(dur.values())
    print(f"{path}\ntotal device-op time: {total/1e3:.2f} ms "
          f"({len(dur)} distinct ops)\n")
    print(f"{'us total':>12} {'%':>6} {'count':>7}  name")
    for name, d in dur.most_common(top_n):
        print(f"{d:>12} {100*d/total:>6.2f} {cnt[name]:>7}  {name[:90]}")


if __name__ == "__main__":
    main()
