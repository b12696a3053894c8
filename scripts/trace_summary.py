"""Summarize a jax.profiler trace directory: device time by HLO op class.

Usage: python scripts/trace_summary.py [/tmp/campaign/trace]
Finds the newest *.trace.json.gz under the directory and aggregates
complete-event durations on device tracks by op-name prefix.
"""
import collections
import glob
import gzip
import json
import os
import re
import sys

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/campaign/trace"
paths = sorted(glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                         recursive=True), key=os.path.getmtime)
if not paths:
    sys.exit(f"no trace under {root}")
path = paths[-1]
print(f"reading {path}")
with gzip.open(path, "rt") as f:
    data = json.load(f)

events = data["traceEvents"] if isinstance(data, dict) else data
# device track pids: heuristically, names containing TPU/device
pid_names = {}
tid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

dev_pids = {p for p, n in pid_names.items()
            if re.search(r"TPU|device|/device", n, re.I)}

agg = collections.Counter()
total = 0.0
for e in events:
    if e.get("ph") != "X" or e.get("pid") not in dev_pids:
        continue
    dur = e.get("dur", 0) / 1e3       # us -> ms
    name = e.get("name", "?")
    # collapse fusion suffixes and numbers
    key = re.sub(r"[.\d]+$", "", name.split("(")[0])[:48]
    agg[key] += dur
    total += dur

print(f"total device op time: {total:.1f} ms")
for k, v in agg.most_common(40):
    print(f"{v:10.1f} ms  {100*v/max(total,1e-9):5.1f}%  {k}")
