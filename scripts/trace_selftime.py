"""Trace summary by SELF time (event duration minus contained children),
aggregated by op-name with small ops bucketed. Usage:
python scripts/trace_selftime.py /tmp/campaign/trace_list [topN]
"""
import collections
import glob
import gzip
import json
import os
import re
import sys

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/campaign/trace_list"
topn = int(sys.argv[2]) if len(sys.argv) > 2 else 40
paths = sorted(glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                         recursive=True), key=os.path.getmtime)
path = paths[-1]
with gzip.open(path, "rt") as f:
    data = json.load(f)
events = data["traceEvents"] if isinstance(data, dict) else data

pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e.get("args", {}).get("name", "")

dev_pids = {p for p, n in pid_names.items()
            if re.search(r"TPU|/device|Chip", n or "")}
tracks = collections.defaultdict(list)
for e in events:
    if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
        tracks[(e["pid"], e.get("tid"))].append(
            (e["ts"], e["ts"] + e["dur"], e["dur"], e["name"]))

self_time = collections.Counter()
total = 0.0
for k, evs in tracks.items():
    evs.sort(key=lambda x: (x[0], -x[1]))
    stack = []
    child = {}
    for i, (ts, te, dur, name) in enumerate(evs):
        while stack and evs[stack[-1]][1] <= ts:
            stack.pop()
        if stack:
            child[stack[-1]] = child.get(stack[-1], 0.0) + dur
        stack.append(i)
    for i, (ts, te, dur, name) in enumerate(evs):
        st = dur - child.get(i, 0.0)
        if st > 0:
            self_time[name] += st
            total += st

print(f"total device self time: {total/1e3:.1f} ms  ({path})")
for name, t in self_time.most_common(topn):
    print(f"  {t/1e3:9.1f} ms {100*t/total:5.1f}%  {name[:110]}")
