#!/bin/bash
# Sequential TPU measurement campaign; each stage bounded, logs under /tmp/campaign
cd /root/repo
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date)" >> /tmp/campaign/status.log
  timeout "$tmo" "$@" > "/tmp/campaign/$name.log" 2>&1
  echo "=== $name exit $? $(date)" >> /tmp/campaign/status.log
}
run treebuild 2400 python scripts/profile_treebuild.py 1048576 3
run fused     2400 python scripts/profile_fused.py 1048576 2
run bench     3600 python bench.py
run treepm    2400 python scripts/profile_treepm.py 1048576 256
run gatherprobe 1200 python scripts/pallas_gather_probe.py
run wq        3600 python scripts/profile_wq.py 1048576 2
run sweep 5400 python scripts/sweep_fused.py 1048576
run trace 2400 python scripts/trace_fused.py 1048576
echo "CAMPAIGN DONE $(date)" >> /tmp/campaign/status.log
