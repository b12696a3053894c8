#!/bin/bash
# Poll the axon TPU tunnel; when it answers, launch the measurement campaign.
# Probe uses a bounded subprocess because jax.devices() hangs forever when
# the tunnel is down (see BASELINE.md pending-measurements section).
mkdir -p /tmp/campaign
echo "watcher start $(date)" >> /tmp/campaign/status.log
while true; do
  if timeout 75 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    echo "TPU UP $(date)" >> /tmp/campaign/status.log
    bash /root/repo/scripts/tpu_campaign.sh
    exit 0
  fi
  echo "probe failed $(date)" >> /tmp/campaign/status.log
  sleep 240
done
