#!/bin/bash
# Poll the axon tunnel; when it answers, fire the round-5 bench battery.
# CLAUDE.md pattern: the tunnel has multi-hour outages — keep working on CPU,
# let this loop queue the hardware validation.
set -u
LOG=/tmp/tpu_poll.log
echo "poll start $(date)" >> "$LOG"
while true; do
  if timeout 90 python -c "import jax, numpy as np, jax.numpy as jnp; x=jnp.ones((128,128)); np.asarray((x@x)[:1,:1]); print(jax.devices())" >> "$LOG" 2>&1; then
    echo "tunnel up $(date) — firing battery" >> "$LOG"
    bash /root/repo/scripts/run_tpu_battery_r5.sh >> "$LOG" 2>&1
    echo "battery done $(date)" >> "$LOG"
    break
  fi
  sleep 120
done
