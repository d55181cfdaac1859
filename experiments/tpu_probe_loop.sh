#!/bin/bash
# Probe the axon TPU tunnel until it recovers from a wedge.
# Logs one line per attempt to experiments/tpu_probe.log; exits 0 on success.
LOG=/root/repo/experiments/tpu_probe.log
for i in $(seq 1 60); do
  ts=$(date +%H:%M:%S)
  out=$(timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((8,128))+1
print('OK', np.asarray(x[:1,:1]).ravel()[0], jax.devices()[0])
" 2>&1 | tail -1)
  echo "$ts attempt=$i $out" >> "$LOG"
  if [[ "$out" == OK* ]]; then
    echo "$ts TUNNEL RECOVERED" >> "$LOG"
    exit 0
  fi
  sleep 300
done
exit 1
