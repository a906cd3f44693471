#!/bin/bash
# Probe the axon TPU tunnel every 4 min; append status to /tmp/tunnel_status.
while true; do
  out=$(timeout 40 python -u -c "
import numpy as np, sys, os
import concurrent.futures as cf
def probe():
    import jax, jax.numpy as jnp
    return float(np.asarray(jnp.asarray(np.ones(4, np.float32))).sum())
with cf.ThreadPoolExecutor(1) as ex:
    f = ex.submit(probe)
    try: print('UP', f.result(timeout=30))
    except cf.TimeoutError: print('DOWN')
sys.stdout.flush(); os._exit(0)" 2>/dev/null | grep -E 'UP|DOWN')
  echo "$(date -u +%H:%M:%S) ${out:-DOWN}" >> /tmp/tunnel_status
  if [[ "$out" == UP* ]]; then
    echo "$(date -u +%H:%M:%S) TUNNEL UP" >> /tmp/tunnel_status
  fi
  sleep 240
done
