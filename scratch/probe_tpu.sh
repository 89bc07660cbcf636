#!/bin/bash
for i in $(seq 1 60); do
  if timeout 120 python -c "import jax, jax.numpy as jnp; print('TPU OK', int(jnp.arange(8).sum()))" 2>/dev/null | grep -q "TPU OK"; then
    echo "TPU recovered at $(date)" >> scratch/probe_tpu.log
    exit 0
  fi
  echo "probe $i failed at $(date)" >> scratch/probe_tpu.log
  sleep 60
done
