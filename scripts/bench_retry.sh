#!/bin/bash
# Retry bench.py until the flaky TPU tunnel stays up long enough.
for i in 1 2 3 4 5 6; do
  echo "=== attempt $i $(date +%H:%M:%S) ===" >&2
  if timeout 60 python -c "
import jax, jax.numpy as jnp
jax.block_until_ready(jnp.ones((256,256)) @ jnp.ones((256,256)))
" 2>/dev/null; then
    echo "tunnel alive; running bench" >&2
    timeout 590 python bench.py 2>>/tmp/bench_retry_err.log && exit 0
    echo "bench attempt failed (rc=$?)" >&2
  else
    echo "tunnel dead; sleeping" >&2
  fi
  sleep 90
done
exit 1
