#!/usr/bin/env bash
# Poll the TPU tunnel; the moment a trivial matmul completes, fire
# scripts/on_tunnel_return.sh (the pending on-chip measurement backlog)
# and exit. Poll cost while down: one hung python killed at 100 s,
# every 5 min. Log: bench_logs/tunnel_watch.log
set -u
cd "$(dirname "$0")/.."
log=bench_logs/tunnel_watch.log
echo "[watch] started $(date)" >>"$log"
while true; do
    if timeout -k 10 100 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((512, 512)); (x @ x).block_until_ready()" >/dev/null 2>&1; then
        echo "[watch] tunnel back $(date) — firing backlog" >>"$log"
        bash scripts/on_tunnel_return.sh >>"$log" 2>&1
        echo "[watch] backlog done $(date)" >>"$log"
        exit 0
    fi
    sleep 300
done
