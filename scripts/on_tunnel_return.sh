#!/usr/bin/env bash
# Run every pending on-chip measurement the moment the TPU tunnel is back.
# The tunnel goes down for hours at a time (CLAUDE.md / verify skill), so
# this packs the backlog into one command and logs everything under
# bench_logs/<timestamp>/. Safe to re-run; each step is individually
# timed out so one hang doesn't burn the window.
#
# Backlog (NEXT.md):
#   #1 re-measure speculative mechanics (T=2 step-0 fold-in changed the
#      round cost; recorded breakeven alpha 0.763 predates it)
#   #4 itemize the 7B decode's ~4 ms/step gap vs the 11.7 ms roofline
#   headline re-runs: bench_vlm / bench_cascade / bench.py
set -u
cd "$(dirname "$0")/.."
ts=$(date +%Y%m%d_%H%M%S)
out="bench_logs/$ts"
mkdir -p "$out"
echo "logging to $out"

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 to=$2; shift 2
    echo "=== $name ($(date +%H:%M:%S)) ==="
    # -k: SIGKILL stragglers stuck in native tunnel RPCs that never
    # return to the interpreter to handle SIGTERM
    timeout -k 30 "$to" "$@" >"$out/$name.out" 2>"$out/$name.err"
    local rc=$?
    echo "  rc=$rc  ($(tail -c 200 "$out/$name.out" | tr '\n' ' '))"
    return $rc
}

# 1. health gate: a trivial matmul must finish fast or the tunnel is
#    still dead — bail instead of hanging every later step
if ! run health 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((512, 512)); (x @ x).block_until_ready()
print('tunnel ok:', jax.devices())"; then
    echo "tunnel still down; aborting"
    exit 1
fi

# 2. the decode profile (NEXT.md #4): per-fusion device ms for the 7B
#    decode loop — itemize before optimizing
run profile_decode 1800 python profile_decode.py 32

# 3. speculative mechanics re-measure (NEXT.md #1)
run bench_spec 2400 python bench_spec.py

# 4. headline decode + cascade numbers (serving config)
run bench_vlm 2400 python bench_vlm.py
run bench_cascade 2400 python bench_cascade.py --int8 --kv8 --fori --pc64

# 5. the driver headline
run bench 1800 python bench.py

echo "done — read $out/*.out, update COVERAGE.md/NEXT.md, commit"
