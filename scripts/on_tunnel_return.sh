#!/usr/bin/env bash
# Run every pending on-chip measurement the moment the TPU tunnel is back.
# The tunnel goes down for hours at a time (CLAUDE.md / verify skill), so
# this packs the backlog into one command and logs everything under
# bench_logs/<timestamp>/. Safe to re-run; each step is individually
# timed out so one hang doesn't burn the window.
#
# Backlog (post-r5): every r5 on-chip item has run (bench_logs/
# 20260819_193554 + r5s3 — headlines, tower-manifold IVF, decode-gap
# probe, mesh1). The steps below re-run the standing headlines so any
# future session gets fresh distributions; add real-weight parity
# (`mmrs parity --release DIR`) as a step the day weights drop.
set -u
cd "$(dirname "$0")/.."
# scripts/*.py import mmrs_tpu; `python scripts/foo.py` puts scripts/ on
# sys.path, not the repo root — export it explicitly
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
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

# 2. pallas-inside-shard_map on real hardware (1-device mesh): every
#    sharded kernel path vs its single-device oracle (NEXT.md caveat)
run mesh1 1200 python scripts/check_mesh1_tpu.py

# 2b. the driver headline with distributions (embed/query/dedup x5)
run bench 2400 python bench.py

# 3. serving decode + cascade stage table, multi-trial
run bench_vlm 2400 python bench_vlm.py
run bench_cascade 3000 python bench_cascade.py --int8 --kv8 --fori --pc64

# 4. IVF at 1M rows quick (distribution Q1/Q8/Q64) — the 10M build is
#    ~5 min; keep it if the window looks healthy
run bench_ivf_1m 2400 python bench_ivf.py --rows 1048576 --clusters 1024 --iters 5

# 5. r5 #6: realistic-manifold recall — random-weight ViT-B/32 embeddings
#    of structured synthetic images (vs the Gaussian anchors above);
#    embeds ~5x 1M images through the tower, so the long timeout
run bench_ivf_tower 5400 python bench_ivf.py --corpus tower --tower vit_b32 \
    --rows 1048576 --clusters 1024 --iters 5 --families 8192

echo "done — read $out/*.out, update COVERAGE.md/NEXT.md, commit"
