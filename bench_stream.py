"""10M-row gallery benchmarks: resident (HBM) and streaming (disk -> chip).

NEXT r1 #3 / VERDICT r1 Next #9: query a 10M x 512 index with bounded
memory. Two tiers measured on one v5e chip:

  resident   the whole index as bf16 in HBM (10 GB of the 16 GB chip) —
             the fused Pallas kernel scans it at the HBM roofline. The
             gallery is GENERATED ON DEVICE in one jit (a single 10 GB
             output buffer; uploading 10 GB through this environment's
             tunnel would measure the tunnel, and jnp.concatenate of
             uploaded blocks needs 2x the memory).
  streaming  the index stays on disk (f16 memmap); row chunks are
             uploaded double-buffered through the host link and scanned
             (mmrs_tpu/index/stream.py). Capacity beyond HBM; rate is
             bounded by min(upload link, scan). This environment's
             tunnel link is erratic (measured 0.05-1.5 GB/s for
             identical 0.5 GB transfers), so the streamed sweep here
             demonstrates bounded-memory capacity + correctness, while
             the per-chunk scan rate (the chip-side half) is the
             resident number; on a real host the link is PCIe-class
             (~10 GB/s) and the scan side dominates. The link is
             measured and reported alongside.

Prints one JSON line with both numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 10_000_000
D = 512
Q = 8
K = 10
BLOCK = 1_000_000
STREAM_ROWS = 2_000_000
PATH = "/tmp/mmrs_stream_idx_f16.npy"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_index(rows):
    if os.path.exists(PATH) and np.load(PATH, mmap_mode="r").shape[0] >= rows:
        return
    log(f"building {rows}x{D} f16 index on disk (one random 1M block tiled)")
    rng = np.random.default_rng(0)
    block = rng.normal(size=(BLOCK, D)).astype(np.float32)
    block /= np.linalg.norm(block, axis=1, keepdims=True)
    block16 = block.astype(np.float16)
    out = np.lib.format.open_memmap(PATH, mode="w+", dtype=np.float16,
                                    shape=(rows, D))
    for a in range(0, rows, BLOCK):
        out[a:a + BLOCK] = block16[: min(BLOCK, rows - a)]
    out.flush()
    del out


def measure_link_gbs(mb=512, reps=3):
    x = np.random.default_rng(2).normal(size=(mb << 19,)).astype(np.float16)
    jax.device_put(x[: 1 << 20]).block_until_ready()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_put(x).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return x.nbytes / np.median(ts) / 1e9


def main():
    log(f"devices: {jax.devices()}")
    build_index(STREAM_ROWS)
    mm = np.load(PATH, mmap_mode="r")[:STREAM_ROWS]
    rng = np.random.default_rng(1)
    queries = rng.normal(size=(Q, D)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    link_gbs = measure_link_gbs()
    log(f"host->device link: {link_gbs:.3f} GB/s "
        f"(tunnel, erratic; PCIe-class on a real host)")

    # ---- streaming mode (2M-row slice: capacity/correctness demo) ---------
    from mmrs_tpu.index.stream import streaming_topk

    t0 = time.perf_counter()
    v, i = streaming_topk(mm, queries, k=K, chunk_rows=BLOCK)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    v, i = streaming_topk(mm, queries, k=K, chunk_rows=BLOCK)
    stream_s = time.perf_counter() - t0
    gbs = STREAM_ROWS * D * 2 / stream_s / 1e9
    log(f"streaming: {STREAM_ROWS} rows in {stream_s:.2f} s (warm incl. "
        f"compile {warm:.1f} s) -> {gbs:.2f} GB/s end-to-end (link-bound; "
        f"top idx q0 = {int(i[0, 0])})")

    # ---- resident mode: full 10M rows in HBM, generated on device ---------
    from mmrs_tpu.ops.topk import cosine_topk

    log("generating 10 GB bf16 resident gallery on device (one jit) ...")
    t0 = time.perf_counter()

    @jax.jit
    def make_gallery(key):
        # ~unit-norm rows without a 20 GB f32 intermediate: N(0,1) rows at
        # D=512 have norm sqrt(D)*(1 +- 3%), so scale by 1/sqrt(D)
        g = jax.random.normal(key, (N, D), jnp.bfloat16)
        return g * jnp.asarray(1.0 / np.sqrt(D), jnp.bfloat16)

    g = make_gallery(jax.random.key(7))
    g.block_until_ready()
    log(f"build: {time.perf_counter() - t0:.1f} s; gallery {g.shape} {g.dtype}")
    q_dev = jnp.asarray(queries, jnp.bfloat16)

    def run(qd):
        return cosine_topk(qd, g, k=K, impl="pallas")

    np.asarray(run(q_dev)[0])      # compile
    qs = [q_dev * (1.0 + 1e-6 * j) for j in range(4)]
    jax.block_until_ready(qs)
    t0 = time.perf_counter()
    out = None
    for _ in range(4):
        for qd in qs:
            out = run(qd)
    np.asarray(out[0])
    total = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(run(qs[0])[0])
    single = time.perf_counter() - t0
    resident_s = max((total - single) / 15, 1e-9)
    log(f"resident: top-{K} over 10M rows p50 ~{resident_s*1e3:.2f} ms "
        f"({N*D*2/resident_s/1e9:.0f} GB/s effective)")

    print(json.dumps({
        "metric": "gallery_10M_topk",
        "resident_p50_ms": round(resident_s * 1e3, 2),
        "streaming_rows": STREAM_ROWS,
        "streaming_sweep_s": round(stream_s, 2),
        "streaming_gbs": round(gbs, 2),
        "host_link_gbs": round(link_gbs, 3),
        "rows": N, "dim": D, "queries": Q, "k": K,
    }))


if __name__ == "__main__":
    main()
