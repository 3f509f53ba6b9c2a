"""IVF ANN bench: build + query latency + recall at 10M x 512 on one chip.

Context: the exact Pallas scan runs the 10M-row bf16 gallery at ~87% of
the HBM roofline (14.41 ms p50, bench_stream.py) — bandwidth is the hard
floor for exact search. IVF probes nprobe/C of the rows per query, so
small-Q (interactive) latency drops by roughly C/nprobe while recall is
tuned by nprobe (nprobe == C is exact; overflow rows are always exact).

The gallery is GENERATED ON DEVICE chunk by chunk (host-side numpy at
this scale took 15+ min on this box, CLAUDE.md), re-iterably keyed by
chunk id so the build's three passes and the exact-baseline scan all see
identical rows. Timing uses pipelined dispatch (bench.py method) because
per-call host timing lies through the 26 ms tunnel.

Prints one JSON line per config to stdout; prose to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import pipelined_seconds
from mmrs_tpu.index.ivf import build_ivf_streaming, ivf_topk
from mmrs_tpu.ops.topk import cosine_topk

CHUNK = 65536
DIM = 512
EXACT_10M_MS = 14.41  # bench_stream.py resident-scan p50 (the baseline)
# the exact scan is HBM-bandwidth-linear in rows, so scale the baseline
# to the benched gallery size (the r4 1M run wrongly divided the 10M
# constant by 1M latencies — a 10x-flattering ratio)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N_ANCHORS = 8192


@jax.jit
def _gen_chunk(key):
    """Unit-norm bf16 rows, clustered like real embeddings: each chunk
    mixes 8192 shared anchor directions with noise of TOTAL norm ~0.9
    (per-coordinate sigma must scale 1/sqrt(D) — at 512-d a 0.35/coord
    sigma gives |noise| ~ 7.9 vs unit anchors, i.e. structureless data,
    the degenerate case where no ANN can have recall). Same-anchor pairs
    land at cos ~0.55, the neighbor regime of real CLIP galleries."""
    k1, k2 = jax.random.split(key, 2)
    anchors = jax.random.normal(jax.random.key(7), (N_ANCHORS, DIM),
                                jnp.float32)
    anchors = anchors / jnp.linalg.norm(anchors, axis=1, keepdims=True)
    which = jax.random.randint(k1, (CHUNK,), 0, N_ANCHORS)
    sigma = 0.9 / DIM ** 0.5
    x = anchors[which] + sigma * jax.random.normal(k2, (CHUNK, DIM),
                                                   jnp.float32)
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(jnp.bfloat16)


def make_tower_corpus(tower_name: str, n_families: int,
                      sub_batch: int = 256):
    """VERDICT r5 #6: a gallery that approximates the reference's actual
    manifold — CLIP-tower embeddings of photograph-like structured images
    (code/search_image.py:142-165 embeds real photos) instead of Gaussian
    anchor blobs. Images are procedurally generated ON DEVICE in families
    (family = shared sinusoidal-grating frequencies + base color; instance
    = phase/amplitude jitter + pixel noise — the 'same scene, different
    shot' analogue), then encoded by a RANDOM-WEIGHT ViT: neighbor
    structure comes from how the tower folds images together, not from a
    synthetic cluster geometry. Returns (gen_chunk(i) -> [CHUNK, D] bf16,
    dim)."""
    from mmrs_tpu.models import vit
    from mmrs_tpu.models.configs import IMAGE_TOWERS
    from mmrs_tpu.ops.normalize import l2_normalize
    from mmrs_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD

    cfg = IMAGE_TOWERS[tower_name]
    size = cfg.image_size
    with jax.default_device(jax.devices("cpu")[0]):
        params = vit.init(jax.random.key(42), cfg)
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.ndim > 1 else x, params)
    params = jax.device_put(params, jax.devices()[0])

    # fixed per-family tables (keyed independently of the instance keys)
    tk = jax.random.key(13)
    freq = jax.random.uniform(jax.random.fold_in(tk, 0),
                              (n_families, 3, 2), minval=2.0, maxval=24.0)
    phase0 = jax.random.uniform(jax.random.fold_in(tk, 1),
                                (n_families, 3), maxval=2 * np.pi)
    base = jax.random.uniform(jax.random.fold_in(tk, 2),
                              (n_families, 3), minval=0.25, maxval=0.75)
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    inv_std = 1.0 / jnp.asarray(CLIP_STD, jnp.float32)

    @jax.jit
    def _embed_sub(params, key):
        kf, kp, ka, kn = jax.random.split(key, 4)
        fam = jax.random.randint(kf, (sub_batch,), 0, n_families)
        yy, xx = jnp.mgrid[0:size, 0:size] / size
        ph = phase0[fam] + 0.3 * jax.random.normal(kp, (sub_batch, 3))
        amp = 0.22 + 0.08 * jax.random.uniform(ka, (sub_batch, 3))
        f = freq[fam]                                       # [B, 3, 2]
        arg = (2 * np.pi * (f[..., 0][:, None, None, :] * xx[..., None]
                            + f[..., 1][:, None, None, :] * yy[..., None])
               + ph[:, None, None, :])
        img = (base[fam][:, None, None, :]
               + amp[:, None, None, :] * jnp.sin(arg)
               + 0.02 * jax.random.normal(kn, (sub_batch, size, size, 3)))
        x = ((jnp.clip(img, 0.0, 1.0) - mean) * inv_std).astype(jnp.bfloat16)
        feats = vit.apply(params, x, cfg, compute_dtype=jnp.bfloat16)
        return l2_normalize(feats.astype(jnp.float32)).astype(jnp.bfloat16)

    n_sub = CHUNK // sub_batch

    def gen_chunk(i):
        outs = [_embed_sub(params, jax.random.key(i * n_sub + s))
                for s in range(n_sub)]                      # pipelined
        return jnp.concatenate(outs, axis=0)

    return gen_chunk, cfg.embed_dim


def make_chunks(n_chunks, gen=None):
    gen = gen or (lambda i: _gen_chunk(jax.random.key(i)))

    def chunks():
        for i in range(n_chunks):
            yield gen(i)
    return chunks


def exact_baseline(queries, n_chunks, k, gen=None):
    """Streamed exact top-k (chunk-at-a-time scan, host merge) — recall
    oracle without holding the flat gallery next to the buckets."""
    gen = gen or (lambda i: _gen_chunk(jax.random.key(i)))
    best_v = np.full((queries.shape[0], k), -np.inf, np.float32)
    best_i = np.full((queries.shape[0], k), -1, np.int64)
    for i in range(n_chunks):
        g = gen(i)
        v, idx = cosine_topk(queries, g, k, impl="xla")
        v = np.asarray(v)
        idx = np.asarray(idx).astype(np.int64) + i * CHUNK
        mv = np.concatenate([best_v, v], axis=1)
        mi = np.concatenate([best_i, idx], axis=1)
        order = np.argsort(-mv, axis=1)[:, :k]
        best_v = np.take_along_axis(mv, order, axis=1)
        best_i = np.take_along_axis(mi, order, axis=1)
    return best_v, best_i


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_027_008)  # 153 chunks
    ap.add_argument("--clusters", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--recall-queries", type=int, default=64)
    ap.add_argument("--int8", action="store_true",
                    help="int8 bucket rows + per-slot scales (2x capacity)")
    ap.add_argument("--quant", default="", choices=("", "int8", "int4"),
                    help="bucket residency rung (int4 = packed planes, "
                         "4x capacity); supersedes --int8")
    ap.add_argument("--cover", type=float, default=0.98,
                    help="auto-cap slot budget (spill fraction = 1-cover)")
    ap.add_argument("--slots-frac", type=float, default=1.3,
                    help="total-slots ceiling (x rows)")
    ap.add_argument("--sidecar", default="",
                    help="dir: save the sidecar after build and time a "
                         "load_ivf rebuild (the serve-restart path)")
    ap.add_argument("--corpus", default="anchors",
                    choices=("anchors", "tower"),
                    help="anchors = Gaussian anchor blobs (the friendly "
                         "geometry); tower = random-weight ViT embeddings "
                         "of structured synthetic images — the realistic-"
                         "manifold mode (VERDICT r5 #6)")
    ap.add_argument("--tower", default="vit_b32",
                    choices=("vit_b32", "vit_tiny"),
                    help="tower for --corpus tower (vit_tiny = CPU smoke)")
    ap.add_argument("--families", type=int, default=8192,
                    help="image families for --corpus tower")
    ap.add_argument("--chunk", type=int, default=0,
                    help="override the 65536-row chunk (smaller = cheaper "
                         "tower-corpus runs)")
    args = ap.parse_args()
    quant = args.quant or ("int8" if args.int8 else "")

    global CHUNK, DIM
    if args.chunk:
        CHUNK = args.chunk
    gen = None
    if args.corpus == "tower":
        gen, DIM = make_tower_corpus(args.tower, args.families,
                                     sub_batch=min(256, CHUNK))

    n_chunks = args.rows // CHUNK
    n = n_chunks * CHUNK
    log(f"devices: {jax.devices()}  rows={n}  C={args.clusters}  "
        f"corpus={args.corpus} dim={DIM}")

    t0 = time.perf_counter()
    ivf = build_ivf_streaming(
        make_chunks(n_chunks, gen), n, DIM, n_clusters=args.clusters,
        iters=args.iters, chunk=CHUNK, dtype=jnp.bfloat16,
        quantize=quant, cover=args.cover, slots_frac=args.slots_frac)
    jax.block_until_ready(ivf.buckets)
    build_s = time.perf_counter() - t0
    spill = int(np.sum(np.asarray(ivf.spill_ids) >= 0))
    log(f"build: {build_s:.1f} s  cap={ivf.bucket_cap}  spill={spill} "
        f"({100.0 * spill / n:.2f}%)  hbm={ivf.hbm_bytes() / 1e9:.2f} GB")

    if args.sidecar:
        # the serve-restart path: save the sidecar, then rebuild from it
        # (placement + fill only — no k-means, no assignment pass)
        from mmrs_tpu.index.ivf import load_ivf, save_ivf

        save_ivf(args.sidecar, ivf)
        t0 = time.perf_counter()
        ivf2 = load_ivf(args.sidecar,
                        make_chunks=make_chunks(n_chunks, gen),
                        n=n, d=DIM, dtype=jnp.bfloat16, chunk=CHUNK)
        jax.block_until_ready(ivf2.buckets)
        load_s = time.perf_counter() - t0
        log(f"sidecar restart: load {load_s:.1f} s vs build {build_s:.1f}"
            f" s ({build_s / load_s:.1f}x)")
        print(json.dumps({"metric": "ivf_sidecar_restart", "rows": n,
                          "quant": quant, "build_s": round(build_s, 1),
                          "load_s": round(load_s, 1)}), flush=True)
        for leaf in jax.tree.leaves((ivf2.buckets, ivf2.spill,
                                     ivf2.bucket_scales, ivf2.spill_scales)):
            if leaf is not None:
                leaf.delete()

    # queries from the same distribution as the gallery (held-out keys)
    qd = (gen(10_000) if gen is not None
          else _gen_chunk(jax.random.key(10_000)))[: args.recall_queries]

    # recall vs the streamed exact scan
    log("exact baseline scan (streamed)...")
    _, exact_i = exact_baseline(qd, n_chunks, args.k, gen)

    from mmrs_tpu.index.ivf import auto_nprobe

    # the historical grid, clamped to C, plus the auto_nprobe default
    # (C/8) — the knob VERDICT r5 #6 asks to re-examine per corpus
    probes = sorted({p for p in (32, 64, 128, 256) if p <= args.clusters}
                    | {auto_nprobe(args.clusters)})
    for nprobe in probes:
        v, i = ivf_topk(qd, ivf, k=args.k, nprobe=nprobe, impl="auto")
        got = np.asarray(i).astype(np.int64)
        hits = sum(len(set(exact_i[r]) & set(got[r]))
                   for r in range(got.shape[0]))
        recall = hits / float(got.size)

        from mmrs_tpu.utils.trials import measure

        lat = {}
        for q in (1, 8, 64):
            # sub-ms per-call times need a deep pipeline or the 26 ms
            # tunnel RTT noise swamps (total-single): 64 dispatches.
            # 5 trials + median/IQR (VERDICT r3 #2 regression instrument)
            qs = [qd[:q]] * 64
            lat[q] = measure(lambda: 1e3 * pipelined_seconds(
                lambda x: ivf_topk(x, ivf, k=args.k, nprobe=nprobe,
                                   impl="auto"),
                qs, lambda r: np.asarray(r[0][0, 0])), n=5)
        log(f"nprobe={nprobe}: recall@{args.k}={recall:.3f}  "
            f"median ms Q1/Q8/Q64 = {lat[1]['median']:.2f}/"
            f"{lat[8]['median']:.2f}/{lat[64]['median']:.2f}  "
            f"(Q1 IQR {lat[1]['iqr']:.2f})")
        print(json.dumps({
            "metric": "ivf_topk_10m",
            "corpus": args.corpus,
            "quant": quant,
            "nprobe": nprobe,
            "recall_at_k": round(recall, 4),
            "q1_ms": {k: round(v, 3) if not isinstance(v, list)
                      else [round(x, 3) for x in v]
                      for k, v in lat[1].items()},
            "q8_ms_median": round(lat[8]["median"], 3),
            "q64_ms_median": round(lat[64]["median"], 3),
            "build_s": round(build_s, 1),
            "vs_exact_scan_q1": round(
                EXACT_10M_MS * (n / 10_027_008) / lat[1]["median"], 2),
        }), flush=True)


if __name__ == "__main__":
    main()
