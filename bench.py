"""Headline benchmark: ViT-B/32 image-embedding throughput (images/sec/chip).

Baseline target (BASELINE.json north star): >= 5,000 images/sec/chip on TPU
v5e. Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N,
   ... per-metric distributions ...}
Secondary numbers (top-k query latency, dedup scan rate) go to stderr.

Timing method: this environment reaches the chip through a tunnel with
~26 ms round-trip per host fetch, so per-call host timing lies. We dispatch
a pipeline of async batches and fetch only the last result; per-batch time
= (pipelined_total - single_call) / (n_batches - 1), which cancels the RTT.

Regression instrument (VERDICT r3 #2): every metric runs >= 5 independent
pipelined trials and reports median/min/max/IQR — the r1..r3 artifacts
disagreed 2.4x on query latency from tunnel variance alone, which a single
number cannot distinguish from a real regression. The headline `value` is
the MEDIAN of the best serving config.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mmrs_tpu.utils.trials import fmt, measure

BASELINE_IMAGES_PER_SEC = 5000.0
TRIALS = 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def pipelined_seconds(fn, inputs, fetch, warmups=2):
    """Total wall time to run fn over all inputs, minus one-call RTT."""
    for i in range(warmups):
        fetch(fn(inputs[i % len(inputs)]))
    t0 = time.perf_counter()
    out = None
    for x in inputs:
        out = fn(x)
    fetch(out)
    total = time.perf_counter() - t0
    t0 = time.perf_counter()
    fetch(fn(inputs[0]))
    single = time.perf_counter() - t0
    n = len(inputs)
    return max((total - single) / max(n - 1, 1), 1e-9)


def bench_embed(int8: bool = False, batch: int = 224):
    """Returns the per-batch-seconds distribution over TRIALS pipelined
    passes (each pass = 24 dispatched batches, RTT-cancelled)."""
    from mmrs_tpu.models import clip
    from mmrs_tpu.models.clip import CLIPConfig
    from mmrs_tpu.models.configs import CLIP_TEXT_B32, VIT_B32
    from mmrs_tpu.ops.preprocess import normalize_images

    cfg = CLIPConfig(vision=VIT_B32, text=CLIP_TEXT_B32)
    # Init on host CPU (tiny-op round-trips through the device tunnel are
    # slow), then ship once; params must be jit ARGUMENTS, not closure
    # constants, or they get serialized into the compile request.
    # Serving config: bf16 weights + bf16 softmax (models/layers.attention);
    # batch sweep on v5e: 128->11.9k, 192->12.4k, 224->12.7k, 256->11.7k,
    # 512->8.6k img/s, so 224 is the serving batch. int8=True additionally
    # runs the vision-tower matmuls int8 x int8 on the MXU (models/quantize).
    with jax.default_device(jax.devices("cpu")[0]):
        params = clip.init(jax.random.key(0), cfg)
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 and x.ndim > 1 else x,
            params,
        )
        if int8:
            from mmrs_tpu.models.quantize import quantize_clip_visual

            params = quantize_clip_visual(params)
    params = jax.device_put(params, jax.devices()[0])
    # unroll=2 helps the int8 path (+2%: XLA overlaps the dynamic-quant
    # passes across adjacent layers); no effect on bf16. Larger batches
    # fall off a cliff (288 -> 10.7k img/s). The fused Pallas short-seq
    # attention kernel (ops/attention.py) measured SLOWER here (21.6 vs
    # 17.8 ms/batch): per-(image,head) [50,64] dots carry too much fixed
    # MXU/Mosaic overhead, XLA's batched einsum wins for T=50 on v5e --
    # so the serving config stays attn_impl="xla", like the preproc kernel.
    unroll = 2 if int8 else 1

    @jax.jit
    def embed(params, images_u8):
        x = normalize_images(images_u8, dtype=jnp.bfloat16, impl="xla")
        return clip.encode_image(params, x, cfg, unroll=unroll)

    # Generate batches ON DEVICE: the tunnel's host->device link is not
    # representative of production ingest, and uploading 8 x 77 MB would
    # dominate the measurement. Each dispatch still executes the full
    # normalize+tower pipeline per batch.
    batches = [
        jax.random.randint(jax.random.key(i), (batch, 224, 224, 3), 0, 256,
                           jnp.uint8)
        for i in range(4)
    ]
    jax.block_until_ready(batches)
    dist = measure(lambda: pipelined_seconds(
        lambda b: embed(params, b), batches * 6,
        lambda r: np.asarray(r[0, 0], dtype=np.float32)
    ), n=TRIALS)
    tag = "int8" if int8 else "bf16"
    ips = batch / dist["median"]
    log(fmt(f"embed[{tag}] per-batch", dist, "ms", 1e3)
        + f" -> median {ips:.0f} images/sec/chip")
    return dist, batch


def bench_query():
    from mmrs_tpu.ops.topk import cosine_topk

    n, d = 1_048_576, 512
    g = jax.random.normal(jax.random.key(0), (n, d), jnp.bfloat16)
    qs = [jax.random.normal(jax.random.key(i + 1), (8, d), jnp.bfloat16)
          for i in range(8)]
    # 64 dispatches per pass: at ~1.3 ms each the pipelined total (~83
    # ms) dominates the 26 ms RTT being subtracted — 8 dispatches left
    # the subtraction noise-dominated (a trial once measured 0.0)
    dist = measure(lambda: pipelined_seconds(
        lambda q: cosine_topk(q, g, 10, impl="pallas"),
        qs * 8, lambda r: np.asarray(r[0][0, 0]),
    ), n=TRIALS)
    log(fmt("query: top-10 over 1M gallery", dist, "ms", 1e3)
        + f" ({n * d * 2 / dist['median'] / 1e9:.0f} GB/s effective)")
    return dist


def bench_ivf_quick():
    """Compact ANN headline: 256k x 512 IVF (C=512, nprobe=32) — build
    once, report the Q=8 probe-latency distribution + measured recall
    vs the exact scan (bench_ivf.py has the full 1M/10M story)."""
    from mmrs_tpu.index.ivf import build_ivf_streaming, ivf_topk
    from mmrs_tpu.ops.topk import cosine_topk

    n_chunks, chunk, d = 4, 65536, 512
    n = n_chunks * chunk

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        anchors = jax.random.normal(jax.random.key(7), (2048, d),
                                    jnp.float32)
        anchors = anchors / jnp.linalg.norm(anchors, axis=1, keepdims=True)
        which = jax.random.randint(k1, (chunk,), 0, 2048)
        x = anchors[which] + (0.9 / d ** 0.5) * jax.random.normal(
            k2, (chunk, d), jnp.float32)
        return (x / jnp.linalg.norm(x, axis=1, keepdims=True)).astype(
            jnp.bfloat16)

    def chunks():
        for i in range(n_chunks):
            yield gen(jax.random.key(i))

    ivf = build_ivf_streaming(chunks, n, d, n_clusters=512, iters=5,
                              chunk=chunk, dtype=jnp.bfloat16)
    jax.block_until_ready(ivf.buckets)
    q = gen(jax.random.key(999))[:8].astype(jnp.bfloat16)

    # recall vs the exact scan (streamed, chunk at a time)
    best_v = np.full((8, 10), -np.inf, np.float32)
    best_i = np.full((8, 10), -1, np.int64)
    for i in range(n_chunks):
        v, idx = cosine_topk(q, gen(jax.random.key(i)), 10, impl="pallas")
        mv = np.concatenate([best_v, np.asarray(v)], axis=1)
        mi = np.concatenate(
            [best_i, np.asarray(idx).astype(np.int64) + i * chunk], axis=1)
        order = np.argsort(-mv, axis=1)[:, :10]
        best_v = np.take_along_axis(mv, order, axis=1)
        best_i = np.take_along_axis(mi, order, axis=1)
    _, got = ivf_topk(q, ivf, k=10, nprobe=32, impl="pallas")
    got = np.asarray(got).astype(np.int64)
    recall = np.mean([len(set(got[r]) & set(best_i[r])) / 10
                      for r in range(8)])

    qs = [q] * 64
    dist = measure(lambda: pipelined_seconds(
        lambda x: ivf_topk(x, ivf, k=10, nprobe=32, impl="pallas"),
        qs, lambda r: np.asarray(r[0][0, 0])), n=TRIALS)
    log(fmt("ivf[256k, C=512, nprobe=32] Q=8", dist, "ms", 1e3)
        + f", recall@10 {recall:.3f}")
    return dist, recall


def bench_dedup():
    from mmrs_tpu.ops.allpairs import first_match

    n, d = 131_072, 512
    x = jax.random.normal(jax.random.key(0), (n, d), jnp.bfloat16)
    x = x / jnp.linalg.norm(x.astype(jnp.float32), axis=1,
                            keepdims=True).astype(jnp.bfloat16)
    xs = [x * (1.0 + 1e-6 * i) for i in range(4)]
    dist = measure(lambda: pipelined_seconds(
        lambda a: first_match(a, a, tau=0.99, intra=True, impl="pallas"),
        xs, lambda r: np.asarray(r[0]),
    ), n=TRIALS)
    rate = n * n / dist["median"]
    log(fmt("dedup: 131072^2 all-pairs", dist, "ms", 1e3)
        + f" -> {rate / 1e9:.1f} Gpairs/s at the median")
    return dist


def _dist_json(dist, scale=1.0):
    return {k: (round(v * scale, 4) if k != "n" else v)
            if not isinstance(v, list)
            else [round(x * scale, 4) for x in v]
            for k, v in dist.items()}


def health_gate(timeout_s: int = 120) -> bool:
    """The tunneled TPU goes down for hours at a time; when it is down a
    trivial matmul hangs forever (not errors). Probe in a SUBPROCESS with
    a hard timeout so a dead tunnel turns into a fast, visible exit
    instead of an indefinite hang of the driver's bench step."""
    import subprocess

    code = ("import jax, jax.numpy as jnp;"
            "x = jnp.ones((512, 512)); (x @ x).block_until_ready()")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    if not health_gate():
        log("TPU tunnel is down (512x512 matmul hung >120 s); no bench "
            "numbers this run — previous round's artifact stands")
        sys.exit(2)
    log(f"devices: {jax.devices()}")
    extras = {}
    # secondary benches FIRST: the embed bench's live buffers perturb the
    # 1M-gallery scan (measured 23 ms vs 1.2 ms isolated), not vice versa
    try:
        extras["query_ms"] = _dist_json(bench_query(), 1e3)
        ivf_dist, ivf_recall = bench_ivf_quick()
        extras["ivf_q8_ms"] = _dist_json(ivf_dist, 1e3)
        extras["ivf_recall_at_10"] = round(float(ivf_recall), 4)
        extras["dedup_ms"] = _dist_json(bench_dedup(), 1e3)
    except Exception as e:  # secondary benches must not break the headline
        log("secondary bench failed:", repr(e))
    d_bf16, batch = bench_embed(int8=False)
    ips_bf16 = batch / d_bf16["median"]
    extras["embed_bf16_ms"] = _dist_json(d_bf16, 1e3)
    try:
        d_int8, batch8 = bench_embed(int8=True)
        ips_int8 = batch8 / d_int8["median"]
        extras["embed_int8_ms"] = _dist_json(d_int8, 1e3)
    except Exception as e:
        log("int8 embed bench failed:", repr(e))
        ips_int8 = 0.0
    # headline = the best serving config at the MEDIAN; both recorded.
    # int8 keeps the ranking contract (tests/test_quantized_tower.py).
    ips = max(ips_bf16, ips_int8)
    print(json.dumps({
        "metric": "vit_b32_embed_throughput",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_IMAGES_PER_SEC, 3),
        "bf16": round(ips_bf16, 1),
        "int8": round(ips_int8, 1),
        "trials": TRIALS,
        **extras,
    }))


if __name__ == "__main__":
    main()
