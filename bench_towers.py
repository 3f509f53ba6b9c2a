"""Text-tower serving throughput: Taiyi RoBERTa-large (CN) + CLIP text (EN).

The CN pair's image tower (ViT-L/14) has a recorded number (COVERAGE.md);
this covers the text side — the towers behind `encode_text` in the bilingual
union/cascade paths (reference: Taiyi text logits at code/test_taiyi.py:24,
CLIP text encode at CLIP/lab1.py:56-60). Same pipelined timing method as
bench.py. Prints one JSON line per tower to stdout.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from bench import log, pipelined_seconds


def device_init_bf16(init_fn):
    """Random bf16 params generated ON the TPU (CLAUDE.md: host-converted
    bf16 moves at ~0.3 GB/s through this environment's tunnel — generate
    on device instead; bench timings don't depend on weight values)."""
    @jax.jit
    def init(key):
        params = init_fn(key)
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 and x.ndim > 1 else x, params)

    params = init(jax.random.key(0))
    jax.block_until_ready(params)
    return params


def bench_taiyi(batch: int = 512, seq: int = 32):
    """Taiyi text tower: RoBERTa-large 326M + 768-d classifier head.

    seq=32 covers the reference's Chinese prompts ("一张{cls}的图片" is
    ~10 tokens; 32 leaves headroom for long class names)."""
    from mmrs_tpu.models import bert
    from mmrs_tpu.models.configs import TAIYI_ROBERTA_LARGE as cfg

    params = device_init_bf16(lambda k: bert.init(k, cfg))

    @jax.jit
    def encode(params, tokens):
        return bert.apply(params, tokens, None, cfg)

    toks = [jax.random.randint(jax.random.key(i), (batch, seq), 100, 20000,
                               jnp.int32) for i in range(4)]
    jax.block_until_ready(toks)
    per = pipelined_seconds(lambda t: encode(params, t), toks * 4,
                            lambda r: np.asarray(r[0, 0]))
    qps = batch / per
    log(f"taiyi_text[bf16 T={seq}]: {per*1e3:.2f} ms / {batch} "
        f"-> {qps:.0f} texts/sec/chip")
    return qps


def bench_clip_text(batch: int = 512):
    """CLIP text tower at the fixed 77-token context (models/text_transformer
    matches clip.tokenize's padded shape, code/search_image.py:334)."""
    from mmrs_tpu.models import clip
    from mmrs_tpu.models.clip import CLIPConfig
    from mmrs_tpu.models.configs import CLIP_TEXT_B32, VIT_B32

    cfg = CLIPConfig(vision=VIT_B32, text=CLIP_TEXT_B32)
    params = device_init_bf16(lambda k: clip.init(k, cfg))

    @jax.jit
    def encode(params, tokens):
        return clip.encode_text(params, tokens, cfg)

    # argmax-EOT contract: place a max-id token near the end like
    # clip.tokenize does
    with jax.default_device(jax.devices("cpu")[0]):
        base = np.full((batch, 77), 1, np.int32)
        base[:, 0] = 49406
        base[:, 20] = 49407
        toks = [jnp.asarray(np.roll(base, i, axis=0)) for i in range(4)]
    toks = [jax.device_put(t, jax.devices()[0]) for t in toks]
    jax.block_until_ready(toks)
    per = pipelined_seconds(lambda t: encode(params, t), toks * 4,
                            lambda r: np.asarray(r[0, 0]))
    qps = batch / per
    log(f"clip_text_b32[bf16 T=77]: {per*1e3:.2f} ms / {batch} "
        f"-> {qps:.0f} texts/sec/chip")
    return qps


def main():
    log(f"devices: {jax.devices()}")
    taiyi = bench_taiyi()
    clip_t = bench_clip_text()
    print(json.dumps({"metric": "taiyi_text_throughput",
                      "value": round(taiyi, 1), "unit": "texts/sec/chip"}))
    print(json.dumps({"metric": "clip_text_b32_throughput",
                      "value": round(clip_t, 1), "unit": "texts/sec/chip"}))


if __name__ == "__main__":
    main()
