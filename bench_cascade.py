"""Cascade end-to-end benchmark: CLIP gate -> batched LLaVA verify on TPU.

The reference's one latency-instrumented production path is the cascade
with per-stage timers and a count of images that reached LLaVA
(union_clip_llava2.py:163-168, 203, 263-268). This bench reproduces that
stage table at 7B-verifier scale on one v5e chip:

  stage 1  EN CLIP gate: embed every image (ViT-B/32 bf16, batch 224),
           score against a class embedding, threshold -> survivors
  stage 2  LLaVA-v1.5-7B-config verify: batched greedy decode over the
           survivors only (576 vision tokens = 336px/14, llava_v1 prompt
           length, 8 new tokens/answer)

Weights are random (bf16, initialized ON device — 13.5 GB of 7B weights
never cross the tunnel) — stage timings do not depend on weight values.
Prints one JSON line with the stage breakdown; human table to stderr.

Memory: 7B bf16 weights 13.5 GB + KV cache (B=2, 640 seq) ~0.7 GB fits the
16 GB chip; the verify batch is the knob if it does not.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mmrs_tpu.models import clip, llava
from mmrs_tpu.models.clip import CLIPConfig
from mmrs_tpu.models.configs import CLIP_TEXT_B32, VIT_B32, VITConfig
from mmrs_tpu.models.llama import LlamaConfig
from mmrs_tpu.ops.preprocess import normalize_images

N_IMAGES = 448          # 2 embed batches of 224
GATE_BATCH = 224
VERIFY_BATCH = 2        # bf16: 13.5 GB weights leave room for batch 2
VERIFY_BATCH_INT8 = 8   # int8: 7 GB weights -> batch 8 KV cache fits
SURVIVOR_FRACTION = 0.10
MAX_NEW_TOKENS = 8      # "yes"/"no" + slack
PROMPT_LEN = 48         # llava_v1 system + USER/ASSISTANT framing


def log(*a):
    print(*a, file=sys.stderr, flush=True)


LLAVA_7B = llava.LLaVAConfig(
    vision=VITConfig(image_size=336, patch_size=14, width=1024, layers=24,
                     heads=16, embed_dim=768),
    lm=LlamaConfig(vocab_size=32000, dim=4096, layers=32, heads=32,
                   kv_heads=32, mlp_dim=11008,
                   max_seq=576 + PROMPT_LEN + MAX_NEW_TOKENS + 8),
)


def llava_7b_structs(cfg: llava.LLaVAConfig):
    """ShapeDtypeStruct tree of bf16 LLaVA params (for AOT compilation and
    direct-into-layout generation)."""
    from mmrs_tpu.models import vit

    lm = cfg.lm
    v = cfg.vision
    L = lm.layers

    def s(*shape):
        return jax.ShapeDtypeStruct(shape, jnp.bfloat16)

    visual = jax.eval_shape(
        lambda k: vit.init(k, v, jnp.bfloat16), jax.random.key(0))
    return {
        "visual": visual,
        "proj_w1": s(v.width, lm.dim),
        "proj_b1": s(lm.dim),
        "proj_w2": s(lm.dim, lm.dim),
        "proj_b2": s(lm.dim),
        "lm": {
            "embed": s(lm.vocab_size, lm.dim),
            "blocks": {
                "attn_norm": s(L, lm.dim),
                "wq": s(L, lm.dim, lm.dim),
                "wk": s(L, lm.dim, lm.dim),
                "wv": s(L, lm.dim, lm.dim),
                "wo": s(L, lm.dim, lm.dim),
                "mlp_norm": s(L, lm.dim),
                "w_gate": s(L, lm.dim, lm.mlp_dim),
                "w_up": s(L, lm.dim, lm.mlp_dim),
                "w_down": s(L, lm.mlp_dim, lm.dim),
            },
            "final_norm": s(lm.dim),
            "lm_head": s(lm.dim, lm.vocab_size),
        },
    }


def quantized_structs(structs):
    """bf16 struct tree -> QTensor struct tree for the int8 serving keys
    (mirrors models/quantize.quantize_llava without touching values)."""
    from mmrs_tpu.models.layers import QTensor
    from mmrs_tpu.models.quantize import _LM_KEYS, _QUANT_KEYS

    def walk(node, keys):
        if isinstance(node, dict):
            return {
                k: QTensor(
                    jax.ShapeDtypeStruct(v.shape, jnp.int8),
                    jax.ShapeDtypeStruct(v.shape[:-2] + v.shape[-1:],
                                         jnp.float32),
                ) if k in keys and not isinstance(v, dict) else walk(v, keys)
                for k, v in node.items()
            }
        return node

    out = dict(structs)
    out["visual"] = walk(structs["visual"], _QUANT_KEYS)
    out["lm"] = walk(structs["lm"], _LM_KEYS)
    return out


def generate_params_into_formats(structs, formats):
    """Random params generated ON DEVICE directly in the layout the
    compiled verify step wants — 13.5 GB of 7B weights never exist in two
    layouts at once (a post-hoc relayout copy OOMs the 16 GB chip).
    int8 leaves (quantized serving weights) generate as randint; their f32
    scales as small constants — stage timings don't depend on values."""
    flat_s, tree = jax.tree.flatten(structs)
    flat_f, _ = jax.tree.flatten(formats)
    leaves = []
    for i, (st, fmt) in enumerate(zip(flat_s, flat_f)):
        def make(k, shape=st.shape, dt=st.dtype):
            if dt == jnp.int8:
                return jax.random.randint(k, shape, -127, 128, jnp.int8)
            if len(shape) > 1:
                return jax.random.normal(k, shape, dt) * 0.02
            return jnp.full(shape, 0.0002 if dt == jnp.float32 else 1.0, dt)

        gen = jax.jit(make, out_shardings=fmt)
        leaf = gen(jax.random.key(i))
        leaf.block_until_ready()
        leaves.append(leaf)
    return jax.tree.unflatten(tree, leaves)


def main():
    int8 = "--int8" in sys.argv
    kv8 = "--kv8" in sys.argv          # int8 KV cache (llama.QKVCache)
    # in-place layer-loop cache buffers + chunked causal prefill: the
    # measured-fast decode options at this 624-token multimodal prompt
    # (bench_vlm: scan 327.8 -> unroll 458.1 -> +pc128 491.6 -> fori
    # in-place 653 tok/s)
    layers = ("fori" if "--fori" in sys.argv
              else "unroll" if "--unroll" in sys.argv else "scan")
    pc = (64 if "--pc64" in sys.argv
          else 128 if "--pc128" in sys.argv else None)
    verify_batch = VERIFY_BATCH_INT8 if int8 else VERIFY_BATCH
    if kv8:
        # half the cache bytes -> twice the verify batch fits next to the
        # int8 weights
        verify_batch *= 2
    kv_dtype = jnp.int8 if kv8 else None
    log(f"devices: {jax.devices()}  verifier={'int8' if int8 else 'bf16'} "
        f"kv={'int8' if kv8 else 'bf16'} batch={verify_batch} "
        f"layers={layers} prefill_chunk={pc}")
    dev = jax.devices()[0]

    # ---- stage 1: EN CLIP gate --------------------------------------------
    ccfg = CLIPConfig(vision=VIT_B32, text=CLIP_TEXT_B32)
    with jax.default_device(jax.devices("cpu")[0]):
        cparams = clip.init(jax.random.key(0), ccfg)
        cparams = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 and x.ndim > 1 else x, cparams)
    cparams = jax.device_put(cparams, dev)

    @jax.jit
    def gate_scores(p, u8, class_embed):
        x = normalize_images(u8, dtype=jnp.bfloat16, impl="xla")
        e = clip.encode_image(p, x, ccfg)          # [B, D] normalized
        return 100.0 * (e @ class_embed)

    batches = [
        jax.random.randint(jax.random.key(i), (GATE_BATCH, 224, 224, 3),
                           0, 256, jnp.uint8)
        for i in range(N_IMAGES // GATE_BATCH)
    ]
    class_embed = jax.random.normal(jax.random.key(77), (512,), jnp.bfloat16)
    class_embed = class_embed / jnp.linalg.norm(
        class_embed.astype(jnp.float32)).astype(jnp.bfloat16)
    jax.block_until_ready((batches, class_embed))

    # warmup (compile)
    np.asarray(gate_scores(cparams, batches[0], class_embed))
    from mmrs_tpu.utils.trials import fmt, summarize

    gate_ts = []
    scores = None
    for _ in range(5):  # VERDICT r3 #2: distributions, not single trials
        t0 = time.perf_counter()
        outs = [gate_scores(cparams, b, class_embed) for b in batches]
        scores = np.concatenate([np.asarray(o) for o in outs])
        gate_ts.append(time.perf_counter() - t0)
    gate_dist = summarize(gate_ts)
    gate_s = gate_dist["median"]
    log(fmt("gate pass", gate_dist, "ms", 1e3))

    thr = float(np.quantile(scores, 1.0 - SURVIVOR_FRACTION))
    survivors = int((scores >= thr).sum())
    log(f"gate: {N_IMAGES} images in {gate_s*1e3:.1f} ms "
        f"({N_IMAGES/gate_s:.0f} img/s), threshold {thr:.2f} -> "
        f"{survivors} survivors")

    # ---- stage 2: batched 7B LLaVA verify ----------------------------------
    # free the gate model before bringing up the 7B verifier (the
    # reference swaps models on/off the GPU the same way,
    # merge_dataset.py:430-437 — here it is just buffer lifetime)
    for leaf in jax.tree.leaves((cparams, batches, outs)):
        leaf.delete()

    pre_ids = jnp.ones((verify_batch, PROMPT_LEN - 12), jnp.int32)
    post_ids = jnp.ones((verify_batch, 12), jnp.int32)
    imgs = jax.random.randint(jax.random.key(5),
                              (verify_batch, 336, 336, 3), 0, 256, jnp.uint8)

    def verify_fn(p, u8, pre, post):
        x = normalize_images(u8, dtype=jnp.bfloat16, impl="xla")
        # fused Pallas MHA for the 336px tower (T=577: measured faster than
        # the einsum path, unlike the 50-token B/32 gate)
        return llava.generate(p, x, pre, post, LLAVA_7B,
                              max_new_tokens=MAX_NEW_TOKENS, eos_token=2,
                              attn_impl="pallas", kv_dtype=kv_dtype,
                              layers=layers,
                              prefill_chunk=pc)

    # Compile with AUTO input layouts: the decode scan wants the stacked
    # [L, 4096, 4096] weights in a transposed layout, and default-layout
    # inputs make XLA materialize 1 GB relayout copies INSIDE the step —
    # an instant OOM next to 13.5 GB of residents. AUTO pushes the layout
    # into the input signature, and the random weights are generated
    # directly INTO those layouts.
    from jax.experimental.layout import Format, Layout

    verify_j = jax.jit(verify_fn, in_shardings=Format(Layout.AUTO))
    p_structs = llava_7b_structs(LLAVA_7B)
    if int8:
        p_structs = quantized_structs(p_structs)
    structs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        (p_structs, imgs, pre_ids, post_ids))
    log("compiling 7B verify ...")
    t0 = time.perf_counter()
    compiled = verify_j.lower(*structs).compile()
    p_fmt, i_fmt, pre_fmt, post_fmt = compiled.input_formats[0]
    log(f"compile: {time.perf_counter() - t0:.1f} s")

    log("generating 7B weights on device (into compiled layouts) ...")
    t0 = time.perf_counter()
    vparams = generate_params_into_formats(p_structs, p_fmt)
    log(f"7B init: {time.perf_counter() - t0:.1f} s")

    imgs = jax.device_put(imgs, i_fmt)
    pre_ids = jax.device_put(pre_ids, pre_fmt)
    post_ids = jax.device_put(post_ids, post_fmt)

    def verify(p, u8, pre, post):
        return compiled(p, u8, pre, post)

    jax.block_until_ready(imgs)
    out = np.asarray(verify(vparams, imgs, pre_ids, post_ids))  # warmup
    n_verify_batches = max(1, survivors // verify_batch)
    vlm_ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        res = None
        for i in range(n_verify_batches):
            res = verify(vparams, imgs, pre_ids, post_ids)
        np.asarray(res)
        vlm_ts.append(time.perf_counter() - t0)
    vlm_dist = summarize(vlm_ts)
    vlm_s = vlm_dist["median"]
    log(fmt("verify pass", vlm_dist, "s"))
    per_image = vlm_s / (n_verify_batches * verify_batch)
    log(f"verify: {n_verify_batches * verify_batch} images in {vlm_s:.2f} s "
        f"({per_image*1e3:.0f} ms/img at batch {verify_batch}, "
        f"{MAX_NEW_TOKENS} new tokens, 576 vision tokens)")

    total_s = gate_s + vlm_s
    table = {
        "images": N_IMAGES,
        "gate_ms": round(gate_s * 1e3, 1),
        "gate_ms_per_image": round(gate_s * 1e3 / N_IMAGES, 3),
        "survivors_to_vlm": survivors,
        "vlm_ms": round(vlm_s * 1e3, 1),
        "vlm_ms_per_survivor": round(per_image * 1e3, 1),
        "total_ms": round(total_s * 1e3, 1),
        "total_ms_per_image": round(total_s * 1e3 / N_IMAGES, 2),
        "trials": 5,
        "gate_ms_iqr": round(gate_dist["iqr"] * 1e3, 2),
        "vlm_ms_iqr": round(vlm_dist["iqr"] * 1e3, 1),
        "verifier": ("llava-7b-config "
                     + ("int8" if int8 else "bf16")
                     + (" kv-int8" if kv8 else "")
                     + (f" {layers}" if layers != "scan" else "")
                     + (f" pc{pc}" if pc else "")
                     + f", batch {verify_batch}, single v5e chip"),
    }
    log("stage table:", table)
    print(json.dumps({"metric": "cascade_stage_breakdown", **table}))


if __name__ == "__main__":
    main()
