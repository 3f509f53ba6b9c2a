"""Taiyi RoBERTa text tower — BERT encoder + sequence-classification head.

Replaces `BertForSequenceClassification.from_pretrained(
"IDEA-CCNL/Taiyi-CLIP-Roberta-large-326M-Chinese")` whose `.logits` output is
used directly as the Chinese text embedding (code/test_taiyi.py:11-13,24;
CLIP-Chinese/lab_chinese.py:81-82). The unusual contract is preserved:

    embedding = classifier(tanh(pooler_dense(hidden[CLS])))

i.e. a `num_labels`-dim classification head acting as the projection
(num_labels = 768, matching the ViT-L/14 image embedding dim).

Architecture is standard post-LN BERT (chinese-roberta-wwm is BERT-arch with
absolute position embeddings starting at 0). Stacked-layer lax.scan body;
bf16 matmuls with f32 accumulation; f32 LayerNorm/softmax.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from mmrs_tpu.models.configs import BertConfig
from mmrs_tpu.models.layers import dense, gelu, layer_norm

Params = Dict[str, Any]


def _block(h, p, heads: int, mask, eps: float, compute_dtype):
    """Post-LN BERT block."""
    from mmrs_tpu.models.layers import attention

    attn_out = attention(h, p["attn"], heads, mask, compute_dtype)
    h = layer_norm(h + attn_out, p["attn_ln_scale"], p["attn_ln_bias"], eps=eps)
    inter = gelu(dense(h, p["mlp"]["w1"], p["mlp"]["b1"], compute_dtype))
    out = dense(inter, p["mlp"]["w2"], p["mlp"]["b2"], compute_dtype)
    h = layer_norm(h + out, p["out_ln_scale"], p["out_ln_bias"], eps=eps)
    return h


def apply(
    params: Params,
    tokens: jnp.ndarray,                    # [B, T] int32
    attention_mask: Optional[jnp.ndarray],  # [B, T] 1=keep, 0=pad (None = all keep)
    cfg: BertConfig,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:                           # [B, num_labels] f32 "logits" embedding
    b, t = tokens.shape
    pos_ids = jnp.arange(t)
    emb = (
        params["word_embeddings"][tokens]
        + params["position_embeddings"][pos_ids][None]
        + params["token_type_embeddings"][0][None, None]
    )
    h = layer_norm(
        emb.astype(compute_dtype),
        params["emb_ln_scale"],
        params["emb_ln_bias"],
        eps=cfg.layer_norm_eps,
    )

    if attention_mask is None:
        mask = None
    else:
        neg = jnp.where(attention_mask.astype(jnp.bool_), 0.0, -jnp.inf)
        mask = neg[:, None, None, :].astype(jnp.float32)  # [B, 1, 1, T]

    def body(h, layer_params):
        return _block(h, layer_params, cfg.heads, mask, cfg.layer_norm_eps,
                      compute_dtype), None

    h, _ = jax.lax.scan(body, h, params["blocks"])

    cls = h[:, 0, :]
    pooled = jnp.tanh(
        dense(cls, params["pooler_kernel"], params["pooler_bias"], compute_dtype)
        .astype(jnp.float32)
    )
    logits = jnp.dot(
        pooled.astype(compute_dtype),
        params["classifier_kernel"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ) + params["classifier_bias"].astype(jnp.float32)
    return logits


def init(key: jax.Array, cfg: BertConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 12)
    w, l, inter = cfg.hidden_size, cfg.layers, cfg.intermediate_size
    s = 0.02

    def nrm(k, shape):
        return (jax.random.normal(k, shape) * s).astype(dtype)

    def stack_nrm(k, shape):
        return (jax.random.normal(k, (l, *shape)) * s).astype(dtype)

    def stack_zeros(shape):
        return jnp.zeros((l, *shape), dtype)

    def stack_ones(shape):
        return jnp.ones((l, *shape), dtype)

    blocks = {
        "attn": {
            "wq": stack_nrm(ks[0], (w, w)), "bq": stack_zeros((w,)),
            "wk": stack_nrm(ks[1], (w, w)), "bk": stack_zeros((w,)),
            "wv": stack_nrm(ks[2], (w, w)), "bv": stack_zeros((w,)),
            "wo": stack_nrm(ks[3], (w, w)), "bo": stack_zeros((w,)),
        },
        "attn_ln_scale": stack_ones((w,)), "attn_ln_bias": stack_zeros((w,)),
        "mlp": {
            "w1": stack_nrm(ks[4], (w, inter)), "b1": stack_zeros((inter,)),
            "w2": stack_nrm(ks[5], (inter, w)), "b2": stack_zeros((w,)),
        },
        "out_ln_scale": stack_ones((w,)), "out_ln_bias": stack_zeros((w,)),
    }
    return {
        "word_embeddings": nrm(ks[6], (cfg.vocab_size, w)),
        "position_embeddings": nrm(ks[7], (cfg.max_position_embeddings, w)),
        "token_type_embeddings": nrm(ks[8], (cfg.type_vocab_size, w)),
        "emb_ln_scale": jnp.ones((w,), dtype),
        "emb_ln_bias": jnp.zeros((w,), dtype),
        "blocks": blocks,
        "pooler_kernel": nrm(ks[9], (w, w)),
        "pooler_bias": jnp.zeros((w,), dtype),
        "classifier_kernel": nrm(ks[10], (w, cfg.num_labels)),
        "classifier_bias": jnp.zeros((cfg.num_labels,), dtype),
    }
