"""CLIP text tower — causal transformer with EOT-token pooling.

Replaces `clip_model.encode_text` (CLIP/lab1.py:58-60): token embedding +
positional embedding, causally-masked pre-LN transformer, ln_final, take the
hidden state at the EOT position (the argmax token id — EOT has the highest
id in the CLIP vocab), project with `text_projection`.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from mmrs_tpu.models.configs import TextConfig
from mmrs_tpu.models.layers import gelu, init_block_params, layer_norm, quick_gelu, scan_blocks

Params = Dict[str, Any]


def causal_mask(t: int) -> jnp.ndarray:
    """Additive [1, 1, T, T] mask: 0 on/below diagonal, -inf above."""
    return jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)[None, None]


def apply(
    params: Params,
    tokens: jnp.ndarray,          # [B, T] int32, padded to context_length
    cfg: TextConfig,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:                 # [B, embed_dim] f32
    b, t = tokens.shape
    x = params["token_embedding"][tokens].astype(compute_dtype)      # [B, T, W]
    x = x + params["positional_embedding"][:t].astype(compute_dtype)[None]

    act = quick_gelu if cfg.quick_gelu else gelu
    x = scan_blocks(x, params["blocks"], cfg.heads, causal_mask(t), act, compute_dtype)
    x = layer_norm(x, params["ln_final_scale"], params["ln_final_bias"])

    # EOT pooling: the end-of-text token has the largest id in the vocab,
    # so argmax over token ids finds its position (OpenAI CLIP contract).
    eot = jnp.argmax(tokens, axis=-1)                                # [B]
    pooled = x[jnp.arange(b), eot]                                   # [B, W]
    out = jnp.dot(
        pooled.astype(compute_dtype),
        params["text_projection"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return out


def init(key: jax.Array, cfg: TextConfig, dtype=jnp.float32) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s = cfg.width ** -0.5
    return {
        "token_embedding": (
            jax.random.normal(k1, (cfg.vocab_size, cfg.width)) * 0.02
        ).astype(dtype),
        "positional_embedding": (
            jax.random.normal(k2, (cfg.context_length, cfg.width)) * 0.01
        ).astype(dtype),
        "blocks": init_block_params(k3, cfg.layers, cfg.width, dtype=dtype),
        "ln_final_scale": jnp.ones((cfg.width,), dtype),
        "ln_final_bias": jnp.zeros((cfg.width,), dtype),
        "text_projection": (
            jax.random.normal(k4, (cfg.width, cfg.embed_dim)) * s
        ).astype(dtype),
    }
