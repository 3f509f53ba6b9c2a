"""Per-op trace of the int8 vs bf16 ViT-B/32 serving batch (VERDICT r5 #1).

int8 embed is only +2.2% over bf16 (BENCH_r04) despite the MXU's 2x int8
rate. Known suspect (CLAUDE.md): XLA fuses layout transposes into bf16
matmul epilogues but NOT int8 ones. This prints the per-op device table
for both dtypes so the copies can be itemized before touching layout code.
"""

from __future__ import annotations

import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from mmrs_tpu.utils.profiling import profile_to, trace_op_table


def build(int8: bool, batch: int = 224, mlp_impl: str = "xla"):
    from mmrs_tpu.models import clip
    from mmrs_tpu.models.clip import CLIPConfig
    from mmrs_tpu.models.configs import CLIP_TEXT_B32, VIT_B32
    from mmrs_tpu.ops.preprocess import normalize_images

    cfg = CLIPConfig(vision=VIT_B32, text=CLIP_TEXT_B32)
    with jax.default_device(jax.devices("cpu")[0]):
        params = clip.init(jax.random.key(0), cfg)
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 and x.ndim > 1 else x, params)
        if int8:
            from mmrs_tpu.models.quantize import quantize_clip_visual

            params = quantize_clip_visual(params)
    params = jax.device_put(params, jax.devices()[0])
    unroll = 2 if int8 else 1

    @jax.jit
    def embed(params, images_u8):
        x = normalize_images(images_u8, dtype=jnp.bfloat16, impl="xla")
        return clip.encode_image(params, x, cfg, unroll=unroll,
                                 mlp_impl=mlp_impl)

    img = jax.random.randint(jax.random.key(0), (batch, 224, 224, 3),
                             0, 256, jnp.uint8)
    jax.block_until_ready(img)
    return embed, params, img


def table(int8: bool, top: int = 22):
    embed, params, img = build(int8)
    np.asarray(embed(params, img)[0, 0], np.float32)     # compile+warm
    with tempfile.TemporaryDirectory() as d:
        with profile_to(d):
            for _ in range(8):
                out = embed(params, img)
            np.asarray(out[0, 0], np.float32)
        rows = trace_op_table(d, top=200)
    tag = "int8" if int8 else "bf16"
    total = sum(ms for _, ms in rows)
    print(f"\n== {tag}: {total:.2f} ms device total over 8 batches "
          f"({total/8:.2f} ms/batch) ==")
    for name, ms in rows[:top]:
        print(f"  {ms/8:8.3f} ms/b  {ms/total*100:5.1f}%  {name}")
    return total


if __name__ == "__main__":
    which = sys.argv[1:] or ["bf16", "int8"]
    for w in which:
        table(int8=(w == "int8"))
