"""Image preprocessing: host decode/resize (PIL-parity) + device normalize.

Split follows SURVEY.md §7 "hard parts": PIL's bicubic resample cannot be
bit-matched cheaply on device, and rank parity with the reference depends on
it — so decode + resize + center-crop stay on host with PIL-identical math
(CLIP/lab1.py:26 `preprocess(img)`), while the per-pixel affine
(uint8 -> scale -> CLIP mean/std normalize -> bf16) runs on device; the
batch travels host->HBM as uint8 (4x smaller).

WHY THE XLA PATH IS THE PRODUCTION DEFAULT (measured on v5e, 2026-08-16):
XLA fuses this affine into the consumer (the patchify transpose + patch
matmul), so the normalized image is never materialized in HBM — the
standalone op pipelines at ~0 ms inside the tower. The Pallas kernel below
is a separate pallas_call, which forces a [B,224,224,3] bf16 intermediate
through HBM (write + re-read): ViT-B/32 embed measured 28.4 ms vs 24.8 ms
per 256-image batch with it in the path. `impl="auto"` therefore resolves
to "xla" everywhere; the kernel is kept as the reference implementation for
standalone normalization and tests. (It also needs a uint8->int32->f32 cast
hop — Mosaic on this TPU has no direct uint8->float cast.)

CLIP normalization constants from code/custom.py:28.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# OpenAI CLIP constants (code/custom.py:28)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


# --------------------------------------------------------------------------
# Host side: PIL-parity resize + center crop (matches clip.load preprocess)
# --------------------------------------------------------------------------

def resize_center_crop(img, size: int = 224):
    """PIL path of OpenAI CLIP preprocess: BICUBIC resize of the SHORT side
    to `size`, then center crop size x size. Returns HWC uint8 ndarray."""
    from PIL import Image

    w, h = img.size
    # torchvision Resize floors the long side (int(), not round()):
    # _compute_resized_output_size -> int(size * long / short).
    if w < h:
        nw, nh = size, int(size * h / w)
    else:
        nw, nh = int(size * w / h), size
    img = img.resize((nw, nh), Image.BICUBIC)
    left = (nw - size) // 2
    top = (nh - size) // 2
    img = img.crop((left, top, left + size, top + size))
    return np.asarray(img.convert("RGB"), dtype=np.uint8)


def hf_resize_center_crop(img, size: int = 224):
    """HF CLIPImageProcessor path (used by the Chinese tower,
    CLIP-Chinese/lab_chinese.py:29). Differentially verified byte-
    identical to resize_center_crop against the real transformers
    CLIPImageProcessor across aspect ratios (tests/test_bilingual_
    augment.py) — HF's shortest-edge resize + center crop coincides
    with the torchvision stack, so this is an alias, not a duplicate
    implementation."""
    return resize_center_crop(img, size)


# --------------------------------------------------------------------------
# Device side: fused uint8 -> normalized bf16
# --------------------------------------------------------------------------

def _norm_kernel(x_ref, mean_ref, inv_std_ref, out_ref):
    # Mosaic has no direct uint8->float cast on this TPU generation; the
    # int32 hop lowers cleanly (measured: u8->i32->f32 OK, u8->f32 FAILs).
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    out_ref[:] = ((x - mean_ref[:]) * inv_std_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dtype", "impl"))
def normalize_images(
    images_u8: jnp.ndarray,        # [B, H, W, 3] uint8
    dtype=jnp.bfloat16,
    impl: str = "auto",
) -> jnp.ndarray:
    """(x/255 - mean) / std on device, output in compute dtype."""
    if impl == "auto":
        impl = "xla"  # measured faster: fuses into the patch matmul (above)

    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    inv_std = 1.0 / jnp.asarray(CLIP_STD, jnp.float32)

    if impl == "xla":
        x = images_u8.astype(jnp.float32) / 255.0
        return ((x - mean) * inv_std).astype(dtype)

    b, h, w, c = images_u8.shape
    # Flatten to [B*H, W*C] rows; broadcast mean/std to a [1, W*C] row so the
    # kernel is one VPU multiply-add per tile.
    flat = images_u8.reshape(b * h, w * c)
    mean_row = jnp.tile(mean, w)[None, :]
    inv_row = jnp.tile(inv_std, w)[None, :]

    interpret = impl == "pallas_interpret"
    rows = b * h
    tile_r = min(1024, rows)
    pad = (-rows) % tile_r
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        _norm_kernel,
        grid=((rows + pad) // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, w * c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, w * c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows + pad, w * c), dtype),
        interpret=interpret,
    )(flat, mean_row, inv_row)
    return out[:rows].reshape(b, h, w, c)
