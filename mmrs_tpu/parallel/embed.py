"""Data-parallel gallery embedding over the mesh.

SURVEY.md §2.6 item 2: index builds embed batches sharded by the batch
dimension. Params are replicated; each chip encodes its slice of the batch;
outputs come back row-sharded (ready for a row-sharded gallery) or gathered
to host for the on-disk index writer.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmrs_tpu.parallel.mesh import DATA_AXIS


def make_sharded_encoder(
    encode_fn: Callable,          # (params, images_u8 [B,S,S,3]) -> [B, D]
    params,
    mesh: Mesh,
    batch_size: int,
) -> Callable[[np.ndarray], np.ndarray]:
    """Wraps a jittable encode function into a batch-sharded callable with
    the `pixels_u8 -> embeddings` signature build_index expects. Ragged
    final batches are padded to the mesh-divisible size and trimmed."""
    n_data = mesh.shape[DATA_AXIS]
    if batch_size % n_data != 0:
        raise ValueError(f"batch_size {batch_size} not divisible by "
                         f"data axis {n_data}")
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    jitted = jax.jit(encode_fn, in_shardings=(repl, batch_sh),
                     out_shardings=batch_sh)
    params = jax.device_put(params, repl)

    def encode(pixels_u8: np.ndarray) -> np.ndarray:
        b = pixels_u8.shape[0]
        pad = (-b) % n_data
        if pad:
            pixels_u8 = np.concatenate(
                [pixels_u8, np.zeros((pad, *pixels_u8.shape[1:]),
                                     pixels_u8.dtype)], axis=0)
        out = jitted(params, jnp.asarray(pixels_u8))
        return np.asarray(out, dtype=np.float32)[:b]

    return encode
