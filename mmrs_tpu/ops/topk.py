"""Fused cosine top-k gallery scan — Pallas TPU kernel.

The query engine's hot op, replacing the reference's
`100. * image_features @ text_features.T` + host-side ranking
(code/search_image.py:105-117, CLIP/lab1.py:90-91) with a single fused
kernel: the gallery is streamed through VMEM tile by tile, each tile's
scores come off the MXU, and a running top-k (values + global indices) is
maintained in VMEM scratch — the [Q, N] score matrix is never materialized
in HBM. For a 1M x 512 gallery that saves 4 GB of HBM traffic per 1k-query
batch versus the naive matmul+top_k.

Inputs are expected L2-normalized (the reference's contract,
CLIP/lab1.py:89), so scores are cosines; callers apply logit scaling.

`cosine_topk(..., impl=)`:
  - "pallas": the fused kernel (TPU; interpret-mode on CPU in tests)
  - "xla":    jnp matmul + jax.lax.top_k reference (oracle + fallback)
  - "auto":   pallas on TPU, xla elsewhere
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _topk_merge(vals, idxs, k: int):
    """Iteratively extract the k largest (value, index) pairs per row.

    vals/idxs: [Q, M]. Returns ([Q, k], [Q, k]). k static and small; each
    pass is one VPU max-reduce + one masked update — negligible next to the
    MXU matmul that produced the scores.
    """
    q, m = vals.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (q, m), 1)
    out_v = []
    out_i = []
    for _ in range(k):
        best = jnp.max(vals, axis=1)                      # [Q]
        arg = jnp.argmax(vals, axis=1)                    # [Q]
        hit = col == arg[:, None]                         # one-hot per row
        out_v.append(best)
        # Mosaic has no row-wise gather; select the index via the one-hot mask.
        out_i.append(jnp.sum(jnp.where(hit, idxs, 0), axis=1))
        vals = jnp.where(hit, NEG_INF, vals)
    return jnp.stack(out_v, axis=1), jnp.stack(out_i, axis=1)


def _kernel(n_ref, q_ref, g_ref, out_v_ref, out_i_ref, run_v, run_i, *, k: int,
            tile_n: int):
    step = pl.program_id(0)
    num_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init():
        run_v[:] = jnp.full_like(run_v, NEG_INF)
        run_i[:] = jnp.full_like(run_i, -1)

    q = q_ref[:]                                           # [Q, D]
    g = g_ref[:]                                           # [TILE_N, D]
    scores = jax.lax.dot_general(
        q, g, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                      # [Q, TILE_N]

    base = step * tile_n
    qn, tn = scores.shape
    col_ids = base + jax.lax.broadcasted_iota(jnp.int32, (qn, tn), 1)
    n_valid = n_ref[0]
    scores = jnp.where(col_ids < n_valid, scores, NEG_INF)

    merged_v = jnp.concatenate([run_v[:], scores], axis=1)
    merged_i = jnp.concatenate([run_i[:], col_ids], axis=1)
    new_v, new_i = _topk_merge(merged_v, merged_i, k)
    run_v[:] = new_v
    run_i[:] = new_i

    @pl.when(step == num_steps - 1)
    def _finish():
        out_v_ref[:] = run_v[:]
        out_i_ref[:] = run_i[:]


def _cosine_topk_pallas(
    queries: jnp.ndarray,   # [Q, D]
    gallery: jnp.ndarray,   # [N, D]
    k: int,
    tile_n: int = 2048,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    q, d = queries.shape
    n = gallery.shape[0]
    qp = _round_up(max(q, 8), 8)
    dp = _round_up(d, 128)
    tile_n = min(tile_n, _round_up(n, 128))

    if (qp, dp) != (q, d):
        queries = jnp.zeros((qp, dp), queries.dtype).at[:q, :d].set(queries)
    if dp != d:
        # rare (D not lane-aligned): column-pad the gallery — a full copy,
        # acceptable only off the serving configs (D=512/768 are aligned)
        gallery = jnp.zeros((n, dp), gallery.dtype).at[:, :d].set(gallery)
    # NO row padding: the grid's last block may overrun the gallery — Pallas
    # clamps the block read and the kernel masks rows >= n_valid to -inf, so
    # no padded HBM copy of the gallery is ever materialized (a 10 GB
    # resident gallery would not fit twice; scatter-copy OOM seen at 10M rows)
    n_arr = jnp.asarray([n], jnp.int32)

    grid = (_round_up(n, tile_n) // tile_n,)
    out_v, out_i = pl.pallas_call(
        functools.partial(_kernel, k=k, tile_n=tile_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                     # n scalar
            pl.BlockSpec((qp, dp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                     # queries
            pl.BlockSpec((tile_n, dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                     # gallery tile
        ],
        out_specs=(
            pl.BlockSpec((qp, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qp, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qp, k), jnp.float32),
            jax.ShapeDtypeStruct((qp, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((qp, k), jnp.float32),
            pltpu.VMEM((qp, k), jnp.int32),
        ],
        interpret=interpret,
    )(n_arr, queries, gallery)
    return out_v[:q], out_i[:q]


def _cosine_topk_xla(queries, gallery, k):
    scores = jnp.dot(
        queries.astype(jnp.float32), gallery.astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    )
    vals, idxs = jax.lax.top_k(scores, k)
    return vals, idxs.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "impl", "tile_n"))
def cosine_topk(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    k: int = 10,
    impl: str = "auto",
    tile_n: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k cosine scores and gallery row indices for each query.

    queries [Q, D], gallery [N, D] (both L2-normalized).
    Returns (values [Q, k] f32, indices [Q, k] int32), sorted descending.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return _cosine_topk_xla(queries, gallery, k)
    if impl == "pallas":
        return _cosine_topk_pallas(queries, gallery, k, tile_n=tile_n)
    if impl == "pallas_interpret":
        return _cosine_topk_pallas(queries, gallery, k, tile_n=tile_n,
                                   interpret=True)
    raise ValueError(f"unknown impl {impl!r}")
