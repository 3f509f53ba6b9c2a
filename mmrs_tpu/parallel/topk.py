"""Distributed top-k over a row-sharded gallery.

SURVEY.md §5's design, implemented: queries are replicated, each chip runs
the fused Pallas `cosine_topk` over ITS gallery shard (local indices +
shard offset -> global row ids), the per-shard [Q, k] candidates are
all-gathered over ICI (k * n_shards values — tiny), and the final top-k
merge happens on every chip redundantly (cheaper than a host round-trip).
One jitted shard_map; no host involvement.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from mmrs_tpu.ops.topk import cosine_topk
from mmrs_tpu.parallel.mesh import DATA_AXIS


def sharded_cosine_topk(
    queries: jnp.ndarray,      # [Q, D] replicated
    gallery: jnp.ndarray,      # [N, D] row-sharded over `axis`
    k: int,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    impl: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (values [Q, k], global indices [Q, k]) — replicated."""
    n = gallery.shape[0]
    n_shards = mesh.shape[axis]
    if n % n_shards != 0:
        raise ValueError(f"gallery rows {n} not divisible by {n_shards} shards")
    rows_per_shard = n // n_shards

    def local(q, g_shard):
        shard_id = jax.lax.axis_index(axis)
        vals, idxs = cosine_topk(q, g_shard, k=k, impl=impl)
        idxs = idxs + shard_id * rows_per_shard        # local -> global rows
        # gather candidates from every shard: [S, Q, k]
        all_vals = jax.lax.all_gather(vals, axis)
        all_idxs = jax.lax.all_gather(idxs, axis)
        s, qn, kk = all_vals.shape
        flat_v = jnp.transpose(all_vals, (1, 0, 2)).reshape(qn, s * kk)
        flat_i = jnp.transpose(all_idxs, (1, 0, 2)).reshape(qn, s * kk)
        best_v, pos = jax.lax.top_k(flat_v, k)
        best_i = jnp.take_along_axis(flat_i, pos, axis=1)
        return best_v, best_i

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, gallery)


def place_gallery(gallery: jnp.ndarray, mesh: Mesh, axis: str = DATA_AXIS):
    """Device-put a gallery row-sharded over the mesh."""
    return jax.device_put(gallery, NamedSharding(mesh, P(axis, None)))
