"""Query engine: text / image / k-shot-prototype search over a gallery.

The `search_image.py`-equivalent surface (code/search_image.py:320-390),
served from the fused Pallas `cosine_topk` kernel (single chip) or the
sharded shard_map path (mesh). Scores follow the reference's
`100. * feat @ ref.T` convention (code/search_image.py:105-117) via a
configurable logit scale.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from mmrs_tpu.config import SearchConfig
from mmrs_tpu.index.gallery import GalleryIndex
from mmrs_tpu.ops.normalize import l2_normalize
from mmrs_tpu.ops.topk import cosine_topk
from mmrs_tpu.search.prototypes import build_prototype
from mmrs_tpu.utils.stats import StageStats


@dataclass
class SearchHit:
    path: str
    score: float
    rank: int
    cls: str


class SearchEngine:
    """Holds a gallery on device (optionally sharded) and answers queries."""

    def __init__(
        self,
        index: GalleryIndex,
        config: Optional[SearchConfig] = None,
        mesh=None,
        device_dtype=jnp.bfloat16,
        quantize: bool = False,
    ):
        """`quantize=True` stores the gallery as int8 + per-row scales
        (ops/quant.py): half the HBM residency (2x rows per chip) at the
        cost of ~0.3% score error — opt-in; bf16 is the rank-parity
        default. Composes with `mesh` (int8 rows + scales row-sharded).
        Ragged row counts are padded to the shard multiple and masked at
        query time, so any index size runs on any mesh."""
        self.index = index
        self.config = config or SearchConfig()
        self.mesh = mesh
        self.stats = StageStats()
        self.quantized = quantize
        emb = jnp.asarray(np.asarray(index.embeddings), device_dtype)
        emb = l2_normalize(emb)  # idempotent if rows already normalized
        if quantize:
            if mesh is not None:
                from mmrs_tpu.parallel.topk import place_gallery_quantized

                self.gallery, self.gallery_scales = place_gallery_quantized(
                    emb, mesh)
            else:
                from mmrs_tpu.ops.quant import quantize_rows

                self.gallery, self.gallery_scales = quantize_rows(emb)
            return
        if mesh is not None:
            from mmrs_tpu.parallel.topk import place_gallery

            emb = place_gallery(emb, mesh)
        self.gallery = emb

    # -- core ---------------------------------------------------------------

    def query_vectors(
        self, vectors: jnp.ndarray, top_k: Optional[int] = None
    ) -> List[List[SearchHit]]:
        """vectors [Q, D] (unnormalized ok). Returns hits per query."""
        k = min(top_k or self.config.top_k, len(self.index))
        q = l2_normalize(jnp.asarray(vectors))
        if not self.quantized:
            q = q.astype(self.gallery.dtype)
        with self.stats.timed("topk", count=q.shape[0]):
            if self.quantized and self.mesh is not None:
                from mmrs_tpu.parallel.topk import (
                    sharded_cosine_topk_quantized,
                )

                vals, idxs = sharded_cosine_topk_quantized(
                    q, self.gallery, self.gallery_scales, k, self.mesh,
                    n_valid=len(self.index))
            elif self.quantized:
                from mmrs_tpu.ops.quant import cosine_topk_quantized

                vals, idxs = cosine_topk_quantized(
                    q, self.gallery, self.gallery_scales, k)
            elif self.mesh is not None:
                from mmrs_tpu.parallel.topk import sharded_cosine_topk

                vals, idxs = sharded_cosine_topk(q, self.gallery, k, self.mesh,
                                                 n_valid=len(self.index))
            else:
                vals, idxs = cosine_topk(q, self.gallery, k)
            vals = np.asarray(vals)
            idxs = np.asarray(idxs)
        scale = self.config.logit_scale
        out: List[List[SearchHit]] = []
        for qi in range(vals.shape[0]):
            hits = [
                SearchHit(
                    path=self.index.paths[int(r)],
                    score=float(vals[qi, j] * scale),
                    rank=j,
                    cls=self.index.classes[int(r)],
                )
                for j, r in enumerate(idxs[qi])
            ]
            out.append(hits)
        return out

    # -- query flavors (the reference's entry points) -------------------------

    def query_text(self, text_embeds: jnp.ndarray, top_k=None):
        """Text->image search: embeds from the matching text tower."""
        return self.query_vectors(text_embeds, top_k)

    def query_image(self, image_embeds: jnp.ndarray, top_k=None):
        """Reference-image->image search."""
        return self.query_vectors(image_embeds, top_k)

    def query_prototype(
        self,
        shot_embeds: jnp.ndarray,          # [K, D] embeddings of k examples
        strategy: Optional[str] = None,
        text_embed: Optional[jnp.ndarray] = None,
        top_k=None,
    ):
        """K-shot prototype search using the reference's four strategies."""
        cfg = self.config
        proto = build_prototype(
            shot_embeds,
            strategy=strategy or cfg.prototype,
            text_embed=text_embed,
            cluster_k=cfg.cluster_k,
            balance_ratio=cfg.cluster_balance_ratio,
            outlier_percentile=cfg.outlier_percentile,
        )
        return self.query_vectors(proto[None, :], top_k)

    def similarities(self, vectors: jnp.ndarray) -> np.ndarray:
        """Full (scaled) similarity row per query vs the whole gallery —
        the calibration path's input (kept for threshold sweeps; O(N) per
        query, so only for calibration-sized galleries)."""
        q = l2_normalize(jnp.asarray(vectors)).astype(jnp.float32)
        g = jnp.asarray(np.asarray(self.index.embeddings), jnp.float32)
        sims = jnp.dot(q, g.T, preferred_element_type=jnp.float32)
        return np.asarray(sims) * self.config.logit_scale
