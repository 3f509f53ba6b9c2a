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

import jax
import jax.numpy as jnp
import numpy as np

from mmrs_tpu.config import SearchConfig
from mmrs_tpu.index.gallery import GalleryIndex
from mmrs_tpu.ops.normalize import l2_normalize
from mmrs_tpu.ops.topk import cosine_topk
from mmrs_tpu.search.prototypes import build_prototype
from mmrs_tpu.utils.logging import get_logger
from mmrs_tpu.utils.stats import StageStats

log = get_logger(__name__)

UPLOAD_CHUNK = 131072  # host->device staging rows (bounds host RSS)


def _fill_rows_q8(gal, scales, rows, start):
    from mmrs_tpu.ops.quant import quantize_rows

    q, s = quantize_rows(l2_normalize(rows))
    gal = jax.lax.dynamic_update_slice(gal, q, (start, 0))
    scales = jax.lax.dynamic_update_slice(scales, s, (start,))
    return gal, scales


def _fill_rows_q4(gal, scales, rows, start):
    from mmrs_tpu.ops.quant4 import quantize_rows_int4

    w, s = quantize_rows_int4(l2_normalize(rows))
    gal = jax.lax.dynamic_update_slice(gal, w, (0, start))
    scales = jax.lax.dynamic_update_slice(scales, s, (start,))
    return gal, scales


# donate the packed carry so each fill updates in place (no 2x packed peak)
_fill_rows_q8 = jax.jit(_fill_rows_q8, donate_argnums=(0, 1))
_fill_rows_q4 = jax.jit(_fill_rows_q4, donate_argnums=(0, 1))


def _quantize_gallery_chunked(embeddings, device_dtype, mode: str,
                              chunk: int = UPLOAD_CHUNK):
    """Upload + L2-normalize + quantize chunk-by-chunk so peak HBM during
    engine construction is the PACKED gallery plus one staging chunk — the
    full bf16 gallery is never resident, keeping int8's 2x / int4's 4x
    rows-per-chip claims true AT INIT (ADVICE r3). Numerics match the
    full-array path exactly: both quantize L2-normalized device_dtype rows
    and all the ops are per-row."""
    n, d = embeddings.shape
    if mode == "int4":
        gal = jnp.zeros((d // 8, n), jnp.int32)   # packed words, [D/8, N]
        fill = _fill_rows_q4
    else:
        gal = jnp.zeros((n, d), jnp.int8)
        fill = _fill_rows_q8
    scales = jnp.zeros((n,), jnp.float32)
    for a in range(0, n, chunk):
        rows = jnp.asarray(np.asarray(embeddings[a:a + chunk]), device_dtype)
        gal, scales = fill(gal, scales, rows, a)
    return gal, scales


def _to_device_chunked(embeddings, dtype, chunk: int = UPLOAD_CHUNK):
    """Upload a (possibly memmapped) [N, D] host array to device in chunks,
    so a 1M-row f32 index never needs a full in-RAM copy (streaming is the
    point: ~chunk*D*4 bytes of host staging instead of N*D*4)."""
    n = embeddings.shape[0]
    if n <= chunk:
        return jnp.asarray(np.asarray(embeddings), dtype)
    parts = [
        jnp.asarray(np.asarray(embeddings[a:a + chunk]), dtype)
        for a in range(0, n, chunk)
    ]
    out = jnp.concatenate(parts, axis=0)
    out.block_until_ready()
    return out


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
        quantize: bool | str = False,
    ):
        """`quantize` selects the gallery residency ladder: False/"" keeps
        bf16 (the rank-parity default, BASELINE.md); True or "int8" stores
        int8 + per-row scales (ops/quant.py — half the HBM, 2x rows per
        chip, ~0.3% score error); "int4" packs two dims per byte
        (ops/quant4.py — quarter the HBM, 4x rows per chip, ~0.6% score
        error). Both compose with `mesh` (rows/scales sharded over the
        data axis, candidates all-gather-merged) and with `ann="ivf"`
        (int8 bucket rows or int4 packed bucket planes — the whole
        ladder applies inside the index). Ragged row counts are padded
        to the shard multiple and masked at query time, so any index
        size runs on any mesh. Single-device quantized construction streams
        chunk-by-chunk, so peak HBM at init is the packed gallery + one
        chunk (the mesh path uploads bf16 first — per-chip headroom is
        n_shards x).

        A device-OOM during init is re-raised with a pointer at
        `mmrs plan` (mmrs_tpu/plan.py), which predicts residency for
        every quant x flat/IVF x shards rung before building."""
        try:
            self._init(index, config, mesh, device_dtype, quantize)
        except Exception as e:
            msg = str(e)
            if "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg:
                from mmrs_tpu.plan import oom_hint

                dim = index.embeddings.shape[1] if len(index) else 0
                raise RuntimeError(
                    f"{oom_hint(len(index), dim)} (device error: "
                    f"{msg[:300]})") from e
            raise

    def _init(self, index, config, mesh, device_dtype, quantize):
        self.index = index
        self.config = config or SearchConfig()
        self.mesh = mesh
        self.stats = StageStats()
        if quantize is True:
            quantize = "int8"
        elif quantize in (False, None):
            quantize = ""
        if quantize not in ("", "int8", "int4"):
            raise ValueError(f"unknown quantize mode {quantize!r}")
        self.quantized = quantize
        self.ivf = None
        if self.config.ann == "ivf":
            # sub-linear ANN serving (index/ivf.py): the flat gallery is
            # never device-resident; residency = buckets (~1.25x rows).
            # quantize=True stores int8 bucket rows + per-slot scales
            # (2x rows per chip, the flat int8 gallery trade). With a
            # mesh the buckets are SLOT-sharded (parallel/ivf.py): every
            # chip holds cap/n_shards slots of every bucket, the probe
            # list replicates, candidates all-gather-merge — per-chip
            # scan traffic AND capacity both scale with the mesh.
            # the full residency ladder applies inside the index too:
            # int8 bucket rows + per-slot scales (2x rows) or int4
            # packed bucket planes (4x rows, ops/quant4 layout).
            # The trained sidecar (centroids + slot maps, ~4 B/row)
            # auto-caches under <index_dir>/ivf so serve/search restarts
            # skip the k-means + assignment passes (280 s at 10M rows);
            # a fingerprint over the gallery rows invalidates it when
            # content changes, and any shape/quant/knob mismatch
            # triggers a rebuild + re-save.
            from mmrs_tpu.index import ivf as ivf_mod

            cfg = self.config
            if cfg.ann_target_recall > 0 and cfg.ann_nprobe > 0:
                raise ValueError(
                    "set ann_nprobe or ann_target_recall, not both")
            sidecar = None
            meta = None
            loaded = False
            if getattr(index, "directory", None):
                import os

                sidecar = os.path.join(index.directory, "ivf")
            if sidecar is not None:
                meta = ivf_mod.sidecar_meta(sidecar)
                compatible = meta is not None and (
                    meta.get("quant", "") == self.quantized
                    and cfg.ann_clusters in (0, meta.get("n_clusters"))
                    and cfg.ann_bucket_cap in (0, meta.get("bucket_cap"))
                    # auto-cap derives from cover; an explicit cap
                    # overrides it, otherwise a changed cover rebuilds
                    and (cfg.ann_bucket_cap != 0
                         or (meta.get("cover", 0.98) == cfg.ann_cover
                             and meta.get("slots_frac", 1.3)
                             == cfg.ann_slots_frac))
                )
                if compatible and meta["n_total"] < len(index):
                    # gallery grew (mmrs index update): assign ONLY the
                    # appended rows with the saved centroids — the
                    # k-means + old-row assignment passes never re-run
                    try:
                        meta = ivf_mod.extend_sidecar(sidecar,
                                                      index.embeddings)
                    except (ValueError, OSError) as e:
                        log.warning("ivf sidecar extend failed (%s); "
                                    "rebuilding", e)
                        compatible = False
                if compatible:
                    try:
                        self.ivf = ivf_mod.load_ivf(
                            sidecar, index.embeddings, dtype=device_dtype,
                            mesh=mesh)
                        loaded = True
                    except ValueError as e:
                        log.warning("ivf sidecar rejected (%s); rebuilding",
                                    e)
            if self.ivf is None:
                self.ivf = ivf_mod.build_ivf(
                    index.embeddings,
                    n_clusters=cfg.ann_clusters,
                    bucket_cap=cfg.ann_bucket_cap,
                    iters=cfg.ann_train_iters,
                    dtype=device_dtype,
                    quantize=quantize,
                    mesh=mesh,
                    cover=cfg.ann_cover,
                    slots_frac=cfg.ann_slots_frac,
                )
                if sidecar is not None:
                    try:
                        ivf_mod.save_ivf(sidecar, self.ivf,
                                         embeddings=index.embeddings)
                        ivf_mod.update_sidecar_meta(
                            sidecar, cover=cfg.ann_cover,
                            slots_frac=cfg.ann_slots_frac)
                        meta = ivf_mod.sidecar_meta(sidecar)
                    except OSError as e:  # read-only index dirs are fine
                        log.warning("ivf sidecar not saved: %s", e)
                        sidecar = None
            if cfg.ann_target_recall > 0:
                # measured recall/latency knob (faiss practice): reuse a
                # persisted tuning only when the index came FROM that
                # sidecar and the target matches; otherwise measure and
                # persist alongside the slot maps.
                import dataclasses

                tuned = (meta or {}).get("tuned")
                if not (loaded and tuned
                        and tuned.get("target") == cfg.ann_target_recall
                        and tuned.get("k") == cfg.top_k):
                    tuned = ivf_mod.tune_nprobe(
                        self.ivf, index.embeddings,
                        target_recall=cfg.ann_target_recall,
                        k=cfg.top_k, mesh=mesh)
                    if sidecar is not None:
                        try:
                            ivf_mod.update_sidecar_meta(sidecar,
                                                        tuned=tuned)
                        except OSError as e:
                            log.warning("tuned nprobe not saved: %s", e)
                self.config = dataclasses.replace(
                    self.config, ann_nprobe=int(tuned["nprobe"]))
                log.info("ann_target_recall %.3f -> nprobe %d "
                         "(measured recall %.4f)", cfg.ann_target_recall,
                         tuned["nprobe"], tuned["recall"])
            self.gallery = None
            return
        elif self.config.ann not in ("none", "", None):
            raise ValueError(f"unknown ann mode {self.config.ann!r}")
        if self.quantized and mesh is None:
            # chunked quantize-on-upload: peak HBM at init is the packed
            # gallery + one chunk, never the full bf16 gallery (ADVICE r3)
            self.gallery, self.gallery_scales = _quantize_gallery_chunked(
                index.embeddings, device_dtype, self.quantized)
            return
        emb = _to_device_chunked(index.embeddings, device_dtype)
        emb = l2_normalize(emb)  # idempotent if rows already normalized
        if self.quantized == "int4":
            from mmrs_tpu.parallel.quant4 import place_gallery_int4

            self.gallery, self.gallery_scales = place_gallery_int4(emb, mesh)
            return
        if self.quantized:
            from mmrs_tpu.parallel.topk import place_gallery_quantized

            self.gallery, self.gallery_scales = place_gallery_quantized(
                emb, mesh)
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
        if not self.quantized and self.gallery is not None:
            q = q.astype(self.gallery.dtype)
        with self.stats.timed("topk", count=q.shape[0]):
            if self.ivf is not None and self.mesh is not None:
                from mmrs_tpu.parallel.ivf import sharded_ivf_topk

                vals, idxs = sharded_ivf_topk(
                    q, self.ivf, k=k, nprobe=self.config.ann_nprobe,
                    mesh=self.mesh)
            elif self.ivf is not None:
                from mmrs_tpu.index.ivf import ivf_topk

                vals, idxs = ivf_topk(q, self.ivf, k=k,
                                      nprobe=self.config.ann_nprobe)
            elif self.quantized == "int4" and self.mesh is not None:
                from mmrs_tpu.parallel.quant4 import sharded_cosine_topk_int4

                vals, idxs = sharded_cosine_topk_int4(
                    q, self.gallery, self.gallery_scales, k, self.mesh,
                    n_valid=len(self.index))
            elif self.quantized == "int4":
                from mmrs_tpu.ops.quant4 import cosine_topk_int4

                vals, idxs = cosine_topk_int4(
                    q, self.gallery, self.gallery_scales, k)
            elif self.quantized and self.mesh is not None:
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
            hits: List[SearchHit] = []
            for j in range(idxs.shape[1]):
                r = int(idxs[qi, j])
                if r < 0:
                    # padded sentinel: k exceeded the live candidate rows
                    # (small nprobe/bucket_cap, tiny shards) — never
                    # surface paths[-1] as a fake hit (ADVICE r3)
                    continue
                hits.append(SearchHit(
                    path=self.index.paths[r],
                    score=float(vals[qi, j] * scale),
                    rank=len(hits),
                    cls=self.index.classes[r],
                ))
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

    def device_similarities(self, vectors: jnp.ndarray) -> jnp.ndarray:
        """UNscaled cosine rows [Q, N] computed against the DEVICE-resident
        gallery (bf16/int8/sharded) — no host f32 gallery copy, no [Q, N]
        host transfer. The calibration input at production scale: for a
        1M-row index each query row is 4 MB on device."""
        q = l2_normalize(jnp.asarray(vectors))
        n = len(self.index)
        if self.ivf is not None:
            raise RuntimeError(
                "device_similarities needs the flat gallery; calibrate "
                "with ann='none' (calibration is an offline build step)")
        if self.quantized == "int4":
            if self.mesh is not None:
                from mmrs_tpu.parallel.quant4 import sharded_similarities_int4

                sims = sharded_similarities_int4(
                    q, self.gallery, self.gallery_scales, self.mesh)
            else:
                from mmrs_tpu.ops.quant4 import similarities_int4

                sims = similarities_int4(q, self.gallery,
                                         self.gallery_scales)
            return sims[:, :n]
        if self.quantized:
            from mmrs_tpu.ops.quant import quantize_rows

            q_q, q_scale = quantize_rows(q.astype(jnp.float32))
            if self.mesh is not None:
                from mmrs_tpu.parallel.topk import (
                    sharded_similarities_quantized,
                )

                sims = sharded_similarities_quantized(
                    q_q, q_scale, self.gallery, self.gallery_scales,
                    self.mesh)
            else:
                acc = jax.lax.dot_general(
                    q_q, self.gallery, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                sims = (acc.astype(jnp.float32) * q_scale[:, None]
                        * self.gallery_scales[None, :])
        elif self.mesh is not None:
            from mmrs_tpu.parallel.topk import sharded_similarities

            sims = sharded_similarities(q.astype(self.gallery.dtype),
                                        self.gallery, self.mesh)
        else:
            sims = jax.lax.dot_general(
                q.astype(self.gallery.dtype), self.gallery,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        return sims[:, :n]

    def similarities(self, vectors: jnp.ndarray) -> np.ndarray:
        """Scaled similarity rows on host — convenience for small galleries
        and artifacts; built on device_similarities."""
        return (np.asarray(self.device_similarities(vectors), np.float32)
                * self.config.logit_scale)

    def sweep_class(
        self,
        vector: jnp.ndarray,          # [D] query/prototype
        positives: np.ndarray,        # [N] bool ground truth per gallery row
        thresholds: Optional[np.ndarray] = None,
        calib_config=None,
    ):
        """Threshold calibration against the whole gallery, streaming on
        device: sims stay device-resident ([N] floats), the sweep's
        (tp, fp, fn) reductions run there, and only the [T] count vectors
        come back to host. Replaces the old full-materialization
        similarities()+find_thresholds flow at production scale
        (code/search_image.py:58-103 semantics, VERDICT r1 Weak #4).
        Thresholds apply to SCALED sims (config.logit_scale), matching the
        reference's logit-scaled threshold tables."""
        from mmrs_tpu.config import CalibrationConfig
        from mmrs_tpu.search.calibrate import (_sweep_counts,
                                               grid_thresholds,
                                               result_from_counts)

        cfg = calib_config or CalibrationConfig()
        sims = self.device_similarities(jnp.asarray(vector)[None, :])[0]
        sims = sims.astype(jnp.float32) * self.config.logit_scale
        pos = jnp.asarray(np.asarray(positives, bool))
        if thresholds is None:
            # sims here are logit-SCALED, so the arange raw-cosine grid
            # must be scaled too (grid_thresholds docs)
            thresholds = grid_thresholds(cfg, float(jnp.min(sims)),
                                         float(jnp.max(sims)),
                                         scale=self.config.logit_scale)
        tp, fp, fn = _sweep_counts(sims, pos, jnp.asarray(thresholds))
        return result_from_counts(thresholds, tp, fp, fn)
