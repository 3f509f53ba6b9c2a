"""Real-weight parity gate + bf16-vs-f32 rank-parity gate.

The reference records golden outputs that pin its exact behavior:

  - smoke probs [0.9927937, 0.00421068, 0.00299572] for CLIP.png vs
    ("a diagram", "a dog", "a cat")            (code/test_clip.py:18)
  - EN lychee threshold 27.6327 -> F1 0.9468   (clip_en.ipynb cell 76;
    reused at code/merge_dataset.py:395)
  - CN lychee threshold 10.3771 -> F1 1.00     (clip_cn.ipynb cell 18;
    code/merge_dataset.py:397)

`mmrs parity` drives this module: given a converted checkpoint it
reproduces the smoke probs, and given labeled folders it reproduces the
calibrated thresholds. The weights themselves cannot be downloaded in this
build environment, so the harness + documented procedure exist now and the
numbers get asserted the moment a checkpoint is dropped in.

The rank-parity half needs no weights at all: it checks that bf16 gallery
residency (the serving default) preserves the f32 top-k ranking on a
synthetic >=100k-row gallery — every disagreement must be a near-tie
within the bf16 rounding bound, and planted well-separated queries must
match exactly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import numpy as np

# code/test_clip.py:18 (printed expectation kept in the reference)
GOLDEN_SMOKE_PROBS = (0.9927937, 0.00421068, 0.00299572)
GOLDEN_SMOKE_TEXTS = ("a diagram", "a dog", "a cat")
# clip_en.ipynb cell 76 / merge_dataset.py:395 and clip_cn.ipynb cell 18 /
# merge_dataset.py:397
GOLDEN_EN_LYCHEE = {"threshold": 27.6327, "f1": 0.9468,
                    "precision": 0.959, "recall": 0.935}
GOLDEN_CN_LYCHEE = {"threshold": 10.3771, "f1": 1.00}

# one bf16 mantissa step at ~1.0; two rounded unit-norm inputs give score
# noise a small multiple of this
BF16_EPS = 2.0 ** -8


@dataclass
class SmokeResult:
    probs: np.ndarray              # [3]
    golden: Tuple[float, float, float]
    max_abs_diff: float
    ok: bool


def smoke_probs(towers, image_path: str,
                texts: Sequence[str] = GOLDEN_SMOKE_TEXTS,
                image_size: int = 224) -> np.ndarray:
    """The code/test_clip.py flow on our towers: one image, three captions,
    softmax of 100 * cosine logits."""
    import jax.numpy as jnp

    from mmrs_tpu.io.images import load_image
    from mmrs_tpu.models.clip import zeroshot_probs

    r = load_image(image_path, size=image_size)
    img = towers.image_encode(np.asarray(r.pixels)[None])
    txt = towers.text_encode(list(texts))
    probs = zeroshot_probs(jnp.asarray(img), jnp.asarray(txt))
    return np.asarray(probs, np.float32)[0]


def check_smoke(probs: np.ndarray, atol: float = 5e-3) -> SmokeResult:
    golden = np.asarray(GOLDEN_SMOKE_PROBS, np.float32)
    diff = float(np.max(np.abs(probs - golden)))
    return SmokeResult(probs=probs, golden=GOLDEN_SMOKE_PROBS,
                       max_abs_diff=diff, ok=diff <= atol)


def threshold_parity(result, golden: dict, thr_atol: float = 0.05,
                     f1_atol: float = 0.01) -> dict:
    """Compare a SweepResult against a recorded notebook threshold."""
    return {
        "best_threshold": result.best_threshold,
        "golden_threshold": golden["threshold"],
        "threshold_ok": abs(result.best_threshold - golden["threshold"])
        <= thr_atol,
        "best_f1": result.best_f1,
        "golden_f1": golden["f1"],
        "f1_ok": abs(result.best_f1 - golden["f1"]) <= f1_atol,
    }


# --------------------------------------------------------------------------
# bf16-vs-f32 rank parity (no weights needed)
# --------------------------------------------------------------------------

@dataclass
class RankParityReport:
    n: int
    queries: int
    k: int
    exact_queries: int             # queries whose top-k list matches exactly
    tie_flips: int                 # rank disagreements that are eps-ties
    violations: int                # disagreements beyond the tie tolerance
    max_tie_gap: float             # largest f32 score gap among flips
    planted_exact: Optional[bool]  # well-separated queries matched exactly
    ok: bool


def _topk_f32(queries: np.ndarray, gallery: np.ndarray, k: int):
    scores = queries @ gallery.T
    idx = np.argpartition(-scores, k - 1, axis=1)[:, :k]
    vals = np.take_along_axis(scores, idx, axis=1)
    order = np.argsort(-vals, axis=1, kind="stable")
    return np.take_along_axis(vals, order, 1), np.take_along_axis(idx, order, 1)


def rank_parity_report(
    n: int = 100_000,
    d: int = 512,
    queries: int = 16,
    k: int = 10,
    seed: int = 0,
    tie_tol: float = 4 * BF16_EPS,
    planted: int = 4,
    impl: str = "auto",
) -> RankParityReport:
    """Serving-dtype rank gate: top-k over the bf16 device gallery must
    equal the f32 oracle, except for flips between scores that the f32
    oracle itself calls a near-tie (gap < tie_tol — bf16 input rounding
    cannot preserve order below its own quantization noise). `planted`
    queries are given a clearly-separated true top-k (margin >> tie_tol),
    the realistic retrieval case; those must match EXACTLY."""
    import jax.numpy as jnp

    from mmrs_tpu.ops.topk import cosine_topk

    rng = np.random.default_rng(seed)
    gallery = rng.normal(size=(n, d)).astype(np.float32)
    gallery /= np.linalg.norm(gallery, axis=1, keepdims=True)
    qs = rng.normal(size=(queries, d)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)

    # plant well-separated neighborhoods for the first `planted` queries:
    # k rows at descending, well-spaced cosines to query i
    for i in range(min(planted, queries)):
        rows = rng.choice(n, size=k, replace=False)
        for j, r in enumerate(rows):
            target = 0.95 - 0.03 * j          # gaps 10x the tie tolerance
            orth = rng.normal(size=d).astype(np.float32)
            orth -= orth @ qs[i] * qs[i]
            orth /= np.linalg.norm(orth)
            gallery[r] = target * qs[i] + np.sqrt(1 - target ** 2) * orth

    v32, i32 = _topk_f32(qs, gallery, k)

    g16 = jnp.asarray(gallery, jnp.bfloat16)
    q16 = jnp.asarray(qs, jnp.bfloat16)
    _, i16 = cosine_topk(q16, g16, k=k, impl=impl)
    i16 = np.asarray(i16)

    scores32 = qs @ gallery.T
    exact = 0
    tie_flips = 0
    violations = 0
    max_gap = 0.0
    planted_exact = True
    for qi in range(queries):
        if np.array_equal(i16[qi], i32[qi]):
            exact += 1
            continue
        if qi < planted:
            planted_exact = False
        # every position disagreement must be a near-tie in f32 scores
        for pos in range(k):
            a, b = i16[qi, pos], i32[qi, pos]
            if a == b:
                continue
            gap = abs(scores32[qi, a] - scores32[qi, b])
            max_gap = max(max_gap, float(gap))
            if gap < tie_tol:
                tie_flips += 1
            else:
                violations += 1
    return RankParityReport(
        n=n, queries=queries, k=k, exact_queries=exact,
        tie_flips=tie_flips, violations=violations, max_tie_gap=max_gap,
        planted_exact=planted_exact if planted else None,
        ok=(violations == 0) and (planted_exact if planted else True),
    )
