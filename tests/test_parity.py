"""Parity gate: bf16-vs-f32 rank gate + the real-weight harness plumbing."""

import json

import numpy as np
import pytest
import jax.numpy as jnp
from PIL import Image

from mmrs_tpu.eval import parity


@pytest.mark.slow
def test_rank_gate_passes_at_scale():
    """100k-row synthetic gallery: every bf16/f32 disagreement is an
    eps-tie, and planted well-separated queries match exactly (VERDICT r1
    Next #2's CI gate)."""
    r = parity.rank_parity_report(n=100_000, d=256, queries=12, k=10,
                                  planted=4, impl="xla")
    assert r.violations == 0
    assert r.planted_exact is True
    assert r.ok
    # sanity: the report actually inspected disagreements or matched all
    assert r.exact_queries + (1 if r.tie_flips else 0) >= 1


def test_rank_gate_detects_violations():
    """A gate that can't fail is not a gate: corrupting scores beyond the
    tie tolerance must be flagged. We simulate by shrinking tie_tol to 0 —
    any bf16-induced flip then counts as a violation."""
    r = parity.rank_parity_report(n=50_000, d=128, queries=16, k=10,
                                  planted=0, tie_tol=0.0, impl="xla")
    # at 50k random rows with d=128 some near-ties always flip under bf16
    assert r.tie_flips == 0  # tol 0 reclassifies everything
    assert r.violations > 0
    assert not r.ok


def test_smoke_probs_shape_and_golden_compare(tmp_path):
    from mmrs_tpu.config import Config
    from mmrs_tpu.models.tokenizer import CLIPTokenizer
    from mmrs_tpu.pipeline import build_towers

    cfg = Config()
    cfg.model.image_tower = "vit_tiny"
    cfg.model.dtype = "float32"
    towers = build_towers(
        cfg, tokenizer=CLIPTokenizer.synthetic(["diagram", "dog", "cat"]))

    img = tmp_path / "clip.png"
    Image.fromarray(np.full((64, 64, 3), 127, np.uint8)).save(img)
    probs = parity.smoke_probs(towers, str(img), image_size=towers.clip_config.vision.image_size)
    assert probs.shape == (3,)
    assert probs.sum() == pytest.approx(1.0, abs=1e-3)

    s = parity.check_smoke(probs)
    assert s.ok is False            # random weights can't hit the golden
    assert s.max_abs_diff > 0

    s2 = parity.check_smoke(np.asarray(parity.GOLDEN_SMOKE_PROBS))
    assert s2.ok is True and s2.max_abs_diff < 1e-6


def test_threshold_parity_logic():
    from mmrs_tpu.search.calibrate import find_thresholds

    rng = np.random.default_rng(0)
    pos = rng.normal(28.0, 0.2, 200).astype(np.float32)
    neg = rng.normal(20.0, 2.0, 400).astype(np.float32)
    res = find_thresholds(pos, neg)
    good = parity.threshold_parity(res, {"threshold": res.best_threshold,
                                         "f1": res.best_f1})
    assert good["threshold_ok"] and good["f1_ok"]
    bad = parity.threshold_parity(res, parity.GOLDEN_CN_LYCHEE)
    assert not bad["threshold_ok"]
    # the section carries the "ok" key the release gate aggregates on —
    # without it a failed headline threshold never failed the gate
    assert good["ok"] is True and bad["ok"] is False


def test_cli_parity_rank_gate(capsys):
    from mmrs_tpu.cli.main import main

    with pytest.raises(SystemExit) as e:
        main(["parity", "--rank-gate", "--rows", "20000", "--queries", "8"])
    assert e.value.code == 0
    out = json.loads(capsys.readouterr().out)
    assert out["ok"] is True
    assert out["rank_gate"]["violations"] == 0
