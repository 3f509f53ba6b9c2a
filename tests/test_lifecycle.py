"""One-command reference-workflow replication (VERDICT r3 #7).

The reference user ran ~27 scripts to go from a raw labeled tree to a
governed dataset; `mmrs lifecycle` produces every artifact family in one
run. This test builds a synthetic color tree (unique basenames, planted
duplicates + leaked files + negative pools), runs the lifecycle, and
asserts every artifact exists and the stages AGREE with each other
(union EN-pass == cascade gate-pass; journal rows == images; VQA pools
drawn from the right folders).
"""

import csv
import json
import os

import numpy as np
import pytest
from PIL import Image

CLASSES = {"lychee": (220, 40, 60), "guitar": (150, 100, 40),
           "baozi": (240, 230, 210)}


def _img(rng, color):
    arr = np.clip(np.full((48, 48, 3), color, int)
                  + rng.integers(-25, 25, (48, 48, 3)), 0, 255)
    return arr.astype(np.uint8)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("lifecycle_root")
    i = 0
    for cls, color in CLASSES.items():
        d = root / cls
        d.mkdir()
        for _ in range(8):
            Image.fromarray(_img(rng, color)).save(d / f"img{i:03d}.jpg")
            i += 1
    # planted exact duplicate (same pixels, different file)
    dup_src = root / "lychee" / "img000.jpg"
    Image.open(dup_src).save(root / "lychee" / "img_dup.jpg")
    # a PNG that the normalize report should flag (dry-run: not converted)
    Image.fromarray(_img(rng, CLASSES["guitar"])).save(
        root / "guitar" / "img_png.png")
    # VQA pools: easy negatives + per-class hard negatives
    ez = root / "ez_negative"
    ez.mkdir()
    for j in range(4):
        Image.fromarray(_img(rng, (30, 30, 30))).save(ez / f"ez{j}.jpg")
    hn = root / "lychee_negative"
    hn.mkdir()
    for j in range(3):
        Image.fromarray(_img(rng, (200, 60, 80))).save(hn / f"hn{j}.jpg")
    # held-out test tree with one leaked file
    test = tmp_path_factory.mktemp("lifecycle_test")
    (test / "lychee").mkdir()
    Image.open(dup_src).save(test / "lychee" / "held0.jpg")
    Image.fromarray(_img(rng, (90, 90, 200))).save(
        test / "lychee" / "held1.jpg")
    return str(root), str(test)


@pytest.mark.slow
def test_lifecycle_produces_all_artifact_families(tree, tmp_path):
    root, test_root = tree
    from mmrs_tpu.config import Config, ModelConfig
    from mmrs_tpu.lifecycle import run_lifecycle

    cfg = Config(model=ModelConfig(image_tower="vit_tiny",
                                   text_tower="clip_text_tiny",
                                   dtype="float32"))
    out = str(tmp_path / "artifacts")
    m = run_lifecycle(root, out, "lychee", cfg=cfg, shots=4,
                      test_root=test_root, dedup_tau=0.9999)

    # every artifact family the reference's scripts produce
    assert os.path.exists(os.path.join(out, "lifecycle.json"))
    assert os.path.exists(m["normalize"]["report"])
    assert os.path.exists(os.path.join(m["index"]["dir"], "manifest.json"))
    assert os.path.exists(m["calibrate"]["sweep_csv"])
    assert os.path.exists(os.path.join(out, "calibrate",
                                       "calibration.json"))
    assert m["union"]["audit_csv"] and os.path.exists(m["union"]["audit_csv"])
    assert os.path.exists(m["cascade"]["journal"])
    assert os.path.exists(m["cascade"]["audit_csv"])
    assert os.path.exists(m["dedup"]["report"])
    assert os.path.exists(m["leakage"]["report"])
    for f in ("dataset_pos.json", "dataset_pos_cross.json",
              "dataset_pos_cross_simple.json",
              "dataset_pos_cross_simple_hard.json"):
        assert os.path.exists(os.path.join(m["vqa"]["dir"], f)), f

    # the planted artifacts are found by the right stages
    assert m["normalize"]["would_convert"] == 1          # the .png
    assert m["index"]["rows"] >= 25                      # jpgs + png + dup
    dup_pairs = json.load(open(m["dedup"]["report"]))["duplicates"]
    assert any("img_dup" in d or "img_dup" in k for d, k in dup_pairs)
    leaked = json.load(open(m["leakage"]["report"]))["leaked"]
    assert any("img000" in d or "img_dup" in d for d, _ in leaked)

    # cross-stage agreement: same tower + prototype + threshold
    assert m["cross_checks"]["union_en_pass_eq_cascade_gate"], m
    assert m["cross_checks"]["calibration_rows_eq_index_rows"], m
    # a color-separable positive class calibrates to a usable gate
    assert m["calibrate"]["best_f1"] > 0.6
    assert 0 < m["cascade"]["gate_passed"] < m["cascade"]["images"]

    # journal has one finalized row per image (crash-resume contract)
    with open(m["cascade"]["journal"]) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == m["cascade"]["images"]

    # the lab3-style sweep CSV is a full curve, not a summary line
    with open(m["calibrate"]["sweep_csv"]) as f:
        sweep_rows = list(csv.DictReader(f))
    assert len(sweep_rows) >= 100
    assert set(sweep_rows[0]) == {"threshold", "precision", "recall", "f1"}

    # VQA v4 pools drew from the planted folders
    assert m["vqa"]["positives"] > 0
    with open(os.path.join(m["vqa"]["dir"],
                           "dataset_pos_cross_simple_hard.json")) as f:
        recs = json.load(f)  # the reference's LLaVA-format JSON array
    assert any("ez_negative" in r["image"] for r in recs)
    assert any("lychee_negative" in r["image"] for r in recs)


def test_cli_lifecycle_flags_parse():
    from mmrs_tpu.cli.main import build_parser

    a = build_parser().parse_args(
        ["lifecycle", "--root", "r", "--out", "o",
         "--positive-class", "lychee", "--shots", "3",
         "--test-root", "t", "--dedup-tau", "0.98"])
    assert a.positive_class == "lychee" and a.shots == 3
    assert a.test_root == "t" and a.dedup_tau == 0.98
