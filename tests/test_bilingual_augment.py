"""Bilingual union driver + augmentation pipeline."""

import os
import random

import numpy as np
import pytest
from PIL import Image

from mmrs_tpu.govern.bilingual import bilingual_union
from mmrs_tpu.io.augment import augment_image, augmented_epochs, random_resized_crop_params


@pytest.fixture(scope="module")
def color_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("bi")
    rng = np.random.default_rng(0)
    for cls, color in [("lychee", (250, 30, 30)), ("other", (30, 30, 250))]:
        d = root / cls
        d.mkdir()
        for i in range(5):
            arr = np.clip(np.full((40, 40, 3), color, int)
                          + rng.integers(0, 25, (40, 40, 3)), 0, 255)
            Image.fromarray(arr.astype(np.uint8)).save(d / f"{cls}{i}.jpg")
    return str(root)


def _mean_color_encoder(pixels_u8):
    x = pixels_u8.astype(np.float32) / 255.0
    f = x.mean(axis=(1, 2))
    f = np.concatenate([f, 0.05 * np.ones((len(f), 3), np.float32)], 1)
    return f / np.linalg.norm(f, axis=1, keepdims=True)


def test_bilingual_union_end_to_end(color_tree, tmp_path):
    red = np.array([1.0, 0.05, 0.05, 0.0, 0.0, 0.0], np.float32)
    res = bilingual_union(
        color_tree, "lychee",
        en_encode=_mean_color_encoder, en_text_embed=red,
        cn_encode=_mean_color_encoder, cn_text_embed=red,
        out_root=str(tmp_path / "union"),
        image_size=32, batch_size=4,
    )
    assert res.en_best_f1 == pytest.approx(1.0)
    assert res.report is not None
    assert res.report.union_pass == 5
    assert res.report.metrics.f1 == pytest.approx(1.0)
    copied = os.listdir(tmp_path / "union" / "lychee")
    assert "_file_details.csv" in copied and len(copied) == 6


def test_rrc_params_within_bounds():
    rng = random.Random(0)
    for _ in range(50):
        top, left, h, w = random_resized_crop_params(100, 80, rng)
        assert 0 <= top <= 80 - h and 0 <= left <= 100 - w
        assert 0.5 * 0.9 <= (h * w) / (100 * 80) <= 1.01
        assert 3 / 4 - 0.08 <= w / h <= 4 / 3 + 0.08


def test_augment_image_shape_and_variation():
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (60, 90, 3), np.uint8))
    a = augment_image(img, 32, random.Random(1))
    b = augment_image(img, 32, random.Random(2))
    assert a.shape == (32, 32, 3) and a.dtype == np.uint8
    assert not np.array_equal(a, b)


def test_augmented_epochs_deterministic(tmp_path):
    p = tmp_path / "x.jpg"
    Image.fromarray(
        np.random.default_rng(1).integers(0, 255, (50, 50, 3), np.uint8)
    ).save(p)
    e1 = list(augmented_epochs([str(p)], epochs=2, size=32, seed=7))
    e2 = list(augmented_epochs([str(p)], epochs=2, size=32, seed=7))
    assert len(e1) == 2 and e1[0].shape == (1, 32, 32, 3)
    np.testing.assert_array_equal(e1[0], e2[0])
    assert not np.array_equal(e1[0], e1[1])  # different views per epoch


@pytest.mark.slow
def test_hf_resize_matches_transformers_processor():
    """hf_resize_center_crop (the Chinese tower's stack) is an alias of
    resize_center_crop — differentially verified byte-identical to the
    REAL transformers CLIPImageProcessor across aspect ratios."""
    transformers = pytest.importorskip("transformers")
    from mmrs_tpu.ops.preprocess import (hf_resize_center_crop,
                                         resize_center_crop)

    proc = transformers.CLIPImageProcessor(
        size={"shortest_edge": 224},
        crop_size={"height": 224, "width": 224},
        do_normalize=False, do_rescale=False)
    rng = np.random.default_rng(0)
    for shape in [(300, 200), (13, 700), (225, 224), (101, 303)]:
        arr = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        img = Image.fromarray(arr)
        hf = np.asarray(proc(img, return_tensors="np")["pixel_values"]
                        )[0].transpose(1, 2, 0).astype(np.uint8)
        ours = hf_resize_center_crop(img, 224)
        np.testing.assert_array_equal(ours, hf)
        np.testing.assert_array_equal(ours, resize_center_crop(img, 224))
