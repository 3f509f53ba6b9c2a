"""Weights-drop drill (VERDICT r5 #9): synthesize a FULL-SIZE (real dims)
release pack and run `mmrs parity --release` end-to-end once, so the real
weight drop is a data swap, not a debugging session.

Random weights cannot match the recorded goldens (the gate reports that
honestly, test_release.py:399-401); the drill asserts the MACHINERY at
real dims: the archive loads, configs derive to the published shapes, the
smoke probs compute, the int8 geometry gate passes on the real-size
tower, the tokenizer differential runs, and the threshold sweep produces
a calibration — and it records the wall time the real drop will cost.
"""

import os
import sys
import time

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))
from test_release import (module_from_flat, openai_flat_state,  # noqa: E402
                          write_bpe_gz)


# The published tower shapes (models/configs.py VIT_B32/VIT_L14 +
# their text pairs). The 7B llava-dims drill is chip-bound: 27 GB of f32
# host generation (13.5 GB took 15+ min on this box, CLAUDE.md) does not
# fit this environment; its LAYOUT is covered at small dims by
# test_release.py and the structural-load section of the gate.
DIMS = {
    "vit_b32": dict(width=768, patch=32, grid=7, layers=12, embed=512,
                    t_width=512, t_layers=12, vocab=49408, ctx=77),
    "vit_l14": dict(width=1024, patch=14, grid=16, layers=24, embed=768,
                    t_width=768, t_layers=12, vocab=49408, ctx=77),
}
MIN_PARAMS = {"vit_b32": 140_000_000, "vit_l14": 390_000_000}
WIDTH = {"vit_b32": 768, "vit_l14": 1024}


@pytest.mark.slow
@pytest.mark.parametrize("dims", ["vit_b32", "vit_l14"])
def test_weights_drop_drill_real_dims(tmp_path, dims):
    from PIL import Image

    from mmrs_tpu.eval.parity import release_gate

    pack = tmp_path / "pack"
    pack.mkdir()

    t0 = time.time()
    flat = openai_flat_state(seed=0, **DIMS[dims])
    n_params = sum(int(np.prod(v.shape)) for v in flat.values())
    m = torch.jit.script(module_from_flat(flat))
    torch.jit.save(m, str(pack / "ViT-B-32.pt"))
    synth_s = time.time() - t0

    write_bpe_gz(str(pack / "bpe_simple_vocab_16e6.txt.gz"))
    rng = np.random.default_rng(0)

    def _img(path, color):
        arr = np.clip(np.full((256, 320, 3), color, int)
                      + rng.integers(-25, 25, (256, 320, 3)), 0, 255)
        Image.fromarray(arr.astype(np.uint8)).save(path)

    smoke = str(tmp_path / "CLIP.png")
    _img(smoke, (128, 128, 128))
    pos_dir, neg_dir = str(tmp_path / "pos"), str(tmp_path / "neg")
    os.makedirs(pos_dir), os.makedirs(neg_dir)
    for i in range(4):
        _img(os.path.join(pos_dir, f"p{i}.jpg"), (200, 60, 80))
        _img(os.path.join(neg_dir, f"n{i}.jpg"), (60, 200, 80))

    t1 = time.time()
    rep = release_gate(str(pack), image=smoke, pos_dir=pos_dir,
                       neg_dir=neg_dir, prompt="a photo of lychee",
                       golden="en")
    gate_s = time.time() - t1

    # real-dims pack discovered and configs derived from the artifact
    assert rep["found_models"] == {"openai_clip": str(pack / "ViT-B-32.pt")}
    cfgrepr = rep["loaded"]["openai_clip"]["config"]
    assert (f"width={WIDTH[dims]}" in cfgrepr
            and f"embed_dim={DIMS[dims]['embed']}" in cfgrepr), cfgrepr
    assert n_params > MIN_PARAMS[dims]

    # every section ran (golden mismatches are honest at random weights)
    assert len(rep["smoke"]["probs"]) == 3
    assert abs(sum(rep["smoke"]["probs"]) - 1.0) < 1e-3
    assert rep["smoke"]["ok"] is False  # random weights != golden, reported
    assert rep["int8_tower"]["ok"], rep["int8_tower"]
    assert rep["int8_tower"]["min_cosine_vs_f32"] > 0.98
    bpe = rep["clip_bpe_differential"]
    assert bpe["ok"] and bpe["checked"] > 0, bpe
    thr = rep["threshold"]
    assert "best_threshold" in thr and np.isfinite(thr["best_threshold"])

    # the drill's deliverable: the timing of a real drop at real dims
    print(f"\nweights-drop drill ({dims} dims, {n_params/1e6:.0f}M "
          f"params): synth+archive {synth_s:.0f}s, "
          f"mmrs parity --release gate {gate_s:.0f}s", flush=True)
    assert gate_s < 3600
