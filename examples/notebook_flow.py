"""End-to-end notebook flow: clip_en.ipynb + clip_cn.ipynb + merge_dataset.py.

Drives the reference's recorded analysis pipeline on this framework, on a
synthetic color dataset with the tiny tower pair (random weights — the
golden numbers in BASELINE.md get asserted via `mmrs parity` the moment a
converted checkpoint is available; this script proves the FLOW end to end):

  1. EN 6-way zero-shot (5 positives + "others")      clip_en.ipynb cell 6
  2. EN binary X vs "not X"                           clip_en.ipynb / lab2
  3. EN F1-threshold calibration per class            clip_en.ipynb cell 75
  4. CN (Taiyi-pair) calibration                      clip_cn.ipynb cells 13-14
  5. merge_dataset __main__: binary class-merge, EN predict + CN predict,
     per-basename union, verifier filter over predicted positives
                                                      merge_dataset.py:394-444

Class similarity scores for calibration/union use few-shot image
prototypes (the search_image.py contract) so the flow is meaningful under
random weights; the zero-shot sections exercise the text towers.

    python examples/notebook_flow.py [--root DIR] [--n-per-class N]
"""

from __future__ import annotations

import argparse
import os
import tempfile

import numpy as np

CLASSES = ["lychee", "guitar", "baozi", "violin", "cherry"]
DISTRACTORS = ["pottery", "lynx"]
COLORS = {
    "lychee": (220, 40, 60), "guitar": (150, 100, 40),
    "baozi": (240, 230, 210), "violin": (120, 60, 20),
    "cherry": (200, 20, 90), "pottery": (170, 140, 110),
    "lynx": (130, 120, 100),
}


def make_dataset(root: str, n: int) -> None:
    from PIL import Image

    rng = np.random.default_rng(0)
    for cls in CLASSES + DISTRACTORS:
        os.makedirs(os.path.join(root, cls), exist_ok=True)
        for i in range(n):
            arr = np.clip(np.full((64, 64, 3), COLORS[cls], int)
                          + rng.integers(-30, 30, (64, 64, 3)), 0, 255)
            Image.fromarray(arr.astype(np.uint8)).save(
                os.path.join(root, cls, f"{cls}{i}.jpg"), quality=92)


def embed_folder(towers, root: str):
    from mmrs_tpu.io.dataset import FolderDataset

    ds = FolderDataset.from_root(root)
    feats, labels, paths = [], [], []
    for batch in ds.batches(32, drop_errors=True):
        e = towers.image_encode(batch.pixels)
        feats.append(e / np.linalg.norm(e, axis=1, keepdims=True))
        labels.extend(batch.labels)
        paths.extend(batch.paths)
    return np.concatenate(feats), labels, paths


def main(root: str | None = None, n_per_class: int = 10,
         tower: str = "vit_tiny") -> dict:
    import jax.numpy as jnp

    from mmrs_tpu.config import Config
    from mmrs_tpu.cascade.verifier import CallableVerifier
    from mmrs_tpu.eval.zeroshot import binary_zeroshot, multiclass_zeroshot
    from mmrs_tpu.govern.union_report import UnionSample, combined_metrics
    from mmrs_tpu.io.dataset import merge_class_map
    from mmrs_tpu.models.tokenizer import CLIPTokenizer
    from mmrs_tpu.pipeline import build_towers
    from mmrs_tpu.search.calibrate import find_thresholds
    from mmrs_tpu.search.metrics import prf1_from_counts

    tmp = None
    if root is None:
        tmp = tempfile.TemporaryDirectory()
        root = tmp.name
    if not os.path.isdir(os.path.join(root, CLASSES[0])):
        make_dataset(root, n_per_class)

    summary: dict = {}

    # --- towers: EN CLIP pair + CN Taiyi pair (tiny presets by default) ---
    en_cfg = Config()
    en_cfg.model.image_tower = tower
    # empty merge table = byte-level BPE; fine for a random-weight demo
    en = build_towers(en_cfg, tokenizer=CLIPTokenizer(merges=[]))
    cn_cfg = Config()
    cn_cfg.model.image_tower = tower
    cn_cfg.model.text_tower = "taiyi_roberta"
    cn = build_towers(cn_cfg)   # CN text tower unused: image prototypes

    feats, labels, paths = embed_folder(en, root)
    cn_feats, _, _ = embed_folder(cn, root)
    names = CLASSES + ["others"]
    label_idx = [names.index(c) if c in CLASSES else len(CLASSES)
                 for c in labels]

    # --- 1. EN 6-way zero-shot (clip_en.ipynb cell 6 / lab1) --------------
    prompts = [f"a photo of {c}" for c in CLASSES] + ["a photo of others"]
    text = np.array(en.text_encode(prompts))
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    mc = multiclass_zeroshot(feats, text, label_idx, names)
    summary["six_way_acc"] = round(mc.accuracy, 4)

    # --- 2. EN binary X vs not-X (lab2) -----------------------------------
    pos_t = {c: text[i] for i, c in enumerate(CLASSES)}
    neg = np.array(en.text_encode([f"a photo that is not {c}" for c in CLASSES]))
    neg /= np.linalg.norm(neg, axis=1, keepdims=True)
    neg_t = {c: neg[i] for i, c in enumerate(CLASSES)}
    by_target = {c: feats for c in CLASSES}
    lab = {c: [l == c for l in labels] for c in CLASSES}
    summary["binary_mean_f1"] = round(
        binary_zeroshot(by_target, pos_t, neg_t, lab).mean_f1, 4)

    # --- 3/4. calibration per class, EN and CN (image prototypes) --------
    def calibrate(fs):
        thr, f1 = {}, {}
        for c in CLASSES:
            mask = np.asarray([l == c for l in labels])
            proto = fs[mask][: 3].mean(axis=0)
            proto /= np.linalg.norm(proto)
            sims = 100.0 * fs @ proto
            res = find_thresholds(sims[mask], sims[~mask])
            thr[c], f1[c] = res.best_threshold, res.best_f1
        return thr, f1

    en_thr, en_f1 = calibrate(feats)
    cn_thr, cn_f1 = calibrate(cn_feats)
    summary["en_calibrated_f1"] = round(float(np.mean(list(en_f1.values()))), 4)
    summary["cn_calibrated_f1"] = round(float(np.mean(list(cn_f1.values()))), 4)

    # --- 5. merge_dataset flow: binary merge, union, verifier filter ------
    target = CLASSES[0]
    mapping = merge_class_map(CLASSES + DISTRACTORS, [], binary_positive=target)
    merged = [mapping[l] for l in labels]

    mask = np.asarray([m == target for m in merged])
    en_proto = feats[mask][:3].mean(axis=0); en_proto /= np.linalg.norm(en_proto)
    cn_proto = cn_feats[mask][:3].mean(axis=0); cn_proto /= np.linalg.norm(cn_proto)
    en_sims = 100.0 * feats @ en_proto
    cn_sims = 100.0 * cn_feats @ cn_proto
    samples = [UnionSample(path=p, basename=os.path.basename(p),
                           en_sim=float(es), cn_sim=float(cs),
                           is_positive=bool(m))
               for p, es, cs, m in zip(paths, en_sims, cn_sims, mask)]
    union = combined_metrics(samples, en_thr[target], cn_thr[target])
    en_only = combined_metrics(samples, en_thr[target], float("inf"))
    cn_only = combined_metrics(samples, float("inf"), cn_thr[target])
    summary["union_recall"] = round(union.recall, 4)
    assert union.recall >= max(en_only.recall, cn_only.recall) - 1e-9, \
        "union must not lose positives either tower found"

    # verifier filter over predicted positives (merge_dataset.py:442,
    # filter_preds :333-365): ground-truth oracle with 10% false "yes"
    rng = np.random.default_rng(1)
    truth = {os.path.basename(p): bool(m) for p, m in zip(paths, mask)}

    def oracle(image_path, category):
        yes = truth[os.path.basename(image_path)]
        if not yes and rng.random() < 0.10:
            yes = True
        return "Yes." if yes else "No."

    verifier = CallableVerifier(oracle)
    pred_pos = [s.basename for s in samples
                if s.en_sim >= en_thr[target] or s.cn_sim >= cn_thr[target]]
    kept = [b for b in pred_pos if verifier.verify(b, target)]
    tp = sum(truth[b] for b in kept)
    fp = len(kept) - tp
    fn = sum(truth.values()) - tp
    filt = prf1_from_counts(tp, fp, fn)
    summary["union_precision"] = round(union.precision, 4)
    summary["filtered_precision"] = round(filt.precision, 4)
    assert filt.precision >= union.precision - 1e-9, \
        "the verifier filter must not reduce precision"

    print("notebook flow summary:", summary)
    if tmp:
        tmp.cleanup()
    return summary


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root")
    ap.add_argument("--n-per-class", type=int, default=10)
    ap.add_argument("--tower", default="vit_tiny")
    args = ap.parse_args()
    main(args.root, args.n_per_class, args.tower)
