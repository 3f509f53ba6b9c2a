"""End-to-end few-shot Tip-Adapter(-F) from an image folder.

The glue the reference runs as `python code/main_custom.py --config cfg.yaml`
(code/main_custom.py:250-299): k-shot sample the train folder, build the
augmented cache model through the image tower, pre-encode test features,
build the prompt classifier from the text tower, train Tip-Adapter-F, and
grid-search (beta, alpha).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from mmrs_tpu.adapt import tip_adapter as tip
from mmrs_tpu.io.dataset import FolderDataset, few_shot_sample
from mmrs_tpu.ops.normalize import l2_normalize
from mmrs_tpu.utils.logging import get_logger

log = get_logger(__name__)

DEFAULT_TEMPLATE = "a photo of {}"   # code/utils.py:84 single-template case


@dataclass
class FewShotRun:
    classes: List[str]
    keys: np.ndarray
    values: np.ndarray
    result: tip.TipAdapterFResult
    zero_shot_f1: float
    tip_f1: float                 # training-free Tip-Adapter at init


def encode_folder(towers, samples: Sequence[Tuple[str, str]],
                  class_to_idx, batch_size: int = 64,
                  image_size: int = 224):
    """Center-crop encode of (path, class) samples -> (normalized feats,
    int labels); corrupt images quarantined."""
    ds = FolderDataset(list(samples), image_size=image_size)
    feats, labels = [], []
    for b in ds.batches(batch_size):
        f = towers.image_encode(b.pixels)
        for row, cls, ok in zip(f, b.labels, b.ok):
            if ok:
                feats.append(row)
                labels.append(class_to_idx[cls])
    return (np.asarray(feats, np.float32), np.asarray(labels, np.int32))


def run_few_shot(
    towers,
    root: str,
    shots: int = 4,
    augment_epoch: int = 5,
    template: str = DEFAULT_TEMPLATE,
    lr: float = 1e-3,
    epochs: int = 20,
    alpha: float = 1.0,
    beta: float = 1.0,
    run_search_hp: bool = True,
    batch_size: int = 64,
    seed: int = 0,
    image_size: Optional[int] = None,
) -> FewShotRun:
    """main_custom.py's flow end-to-end from a class-per-folder tree:
    train = k random shots per class, test = every remaining image."""
    size = image_size or towers.clip_config.vision.image_size
    ds = FolderDataset.from_root(root, image_size=size)
    classes = ds.classes
    class_to_idx = {c: i for i, c in enumerate(classes)}

    shot_samples = few_shot_sample(ds.samples, shots, seed=seed)
    shot_set = set(shot_samples)
    test_samples = [s for s in ds.samples if s not in shot_set]
    if not test_samples:      # tiny trees: evaluate on the shots themselves
        test_samples = shot_samples
    shot_paths = [p for p, _ in shot_samples]
    shot_labels = np.asarray([class_to_idx[c] for _, c in shot_samples],
                             np.int32)

    log.info("few-shot: %d classes, %d shots, %d test images",
             len(classes), len(shot_samples), len(test_samples))

    # cache model: augment_epoch tower passes (code/utils.py:99-132)
    keys, values, aug_norm = tip.build_cache_from_folder(
        towers.image_encode_raw, shot_paths, shot_labels, len(classes),
        augment_epoch=augment_epoch, image_size=size,
        batch_size=batch_size, seed=seed)

    test_feats, test_labels = encode_folder(
        towers, test_samples, class_to_idx, batch_size, size)
    test_feats_j = jnp.asarray(test_feats)
    test_labels_j = jnp.asarray(test_labels)

    # prompt classifier (code/utils.py:79-96, single template)
    if towers.text_encode is None:
        raise ValueError("few-shot driver needs a text tower / tokenizer "
                         "for the prompt classifier")
    txt = towers.text_encode([template.format(c) for c in classes])
    clip_weights = l2_normalize(jnp.asarray(txt), axis=-1).T    # [D, C]

    from mmrs_tpu.search.metrics import macro_f1

    zs_preds = np.argmax(test_feats @ np.asarray(clip_weights), axis=-1)
    zero_shot_f1 = macro_f1(zs_preds, test_labels, len(classes))

    import jax

    # one fused dispatch (eager per-op dispatch is slow on remote backends)
    tf_logits = jax.jit(tip.tip_logits)(
        test_feats_j, keys, values, clip_weights,
        jnp.float32(alpha), jnp.float32(beta))
    tip_f1 = macro_f1(np.argmax(np.asarray(tf_logits), -1), test_labels,
                      len(classes))

    result = tip.train_tip_adapter_f(
        aug_norm,                       # [E, NK, D]: per-epoch augmented
        jnp.asarray(shot_labels),
        test_feats_j, test_labels_j,
        keys, values, clip_weights,
        num_classes=len(classes),
        lr=lr, epochs=epochs, batch_size=batch_size,
        alpha=alpha, beta=beta, run_search_hp=run_search_hp, seed=seed)

    return FewShotRun(classes=classes, keys=np.asarray(keys),
                      values=np.asarray(values), result=result,
                      zero_shot_f1=zero_shot_f1, tip_f1=tip_f1)
