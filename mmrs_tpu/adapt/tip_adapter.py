"""Tip-Adapter and Tip-Adapter-F few-shot classification over CLIP features.

Reference: code/main_custom.py:108-247 and code/utils.py:99-206.

Semantics reproduced:
  - cache model (utils.py `build_cache_model`): augment_epoch feature passes
    over the k-shot train set, MEAN over augmentation passes, L2-normalize
    -> cache keys; values are the one-hot labels.
  - training-free Tip-Adapter (main_custom.py:108-145):
        affinity     = feat @ keys.T
        cache_logits = exp(-beta * (1 - affinity)) @ values
        clip_logits  = 100 * feat @ clip_weights
        tip_logits   = clip_logits + alpha * cache_logits
  - Tip-Adapter-F (main_custom.py:148-247): the keys become a trainable
    linear layer initialized from the cache keys; AdamW + cosine LR; CE
    loss on tip logits; best checkpoint selected by macro-F1.
  - hyperparameter search (utils.py `search_hp`:159-206): grid over
    beta in (0, scale0], alpha in (0, scale1]; vectorized here via vmap
    instead of the reference's nested Python loops.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mmrs_tpu.ops.normalize import l2_normalize
from mmrs_tpu.search.metrics import macro_f1


def build_cache(
    aug_features: jnp.ndarray,    # [E, NK, D] one row per augment pass
    labels: jnp.ndarray,          # [NK] int
    num_classes: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (keys [NK, D] L2-normalized, values [NK, C] one-hot)."""
    mean_feats = jnp.mean(aug_features.astype(jnp.float32), axis=0)
    keys = l2_normalize(mean_feats)
    values = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    return keys, values


def build_cache_from_folder(
    image_encode_raw,             # pixels_u8 [B,S,S,3] -> RAW [B,D] feats
    shot_paths,                   # NK image paths (k per class)
    shot_labels,                  # NK int labels
    num_classes: int,
    augment_epoch: int = 10,
    image_size: int = 224,
    batch_size: int = 64,
    seed: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The build_cache_model driver (code/utils.py:99-132): augment_epoch
    tower passes over the k-shot images with RandomResizedCrop(0.5-1.0,
    bicubic) + HFlip, RAW features meaned over passes then L2-normalized
    into the cache keys. Returns (keys [NK,D], values [NK,C],
    aug_normalized [E,NK,D] — per-pass L2-normalized features for
    per-epoch adapter training)."""
    from mmrs_tpu.io.augment import augmented_epochs

    passes = []
    for views in augmented_epochs(shot_paths, augment_epoch,
                                  size=image_size, seed=seed):
        rows = np.concatenate([
            np.asarray(image_encode_raw(views[a:a + batch_size]),
                       np.float32)
            for a in range(0, len(views), batch_size)
        ])
        passes.append(rows)
    aug = jnp.asarray(np.stack(passes))                     # [E, NK, D] raw
    labels = jnp.asarray(np.asarray(shot_labels, np.int32))
    keys, values = build_cache(aug, labels, num_classes)
    return keys, values, l2_normalize(aug, axis=-1)


def tip_logits(
    feats: jnp.ndarray,           # [N, D] L2-normalized test features
    keys: jnp.ndarray,            # [NK, D]
    values: jnp.ndarray,          # [NK, C]
    clip_weights: jnp.ndarray,    # [D, C] normalized text classifier
    alpha: jnp.ndarray,
    beta: jnp.ndarray,
) -> jnp.ndarray:
    affinity = feats @ keys.T                                   # [N, NK]
    cache_logits = jnp.exp(-beta * (1.0 - affinity)) @ values   # [N, C]
    clip_logits = 100.0 * feats @ clip_weights                  # [N, C]
    return clip_logits + alpha * cache_logits


@functools.partial(jax.jit, static_argnames=("num_classes",))
def _grid_f1(
    feats, keys, values, clip_weights, labels,
    betas, alphas, num_classes: int,
):
    """F1 over the full (beta, alpha) grid in one vmapped computation."""
    affinity = feats @ keys.T
    clip_logits = 100.0 * feats @ clip_weights

    def f1_of(beta, alpha):
        cache = jnp.exp(-beta * (1.0 - affinity)) @ values
        preds = jnp.argmax(clip_logits + alpha * cache, axis=-1)
        # inline confusion-matrix macro F1 (jit-friendly)
        cm = jnp.zeros((num_classes, num_classes), jnp.float32).at[
            labels, preds
        ].add(1.0)
        tp = jnp.diag(cm)
        fp = jnp.sum(cm, 0) - tp
        fn = jnp.sum(cm, 1) - tp
        p = jnp.where(tp + fp > 0, tp / jnp.where(tp + fp > 0, tp + fp, 1), 0)
        r = jnp.where(tp + fn > 0, tp / jnp.where(tp + fn > 0, tp + fn, 1), 0)
        f1 = jnp.where(p + r > 0, 2 * p * r / jnp.where(p + r > 0, p + r, 1), 0)
        return jnp.mean(f1)

    return jax.vmap(lambda b: jax.vmap(lambda a: f1_of(b, a))(alphas))(betas)


@dataclass
class HPResult:
    beta: float
    alpha: float
    f1: float
    grid: np.ndarray   # [B, A] F1 surface


def search_hp(
    feats, keys, values, clip_weights, labels,
    num_classes: int,
    search_scale: Tuple[float, float] = (7.0, 3.0),
    search_step: Tuple[int, int] = (200, 20),
    mesh=None,
) -> HPResult:
    """Grid semantics of utils.py:159-206: beta_i = (i+1)*scale0/steps0.

    With `mesh`, the beta axis of the grid is sharded over the mesh's data
    axis (features/cache replicated — they are tiny next to the [B, A]
    sweep) and XLA partitions the vmap; each device evaluates its beta
    slice, no communication until the final gather of the F1 surface.
    """
    n_beta = search_step[0]
    betas = jnp.asarray(
        [(i + 1) * search_scale[0] / search_step[0] for i in range(n_beta)]
    )
    alphas = jnp.asarray(
        [(i + 1) * search_scale[1] / search_step[1] for i in range(search_step[1])]
    )
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mmrs_tpu.parallel.mesh import DATA_AXIS

        shards = mesh.shape[DATA_AXIS]
        pad = (-n_beta) % shards
        if pad:
            betas = jnp.concatenate([betas, jnp.full((pad,), betas[-1])])
        betas = jax.device_put(betas, NamedSharding(mesh, P(DATA_AXIS)))
        repl = NamedSharding(mesh, P())
        feats, keys, values, clip_weights = jax.device_put(
            (feats, keys, values, clip_weights), repl)
    grid = np.asarray(
        _grid_f1(feats, keys, values, clip_weights, jnp.asarray(labels),
                 betas, alphas, num_classes)
    )[:n_beta]
    bi, ai = np.unravel_index(np.argmax(grid), grid.shape)
    return HPResult(
        beta=float(betas[bi]), alpha=float(alphas[ai]),
        f1=float(grid[bi, ai]), grid=grid,
    )


@dataclass
class TipAdapterFResult:
    adapter_keys: np.ndarray     # trained keys [NK, D]
    best_f1: float
    best_epoch: int
    history: list                # per-epoch eval F1
    hp: Optional[HPResult] = None


def train_tip_adapter_f(
    train_feats: jnp.ndarray,     # [N, D] L2-normalized (no-grad encodes)
    train_labels: jnp.ndarray,    # [N]
    test_feats: jnp.ndarray,
    test_labels: jnp.ndarray,
    keys: jnp.ndarray,            # cache keys init [NK, D]
    values: jnp.ndarray,          # [NK, C]
    clip_weights: jnp.ndarray,    # [D, C]
    num_classes: int,
    lr: float = 1e-3,
    epochs: int = 20,
    batch_size: int = 256,
    alpha: float = 1.0,
    beta: float = 1.0,
    run_search_hp: bool = True,
    search_scale: Tuple[float, float] = (7.0, 3.0),
    search_step: Tuple[int, int] = (200, 20),
    seed: int = 0,
) -> TipAdapterFResult:
    """Tip-Adapter-F: train the adapter (the keys matrix as a linear layer)
    with AdamW + cosine-annealed LR; track best test F1 (main_custom.py
    saves/reloads the best adapter at :212-214).

    `train_feats` may be [N, D] (fixed features) or [E, N, D] — one
    augmented view set per pass, cycled across epochs, mirroring the
    reference's per-epoch augmented re-encode of the train loader
    (main_custom.py:166-189)."""
    train_feats = jnp.asarray(train_feats)
    per_epoch = None
    if train_feats.ndim == 3:
        per_epoch = train_feats
        train_feats = per_epoch[0]
    n = train_feats.shape[0]
    steps_per_epoch = max(1, (n + batch_size - 1) // batch_size)
    schedule = optax.cosine_decay_schedule(lr, epochs * steps_per_epoch)
    tx = optax.adamw(schedule, weight_decay=0.01)

    params = {"keys": jnp.asarray(keys, jnp.float32)}
    opt_state = tx.init(params)

    # values/clip_weights/test_feats travel as jit ARGUMENTS, not closure
    # captures (CLAUDE.md: captured arrays are baked into the compiled
    # graph as constants and blow the remote compiler's request limit)
    vals_j = jnp.asarray(values)
    cw_j = jnp.asarray(clip_weights)
    test_j = jnp.asarray(test_feats)

    @jax.jit
    def step(params, opt_state, feats, labels, vals, cw):
        def loss_fn(p):
            logits = tip_logits(feats, p["keys"], vals, cw, alpha, beta)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_preds(params, feats, vals, cw):
        logits = tip_logits(feats, params["keys"], vals, cw, alpha, beta)
        return jnp.argmax(logits, axis=-1)

    rng = np.random.default_rng(seed)
    best_f1, best_epoch = -1.0, -1
    best_keys = np.asarray(params["keys"])
    history = []
    for epoch in range(epochs):
        feats_e = (per_epoch[epoch % per_epoch.shape[0]]
                   if per_epoch is not None else train_feats)
        order = rng.permutation(n)
        for s in range(steps_per_epoch):
            idx = order[s * batch_size:(s + 1) * batch_size]
            params, opt_state, _ = step(
                params, opt_state, feats_e[idx], train_labels[idx],
                vals_j, cw_j
            )
        f1 = macro_f1(eval_preds(params, test_j, vals_j, cw_j),
                      test_labels, num_classes)
        history.append(f1)
        if f1 > best_f1:
            best_f1, best_epoch = f1, epoch
            best_keys = np.asarray(params["keys"])

    hp = None
    if run_search_hp:
        hp = search_hp(test_feats, jnp.asarray(best_keys), values,
                       clip_weights, test_labels, num_classes,
                       search_scale, search_step)
    return TipAdapterFResult(
        adapter_keys=best_keys, best_f1=best_f1, best_epoch=best_epoch,
        history=history, hp=hp,
    )


def clip_classifier(
    text_embeds_per_class: jnp.ndarray,   # [C, P, D] P prompt-template embeds
) -> jnp.ndarray:
    """Prompt-ensemble classifier weights (utils.py `clip_classifier`:79-96):
    mean over templates, L2-normalized, transposed to [D, C]."""
    mean = jnp.mean(l2_normalize(text_embeds_per_class.astype(jnp.float32),
                                 axis=-1), axis=1)
    return l2_normalize(mean, axis=-1).T
