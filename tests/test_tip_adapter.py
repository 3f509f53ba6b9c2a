"""Tip-Adapter(-F): cache semantics, logit formula oracle, training improves F1."""

import numpy as np
import pytest
import jax.numpy as jnp

from mmrs_tpu.adapt import tip_adapter as tip


def _synthetic_problem(seed=0, n_classes=4, d=32, shots=8, n_test=200):
    """Class-clustered unit features with noise; clip_weights slightly off
    so the cache model has something to add."""
    rng = np.random.default_rng(seed)
    protos = rng.normal(size=(n_classes, d))
    protos /= np.linalg.norm(protos, axis=1, keepdims=True)

    def sample(n_per, noise):
        feats, labels = [], []
        for c in range(n_classes):
            f = protos[c] + noise * rng.normal(size=(n_per, d))
            f /= np.linalg.norm(f, axis=1, keepdims=True)
            feats.append(f)
            labels += [c] * n_per
        return np.concatenate(feats).astype(np.float32), np.asarray(labels)

    train_f, train_y = sample(shots, 0.3)
    test_f, test_y = sample(n_test // n_classes, 0.3)
    # degraded text classifier: true prototype + big perturbation
    w = protos + 0.8 * rng.normal(size=protos.shape)
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    return train_f, train_y, test_f, test_y, w.T.astype(np.float32)


def test_build_cache_mean_over_augmentations():
    rng = np.random.default_rng(0)
    aug = rng.normal(size=(3, 6, 8)).astype(np.float32)
    labels = np.array([0, 0, 1, 1, 2, 2])
    keys, values = tip.build_cache(jnp.asarray(aug), jnp.asarray(labels), 3)
    mean = aug.mean(0)
    mean /= np.linalg.norm(mean, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(keys), mean, atol=1e-5)
    assert np.asarray(values).shape == (6, 3)
    assert (np.asarray(values).argmax(1) == labels).all()


def test_tip_logits_formula_oracle():
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(5, 8)).astype(np.float32)
    keys = rng.normal(size=(12, 8)).astype(np.float32)
    values = np.eye(3)[rng.integers(0, 3, 12)].astype(np.float32)
    w = rng.normal(size=(8, 3)).astype(np.float32)
    alpha, beta = 1.7, 2.3
    got = np.asarray(tip.tip_logits(
        jnp.asarray(feats), jnp.asarray(keys), jnp.asarray(values),
        jnp.asarray(w), alpha, beta,
    ))
    affinity = feats @ keys.T
    cache = np.exp(-beta * (1 - affinity)) @ values
    expected = 100.0 * feats @ w + alpha * cache
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-3)


def test_cache_improves_over_zeroshot_and_training_improves_more():
    train_f, train_y, test_f, test_y, w = _synthetic_problem()
    keys, values = tip.build_cache(
        jnp.asarray(train_f)[None], jnp.asarray(train_y), 4
    )
    from mmrs_tpu.search.metrics import macro_f1

    zs_preds = np.argmax(100.0 * test_f @ w, axis=1)
    zs_f1 = macro_f1(zs_preds, test_y, 4)

    tip_preds = np.asarray(jnp.argmax(tip.tip_logits(
        jnp.asarray(test_f), keys, values, jnp.asarray(w), 3.0, 5.0), axis=1))
    tip_f1 = macro_f1(tip_preds, test_y, 4)
    assert tip_f1 > zs_f1

    res = tip.train_tip_adapter_f(
        jnp.asarray(train_f), jnp.asarray(train_y),
        jnp.asarray(test_f), jnp.asarray(test_y),
        keys, values, jnp.asarray(w), num_classes=4,
        epochs=10, alpha=3.0, beta=5.0, run_search_hp=False,
    )
    assert res.best_f1 >= tip_f1 - 1e-6
    assert len(res.history) == 10


def test_search_hp_grid_shape_and_argmax():
    train_f, train_y, test_f, test_y, w = _synthetic_problem(seed=3)
    keys, values = tip.build_cache(
        jnp.asarray(train_f)[None], jnp.asarray(train_y), 4
    )
    hp = tip.search_hp(
        jnp.asarray(test_f), keys, values, jnp.asarray(w),
        test_y, num_classes=4, search_scale=(7.0, 3.0), search_step=(10, 5),
    )
    assert hp.grid.shape == (10, 5)
    assert hp.f1 == pytest.approx(hp.grid.max())
    assert 0 < hp.beta <= 7.0 and 0 < hp.alpha <= 3.0


def test_clip_classifier_prompt_ensemble():
    rng = np.random.default_rng(4)
    embeds = rng.normal(size=(3, 4, 16)).astype(np.float32)  # C,P,D
    w = np.asarray(tip.clip_classifier(jnp.asarray(embeds)))
    assert w.shape == (16, 3)
    np.testing.assert_allclose(np.linalg.norm(w, axis=0), 1.0, atol=1e-5)
