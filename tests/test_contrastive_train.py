"""DP×TP contrastive train step + sharded orbax checkpoint/resume."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmrs_tpu.adapt.contrastive import make_train_step
from mmrs_tpu.config import MeshConfig
from mmrs_tpu.models.clip import CLIPConfig
from mmrs_tpu.models.configs import TextConfig, VITConfig
from mmrs_tpu.parallel.mesh import make_mesh

VCFG = VITConfig(image_size=32, patch_size=8, width=64, layers=2, heads=4,
                 embed_dim=32)
TCFG = TextConfig(vocab_size=128, context_length=12, width=64, layers=2,
                  heads=4, embed_dim=32)
CFG = CLIPConfig(vision=VCFG, text=TCFG)


def _batch(key, b):
    ki, kt = jax.random.split(key)
    images = jax.random.normal(ki, (b, 32, 32, 3), jnp.float32)
    tokens = jax.random.randint(kt, (b, 12), 1, 127)
    return images, tokens


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data_size=4, model_size=2),
                     jax.devices()[:8])


@pytest.mark.slow
def test_train_step_learns(mesh):
    """A few DP×TP steps on a fixed batch reduce the contrastive loss
    (the dryrun only checks one step is finite)."""
    train_step, init_state = make_train_step(CFG, mesh, learning_rate=1e-3,
                                             compute_dtype=jnp.float32)
    params, opt_state = init_state(jax.random.key(0))
    images, tokens = _batch(jax.random.key(1), 8)
    losses = []
    for _ in range(4):
        params, opt_state, loss = train_step(params, opt_state, images,
                                             tokens)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_sharded_orbax_checkpoint_resume(mesh, tmp_path):
    """Save the SHARDED train state with orbax mid-run, restore it, and
    continue: the resumed run's loss matches the uninterrupted one (the
    distributed checkpoint/resume story, SURVEY §5)."""
    from mmrs_tpu.models import checkpoint

    train_step, init_state = make_train_step(CFG, mesh, learning_rate=1e-3,
                                             compute_dtype=jnp.float32)
    params, opt_state = init_state(jax.random.key(2))
    images, tokens = _batch(jax.random.key(3), 8)

    # two uninterrupted steps = the oracle
    p1, o1, _ = train_step(params, opt_state, images, tokens)
    _, _, want = train_step(p1, o1, images, tokens)

    # one step, checkpoint the sharded state, restore, one more step
    p1b, o1b, _ = train_step(params, opt_state, images, tokens)
    d = str(tmp_path / "ckpt")
    state = {"params": p1b, "opt": o1b}
    checkpoint.save_orbax(state, d)
    back = checkpoint.load_orbax(d, state)
    # restored leaves keep their mesh shardings
    leaf = jax.tree.leaves(back["params"])[0]
    assert leaf.sharding == jax.tree.leaves(p1b)[0].sharding
    _, _, got = train_step(back["params"], back["opt"], images, tokens)
    assert float(got) == pytest.approx(float(want), rel=1e-6)
