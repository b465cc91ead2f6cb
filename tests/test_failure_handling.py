"""Failure-detection tests: non-finite losses skip the update, trainer aborts
after a streak (SURVEY.md §5 — replaces the reference's raise-and-die NaN guards)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mslesions3d_tpu.models import SSD3D, SSD3DConfig, model_priors
from mslesions3d_tpu.train import create_train_state, make_train_step


@pytest.fixture(scope="module")
def setup():
    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(16, 16, 16), width_mult=0.25,
    )
    model = SSD3D(cfg)
    priors = model_priors(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    return cfg, model, priors, state


def make_batch(value=0.0, batch=2):
    return {
        "image": np.full((batch, 16, 16, 16, 1), value, np.float32),
        "boxes": np.tile(np.asarray([0.2, 0.2, 0.2, 0.6, 0.6, 0.6], np.float32),
                          (batch, 1, 1)),
        "labels": np.ones((batch, 1), np.int32),
        "box_mask": np.ones((batch, 1), bool),
        "batch_mask": np.ones((batch,), bool),
    }


def test_nonfinite_step_skips_update(setup):
    cfg, model, priors, state = setup
    step = make_train_step(cfg, model, priors, donate=False)

    bad = make_batch(np.inf)
    new_state, m = step(state, bad, jax.random.PRNGKey(1))
    assert float(m["nonfinite"]) == 1.0
    # parameters unchanged, step still advances
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(new_state.step) == int(state.step) + 1


def test_finite_step_updates(setup):
    cfg, model, priors, state = setup
    step = make_train_step(cfg, model, priors, donate=False)
    new_state, m = step(state, make_batch(0.5), jax.random.PRNGKey(2))
    assert float(m["nonfinite"]) == 0.0
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(new_state.params))
    )
    assert changed


def test_nonfinite_streak_counts_and_resets(setup):
    """The streak counter lives on device in TrainState (no per-step host
    sync) and resets on the first finite step."""
    cfg, model, priors, state = setup
    step = make_train_step(cfg, model, priors, donate=False)

    state, m = step(state, make_batch(np.inf), jax.random.PRNGKey(1))
    assert int(m["nonfinite_streak"]) == 1
    state, m = step(state, make_batch(np.inf), jax.random.PRNGKey(2))
    assert int(m["nonfinite_streak"]) == 2
    assert int(state.nonfinite_streak) == 2
    state, m = step(state, make_batch(0.5), jax.random.PRNGKey(3))
    assert int(m["nonfinite_streak"]) == 0


def test_trainer_aborts_on_streak(tmp_path):
    """Trainer.fit raises once the on-device streak crosses the limit."""
    from mslesions3d_tpu.train import Trainer, TrainerConfig

    class NaNData:
        batch_size = 2
        def setup(self, stage=None):
            pass
        def train_batches(self, epoch=0, drop_partial=True):
            for _ in range(8):
                yield make_batch(np.inf)
        def val_batches(self):
            yield make_batch(0.5)

    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(16, 16, 16), width_mult=0.25,
    )
    tcfg = TrainerConfig(
        logdir=str(tmp_path), experiment_name="nan", max_epochs=2, max_steps=0,
        max_nonfinite_streak=4, log_every_n_steps=2, grad_hist_every_n_steps=0,
        early_stopping=False, verbose=False,
    )
    with pytest.raises(FloatingPointError, match="consecutive non-finite"):
        Trainer(tcfg).fit(cfg, NaNData())
