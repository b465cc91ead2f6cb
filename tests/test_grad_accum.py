"""Gradient accumulation (make_train_step(grad_accum=N))."""

import jax
import jax.numpy as jnp
import numpy as np

from mslesions3d_tpu.models import SSD3D, SSD3DConfig, model_priors
from mslesions3d_tpu.train import create_train_state, make_train_step


def _batch(B, size, n_obj=1, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": rng.normal(0, 1, (B, *size, 1)).astype(np.float32),
        "boxes": np.tile(np.asarray([[0.2, 0.2, 0.2, 0.5, 0.5, 0.5]],
                                    np.float32), (B, n_obj, 1)),
        "labels": np.ones((B, n_obj), np.int32),
        "box_mask": np.ones((B, n_obj), bool),
        "batch_mask": np.ones(B, bool),
    }


def test_grad_accum_matches_manual_micro_average_convnet():
    """Exact semantics on the BN-less convnet backbone: grad_accum=4 must
    equal the hand-rolled accumulation — four single-sample steps from the
    SAME state, gradients averaged, losses meaned. Dropout is disabled so
    the manual path is key-independent (per-micro-batch dropout keys are
    pinned by test_grad_accum_micro_batches_get_distinct_dropout); vs the
    FULL batch the result legitimately differs through dropout and BN,
    which is standard grad-accum semantics."""
    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(16, 16, 16),
        base_network_config="convnet_maxpool_double",
        aspect_ratios={4: [1.0], 6: [1.0]}, convnet_dropout=0.0,
        lr=1e-3, threshold=[0.1, 0.2], batch_size=4,
    )
    model = SSD3D(cfg)
    priors = model_priors(cfg)
    batch = _batch(4, (16, 16, 16))
    key = jax.random.PRNGKey(5)

    step1 = make_train_step(cfg, model, priors, donate=False,
                            return_grads=True)
    step4 = make_train_step(cfg, model, priors, donate=False,
                            return_grads=True, grad_accum=4)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))

    micro_grads, micro_losses = [], []
    for i in range(4):
        mb = {k: v[i:i + 1] for k, v in batch.items()}
        _, m = step1(state, mb, key)
        micro_grads.append(m["grads"])
        micro_losses.append(float(m["total_loss"]))
    manual = jax.tree_util.tree_map(
        lambda *gs: sum(np.asarray(g, np.float64) for g in gs) / 4.0,
        *micro_grads)

    _, m4 = step4(state, batch, key)
    np.testing.assert_allclose(float(m4["total_loss"]),
                               np.mean(micro_losses), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m4["grads"]),
                    jax.tree_util.tree_leaves(manual)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_grad_accum_mobilenet_smoke_and_detections():
    """BN model: losses finite, state advances, BN stats move, and the
    with_detections variant reassembles full-batch detections."""
    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(16, 16, 16),
        width_mult=0.25, lr=1e-3, threshold=[0.1, 0.2], batch_size=4,
    )
    model = SSD3D(cfg)
    priors = model_priors(cfg)
    step = make_train_step(cfg, model, priors, donate=False,
                           with_detections=True, grad_accum=2)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    stats_before = jax.tree_util.tree_leaves(state.batch_stats)[0].copy()
    batch = _batch(4, (16, 16, 16), seed=3)
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["total_loss"]))
    assert int(state.step) == 1
    assert m["detections"]["boxes"].shape[0] == 4
    stats_after = jax.tree_util.tree_leaves(state.batch_stats)[0]
    assert not np.allclose(np.asarray(stats_before), np.asarray(stats_after))


def test_grad_accum_indivisible_batch_raises():
    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(16, 16, 16),
        width_mult=0.25, threshold=[0.1, 0.2], batch_size=3,
    )
    model = SSD3D(cfg)
    priors = model_priors(cfg)
    step = make_train_step(cfg, model, priors, donate=False, grad_accum=2)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        step(state, _batch(3, (16, 16, 16)), jax.random.PRNGKey(0))


def test_grad_accum_cuts_step_memory():
    """The point of the feature: XLA per-device temp memory of the compiled
    step drops when activations are one micro-batch's worth."""
    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(32, 32, 32),
        width_mult=0.5, lr=1e-3, threshold=[0.1, 0.2], batch_size=8,
    )
    model = SSD3D(cfg)
    priors = model_priors(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    state_abs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    batch_abs = {
        "image": jax.ShapeDtypeStruct((8, 32, 32, 32, 1), np.float32),
        "boxes": jax.ShapeDtypeStruct((8, 1, 6), np.float32),
        "labels": jax.ShapeDtypeStruct((8, 1), np.int32),
        "box_mask": jax.ShapeDtypeStruct((8, 1), bool),
        "batch_mask": jax.ShapeDtypeStruct((8,), bool),
    }
    key = jax.ShapeDtypeStruct((2,), np.uint32)

    def temp_bytes(accum):
        step = make_train_step(cfg, model, priors, donate=False,
                               grad_accum=accum)
        ma = step.lower(state_abs, batch_abs, key).compile().memory_analysis()
        return getattr(ma, "temp_size_in_bytes", 0)

    assert temp_bytes(8) < 0.55 * temp_bytes(1)


def test_grad_accum_composes_with_spatial_mesh():
    """grad_accum under a depth-sharded batch: the micro-batch reshape of a
    sharded array reshard + the activation-constraint interceptor must
    still give the unsharded result (loss-level; single step)."""
    from mslesions3d_tpu.parallel.spatial import (
        make_mesh_2d, shard_batch_spatial,
    )

    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(16, 16, 16),
        width_mult=0.25, lr=1e-3, threshold=[0.1, 0.2], batch_size=4,
    )
    model = SSD3D(cfg)
    priors = model_priors(cfg)
    batch = _batch(4, (16, 16, 16), seed=8)
    key = jax.random.PRNGKey(2)
    mesh = make_mesh_2d(n_data=2, n_spatial=4)

    step_ref = make_train_step(cfg, model, priors, donate=False, grad_accum=2)
    state_ref = create_train_state(model, cfg, jax.random.PRNGKey(0))
    _, m_ref = step_ref(state_ref, batch, key)

    step_sh = make_train_step(cfg, model, priors, donate=False, grad_accum=2,
                              constraint_mesh=mesh)
    state_sh = create_train_state(model, cfg, jax.random.PRNGKey(0))
    _, m_sh = step_sh(state_sh, shard_batch_spatial(batch, mesh), key)

    np.testing.assert_allclose(float(m_sh["total_loss"]),
                               float(m_ref["total_loss"]), rtol=1e-5)
    assert np.isfinite(float(m_sh["grad_norm"]))
    np.testing.assert_allclose(float(m_sh["grad_norm"]),
                               float(m_ref["grad_norm"]), rtol=1e-3)


def test_grad_accum_micro_batches_get_distinct_dropout():
    """Each micro-batch must draw its own dropout mask (fold_in of the
    micro index): with a duplicated sample and grad_accum=2, shared keys
    would make the accumulated grads EXACTLY equal the single-sample
    step's grads (average of two identical micro grads); distinct keys
    make them differ."""
    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(16, 16, 16),
        base_network_config="convnet_maxpool_double",
        aspect_ratios={4: [1.0], 6: [1.0]}, convnet_dropout=0.5,
        lr=1e-3, threshold=[0.1, 0.2], batch_size=2,
    )
    model = SSD3D(cfg)
    priors = model_priors(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(5)

    one = _batch(1, (16, 16, 16), seed=4)
    dup = {k: np.concatenate([v, v], axis=0) for k, v in one.items()}

    step1 = make_train_step(cfg, model, priors, donate=False,
                            return_grads=True)
    step2 = make_train_step(cfg, model, priors, donate=False,
                            return_grads=True, grad_accum=2)
    _, m1 = step1(state, one, key)
    _, m2 = step2(state, dup, key)
    diffs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
             for a, b in zip(jax.tree_util.tree_leaves(m2["grads"]),
                             jax.tree_util.tree_leaves(m1["grads"]))]
    assert max(diffs) > 1e-4, (
        "accumulated grads identical to a single micro's grads: dropout "
        "masks are shared across micro-batches"
    )


def test_grad_accum_mining_is_per_micro_batch():
    """Pin the grad_accum x hard-negative-mining composition (round-3
    verdict #6): the 3:1 negative mining ratio is computed WITHIN each
    micro-batch. The composed step must equal the hand-rolled per-micro
    mining computation (single-sample mining steps from the same state,
    grads averaged) and must NOT equal the unaccumulated full-batch step,
    which mines negatives across the whole batch (the deliberate,
    documented semantic difference; train/steps.py grad_accum docstring)."""
    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(16, 16, 16),
        base_network_config="convnet_maxpool_double",
        aspect_ratios={4: [1.0], 6: [1.0]}, convnet_dropout=0.0,
        lr=1e-3, threshold=[0.1, 0.2], batch_size=4,
    )
    model = SSD3D(cfg)
    priors = model_priors(cfg)
    # uneven positives per sample so cross-batch mining differs from
    # per-micro mining: samples 0-1 have a real object, 2-3 are
    # background-only (mask False)
    batch = _batch(4, (16, 16, 16), seed=9)
    batch["box_mask"][2:] = False
    key = jax.random.PRNGKey(6)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))

    step1 = make_train_step(cfg, model, priors, donate=False,
                            return_grads=True, hard_negative_mining=True)
    step4 = make_train_step(cfg, model, priors, donate=False,
                            return_grads=True, hard_negative_mining=True,
                            grad_accum=4)

    micro_grads, micro_losses = [], []
    for i in range(4):
        mb = {k: v[i:i + 1] for k, v in batch.items()}
        _, m = step1(state, mb, key)
        micro_grads.append(m["grads"])
        micro_losses.append(float(m["total_loss"]))
    manual = jax.tree_util.tree_map(
        lambda *gs: sum(np.asarray(g, np.float64) for g in gs) / 4.0,
        *micro_grads)

    _, m4 = step4(state, batch, key)
    np.testing.assert_allclose(float(m4["total_loss"]),
                               np.mean(micro_losses), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m4["grads"]),
                    jax.tree_util.tree_leaves(manual)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    # and the full-batch mining step is a DIFFERENT function
    _, m_full = step1(state, batch, key)
    assert abs(float(m_full["total_loss"]) - float(m4["total_loss"])) > 1e-6
