"""Device-side patch sampling (data/patches.py): geometry + training path."""

import jax
import jax.numpy as jnp
import numpy as np

from mslesions3d_tpu.data.patches import (
    boxes_to_patch,
    crop_patches,
    deterministic_patch_starts,
    sample_patch_starts,
)


def test_boxes_to_patch_geometry():
    """Remap + mask rules against hand-computed values."""
    vol = (32, 32, 32)
    patch = (16, 16, 16)
    starts = np.array([[8, 8, 8]], np.int32)
    boxes = np.array([[
        [10 / 32, 10 / 32, 10 / 32, 14 / 32, 14 / 32, 14 / 32],  # inside
        [0 / 32, 0 / 32, 0 / 32, 4 / 32, 4 / 32, 4 / 32],        # outside
        [6 / 32, 10 / 32, 10 / 32, 20 / 32, 14 / 32, 14 / 32],   # straddles
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],                          # padding
    ]], np.float32)
    mask = np.array([[True, True, True, False]])

    out, new_mask = jax.jit(
        lambda b, m: boxes_to_patch(b, m, jnp.asarray(starts), vol, patch)
    )(boxes, mask)
    out = np.asarray(out)
    new_mask = np.asarray(new_mask)

    assert new_mask.tolist() == [[True, False, True, False]]
    # inside box: (10-8)/16 .. (14-8)/16
    np.testing.assert_allclose(out[0, 0], [2 / 16] * 3 + [6 / 16] * 3, atol=1e-6)
    # straddling box: lo clipped to 0 on axis 0 (6-8 < 0), hi 12/16
    np.testing.assert_allclose(
        out[0, 2], [0, 2 / 16, 2 / 16, 12 / 16, 6 / 16, 6 / 16], atol=1e-6
    )
    # masked slots zeroed
    np.testing.assert_array_equal(out[0, 1], np.zeros(6))


def test_crop_patches_matches_numpy():
    rng = np.random.default_rng(0)
    vols = rng.normal(0, 1, (2, 24, 20, 24, 3)).astype(np.float32)
    starts = np.array([[4, 0, 8], [0, 4, 0]], np.int32)
    out = np.asarray(crop_patches(jnp.asarray(vols), jnp.asarray(starts),
                                  (16, 16, 16)))
    for i, (x, y, z) in enumerate(starts):
        np.testing.assert_array_equal(
            out[i], vols[i, x:x + 16, y:y + 16, z:z + 16]
        )


def test_sample_patch_starts_lesion_bias():
    """pos_fraction=1: every sampled patch contains its chosen box center."""
    vol = (48, 48, 48)
    patch = (16, 16, 16)
    B = 16
    rng = np.random.default_rng(1)
    centers = rng.uniform(0.15, 0.85, (B, 3)).astype(np.float32)
    half = 2 / 48
    boxes = np.concatenate([centers - half, centers + half], -1)[:, None, :]
    mask = np.ones((B, 1), bool)

    starts = np.asarray(sample_patch_starts(
        jax.random.PRNGKey(0), vol, patch, jnp.asarray(boxes),
        jnp.asarray(mask), pos_fraction=1.0,
    ))
    vox_centers = centers * 48
    assert ((vox_centers >= starts) & (vox_centers < starts + 16)).all()
    assert (starts >= 0).all() and (starts <= 48 - 16).all()


def test_sample_patch_starts_uniform_when_no_boxes():
    """No real boxes -> uniform sampling still in range, and varies."""
    starts = np.asarray(sample_patch_starts(
        jax.random.PRNGKey(3), (40, 40, 40), (16, 16, 16),
        jnp.zeros((8, 2, 6)), jnp.zeros((8, 2), bool), pos_fraction=1.0,
    ))
    assert (starts >= 0).all() and (starts <= 24).all()
    assert len(np.unique(starts[:, 0])) > 1


def test_deterministic_patch_starts():
    vol = (32, 32, 32)
    patch = (16, 16, 16)
    boxes = np.array([[[20 / 32, 20 / 32, 20 / 32, 28 / 32, 28 / 32, 28 / 32]]],
                     np.float32)
    mask = np.ones((1, 1), bool)
    starts = np.asarray(deterministic_patch_starts(vol, patch,
                                                   jnp.asarray(boxes),
                                                   jnp.asarray(mask)))
    # box center at voxel 24; centered start = 24 - 8 = 16, clipped to <= 16
    np.testing.assert_array_equal(starts, [[16, 16, 16]])
    # no boxes -> volume center
    starts0 = np.asarray(deterministic_patch_starts(
        vol, patch, jnp.zeros((1, 1, 6)), jnp.zeros((1, 1), bool)))
    np.testing.assert_array_equal(starts0, [[8, 8, 8]])


def test_patch_train_step_runs_and_learns_geometry():
    """make_train_step(patch_training=True) on full volumes: loss finite,
    and with pos_fraction=1 the remapped GT stays non-empty (the sampler
    keeps lesions in view)."""
    from mslesions3d_tpu.models import SSD3D, SSD3DConfig, model_priors
    from mslesions3d_tpu.train import create_train_state, make_train_step

    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(16, 16, 16),
        width_mult=0.25, lr=1e-3, threshold=[0.1, 0.2], batch_size=2,
    )
    model = SSD3D(cfg)
    priors = model_priors(cfg)
    step = make_train_step(cfg, model, priors, donate=False,
                           with_detections=True,
                           patch_training=True, patch_pos_fraction=1.0)

    rng = np.random.default_rng(4)
    boxes = np.array([[0.4, 0.4, 0.4, 0.6, 0.6, 0.6]], np.float32)
    batch = {
        "image": rng.normal(0, 1, (2, 32, 28, 32, 1)).astype(np.float32),
        "boxes": np.tile(boxes, (2, 1, 1)),
        "labels": np.ones((2, 1), np.int32),
        "box_mask": np.ones((2, 1), bool),
        "batch_mask": np.ones(2, bool),
    }
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    for i in range(3):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(m["total_loss"]))
        # lesion-biased sampling keeps the (only) GT box in every patch
        assert np.asarray(m["aug_box_mask"]).sum() == 2
    assert int(state.step) == 3


def test_trainer_patch_training_end_to_end(tmp_path, monkeypatch):
    """Trainer + CLI-config path: patch-train a tiny model on 24^3 volumes
    with 16^3 patches, checkpoints written, val metrics computed on the
    deterministic crop. 12 images -> 3 val volumes at batch 2, so the final
    val stack is PARTIAL: it must be padded onto the standing compiled
    sliding-window detector, not trigger a second multi-minute compile
    (round-3 advisor)."""
    import mslesions3d_tpu.sliding_window as sw_mod
    from mslesions3d_tpu.data.datasets import SyntheticDataModule
    from mslesions3d_tpu.data.generate import generate_dataset
    from mslesions3d_tpu.models import SSD3DConfig
    from mslesions3d_tpu.train.loop import Trainer, TrainerConfig

    builds = []
    real_make = sw_mod.make_sliding_window_detector

    def counting_make(*a, **kw):
        builds.append(kw.get("volume_batch", 1))
        return real_make(*a, **kw)

    monkeypatch.setattr(sw_mod, "make_sliding_window_detector", counting_make)

    root = generate_dataset(
        tmp_path / "data", num_images=12, n_classes=1, image_size=(24, 24, 24),
        object_size=(5, 8), num_objects=(1, 2), seed=5, subdir="ds",
    )
    dm = SyntheticDataModule(data_dir=root, n_classes=1, batch_size=2,
                             max_objects=8)
    dm.setup("fit")
    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(16, 16, 16),
        width_mult=0.25, lr=1e-3, threshold=[0.1, 0.2], batch_size=2,
    )
    tcfg = TrainerConfig(
        logdir=str(tmp_path / "logs"), experiment_name="patch", max_epochs=2,
        compute_metric_every_n_epochs=2, early_stopping=False, verbose=False,
        patch_training=True, patch_pos_fraction=0.8,
        grad_hist_every_n_steps=0,
    )
    state, result = Trainer(tcfg).fit(cfg, dm)
    assert int(state.step) > 0
    assert np.isfinite(result["history"][-1]["avg_val_loss"])
    assert (tmp_path / "logs" / "patch" / "checkpoints").exists()
    # metric epochs also score FULL-volume detections via the sliding window
    metric_epochs = [h for h in result["history"]
                     if "mAP/validation_full_IoU_0.1" in h]
    assert metric_epochs, "full-volume val mAP was never computed"
    assert np.isfinite(metric_epochs[-1]["mAP/validation_full_IoU_0.1"])
    # ONE detector build despite the partial (3 % 2) final val stack
    assert builds == [2], f"expected one batch-2 detector build, got {builds}"


def test_trainer_patch_training_data_parallel(tmp_path):
    """patch_training composes with --data_parallel (the sharded-cache
    gathered step inherits the crop: shard-local gather of FULL volumes,
    then on-device patch sampling inside the same program)."""
    from mslesions3d_tpu.data.datasets import SyntheticDataModule
    from mslesions3d_tpu.data.generate import generate_dataset
    from mslesions3d_tpu.models import SSD3DConfig
    from mslesions3d_tpu.train.loop import Trainer, TrainerConfig

    root = generate_dataset(
        tmp_path / "data", num_images=16, n_classes=1, image_size=(24, 24, 24),
        object_size=(5, 8), num_objects=(1, 2), seed=6, subdir="ds",
    )
    dm = SyntheticDataModule(data_dir=root, n_classes=1, batch_size=8,
                             max_objects=8)
    dm.setup("fit")
    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(16, 16, 16),
        width_mult=0.25, lr=1e-3, threshold=[0.1, 0.2], batch_size=8,
    )
    tcfg = TrainerConfig(
        logdir=str(tmp_path / "logs"), experiment_name="patch_dp",
        max_epochs=1, compute_metric_every_n_epochs=1,
        early_stopping=False, verbose=False, data_parallel=True,
        patch_training=True, grad_hist_every_n_steps=0,
    )
    state, result = Trainer(tcfg).fit(cfg, dm)
    assert int(state.step) > 0
    assert np.isfinite(result["history"][-1]["avg_val_loss"])
    # the STREAMING val branch computes the full-volume sliding-window mAP
    assert "mAP/validation_full_IoU_0.1" in result["history"][-1]
