"""Sliding-window inference tests: grid coverage + stitched pipeline validity."""

import numpy as np
import jax
import jax.numpy as jnp

from mslesions3d_tpu.models import SSD3D, SSD3DConfig
from mslesions3d_tpu.sliding_window import make_sliding_window_detector, patch_offsets


def test_patch_offsets_cover_volume():
    offs = patch_offsets((40, 40, 40), (16, 16, 16), overlap=0.25)
    # stride 12 -> starts [0, 12, 24] (+ clamp 24 == 40-16) per axis
    per_axis = sorted(set(offs[:, 0]))
    assert per_axis == [0, 12, 24]
    assert offs.shape == (27, 3)
    # full coverage: every voxel inside some patch
    covered = np.zeros(40, bool)
    for s in per_axis:
        covered[s : s + 16] = True
    assert covered.all()


def test_patch_offsets_clamped_tail():
    offs = patch_offsets((30, 30, 30), (16, 16, 16), overlap=0.5)
    per_axis = sorted(set(offs[:, 0]))
    assert per_axis[-1] == 14  # clamped to size - patch
    assert per_axis[0] == 0


def test_sliding_window_pipeline_runs():
    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(16, 16, 16),
        width_mult=0.25, min_score=0.05, top_k=20,
    )
    model = SSD3D(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 1)), train=False)

    detector = make_sliding_window_detector(
        cfg, volume_shape=(24, 24, 24), overlap=0.25, patch_batch=4,
    )
    assert detector.n_patches == 8  # starts [0, 8] per axis

    volume = jnp.asarray(np.random.default_rng(0).normal(size=(24, 24, 24, 1)), jnp.float32)
    det = detector(variables, volume)
    boxes = np.asarray(det["boxes"][0])
    count = int(det["count"][0])
    assert boxes.shape[0] == 20
    if count:
        valid = boxes[:count]
        assert valid.min() >= -1e-5 and valid.max() <= 1.0 + 1e-5
        assert (valid[:, 3:] >= valid[:, :3] - 1e-6).all()


def test_sliding_window_global_coordinates():
    """A detection in the far-corner patch must map beyond the first patch's extent."""
    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(16, 16, 16),
        width_mult=0.25, min_score=0.0, top_k=50,
    )
    model = SSD3D(cfg)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 16, 1)), train=False)
    detector = make_sliding_window_detector(
        cfg, volume_shape=(32, 32, 32), overlap=0.0, patch_batch=4, min_score=0.0,
    )
    volume = jnp.asarray(np.random.default_rng(1).normal(size=(32, 32, 32, 1)), jnp.float32)
    det = detector(variables, volume)
    count = int(det["count"][0])
    assert count > 0
    centers = np.asarray(det["boxes"][0][:count])
    mids = (centers[:, :3] + centers[:, 3:]) / 2
    # with min_score=0 every patch emits candidates; some must land in the
    # second half of the volume (global coords), not all inside patch 0
    assert (mids > 0.5).any()


def test_sliding_window_volume_batch_matches_single():
    """volume_batch=V on V stacked volumes == the single-volume detector per
    volume (throughput mode must not change results)."""
    config = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(32, 32, 32),
        width_mult=0.25, min_score=0.2, top_k=10,
    )
    model = SSD3D(config)
    rng = np.random.default_rng(3)
    vols = jnp.asarray(rng.normal(0, 1, (3, 48, 40, 48, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), vols[0][None, :32, :32, :32], train=False)

    single = make_sliding_window_detector(config, (48, 40, 48))
    batched = make_sliding_window_detector(config, (48, 40, 48), volume_batch=3)

    out_b = batched(variables, vols)
    for i in range(3):
        out_s = single(variables, vols[i])
        np.testing.assert_array_equal(
            np.asarray(out_b["count"])[i], np.asarray(out_s["count"])[0]
        )
        np.testing.assert_allclose(
            np.asarray(out_b["scores"])[i], np.asarray(out_s["scores"])[0],
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(out_b["boxes"])[i], np.asarray(out_s["boxes"])[0],
            rtol=1e-5, atol=1e-6,
        )


def test_sliding_window_mesh_matches_single_device():
    """mesh= shards patch batches over the 8-device data mesh (the
    multi-chip serving path); detections must equal the unsharded run."""
    from mslesions3d_tpu.parallel import make_mesh

    config = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(32, 32, 32),
        width_mult=0.25, min_score=0.2, top_k=10,
    )
    model = SSD3D(config)
    rng = np.random.default_rng(9)
    vol = jnp.asarray(rng.normal(0, 1, (48, 40, 48, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), vol[None, :32, :32, :32],
                           train=False)

    plain = make_sliding_window_detector(config, (48, 40, 48))
    sharded = make_sliding_window_detector(config, (48, 40, 48),
                                           mesh=make_mesh(8))
    out_p = plain(variables, vol)
    out_s = sharded(variables, vol)
    np.testing.assert_array_equal(np.asarray(out_s["count"]),
                                  np.asarray(out_p["count"]))
    np.testing.assert_allclose(np.asarray(out_s["scores"]),
                               np.asarray(out_p["scores"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_s["boxes"]),
                               np.asarray(out_p["boxes"]),
                               rtol=1e-5, atol=1e-6)
