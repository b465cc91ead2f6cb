"""Data pipeline tests: NIfTI I/O, synthetic generator, seg<->boxes, transforms,
datamodule batching, and device-side augmentation geometry."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mslesions3d_tpu.data import (
    SyntheticDataModule,
    boxes_from_segmentation,
    generate_dataset,
    load_nifti,
    pad_objects,
    save_nifti,
    segmentation_from_boxes,
)
from mslesions3d_tpu.data.augment import AugmentConfig, augment_sample
from mslesions3d_tpu.data.transforms import (
    t_crop_foreground,
    t_normalize_intensity,
    t_resize_with_pad_or_crop,
    t_spacing,
)


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(17, 23, 9)).astype(np.float32)
    affine = np.diag([1.0, 2.0, 3.0, 1.0])
    affine[:3, 3] = (-5, 4, 7)
    path = tmp_path / "x.nii.gz"
    save_nifti(path, data, affine)
    img = load_nifti(path)
    np.testing.assert_allclose(img.data, data, rtol=1e-6)
    np.testing.assert_allclose(img.affine, affine, rtol=1e-6)
    np.testing.assert_allclose(img.pixdim, (1, 2, 3), rtol=1e-5)


def test_nifti_uncompressed_and_dtypes(tmp_path):
    data = (np.arange(60).reshape(3, 4, 5) % 7).astype(np.int16)
    path = tmp_path / "y.nii"
    save_nifti(path, data)
    img = load_nifti(path)
    assert img.data.dtype == np.int16
    np.testing.assert_array_equal(img.data, data)


def test_boxes_from_segmentation_classes_mode():
    seg = np.zeros((32, 32, 32), np.float32)
    seg[4:10, 4:10, 4:10] = 1  # class-1 cube
    seg[20:26, 18:28, 12:20] = 2  # class-2 block
    boxes, labels = boxes_from_segmentation(seg, "classes", n_classes=2)
    assert boxes.shape == (2, 6)
    np.testing.assert_array_equal(sorted(labels), [1, 2])
    # inclusive max index normalization (utils.py:500)
    cube = boxes[labels == 1][0]
    np.testing.assert_allclose(cube * 32, [4, 4, 4, 9, 9, 9], atol=1e-5)


def test_boxes_from_segmentation_binary_merges_touching():
    seg = np.zeros((24, 24, 24), np.float32)
    seg[2:6, 2:6, 2:6] = 1
    seg[5:9, 2:6, 2:6] = 1  # touches the first cube -> one component
    seg[15:19, 15:19, 15:19] = 1
    boxes, labels = boxes_from_segmentation(seg, "binary")
    assert boxes.shape[0] == 2
    assert set(labels) == {1}


def test_boxes_from_segmentation_instances_thresholds():
    seg = np.zeros((16, 16, 16), np.float32)
    seg[1:4, 1:4, 1:4] = 1001
    seg[8:12, 8:12, 8:12] = 2001
    boxes, labels = boxes_from_segmentation(
        seg, "instances", thresholds=[(1000, 2000), (2000, np.inf)]
    )
    np.testing.assert_array_equal(sorted(labels), [1, 2])


def test_zero_volume_boxes_dropped():
    seg = np.zeros((16, 16, 16), np.float32)
    seg[5, 5, 5] = 1  # single voxel -> inclusive box has zero volume
    seg[8:12, 8:12, 8:12] = 1
    boxes, labels = boxes_from_segmentation(seg, "binary")
    assert boxes.shape[0] == 1


def test_seg_boxes_roundtrip():
    """Paint wireframes from boxes, re-derive boxes, recover the originals."""
    shape = (32, 32, 32)
    boxes = np.array(
        [[4, 4, 4, 12, 12, 12], [18, 20, 16, 28, 30, 26]], np.float32
    ) / np.asarray(shape * 2, np.float32)
    labels = np.array([1, 1])
    instances, class_map = segmentation_from_boxes(boxes, labels, shape)
    assert set(np.unique(instances)) == {0.0, 1.0, 2.0}
    rederived, relabels = boxes_from_segmentation(instances, "binary")
    np.testing.assert_allclose(np.sort(rederived, 0), np.sort(boxes, 0), atol=1e-5)


def test_generator_and_datamodule(tmp_path):
    root = generate_dataset(
        tmp_path, num_images=6, n_classes=1, image_size=(24, 24, 24),
        object_size=(6, 10), num_objects=(1, 3), seed=0, subdir="ds",
    )
    dm = SyntheticDataModule(data_dir=root, n_classes=1, batch_size=2, max_objects=8)
    assert len(dm.subjects_list) == 6
    dm.setup("fit")
    assert len(dm.trainsubs) == 4 and len(dm.testsubs) == 2

    batch = next(dm.train_batches(epoch=0))
    assert batch["image"].shape == (2, 24, 24, 24, 1)
    assert batch["boxes"].shape == (2, 8, 6)
    assert batch["box_mask"].shape == (2, 8)
    assert batch["batch_mask"].all()
    assert batch["box_mask"].sum() >= 2  # every image has >= 1 object
    # normalized intensity: nonzero voxels ~zero-mean
    img = batch["image"][0, ..., 0]
    assert abs(img[img != 0].mean()) < 0.2

    # partial final batch is padded + masked
    batches = list(dm.val_batches())
    assert batches[-1]["batch_mask"].sum() == 2

    # determinism of the generator
    root2 = generate_dataset(
        tmp_path / "again", num_images=1, n_classes=1, image_size=(24, 24, 24),
        object_size=(6, 10), num_objects=(1, 3), seed=0, subdir="ds",
    )
    a = load_nifti(root / "images" / "sub-0000_image.nii.gz").data
    b = load_nifti(root2 / "images" / "sub-0000_image.nii.gz").data
    np.testing.assert_array_equal(a, b)


def test_generator_two_classes(tmp_path):
    root = generate_dataset(
        tmp_path, num_images=4, n_classes=2, image_size=(32, 32, 32),
        object_size=(10, 16), num_objects=(2, 4), object_width=3, seed=1,
        subdir="ds2",
    )
    seg = load_nifti(root / "labels" / "sub-0001_seg.nii.gz").data
    assert set(np.unique(seg)).issubset({0.0, 1.0, 2.0})
    boxes, labels = boxes_from_segmentation(seg, "classes", n_classes=2)
    assert boxes.shape[0] >= 1


def test_pad_objects_truncates_with_warning():
    boxes = np.zeros((5, 6), np.float32)
    labels = np.ones(5, np.int64)
    with pytest.warns(UserWarning):
        b, l, m = pad_objects(boxes, labels, 3)
    assert b.shape == (3, 6) and m.all()


def test_transforms():
    img = np.zeros((20, 20, 20), np.float32)
    img[5:15, 5:15, 5:15] = np.random.default_rng(0).uniform(1, 3, (10, 10, 10))
    s = {"img": img.copy(), "seg": (img > 0).astype(np.float32)}

    s = t_crop_foreground(s, margin=2)
    assert s["img"].shape == (14, 14, 14)

    before_nonzero = s["img"] != 0
    s = t_normalize_intensity(s, nonzero=True)
    assert abs(s["img"][before_nonzero].mean()) < 1e-4

    s = t_resize_with_pad_or_crop(s, (16, 12, 16))
    assert s["img"].shape == (16, 12, 16)
    assert s["seg"].shape == (16, 12, 16)

    s2 = {"img": img.copy(), "seg": (img > 0).astype(np.float32), "pixdim": (2.0, 1.0, 1.0)}
    s2 = t_spacing(s2, (1.0, 1.0, 1.0))
    assert s2["img"].shape == (40, 20, 20)
    assert set(np.unique(s2["seg"])).issubset({0.0, 1.0})


def test_orientation_permutes_pixdim():
    """Orientation with an axis permutation must carry per-axis spacing along.

    Regression (round-1 advisor finding): a sagittal-style acquisition whose
    LPI reorientation swaps axes 0 and 2, with anisotropic spacing (3,1,1) —
    resampling to 1mm must yield (30,20,30), not zoom the wrong axes.
    """
    from mslesions3d_tpu.data.transforms import t_orientation

    img = np.random.default_rng(0).normal(size=(10, 20, 30)).astype(np.float32)
    # disk axis 0 runs along anatomical z, axis 2 along anatomical x:
    # LPI orientation permutes axes (2, 1, 0)
    affine = np.zeros((4, 4))
    affine[2, 0] = -3.0  # axis 0: anatomical I, spacing 3mm
    affine[1, 1] = -1.0  # axis 1: anatomical P, spacing 1mm
    affine[0, 2] = -1.0  # axis 2: anatomical L, spacing 1mm
    affine[3, 3] = 1.0

    s = {"img": img, "seg": (img > 0).astype(np.float32),
         "affine": affine, "pixdim": (3.0, 1.0, 1.0)}
    s = t_orientation(s, axcodes="LPI")
    assert s["img"].shape == (30, 20, 10)
    assert s["pixdim"] == (1.0, 1.0, 3.0)
    s = t_spacing(s, (1.0, 1.0, 1.0))
    assert s["img"].shape == (30, 20, 30)


def _boxes_close(a, b, tol=0.6 / 32):
    return np.allclose(np.sort(a, 0), np.sort(b, 0), atol=tol)


def test_augment_flip_geometry():
    """Flipping the image and the boxes stays consistent with re-derivation."""
    shape = (32, 32, 32)
    boxes = np.array([[4, 6, 8, 12, 16, 20]], np.float32) / np.asarray(shape * 2, np.float32)
    seg, _ = segmentation_from_boxes(boxes, [1], shape)

    cfg = AugmentConfig(flip_axes=(0, 1, 2), flip_prob=1.0)
    img_aug, boxes_aug = augment_sample(
        jax.random.PRNGKey(0), jnp.asarray(seg[..., None]), jnp.asarray(boxes), cfg
    )
    rederived, _ = boxes_from_segmentation(np.asarray(img_aug)[..., 0] > 0, "binary")
    assert _boxes_close(np.asarray(boxes_aug), rederived)


def test_augment_rot90_geometry():
    shape = (32, 32, 32)
    boxes = np.array([[4, 6, 8, 12, 16, 20]], np.float32) / np.asarray(shape * 2, np.float32)
    seg, _ = segmentation_from_boxes(boxes, [1], shape)

    for plane in [(1, 2), (0, 1), (0, 2)]:
        cfg = AugmentConfig(rot90_planes=(plane,), rot90_prob=1.0)
        img_aug, boxes_aug = augment_sample(
            jax.random.PRNGKey(1), jnp.asarray(seg[..., None]), jnp.asarray(boxes), cfg
        )
        rederived, _ = boxes_from_segmentation(np.asarray(img_aug)[..., 0] > 0, "binary")
        assert _boxes_close(np.asarray(boxes_aug), rederived), f"plane {plane}"


def test_augment_affine_geometry():
    shape = (32, 32, 32)
    boxes = np.array([[8, 8, 8, 22, 22, 22]], np.float32) / np.asarray(shape * 2, np.float32)
    vol = np.zeros(shape, np.float32)
    vol[8:23, 8:23, 8:23] = 1.0  # filled cube (inclusive box [8, 22])

    cfg = AugmentConfig(affine_prob=1.0, translate_range=3.0, scale_range=0.15)
    img_aug, boxes_aug = augment_sample(
        jax.random.PRNGKey(2), jnp.asarray(vol[..., None]), jnp.asarray(boxes), cfg
    )
    rederived, _ = boxes_from_segmentation(np.asarray(img_aug)[..., 0] > 0.5, "binary")
    assert rederived.shape[0] == 1
    assert _boxes_close(np.asarray(boxes_aug), rederived, tol=1.2 / 32)


def test_augment_identity_config():
    cfg = AugmentConfig()
    assert cfg.identity
    img = jnp.ones((8, 8, 8, 1))
    boxes = jnp.zeros((2, 6))
    out_img, out_boxes = augment_sample(jax.random.PRNGKey(0), img, boxes, cfg)
    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(img))


def test_augment_from_names():
    cfg = AugmentConfig.from_names(["flip", "rotate90d", "translate"])
    assert cfg.flip_axes == (0, 1, 2)
    assert len(cfg.rot90_planes) == 3
    assert cfg.affine_prob == 0.7


def test_inverse_map_boxes_roundtrip():
    """crop -> pad/crop -> box derivation, then inverse map recovers original voxels."""
    from mslesions3d_tpu.data.transforms import inverse_map_boxes

    img = np.zeros((30, 40, 36), np.float32)
    img[4:26, 6:36, 5:31] = 1.0  # foreground region
    seg = np.zeros_like(img)
    seg[10:16, 20:26, 12:18] = 1  # object at known original voxels

    s = {"img": img.copy(), "seg": seg.copy()}
    s = t_crop_foreground(s, margin=2)
    s = t_resize_with_pad_or_crop(s, (32, 32, 32))
    boxes, labels = boxes_from_segmentation(s["seg"], "binary")
    assert boxes.shape == (1, 6)

    recovered = inverse_map_boxes(boxes, s["img"].shape[:3], s["transform_meta"])
    np.testing.assert_allclose(recovered[0], [10, 20, 12, 15, 25, 17], atol=1e-6)


def test_inverse_map_boxes_with_zoom():
    from mslesions3d_tpu.data.transforms import inverse_map_boxes

    img = np.zeros((20, 20, 20), np.float32)
    img[:] = 1.0
    seg = np.zeros_like(img)
    seg[4:8, 4:8, 4:8] = 1
    s = {"img": img, "seg": seg, "pixdim": (2.0, 1.0, 1.0)}
    s = t_spacing(s, (1.0, 1.0, 1.0))
    boxes, _ = boxes_from_segmentation(s["seg"], "binary")
    recovered = inverse_map_boxes(boxes, s["img"].shape[:3], s["transform_meta"])
    # original object spans voxels [4, 7] inclusive on each axis
    np.testing.assert_allclose(recovered[0][:3], [4, 4, 4], atol=1.0)
    np.testing.assert_allclose(recovered[0][3:], [7, 7, 7], atol=1.0)


def test_synthetic_subject_ids_arbitrary_width(tmp_path):
    """Subject parsing must not assume 4-character ids (round-1 finding)."""
    root = tmp_path / "ds"
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir()
    vol = np.zeros((8, 8, 8), np.float32)
    for sid in ("0001", "12345", "abc"):
        save_nifti(root / "images" / f"sub-{sid}_image.nii.gz", vol)
        save_nifti(root / "labels" / f"sub-{sid}_seg.nii.gz", vol)
    dm = SyntheticDataModule(data_dir=root, n_classes=1, batch_size=1)
    assert dm.subjects_list == ["0001", "12345", "abc"]


def test_augment_zoom_geometry():
    """Zoomed image and analytically-zoomed boxes stay consistent."""
    shape = (32, 32, 32)
    boxes = np.array([[8, 8, 8, 22, 22, 22]], np.float32) / np.asarray(shape * 2, np.float32)
    vol = np.zeros(shape, np.float32)
    vol[8:23, 8:23, 8:23] = 1.0

    for seed in (0, 1, 2):
        cfg = AugmentConfig(zoom_prob=1.0, min_zoom=0.8, max_zoom=1.2)
        img_aug, boxes_aug = augment_sample(
            jax.random.PRNGKey(seed), jnp.asarray(vol[..., None]), jnp.asarray(boxes), cfg
        )
        rederived, _ = boxes_from_segmentation(np.asarray(img_aug)[..., 0] > 0.5, "binary")
        assert rederived.shape[0] == 1
        assert _boxes_close(np.asarray(boxes_aug), rederived, tol=1.2 / 32), seed


def test_augment_grid_distortion_geometry():
    """Distorted image and inverse-mapped boxes stay consistent; the full
    extent still maps onto itself (no black borders)."""
    shape = (40, 40, 40)
    boxes = np.array([[10, 8, 12, 28, 26, 30]], np.float32) / np.asarray(shape * 2, np.float32)
    vol = np.zeros(shape, np.float32)
    vol[10:29, 8:27, 12:31] = 1.0

    for seed in (0, 3):
        cfg = AugmentConfig(grid_distort_prob=1.0, grid_distort_limit=0.2)
        img_aug, boxes_aug = augment_sample(
            jax.random.PRNGKey(seed), jnp.asarray(vol[..., None]), jnp.asarray(boxes), cfg
        )
        img_np = np.asarray(img_aug)[..., 0]
        rederived, _ = boxes_from_segmentation(img_np > 0.5, "binary")
        assert rederived.shape[0] == 1
        assert _boxes_close(np.asarray(boxes_aug), rederived, tol=1.5 / 40), seed
        # boxes must have actually moved for a 0.2 distortion
        if seed == 0:
            assert not np.allclose(np.asarray(boxes_aug), boxes, atol=1e-4)


def test_augment_from_names_zoom_griddistortion_and_unknown():
    cfg = AugmentConfig.from_names(["zoom", "griddistortion"])
    assert cfg.zoom_prob == 0.1 and cfg.grid_distort_prob == 0.1
    assert not cfg.identity
    with pytest.raises(ValueError, match="unknown augmentation"):
        AugmentConfig.from_names(["zoom", "nonsense"])


def test_debug_transforms(tmp_path, capsys):
    """Printer/ShowImage equivalents (reference utils.py:688-732, C6)."""
    from mslesions3d_tpu.data.transforms import t_printer, t_show_image

    img = np.random.default_rng(0).normal(size=(8, 10, 12)).astype(np.float32)
    s = {"img": img, "seg": (img > 0).astype(np.float32),
         "subject": "dbg/01", "boxes": np.zeros((2, 6), np.float32)}
    out = t_printer(s, prefix="after-load")
    assert out is s
    text = capsys.readouterr().out
    assert "after-load" in text and "[8, 10, 12]" in text

    t_show_image(s, out_dir=tmp_path, axis=1)
    written = list(tmp_path.glob("dbg_01_img_ax1.*"))
    assert written, list(tmp_path.iterdir())


def test_generate_multicontrast_dataset(tmp_path):
    """Multi-contrast generation (BASELINE config #5): 4-D volumes with
    shared geometry and per-channel contrast, deterministic per seed."""
    from mslesions3d_tpu.data.nifti import load_nifti

    root = generate_dataset(
        tmp_path / "mc", num_images=2, n_classes=1, image_size=(24, 24, 24),
        object_size=(6, 10), num_objects=(1, 3), seed=7, n_contrasts=3,
    )
    img = load_nifti(root / "images" / "sub-0000_image.nii.gz").data
    seg = load_nifti(root / "labels" / "sub-0000_seg.nii.gz").data
    assert img.shape == (24, 24, 24, 3)
    assert seg.shape == (24, 24, 24)
    obj = seg > 0
    assert obj.any()
    bg = ~obj
    # channel 0 FLAIR-like: objects brighter than background;
    # channel 1 T1-like: darker (deltas +0.4 / -0.3)
    assert img[..., 0][obj].mean() > img[..., 0][bg].mean() + 0.2
    assert img[..., 1][obj].mean() < img[..., 1][bg].mean() - 0.1

    # determinism: regeneration reproduces the same bytes
    root2 = generate_dataset(
        tmp_path / "mc2", num_images=1, n_classes=1, image_size=(24, 24, 24),
        object_size=(6, 10), num_objects=(1, 3), seed=7, n_contrasts=3,
    )
    img2 = load_nifti(root2 / "images" / "sub-0000_image.nii.gz").data
    np.testing.assert_array_equal(img, img2)


def test_multicontrast_datamodule_batches(tmp_path):
    """SyntheticDataModule yields channels-last multi-contrast batches with
    the same GT boxes as the shared segmentation."""
    root = generate_dataset(
        tmp_path / "mc", num_images=6, n_classes=1, image_size=(24, 24, 24),
        object_size=(6, 10), num_objects=(1, 3), seed=11, n_contrasts=3,
    )
    dm = SyntheticDataModule(data_dir=root, n_classes=1, batch_size=2, max_objects=8)
    dm.setup("fit")
    batch = next(dm.train_batches(drop_partial=False))
    assert batch["image"].shape == (2, 24, 24, 24, 3)
    assert batch["box_mask"].any()
    b = batch["boxes"][batch["box_mask"]]
    assert ((b[:, 3:] > b[:, :3]) & (b >= 0).all(axis=1, keepdims=True)).all()


def test_multicontrast_channel_subset(tmp_path):
    """channels=(0,) gives a FLAIR-only view of a multi-contrast dataset
    (ablation support for the config #5 sweep)."""
    root = generate_dataset(
        tmp_path / "mc", num_images=4, n_classes=1, image_size=(24, 24, 24),
        object_size=(6, 10), num_objects=(1, 3), seed=11, n_contrasts=3,
    )
    dm_all = SyntheticDataModule(data_dir=root, n_classes=1, batch_size=1)
    dm_one = SyntheticDataModule(data_dir=root, n_classes=1, batch_size=1, channels=(0,))
    dm_all.setup("fit"); dm_one.setup("fit")
    s_all = dm_all.get_sample(dm_all.trainsubs[0])
    s_one = dm_one.get_sample(dm_one.trainsubs[0])
    assert s_all["img"].shape[-1] == 3 and s_one["img"].shape[-1] == 1
    np.testing.assert_array_equal(s_one["img"][..., 0], s_all["img"][..., 0])
    np.testing.assert_array_equal(s_one["boxes"], s_all["boxes"])


def test_augment_composed_flip_is_exact():
    """Flips route through the composed MXU resample; integer coordinates
    make the interpolation matrix an exact permutation, so a forced flip
    must be BIT-exact against jnp.flip (no interpolation smoothing)."""
    rng = np.random.default_rng(5)
    img = rng.normal(0, 1, (16, 12, 10, 2)).astype(np.float32)
    boxes = np.array([[0.1, 0.2, 0.3, 0.5, 0.6, 0.7]], np.float32)
    cfg = AugmentConfig(flip_axes=(0, 1, 2), flip_prob=1.0)
    img_aug, _ = augment_sample(
        jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(boxes), cfg
    )
    expected = np.flip(img, axis=(0, 1, 2))
    np.testing.assert_array_equal(np.asarray(img_aug), expected)


def test_prefetch_order_and_errors():
    """prefetch preserves order, bounds memory, and propagates exceptions."""
    import pytest

    from mslesions3d_tpu.utils.prefetch import prefetch

    assert list(prefetch(range(100), depth=3)) == list(range(100))
    assert list(prefetch(iter([]), depth=2)) == []
    # depth<=0 is a passthrough
    assert list(prefetch(range(5), depth=0)) == list(range(5))

    def boom():
        yield 1
        yield 2
        raise ValueError("producer failed")

    it = prefetch(boom(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="producer failed"):
        next(it)
