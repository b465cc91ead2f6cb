"""LesionsDataModule over a synthetic BIDS tree (reference datasets.py:125-335):
path logic, preprocessing pipeline, multi-contrast channels, k-fold splits."""

import numpy as np
import pytest

from mslesions3d_tpu.data.datasets import LesionsDataModule
from mslesions3d_tpu.data.nifti import save_nifti


def make_bids_tree(root, center="CHUV_RIM_OK", subjects=("001", "002", "003"),
                   shape=(40, 44, 44), sequences=("FLAIR",)):
    base = root / center / "derivatives" / "registrations" / "registrations_to_T2star"
    rng = np.random.default_rng(0)
    for i, sub in enumerate(subjects):
        (base / f"sub-{sub}").mkdir(parents=True, exist_ok=True)
        img = np.zeros(shape, np.float32)
        img[6:34, 6:38, 6:38] = rng.uniform(0.5, 1.5, (28, 32, 32))  # "brain"
        seg = np.zeros(shape, np.float32)
        seg[10 + i:15 + i, 12:17, 12:17] = 1  # one lesion per subject
        affine = np.diag([1.0, 1.0, 1.0, 1.0])
        for seq in sequences:
            p = base / "derivatives" / "skullstripped" / f"sub-{sub}" / "ses-01" / \
                f"sub-{sub}_ses-01_{seq}.nii.gz"
            save_nifti(p, img, affine)
        p = base / "derivatives" / "lesionmasks" / f"sub-{sub}" / "ses-01" / \
            f"sub-{sub}_ses-01_labeled_lesions.nii.gz"
        save_nifti(p, seg, affine)
    return root


@pytest.fixture(scope="module")
def bids_root(tmp_path_factory):
    return make_bids_tree(tmp_path_factory.mktemp("bids"))


def test_subject_discovery_and_split(bids_root):
    dm = LesionsDataModule(
        data_dir=bids_root, centers=("CHUV_RIM_OK",), batch_size=2,
        spatial_size=(40, 44, 44), max_objects=4,
    )
    assert len(dm.subjects_list) == 3
    dm.setup("fit")
    assert len(dm.trainsubs) == 2 and len(dm.testsubs) == 1


def test_pipeline_and_batches(bids_root):
    dm = LesionsDataModule(
        data_dir=bids_root, centers=("CHUV_RIM_OK",), batch_size=2,
        spatial_size=(48, 48, 48), max_objects=4, cache=True,
    )
    dm.setup("fit")
    batch = next(dm.train_batches(epoch=0, drop_partial=False))
    assert batch["image"].shape == (2, 48, 48, 48, 1)
    assert batch["box_mask"].sum() == 2  # one lesion per subject
    # lesion box is ~5 voxels wide in fractional coords
    b = batch["boxes"][0][batch["box_mask"][0]][0]
    dims = (b[3:] - b[:3]) * 48
    assert (dims > 2).all() and (dims < 9).all()
    # normalized: nonzero foreground has ~zero mean
    img = batch["image"][0, ..., 0]
    assert abs(img[img != 0].mean()) < 0.3


def test_multicontrast_channels(tmp_path):
    root = make_bids_tree(tmp_path, subjects=("001", "002"),
                          sequences=("FLAIR", "acq-mag_T2star"))
    dm = LesionsDataModule(
        data_dir=root, centers=("CHUV_RIM_OK",),
        input_images=("FLAIR", "acq-mag_T2star"), batch_size=1,
        spatial_size=(40, 44, 44), max_objects=4,
    )
    dm.setup("fit")
    batch = next(dm.train_batches(drop_partial=False))
    # lifts the reference's one-sequence restriction (datasets.py:155-156)
    assert batch["image"].shape[-1] == 2


def test_kfold_split(tmp_path):
    root = make_bids_tree(tmp_path, subjects=tuple(f"{i:03d}" for i in range(1, 9)))
    folds = []
    for fold in range(4):
        dm = LesionsDataModule(
            data_dir=root, centers=("CHUV_RIM_OK",), fold=fold, batch_size=1,
            spatial_size=(40, 44, 44),
        )
        dm.setup("fit")
        # 4-fold over the 6 train-split subjects (80% of 8)
        assert len(dm.trainsubs) + len(dm.testsubs) == 6
        folds.append(tuple(sorted(dm.testsubs)))
    # validation folds are disjoint across fold indices
    assert len(set(folds)) == 4


def test_excluded_subjects(tmp_path):
    root = make_bids_tree(tmp_path, center="BASEL_INSIDER_OK", subjects=("085", "086"))
    dm = LesionsDataModule(
        data_dir=root, centers=("BASEL_INSIDER_OK",), batch_size=1,
        spatial_size=(40, 44, 44),
    )
    # subject 085 is on the reference exclusion list (datasets.py:45)
    assert dm.subjects_list == [("BASEL_INSIDER_OK", "086")]


def test_origspace_inverse_and_nifti_export(tmp_path):
    """Full inverse chain (pad/crop -> crop -> spacing zoom -> orientation)
    maps detections back onto the on-disk grid, and predict writes an
    origspace wireframe NIfTI with the original affine (reference
    predict.py:284-304 parity)."""
    from mslesions3d_tpu.data.nifti import load_nifti
    from mslesions3d_tpu.data.transforms import inverse_map_boxes
    from mslesions3d_tpu.cli.predict import save_subject_predictions

    # sagittal-style acquisition: disk axis 0 along anatomical z with 2mm
    # spacing (axes permute under LPI), one lesion at known disk voxels
    shape = (20, 44, 44)
    affine = np.zeros((4, 4))
    affine[2, 0] = -2.0
    affine[1, 1] = -1.0
    affine[0, 2] = -1.0
    affine[3, 3] = 1.0
    base = tmp_path / "CHUV_RIM_OK" / "derivatives" / "registrations" / \
        "registrations_to_T2star"
    rng = np.random.default_rng(0)
    img = np.zeros(shape, np.float32)
    img[3:17, 6:38, 6:38] = rng.uniform(0.5, 1.5, (14, 32, 32))
    seg = np.zeros(shape, np.float32)
    lesion = (slice(8, 12), slice(12, 18), slice(20, 26))
    seg[lesion] = 1
    p = base / "derivatives" / "skullstripped" / "sub-001" / "ses-01" / \
        "sub-001_ses-01_FLAIR.nii.gz"
    save_nifti(p, img, affine)
    p = base / "derivatives" / "lesionmasks" / "sub-001" / "ses-01" / \
        "sub-001_ses-01_labeled_lesions.nii.gz"
    save_nifti(p, seg, affine)

    dm = LesionsDataModule(
        data_dir=tmp_path, centers=("CHUV_RIM_OK",), batch_size=1,
        spatial_size=(48, 48, 48), max_objects=4, cache=True,
        subject=("CHUV_RIM_OK", "001"),
    )
    dm.setup("fit")
    sample = dm.get_sample(("CHUV_RIM_OK", "001"))
    assert sample["boxes"].shape[0] == 1

    # treat the GT box (final fractional space) as a detection
    final_shape = sample["img"].shape[:3]
    orig = inverse_map_boxes(sample["boxes"], final_shape, sample["transform_meta"])
    expected = np.array([8, 12, 20, 11, 17, 25], np.float64)  # inclusive idx
    np.testing.assert_allclose(orig[0], expected, atol=1.5)

    # predict-path export: origspace wireframe NIfTI on the disk grid
    out = tmp_path / "preds"
    save_subject_predictions(
        out, ("CHUV_RIM_OK", "001"), final_shape, sample["boxes"],
        np.ones(1, np.int64), np.asarray([0.9]), affine=sample["affine"],
        min_score=0.5, save_images=True,
        transform_meta=sample["transform_meta"],
        orig_shape=sample["orig_shape"], orig_affine=sample["orig_affine"],
    )
    wire_path = out / "sub-CHUV_RIM_OK_001_preds_origspace.nii.gz"
    assert wire_path.exists()
    wire = load_nifti(wire_path)
    np.testing.assert_allclose(wire.affine, affine, atol=1e-6)
    assert wire.data.shape == shape
    nz = np.nonzero(wire.data)
    lo = np.array([n.min() for n in nz])
    hi = np.array([n.max() for n in nz])
    np.testing.assert_allclose(lo, expected[:3], atol=2.0)
    np.testing.assert_allclose(hi, expected[3:], atol=2.0)


def test_patch_training_on_bids_volumes(bids_root, tmp_path):
    """The full-resolution patch-training regime on the BIDS datamodule:
    32^3 patches cropped on device from 48^3 preprocessed volumes, one
    metric epoch with the sliding-window full-volume val mAP."""
    import jax
    from mslesions3d_tpu.models import SSD3DConfig
    from mslesions3d_tpu.train.loop import Trainer, TrainerConfig

    dm = LesionsDataModule(
        data_dir=bids_root, centers=("CHUV_RIM_OK",), batch_size=2,
        spatial_size=(48, 48, 48), max_objects=4, cache=True,
    )
    dm.setup("fit")
    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(32, 32, 32),
        width_mult=0.25, lr=1e-3, threshold=[0.1, 0.2], batch_size=2,
        min_object_size=3.0, max_object_size=8.0,
    )
    tcfg = TrainerConfig(
        logdir=str(tmp_path / "logs"), experiment_name="bids_patch",
        max_epochs=1, compute_metric_every_n_epochs=1, early_stopping=False,
        verbose=False, patch_training=True, grad_hist_every_n_steps=0,
    )
    state, result = Trainer(tcfg).fit(cfg, dm)
    assert int(state.step) > 0
    last = result["history"][-1]
    assert np.isfinite(last["avg_val_loss"])
    assert "mAP/validation_full_IoU_0.1" in last
