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
