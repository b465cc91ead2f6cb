from .nifti import load_nifti, save_nifti, NiftiImage
from .boxes_from_seg import boxes_from_segmentation, segmentation_from_boxes
from .datasets import SyntheticDataModule, LesionsDataModule, pad_objects
from .generate import generate_image, generate_dataset
from .patches import (
    boxes_to_patch,
    crop_patches,
    deterministic_patch_starts,
    sample_patch_starts,
)
