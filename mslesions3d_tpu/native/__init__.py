from .native import available, load_nifti_fast, build
