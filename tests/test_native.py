"""Native (C++) NIfTI loader tests: decode/normalize parity with the
pure-Python path, dtype coverage, stale-cache safety."""

import numpy as np
import pytest

from mslesions3d_tpu.data.nifti import load_nifti, save_nifti
from mslesions3d_tpu.data.transforms import t_normalize_intensity
from mslesions3d_tpu.native import available, build, load_nifti_fast

pytestmark = pytest.mark.skipif(not (build() and available()),
                                reason="no C++ toolchain for the native loader")


def test_decode_parity(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(20, 24, 28)).astype(np.float32)
    path = tmp_path / "a.nii.gz"
    save_nifti(path, data, np.diag([1.0, 2.0, 1.5, 1.0]))

    fast, pixdim = load_nifti_fast(path)
    ref = load_nifti(path)
    np.testing.assert_allclose(fast, ref.data, rtol=1e-6)
    np.testing.assert_allclose(pixdim, ref.pixdim, rtol=1e-5)


def test_normalize_parity(tmp_path):
    rng = np.random.default_rng(1)
    data = rng.normal(size=(16, 16, 16)).astype(np.float32)
    data[data < 0] = 0  # mix of zero and nonzero
    path = tmp_path / "b.nii.gz"
    save_nifti(path, data)

    fast, _ = load_nifti_fast(path, normalize=True)
    s = {"img": load_nifti(path).data}
    expected = t_normalize_intensity(s, nonzero=True)["img"]
    np.testing.assert_allclose(fast, expected, rtol=1e-4, atol=1e-4)


def test_int16_and_uncompressed(tmp_path):
    data = (np.arange(4 * 5 * 6).reshape(4, 5, 6) % 13).astype(np.int16)
    path = tmp_path / "c.nii"
    save_nifti(path, data)
    fast, _ = load_nifti_fast(path)
    np.testing.assert_array_equal(fast, data.astype(np.float32))


def test_rewritten_file_not_served_stale(tmp_path):
    path = tmp_path / "d.nii.gz"
    save_nifti(path, np.ones((8, 8, 8), np.float32))
    first, _ = load_nifti_fast(path)
    import os, time
    time.sleep(0.01)
    save_nifti(path, np.full((8, 8, 8), 2.0, np.float32))
    os.utime(path, (time.time() + 5, time.time() + 5))
    second, _ = load_nifti_fast(path)
    assert second.max() == 2.0 and first.max() == 1.0


def test_missing_file_raises(tmp_path):
    with pytest.raises(RuntimeError):
        load_nifti_fast(tmp_path / "nope.nii.gz")


def test_truncated_gz_clean_error(tmp_path):
    """A truncated .nii.gz must raise cleanly, not read out of bounds
    (round-1 advisor finding)."""
    import gzip

    import numpy as np
    import pytest

    from mslesions3d_tpu.data.nifti import save_nifti
    from mslesions3d_tpu.native import native

    if not native.available():
        pytest.skip("native loader unavailable")

    path = tmp_path / "x.nii.gz"
    save_nifti(path, np.ones((12, 13, 14), np.float32))
    # re-gzip a truncated copy of the decompressed stream: the header (with
    # its full 12*13*14 volume declaration) survives, the voxel data doesn't
    plain = gzip.decompress(path.read_bytes())
    trunc = tmp_path / "trunc.nii.gz"
    trunc.write_bytes(gzip.compress(plain[: 348 + 100]))
    with pytest.raises(RuntimeError, match="msl_nifti_load failed with code 7"):
        native.load_nifti_fast(trunc, normalize=True)


def test_4d_multicontrast_decode(tmp_path):
    """4-D volumes decode channels-last, matching the pure-Python loader."""
    rng = np.random.default_rng(2)
    data = rng.normal(size=(10, 12, 14, 3)).astype(np.float32)
    path = tmp_path / "mc.nii.gz"
    save_nifti(path, data)

    fast, _ = load_nifti_fast(path)
    assert fast.shape == (10, 12, 14, 3)
    ref = load_nifti(path)
    assert ref.data.shape == (10, 12, 14, 3)
    np.testing.assert_allclose(fast, ref.data, rtol=1e-6)


def test_4d_normalize_per_channel(tmp_path):
    """Native normalization treats each contrast independently (and matches
    the python t_normalize_intensity per-channel path)."""
    rng = np.random.default_rng(3)
    data = rng.uniform(0.5, 3.0, size=(8, 9, 10, 2)).astype(np.float32)
    data[..., 1] *= 50.0  # very different scale per channel
    data[data < 1.0] = 0  # some zeros for the nonzero mask
    path = tmp_path / "mcn.nii.gz"
    save_nifti(path, data)

    fast, _ = load_nifti_fast(path, normalize=True)
    expected = t_normalize_intensity({"img": load_nifti(path).data}, nonzero=True)["img"]
    np.testing.assert_allclose(fast, expected, rtol=1e-4, atol=1e-4)
    # per-channel: each channel's nonzero voxels are ~N(0, 1)
    for c in range(2):
        vals = fast[..., c][fast[..., c] != 0]
        assert abs(vals.mean()) < 1e-3 and abs(vals.std() - 1.0) < 1e-3
