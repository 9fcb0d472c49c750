"""Roundtrip + reference-sample tests for the pure-numpy NIfTI IO."""

import glob

import numpy as np
import pytest

from healthivert_tpu.utils import nifti


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32])
@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(tmp_path, rng, dtype, gz):
    data = (rng.random((7, 5, 3)) * 100).astype(dtype)
    affine = np.diag([1.0, 2.0, 3.0, 1.0])
    p = str(tmp_path / ("x.nii.gz" if gz else "x.nii"))
    nifti.save(nifti.Nifti1Image(data, affine), p)
    img = nifti.load(p)
    np.testing.assert_array_equal(img.data, data)
    np.testing.assert_allclose(img.affine, affine)


def test_loads_reference_samples():
    """The reference ships straightened label volumes we must be able to read."""
    paths = sorted(glob.glob("/root/reference/datasets/straightened/label/*.nii.gz"))
    if not paths:
        pytest.skip("reference samples not present")
    img = nifti.load(paths[0])
    assert img.data.ndim == 3
    labels = np.unique(img.data)
    assert labels.max() >= 1  # vertebra ids present
    assert img.data.shape[0] == 256 and img.data.shape[1] == 256


def test_scl_slope_applied(tmp_path, rng):
    """Headers with scl_slope/inter must rescale data on load."""
    import struct

    from healthivert_tpu.utils.nifti import load, save, Nifti1Image

    data = (rng.random((4, 4, 2)) * 50).astype(np.int16)
    p = str(tmp_path / "s.nii")
    save(Nifti1Image(data), p)
    raw = bytearray(open(p, "rb").read())
    struct.pack_into("<2f", raw, 112, 2.0, 10.0)  # slope=2, inter=10
    open(p, "wb").write(bytes(raw))
    img = load(p)
    np.testing.assert_allclose(img.get_fdata(), data * 2.0 + 10.0)


def test_affine_spacing(tmp_path):
    from healthivert_tpu.utils.nifti import load, save, Nifti1Image

    aff = np.diag([2.0, 3.0, 4.0, 1.0])
    p = str(tmp_path / "sp.nii.gz")
    save(Nifti1Image(np.zeros((3, 3, 3), np.float32), aff), p)
    img = load(p)
    assert img.spacing == (2.0, 3.0, 4.0)


def test_loaded_data_is_writable(tmp_path):
    """load() must copy out of the frombuffer view: callers mutate volumes
    in place (e.g. infer3d paste-back)."""
    import numpy as np

    from healthivert_tpu.utils import nifti

    v = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    p = str(tmp_path / "w.nii.gz")
    nifti.save(nifti.Nifti1Image(v, np.eye(4), (1.0, 1.0, 1.0)), p)
    loaded = nifti.load(p)
    loaded.data[0, 0, 0] = 99.0
    assert loaded.data[0, 0, 0] == 99.0
    assert loaded.get_fdata().flags.writeable
