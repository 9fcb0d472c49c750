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
