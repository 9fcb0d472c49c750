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


def test_nan_scl_slope_means_no_scaling(tmp_path, rng):
    """Many real writers leave scl_slope/scl_inter as NaN; nibabel treats
    that as 'no scaling'. NaN arithmetic would turn the whole volume NaN
    (code-review r3 catch, reproduced on a real file)."""
    import struct

    from healthivert_tpu.utils.nifti import load, save, Nifti1Image

    data = (rng.random((4, 4, 2)) * 50).astype(np.int16)
    p = str(tmp_path / "nan.nii")
    save(Nifti1Image(data), p)
    raw = bytearray(open(p, "rb").read())
    struct.pack_into("<2f", raw, 112, np.nan, np.nan)
    open(p, "wb").write(bytes(raw))
    img = load(p)
    np.testing.assert_array_equal(img.get_fdata(), data.astype(np.float64))

    # finite slope + NaN inter: scale, treat inter as 0
    struct.pack_into("<2f", raw, 112, 2.0, np.nan)
    open(p, "wb").write(bytes(raw))
    np.testing.assert_allclose(load(p).get_fdata(), data * 2.0)


def test_qform_fallback_when_sform_absent(tmp_path):
    """sform_code == 0 + qform_code > 0 must reconstruct the affine from the
    quaternion (NIfTI-1 method 2), like nibabel — not silently degrade to
    diag(pixdim) (which mis-reports orientation as RAS)."""
    import struct

    from healthivert_tpu.utils.nifti import load, save, Nifti1Image

    data = np.zeros((3, 4, 5), np.float32)
    p = str(tmp_path / "q.nii")
    save(Nifti1Image(data), p)
    raw = bytearray(open(p, "rb").read())
    # 90-degree rotation about +z: (a,b,c,d) = (cos45, 0, 0, sin45)
    s2 = np.sqrt(0.5)
    struct.pack_into("<8f", raw, 76, 1.0, 2.0, 3.0, 4.0, 0, 0, 0, 0)  # pixdim
    struct.pack_into("<h", raw, 252, 1)          # qform_code
    struct.pack_into("<h", raw, 254, 0)          # sform_code
    struct.pack_into("<3f", raw, 256, 0.0, 0.0, s2)   # quatern_b/c/d
    struct.pack_into("<3f", raw, 268, 5.0, 6.0, 7.0)  # qoffset_x/y/z
    open(p, "wb").write(bytes(raw))
    img = load(p)
    want = np.array([
        [0.0, -3.0, 0.0, 5.0],
        [2.0, 0.0, 0.0, 6.0],
        [0.0, 0.0, 4.0, 7.0],
        [0.0, 0.0, 0.0, 1.0],
    ])
    np.testing.assert_allclose(img.affine, want, atol=1e-6)

    # qfac = pixdim[0] = -1 flips the k column
    struct.pack_into("<8f", raw, 76, -1.0, 2.0, 3.0, 4.0, 0, 0, 0, 0)
    open(p, "wb").write(bytes(raw))
    want_flip = want.copy()
    want_flip[:3, 2] *= -1
    np.testing.assert_allclose(load(p).affine, want_flip, atol=1e-6)


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
