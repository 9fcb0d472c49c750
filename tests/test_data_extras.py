"""Transforms factory + image folder walker + aligned dataset split logic."""

import json
import os
import types

import numpy as np

from healthivert_tpu.data.aligned import load_split, partition_normal
from healthivert_tpu.data.image_folder import is_image_file, make_dataset
from healthivert_tpu.data.transforms import get_transform, make_power_2, resize_bilinear


def test_make_power_2_rounds():
    img = np.zeros((255, 258))
    out = make_power_2(img, base=4)
    # int(round(255/4))*4 = 256, int(round(258/4))*4 = 256
    assert out.shape == (256, 256)


def test_resize_bilinear_identity(rng):
    img = rng.random((16, 12))
    np.testing.assert_allclose(resize_bilinear(img, 16, 12), img)


def test_get_transform_none_mode(rng):
    opt = types.SimpleNamespace(preprocess="none", no_flip=True, load_size=256, crop_size=256)
    t = get_transform(opt, rng=np.random.default_rng(0))
    img = (rng.random((256, 256)) * 255).astype(np.uint8)
    out = t(img)
    assert out.shape == (256, 256)
    assert -1.0 <= out.min() and out.max() <= 1.0


def test_resize_matches_torchvision_bicubic(rng):
    """Resample parity with the reference transform chain: torchvision's
    Resize on a PIL image with the default BICUBIC method
    (base_dataset.py:82,117-127). The old numpy-bilinear resize silently
    deviated (code-review r3)."""
    import pytest

    torchvision = pytest.importorskip("torchvision")
    from PIL import Image

    from healthivert_tpu.data.transforms import resize

    img = (rng.random((50, 38)) * 255).astype(np.float32)
    ours = resize(img, 32, 28, "bicubic")
    ref = torchvision.transforms.Resize(
        (32, 28), torchvision.transforms.InterpolationMode.BICUBIC
    )(Image.fromarray(img, mode="F"))
    np.testing.assert_allclose(ours, np.asarray(ref, np.float64), atol=1e-4)


def test_resize_bicubic_golden():
    """Golden constants for the PIL bicubic kernel (precomputed from
    PIL.Image.resize) — catches any accidental kernel/method change even
    though torchvision is absent from this image."""
    from healthivert_tpu.data.transforms import resize

    img = np.arange(16, dtype=np.float32).reshape(4, 4) * 10
    want = np.array([
        [25.37038803, 38.47107315, 51.57175827],
        [98.42823792, 111.52892303, 124.62961578],
    ])
    np.testing.assert_allclose(resize(img, 2, 3, "bicubic"), want, atol=1e-6)


def test_get_transform_shared_params_and_normalize(rng):
    """params= (from get_params) must give paired images identical crop and
    flip; normalize=False stops at the [0,1] ToTensor scaling
    (base_dataset.py:64-115 signature)."""
    from healthivert_tpu.data.transforms import get_params, get_transform

    opt = types.SimpleNamespace(
        preprocess="resize_and_crop", no_flip=False, load_size=64, crop_size=32
    )
    params = get_params(opt, (80, 100), np.random.default_rng(0))
    a = (rng.random((100, 80)) * 255)
    ta = get_transform(opt, params=params)(a)
    tb = get_transform(opt, params=params)(a)
    np.testing.assert_array_equal(ta, tb)  # same crop_pos + flip, no RNG

    mask = np.full((100, 80), 255.0)
    tm = get_transform(opt, params=params, normalize=False)(mask)
    assert tm.max() <= 1.0 and tm.min() >= 0.0 and tm.mean() > 0.9


def test_get_transform_resize_crop(rng):
    opt = types.SimpleNamespace(
        preprocess="resize_and_crop", no_flip=True, load_size=64, crop_size=32
    )
    t = get_transform(opt, rng=np.random.default_rng(0))
    out = t(rng.random((100, 80)) * 255)
    assert out.shape == (32, 32)


def test_image_folder_skips_labels(tmp_path):
    for name in ("a.nii.gz", "b_label.nii.gz", "c.png", "notes.txt"):
        (tmp_path / name).write_bytes(b"x")
    files = make_dataset(str(tmp_path))
    names = [os.path.basename(f) for f in files]
    assert names == ["a.nii.gz", "c.png"]
    assert is_image_file("x.nii.gz") and not is_image_file("x.doc")


def test_split_partition(tmp_path):
    split = {"train": {"p1_20": 0, "p1_21": 3, "p2_19": 1, "p2_20": 2}}
    p = tmp_path / "s.json"
    p.write_text(json.dumps(split))
    s = load_split(str(p), "train")
    normal, abnormal, by_patient = partition_normal(s)
    assert set(normal) == {"p1_20", "p2_19"}
    assert set(abnormal) == {"p1_21", "p2_20"}
    assert by_patient == {"p1": ["20"], "p2": ["19"]}


def make_aligned_fixture(root, n=5):
    """Write n single-vertebra CT/label volumes + a split json under root;
    returns the list of patient_vert ids."""
    from healthivert_tpu.data.synthetic import make_spine_volume
    from healthivert_tpu.utils import nifti

    rng = np.random.default_rng(0)
    # 64^2 volumes: the multiprocess launch test trains on this fixture at
    # crop_size 64, sharing the small compile signature with other tests
    ct, labels, _ = make_spine_volume(
        rng, shape=(64, 64, 16), vert_ids=(19, 20), vert_height=12, gap=5
    )
    for d in ("CT", "label"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    split = {"train": {}}
    pvs = []
    for i in range(n):
        pv = f"p{i}_20"
        pvs.append(pv)
        split["train"][pv] = 0
        aff = np.eye(4)
        nifti.save(nifti.Nifti1Image(ct.astype(np.float32), aff),
                   os.path.join(root, "CT", f"{pv}.nii.gz"))
        nifti.save(nifti.Nifti1Image(labels.astype(np.int16), aff),
                   os.path.join(root, "label", f"{pv}.nii.gz"))
    with open(os.path.join(root, "vertebra_data_local.json"), "w") as f:
        f.write(json.dumps(split))
    return pvs


def _epoch_batches(ds, n_epochs=2):
    out = []
    for _ in range(n_epochs):
        for b in ds:
            out.append(b)
    return out


def test_build_example_normal_vert_is_shifted(rng):
    """normal_vert must be the SHIFTED neighbor mask, aligned with the
    shifted context the generator sees (reference aligned_dataset.py:240-243
    returns normal_vert_label_slice built with the same flank shift) —
    code-review r3 found the unshifted mask was returned."""
    from healthivert_tpu.data.sampler import band_and_shift, build_example, shift_rows

    H, W, Z = 64, 64, 10
    ct = np.full((H, W, Z), 120.0)
    labels = np.zeros((H, W, Z), np.int32)
    labels[28:39, 10:40, :] = 20   # target: height 10 < maxheight
    labels[16:27, 10:40, :] = 19   # normal neighbor directly above
    ex = build_example(np.random.default_rng(0), ct, labels, 20, normal_ids={19})

    x1, x2 = int(ex["x1"]), int(ex["x2"])
    # slice geometry is z-invariant here, so recompute the expected shift
    unshifted = (labels[:, :, 0] == 19).astype(np.float64)
    min_x, max_x, _, _ = band_and_shift(ct[:, :, 0], x1, x2)
    expected = shift_rows(unshifted, x1, x2, min_x, max_x)
    got = ex["normal_vert"][..., 0]
    np.testing.assert_array_equal(got, expected)
    assert not np.array_equal(expected, unshifted)  # the shift must bite


def test_build_example_single_slice_extent(rng):
    """A vertebra whose mask spans ONE z-slice must sample that slice (the
    4/5 central window rounds to an empty range; rng.choice raised
    'a cannot be empty' before the fallback)."""
    from healthivert_tpu.data.sampler import build_example

    H, W, Z = 64, 64, 8
    ct = np.full((H, W, Z), 120.0)
    labels = np.zeros((H, W, Z), np.int32)
    labels[28:39, 10:40, 3] = 20
    ex = build_example(np.random.default_rng(0), ct, labels, 20, normal_ids=set())
    assert ex["slice_ratio"] == 0.0 and ex["height"] == 10


def test_volume_cache_batches_bit_identical(tmp_path):
    """The LRU volume cache (uint8 CT/CAM, narrow labels) must be invisible:
    cached epochs produce BIT-identical batches to uncached ones — the
    quantization commutes with build_example's row selections."""
    from healthivert_tpu.data.aligned import AlignedDataset
    from healthivert_tpu.utils import nifti

    pvs = make_aligned_fixture(str(tmp_path), 4)
    # add CAM volumes to exercise the pre-scaled uint8 cam path
    cam_dir = tmp_path / "CAM"
    cam_dir.mkdir()
    rng = np.random.default_rng(5)
    for pv in pvs:
        cam = rng.random((64, 64, 16)).astype(np.float32)
        nifti.save(nifti.Nifti1Image(cam, np.eye(4)), str(cam_dir / f"{pv}_0.nii.gz"))

    def mk(cache_gb):
        return AlignedDataset(types.SimpleNamespace(
            batch_size=2, seed=0, dataroot=str(tmp_path), phase="train",
            vert_class="normal", num_threads=2, serial_batches=True,
            cam_dir=str(cam_dir), data_cache_gb=cache_gb,
        ))

    cached = _epoch_batches(mk(4.0))
    plain = _epoch_batches(mk(0))
    assert len(cached) == len(plain)
    for bc, bp in zip(cached, plain):
        for k in bp:
            assert np.array_equal(bc[k], bp[k]), k


def test_volume_cache_respects_cap(tmp_path):
    from healthivert_tpu.data.aligned import AlignedDataset

    make_aligned_fixture(str(tmp_path), 5)
    one_entry = 2 * 64 * 64 * 16  # ct u8 + labels u8
    ds = AlignedDataset(types.SimpleNamespace(
        batch_size=2, seed=0, dataroot=str(tmp_path), phase="train",
        vert_class="normal", num_threads=1, serial_batches=True,
        data_cache_gb=2.5 * one_entry / 1e9,  # fits 2 entries
    ))
    for _ in ds:
        pass
    assert len(ds._cache) == 2
    assert ds._cache_bytes <= 2.5 * one_entry


def test_aligned_dataset_yields_trailing_partial_batch(tmp_path):
    """N % batch_size != 0 must still yield all N examples per epoch — the
    reference DataLoader's drop_last=False (/root/reference/data/__init__.py:
    88-93); round 2 silently dropped the remainder."""
    from healthivert_tpu.data.aligned import AlignedDataset

    make_aligned_fixture(str(tmp_path), 5)
    opt = types.SimpleNamespace(
        batch_size=2, seed=0, dataroot=str(tmp_path), phase="train",
        vert_class="normal", num_threads=2, serial_batches=True,
    )
    ds = AlignedDataset(opt)
    sizes = [next(iter(b.values())).shape[0] for b in ds]
    assert sizes == [2, 2, 1]
    assert sum(sizes) == len(ds) == 5


def test_aligned_dataset_process_slicing_disjoint(tmp_path, monkeypatch):
    """Multi-host wiring (VERDICT r2 #1): with 2 simulated processes each
    AlignedDataset instance loads only its own contiguous slice of every
    global batch — together disjoint and covering the global batch order."""
    import jax

    from healthivert_tpu.data.aligned import AlignedDataset

    make_aligned_fixture(str(tmp_path), 8)

    def ids_for(pid, nproc):
        monkeypatch.setattr(jax, "process_count", lambda: nproc)
        monkeypatch.setattr(jax, "process_index", lambda: pid)
        opt = types.SimpleNamespace(
            batch_size=4, seed=0, dataroot=str(tmp_path), phase="train",
            vert_class="normal", num_threads=2, serial_batches=False,
            isTrain=True,
        )
        ds = AlignedDataset(opt)
        loaded = []
        orig = ds._load_example

        def spy(pv, gidx=0):
            loaded.append(pv)
            return orig(pv, gidx)

        ds._load_example = spy
        batches = [next(iter(b.values())).shape[0] for b in ds]
        return loaded, batches

    g_ids, g_sizes = ids_for(0, 1)  # single-process global order
    a_ids, a_sizes = ids_for(0, 2)
    b_ids, b_sizes = ids_for(1, 2)

    assert g_sizes == [4, 4] and a_sizes == b_sizes == [2, 2]
    assert not set(a_ids) & set(b_ids)  # disjoint data across processes
    # interleaved per-batch slices reconstruct the global order exactly
    assert a_ids[0:2] + b_ids[0:2] + a_ids[2:4] + b_ids[2:4] == g_ids


def test_shipped_split_file_found_and_parsed(tmp_path, monkeypatch):
    """The repo ships vertebra_data.json (Verse2019 splits, 1460 verts); the
    dataset finds it from any cwd when dataroot has no local split file."""
    import os

    from healthivert_tpu.data.aligned import load_split, partition_normal

    root = os.path.join(os.path.dirname(__file__), "..", "vertebra_data.json")
    assert os.path.exists(root)
    counts = {p: len(load_split(root, p)) for p in ("train", "test", "val")}
    assert counts == {"train": 729, "test": 366, "val": 365}
    n, a, _ = partition_normal(load_split(root, "train"))
    assert len(n) + len(a) == 729 and len(a) > 0
