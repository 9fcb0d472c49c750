"""Straightening engine tests, incl. bit-parity vs the reference's shipped
straightened label volumes (datasets/straightened/label/0007_*.nii.gz)."""

import os

import numpy as np
import pytest

from healthivert_tpu.straighten.curve import (
    Interpolator,
    frenet_serret,
    sagittal_basis,
    cumulative_length,
)
from healthivert_tpu.straighten import pipeline as P
from healthivert_tpu.utils import nifti

REF = "/root/reference/datasets"


def test_window():
    img = np.array([[-500.0, -300.0, 250.0, 800.0, 2000.0]])
    out = P.window(img.copy(), -300, 800)
    np.testing.assert_allclose(out, [[0, 0, 255 * 550 / 1100, 255, 255]])
    # early return when already inside the window
    small = np.array([[0.0, 100.0]])
    np.testing.assert_array_equal(P.window(small.copy(), -300, 800), small)


def test_frenet_serret_orthonormal(rng):
    t = np.linspace(0, 1, 50)
    curve = np.stack([t * 100, 10 * np.sin(3 * t), 5 * np.cos(2 * t)], -1)
    grads = [np.gradient(curve, axis=0)]
    grads.append(np.gradient(grads[0], axis=0))
    grads.append(np.gradient(grads[1], axis=0))
    basis = frenet_serret(*grads)
    eye = np.einsum("nij,nik->njk", basis, basis)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-8)


def test_sagittal_basis_constraint(rng):
    grad = rng.standard_normal((30, 3))
    basis = sagittal_basis(grad)
    # second basis vector (column 1) must have zero Y component
    np.testing.assert_allclose(basis[:, 1, 1], 0, atol=1e-12)
    eye = np.einsum("nij,nik->njk", basis, basis)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-8)


def test_interpolator_straight_line_identity(rng):
    """A straight axis-aligned curve must reproduce the volume slices."""
    vol = rng.random((40, 32, 32)).astype(np.float32)
    curve = np.stack([np.arange(5, 35, 5), np.full(6, 16.0), np.full(6, 16.0)], -1)
    inter = Interpolator(curve, step=1, get_local_basis=sagittal_basis)
    out = inter.interpolate_along(vol, (32, 32), order=1)
    # knot k sits at x = 5 + k; plane = vol[5+k] (up to grid centering)
    assert out.shape[1:] == (32, 32)
    mid = out[10]
    np.testing.assert_allclose(mid, vol[15], atol=1e-4)


def test_global_local_roundtrip():
    t = np.linspace(0, 1, 30)
    curve = np.stack([t * 60, 20 + 5 * np.sin(2 * t), 20 + 3 * t], -1)
    inter = Interpolator(curve, step=1, get_local_basis=sagittal_basis)
    pt = np.array([30.0, 22.0, 21.0])
    local = inter.global_to_local(pt, (64, 64))
    back = inter.local_to_global(local, (64, 64))
    np.testing.assert_allclose(back, pt, atol=0.1)


def test_extract_3d_volume_centering(rng):
    vol = rng.random((50, 50, 30))
    out = P.extract_3d_volume(vol, (25, 25, 15), size=(16, 16, 8))
    np.testing.assert_array_equal(out, vol[17:33, 17:33, 11:19])


def test_extract_mask_volume_covers_body(rng):
    labels = np.zeros((64, 64, 8))
    labels[20:40, 25:45, 2:6] = 20
    labels[45:60, 25:45, 2:6] = 21  # neighbor excluded from mask
    mask = P.extract_mask_volume(labels, 20)
    assert (mask[:, :, 4][20:40, 25:45] > 0).all()  # covers the body
    assert (mask[:, :, 4][45:60, 25:45] == 0).all()  # excludes other verts
    assert mask[:, :, 0].sum() == 0  # outside z-extent


def test_extract_centroids_drops_tiny_ends():
    seg = np.zeros((60, 40, 40), np.uint8)
    seg[2:4, 2:4, 2:4] = 17  # tiny min label -> dropped (<6000)
    seg[10:30, 10:30, 10:30] = 18
    seg[35:55, 10:30, 10:30] = 19
    cents = P.extract_centroids(seg)
    assert [c["label"] for c in cents] == [18, 19]
    c18 = next(c for c in cents if c["label"] == 18)
    np.testing.assert_allclose([c18["X"], c18["Y"], c18["Z"]], [19.5, 19.5, 19.5])


@pytest.mark.skipif(
    not os.path.exists(f"{REF}/raw/0007/0007_msk.nii.gz"),
    reason="reference sample not present",
)
def test_full_pipeline_parity_with_reference(tmp_path):
    """Straighten the shipped raw mask and compare with the reference's own
    straightened label volumes: the target vertebra must match bit-exactly."""
    outs = P.process_mask3d(
        f"{REF}/raw/0007/0007_msk.nii.gz",
        f"{REF}/raw/0007/0007_msk.nii.gz",
        f"{REF}/raw/0007/0007.json",
        [20],
        str(tmp_path),
    )
    assert outs == ["0007_msk_20"]
    mine = nifti.load(str(tmp_path / "label" / "0007_msk_20.nii.gz")).get_fdata()
    ref = nifti.load(f"{REF}/straightened/label/0007_20.nii.gz").get_fdata()
    inter = np.sum((mine == 20) & (ref == 20))
    dice = 2 * inter / ((mine == 20).sum() + (ref == 20).sum())
    assert dice == pytest.approx(1.0, abs=1e-6), dice
    all_dice = 2 * np.sum((mine > 0) & (ref > 0)) / ((mine > 0).sum() + (ref > 0).sum())
    assert all_dice > 0.99, all_dice


def test_axial_mask_extraction(rng):
    """Legacy axial variant (C22): body isolation + 1.2x rect mask + crops."""
    from healthivert_tpu.straighten.axial import get_vertbody, process_spine_data

    # a body blob (left/anterior) + a posterior process blob
    seg = np.zeros((40, 60))
    seg[10:30, 5:30] = 1  # body: anterior (small min-col), large
    seg[15:22, 40:55] = 1  # process: posterior
    out2, body, center = get_vertbody(seg)
    assert body[15, 10] == 1 and body[18, 45] == 0  # body kept, process dropped
    assert out2.shape == (60, 60)

    ct = rng.normal(100, 30, (128, 128, 20))
    labels = np.zeros((128, 128, 20))
    labels[40:70, 30:60, 5:15] = 20
    labels[80:100, 30:60, 5:15] = 21
    res = process_spine_data(ct, labels, 20, (96, 96))
    assert res["ct_crop"].shape == (96, 96)
    assert res["mask"][50, 45] == 255  # inside the body rect
    assert (res["mask"][labels[:, :, res["center_z"]] == 21] == 0).all()
    assert res["masked_image"][res["mask"] == 255].sum() == 0
