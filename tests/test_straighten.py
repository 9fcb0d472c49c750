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
    labels[40:70, 30:60, 5:15] = 20   # target body
    labels[71:74, 30:60, 5:15] = 21   # neighbor inside the 1.2x rect
    labels[38:40, 30:60, 5:15] = 5    # cervical label inside the rect
    res = process_spine_data(ct, labels, 20, (96, 96))
    # every returned image is cropped to output_size through the same center
    # window (mask_extract.py:177-191)
    assert all(res[k].shape == (96, 96)
               for k in ("ct_crop", "label_crop", "mask", "masked_image", "masked_label"))
    cy, cx = res["center"]
    cc = lambda r, c: (r - cy + 48, c - cx + 48)  # full -> crop coords
    assert res["mask"][cc(55, 45)] == 255  # inside the body rect
    assert res["mask"][cc(71, 45)] == 0    # vert 21 removed (labels 8..25)
    assert res["mask"][cc(38, 45)] == 255  # label 5 exempt (reference loops 8..25)
    assert res["masked_image"][res["mask"] == 255].sum() == 0

    # a label whose mid-slice is empty: no body component -> None, not NaN crash
    labels2 = np.zeros((64, 64, 12))
    labels2[20:30, 20:30, 2] = 22
    labels2[20:30, 20:30, 8] = 22  # center_z = 5 has no pixels
    assert process_spine_data(ct[:64, :64, :12], labels2, 22, (48, 48)) is None


# --------------------------------------------------- C21 alternates (round 2)


def test_reorient_to_preserves_world_points():
    """reorient_to: data is rearranged but every voxel keeps its world
    coordinate (affine consistency), for flip-only and permuted inputs."""
    from healthivert_tpu.utils import nifti

    rng = np.random.default_rng(3)
    vol = rng.random((5, 7, 9)).astype(np.float32)

    # LPS (flips), and a permuted orientation (data axes = A,S,R)
    aff_lps = np.diag([-2.0, -1.5, 3.0, 1.0])
    aff_asr = np.array([
        [0, 0, 1.0, 4.0],
        [1.5, 0, 0, -2.0],
        [0, 2.0, 0, 1.0],
        [0, 0, 0, 1.0],
    ])
    for aff in (aff_lps, aff_asr):
        img = nifti.Nifti1Image(vol.copy(), aff, tuple(np.linalg.norm(aff[:3, :3], axis=0)))
        out = nifti.reorient_to(img, ("R", "A", "I"))
        assert nifti.orientation_codes(out.affine) == ("R", "A", "I")
        assert sorted(out.data.shape) == sorted(vol.shape)
        # every voxel value must sit at the same world point
        corners = [(0, 0, 0), tuple(s - 1 for s in out.data.shape)]
        inner = [tuple(rng.integers(0, s) for s in out.data.shape) for _ in range(4)]
        for idx in corners + inner:
            world = out.affine @ np.array([*idx, 1.0])
            # invert the ORIGINAL affine to find the source voxel
            src = np.linalg.solve(np.asarray(aff, float), world)
            src_idx = tuple(int(round(v)) for v in src[:3])
            assert out.data[idx] == vol[src_idx], (aff, idx)


def test_reorient_to_identity_when_already_oriented():
    from healthivert_tpu.utils import nifti

    vol = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    aff = np.diag([1.0, 1.0, -1.0, 1.0])  # RAI already
    img = nifti.Nifti1Image(vol, aff, (1.0, 1.0, 1.0))
    out = nifti.reorient_to(img, ("R", "A", "I"))
    np.testing.assert_array_equal(out.data, vol)
    np.testing.assert_allclose(out.affine, aff)


def test_extract_mask_volume_left_keeps_leftmost_component():
    from healthivert_tpu.straighten.pipeline import extract_mask_volume_left

    lab = np.zeros((32, 32, 3), np.float64)
    # slice 1: two components of label 5 — left block (cols 2..6) and right
    # block (cols 20..26); plus an other-vertebra voxel inside the left box
    lab[10:16, 2:7, 1] = 5
    lab[10:16, 20:27, 1] = 5
    lab[12, 4, 1] = 7  # other label punches a hole
    m = extract_mask_volume_left(lab, 5)
    assert m[:, :, 0].sum() == 0 and m[:, :, 2].sum() == 0
    sl = m[:, :, 1]
    assert sl[12, 3] == 255  # inside leftmost box
    assert sl[12, 23] == 0  # right component excluded
    assert sl[12, 4] == 0  # other-label voxel zeroed


def test_extract_mask_3dvolume_matches_reference_formula():
    from healthivert_tpu.straighten.pipeline import extract_mask_3dvolume

    rng = np.random.default_rng(0)
    lab = np.zeros((40, 40, 10), np.float64)
    lab[10:20, 14:30, 2:7] = 6
    lab[25:28, 5:9, 3:5] = 7  # other vertebra, outside the grown box
    lab[15, 20, 4] = 8  # other vertebra INSIDE the box -> zeroed
    m = extract_mask_3dvolume(lab, 6)
    # independent mirror of straighten_mask_3d.py:438-461
    loc = np.where(lab == 6)
    x0, x1 = loc[0].min(), loc[0].max()
    y0, y1 = loc[1].min(), loc[1].max()
    z0, z1 = loc[2].min(), loc[2].max()
    cx, cy = int((x1 + x0) / 2), int((y1 + y0) / 2)
    gx0, gx1 = int((x0 - cx) * 1.1 + cx), int((x1 - cx) * 1.1 + cx)
    gy0, gy1 = int((y0 - cy) * 1.1 + cy), int((y1 - cy) * 1.1 + cy)
    want = np.zeros_like(lab, np.uint8)
    want[max(gx0, 0):gx1 + 1, max(gy0, 0):gy1 + 1, z0:z1 + 1] = 255
    want[(lab != 6) & (lab != 0)] = 0
    np.testing.assert_array_equal(m, want)
    assert m[15, 20, 4] == 0


def test_mask_mode_dispatch():
    from healthivert_tpu.straighten.pipeline import (
        _MASK_STRATEGIES, extract_mask_3dvolume, extract_mask_volume,
        extract_mask_volume_left,
    )

    assert _MASK_STRATEGIES == {
        "rect": extract_mask_volume, "left": extract_mask_volume_left,
        "3d": extract_mask_3dvolume,
    }


def test_point_mapping_matches_reference_algorithm():
    """The vectorized point-mapping resolver reproduces the reference's
    per-point formulation (straighten/curve.py:104-157,223-239), mirrored
    inline as the spec, on random curves and points."""
    from healthivert_tpu.straighten.curve import (
        Interpolator, cumulative_length, pixel_to_spatial, spatial_to_pixel,
    )

    def mirror_interp_coords(coordinates, to_origin, to_plane):
        idx = to_origin.argmin()
        (cands,) = np.diff(np.sign(to_plane)).nonzero()
        if len(cands) > 0:
            idx = cands[np.abs(cands - idx).argmin()]
        slc = slice(max(0, idx - 2), idx + 2)
        dp, cs = to_plane[slc], coordinates[slc]
        order = np.argsort(dp)
        dp_s, cs_s = dp[order], cs[order]
        out = np.empty(cs.shape[1])
        for j in range(cs.shape[1]):
            col = cs_s[:, j]
            if 0 <= dp_s[0]:
                s = (col[1] - col[0]) / (dp_s[1] - dp_s[0] + 1e-12)
                out[j] = col[0] + (0 - dp_s[0]) * s
            elif 0 >= dp_s[-1]:
                s = (col[-1] - col[-2]) / (dp_s[-1] - dp_s[-2] + 1e-12)
                out[j] = col[-1] + (0 - dp_s[-1]) * s
            else:
                out[j] = np.interp(0.0, dp_s, col)
        return out

    rng = np.random.default_rng(0)
    t = np.linspace(0, 4 * np.pi, 40)
    curve = np.stack([20 + 3 * np.sin(t / 3), 20 + 2 * np.cos(t / 4), t * 4], 1)
    inter = Interpolator(curve, step=1)
    shape = np.array([64, 64])
    centers = np.zeros_like(inter.knots)
    centers[:, 0] = cumulative_length(inter.knots)
    centers[:, 1:] = shape / 2

    pts = curve[5:35:4] + rng.normal(0, 2.0, (8, 3))
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        got_l = inter.global_to_local(pts, shape)
        want_l = []
        for p in pixel_to_spatial(pts, inter.spacing):
            d = p - inter.knots
            to_origin = np.linalg.norm(d, axis=-1)
            loc = np.einsum("nji,nj->ni", inter.basis, d)
            want_l.append(mirror_interp_coords(loc + centers, to_origin, loc[:, 0]))
        np.testing.assert_allclose(got_l, np.array(want_l), rtol=1e-10, atol=1e-10)

        # and the inverse direction
        lpts = np.array(want_l)
        got_g = inter.local_to_global(lpts, shape)
        want_g = []
        for p in lpts:
            d = p - centers
            to_plane = d[:, 0]
            rot = np.einsum("nij,nj->ni", inter.basis, d)
            to_origin = np.linalg.norm(rot, axis=-1)
            want_g.append(mirror_interp_coords(rot + inter.knots, to_origin, to_plane))
        np.testing.assert_allclose(
            got_g, spatial_to_pixel(np.array(want_g), inter.spacing), rtol=1e-10, atol=1e-10
        )

        # round trip sanity
        np.testing.assert_allclose(got_g, pts, atol=0.35)
