"""Golden tests for band/context/paste geometry vs naive numpy slicing that
mirrors the reference's dynamic-shape implementation."""

import numpy as np
import jax.numpy as jnp

from healthivert_tpu.ops import geometry as G


def _np_band(x1, x2, width, band=40):
    mask_x = (x1 + x2) // 2
    if mask_x <= band // 2:
        min_x = 0
    elif width - mask_x <= band / 2:
        min_x = width - band
    else:
        min_x = mask_x - band // 2
    return min_x, min_x + band


def test_band_bounds_matches_reference_cases():
    width = 256
    for x1, x2 in [(100, 130), (2, 20), (240, 255), (0, 39), (216, 255), (10, 60)]:
        want = _np_band(x1, x2, width)
        got = G.band_bounds(jnp.int32(x1), jnp.int32(x2), width)
        assert (int(got[0]), int(got[1])) == want, (x1, x2)


def test_shift_context_matches_numpy(rng):
    h, w = 64, 32
    img = rng.random((h, w)).astype(np.float32)
    x1, x2 = 25, 47
    min_x, max_x = _np_band(x1, x2, h)
    want = np.zeros_like(img)
    want[:min_x] = img[x1 - min_x : x1]
    want[max_x:] = img[x2 : x2 + (h - max_x)]
    got = np.asarray(
        G.shift_context(jnp.asarray(img), jnp.int32(x1), jnp.int32(x2), jnp.int32(min_x), jnp.int32(max_x))
    )
    np.testing.assert_allclose(got, want)


def _np_shrm_paste(fake, real, pred_h, real_height, x1, x2):
    """Mirror of pix2pix_model.py:207-227 in plain numpy."""
    import math

    h = fake.shape[0]
    height = math.ceil(pred_h)
    if height < real_height:
        height = real_height
    hd = height - real_height
    x_upper = x1 - hd // 2
    x_bottom = x_upper + height
    out = np.zeros_like(fake)
    out[x_upper:x_bottom] = fake[x_upper:x_bottom]
    out[:x_upper] += real[hd // 2 : x1]
    out[x_bottom:] += real[x2 : x2 + h - x_bottom]
    return out


def test_shrm_paste_matches_numpy(rng):
    h, w = 256, 64
    fake = rng.random((h, w)).astype(np.float32)
    real = rng.random((h, w)).astype(np.float32)
    for x1, x2, pred in [(100, 130, 36.4), (100, 130, 20.0), (90, 128, 38.0), (10, 45, 40.0)]:
        rh = x2 - x1
        want = _np_shrm_paste(fake, real, pred, rh, x1, x2)
        got = np.asarray(
            G.shrm_paste(jnp.asarray(fake), jnp.asarray(real), jnp.float32(pred), jnp.int32(rh), jnp.int32(x1), jnp.int32(x2))
        )
        np.testing.assert_allclose(got, want, atol=1e-6), (x1, x2, pred)


def test_shrm_paste_batch_shapes(rng):
    b, h, w = 4, 256, 64
    fake = jnp.asarray(rng.random((b, h, w, 1)).astype(np.float32))
    real = jnp.asarray(rng.random((b, h, w, 1)).astype(np.float32))
    pred = jnp.asarray([36.0, 20.0, 38.0, 40.0], jnp.float32)
    x1 = jnp.asarray([100, 100, 90, 10], jnp.int32)
    x2 = jnp.asarray([130, 130, 128, 45], jnp.int32)
    out = G.shrm_paste_batch(fake, real, pred, x2 - x1, x1, x2)
    assert out.shape == (b, h, w, 1)


def test_local_crop_mask():
    m = np.asarray(G.local_crop_mask(256, 256))
    assert m.shape == (256, 256)
    assert m[:, 93:163].all() and not m[:, :93].any() and not m[:, 163:].any()


def test_min_area_rect_empty_raises():
    import numpy as np
    import pytest

    from healthivert_tpu.ops import native_geometry as ng

    with pytest.raises(ValueError):
        ng.min_area_rect(np.zeros((0, 2)))


def test_min_area_rect_duplicate_points_both_paths():
    """n identical points degenerate the hull to duplicates; the native
    kernel used to skip every zero-length caliper edge and return the
    all-zero rect (code-review r3) — both paths must return the point."""
    import numpy as np

    from healthivert_tpu.ops import native_geometry as ng

    pts = np.tile([[7.0, 3.0]], (5, 1))
    for impl in (ng.min_area_rect, ng._min_area_rect_np):
        c, ctr = impl(pts)
        np.testing.assert_allclose(c, [[7, 3]] * 4)
        np.testing.assert_allclose(ctr, [7, 3])


def test_fill_convex_quad_native_fallback_parity():
    """The numpy fallback must rasterize the SAME pixels as the native
    kernel (std::lround = half away from zero; np.round's half-to-even
    differed on the routine exact-.5 intersections of integer corners)."""
    import numpy as np
    import pytest

    from healthivert_tpu.ops import native_geometry as ng

    if not ng.have_native():
        pytest.skip("native geometry lib unavailable")
    rng = np.random.default_rng(0)
    for _ in range(50):
        quad_pts = rng.integers(0, 30, (6, 2)).astype(np.float64)
        corners, _ = ng.min_area_rect(quad_pts)
        native = ng.fill_convex_quad(corners, (32, 32))
        lib = ng._LIB
        ng._LIB = False
        try:
            fallback = ng.fill_convex_quad(corners, (32, 32))
        finally:
            ng._LIB = lib
        np.testing.assert_array_equal(native, fallback)
