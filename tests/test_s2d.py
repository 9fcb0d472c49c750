"""Exact-parity tests for the space-to-depth conv transforms (ops/s2d.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from healthivert_tpu.ops import s2d


def _conv(x, w, stride=1, pad=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv_pads(x, w, stride, pads):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pads, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.random((2, 8, 10, 3)).astype(np.float32))
    y = s2d.space_to_depth(x)
    assert y.shape == (2, 4, 5, 12)
    np.testing.assert_array_equal(np.asarray(s2d.depth_to_space(y)), np.asarray(x))
    # layout: channel-major (c*4 + di*2+dj)
    np.testing.assert_array_equal(np.asarray(y[0, 1, 2, 2 * 4 + 1]), np.asarray(x[0, 2, 5, 2]))


@pytest.mark.parametrize("k", [3, 5])
@pytest.mark.parametrize("c,f", [(3, 16), (16, 8), (33, 32), (8, 1)])
def test_kernel_s2d_s2d_exact(rng, k, c, f):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, k, c, f)).astype(np.float32))
    want = _conv(x, w, stride=1, pad=(k - 1) // 2)
    got = s2d.depth_to_space(
        _conv(s2d.space_to_depth(x), s2d.kernel_s2d_s2d(w), stride=1, pad=1)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("c,f", [(16, 32), (16, 16)])
def test_kernel_s2d_down_exact(rng, c, f):
    """stride-2 pad-1 3x3 conv == 2x2 stride-1 conv on the s2d input."""
    x = jnp.asarray(rng.standard_normal((2, 16, 16, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, c, f)).astype(np.float32))
    want = _conv(x, w, stride=2, pad=1)
    got = _conv_pads(
        s2d.space_to_depth(x), s2d.kernel_s2d_down(w), 1, ((1, 0), (1, 0))
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_bias_and_upsample_s2d(rng):
    from healthivert_tpu.ops.image import resize_nearest

    b = jnp.asarray(rng.random(5).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(s2d.bias_s2d(b)), np.repeat(np.asarray(b), 4))

    z = jnp.asarray(rng.random((2, 4, 4, 3)).astype(np.float32))
    want = resize_nearest(z, 8, 8)
    got = s2d.depth_to_space(s2d.upsample2x_as_s2d(z))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_s2d_concat_commutes(rng):
    """channel-major layout: s2d(concat(a, b)) == concat(s2d(a), s2d(b))."""
    a = jnp.asarray(rng.random((1, 6, 6, 3)).astype(np.float32))
    b = jnp.asarray(rng.random((1, 6, 6, 2)).astype(np.float32))
    lhs = s2d.space_to_depth(jnp.concatenate([a, b], -1))
    rhs = jnp.concatenate([s2d.space_to_depth(a), s2d.space_to_depth(b)], -1)
    np.testing.assert_array_equal(np.asarray(lhs), np.asarray(rhs))
