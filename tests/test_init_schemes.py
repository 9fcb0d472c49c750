"""--init_type/--init_gain weight-init parity.

The reference implements normal/xavier/kaiming/orthogonal selected by
--init_type with --init_gain (/root/reference/models/networks.py:68-99) and
applies them to the define_D/define_G nets (the inpainting generator is
built WITHOUT init_net, pix2pix_model.py:104, so it is exempt). These tests
pin the per-scheme statistics of our flax equivalents and the threading
from Pix2PixConfig into the discriminators and legacy builders.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from healthivert_tpu.models.layers import weight_init
from healthivert_tpu.models.pix2pix import Pix2PixConfig, build_modules
from healthivert_tpu.models.legacy import UnetGenerator


def _sample(init_type, gain, shape=(4, 4, 64, 128), n=4):
    ws = [
        np.asarray(weight_init(init_type, gain)(jax.random.PRNGKey(i), shape))
        for i in range(n)
    ]
    return np.stack(ws)


def test_normal_std_is_gain():
    w = _sample("normal", 0.05)
    assert abs(w.std() - 0.05) < 0.002
    assert abs(w.mean()) < 0.002


def test_xavier_std():
    # torch xavier_normal_(gain): std = gain * sqrt(2/(fan_in+fan_out))
    kh, kw, cin, cout = 4, 4, 64, 128
    fan_in, fan_out = cin * kh * kw, cout * kh * kw
    expect = 0.02 * np.sqrt(2.0 / (fan_in + fan_out))
    w = _sample("xavier", 0.02, (kh, kw, cin, cout))
    assert abs(w.std() / expect - 1.0) < 0.05


def test_kaiming_std_ignores_gain():
    # torch kaiming_normal_(a=0, fan_in): std = sqrt(2/fan_in); the reference
    # passes no gain through (networks.py:88)
    kh, kw, cin, cout = 4, 4, 64, 128
    expect = np.sqrt(2.0 / (cin * kh * kw))
    for gain in (0.02, 1.0):
        w = _sample("kaiming", gain, (kh, kw, cin, cout))
        assert abs(w.std() / expect - 1.0) < 0.05


def test_orthogonal_columns():
    # flattened (fan_in, out) matrix has orthonormal columns scaled by gain
    gain = 0.7
    w = np.asarray(weight_init("orthogonal", gain)(jax.random.PRNGKey(0), (3, 3, 16, 32)))
    m = w.reshape(-1, 32)
    gram = m.T @ m
    np.testing.assert_allclose(gram, gain**2 * np.eye(32), atol=1e-4)


def test_unknown_scheme_raises():
    with pytest.raises(NotImplementedError):
        weight_init("bogus", 0.02)


def _disc_kernel_stats(cfg):
    gen, disc = build_modules(cfg)
    x = jnp.zeros((1, 64, 64, 1))
    params = disc.init(jax.random.PRNGKey(0), x, train=True)["params"]
    # the widest mid conv gives a stable empirical std
    k = params["conv2"]["kernel"]
    return float(jnp.std(k)), k.shape


def test_config_threads_into_discriminator():
    std_n, shape = _disc_kernel_stats(Pix2PixConfig(ngf=4, ndf=16))
    assert abs(std_n - 0.02) < 0.003  # default normal(0.02)

    std_k, shape = _disc_kernel_stats(Pix2PixConfig(ngf=4, ndf=16, init_type="kaiming"))
    kh, kw, cin, _ = shape
    assert abs(std_k / np.sqrt(2.0 / (cin * kh * kw)) - 1.0) < 0.1

    std_x, shape = _disc_kernel_stats(
        Pix2PixConfig(ngf=4, ndf=16, init_type="xavier", init_gain=1.0)
    )
    kh, kw, cin, cout = shape
    assert abs(std_x / np.sqrt(2.0 / (cin * kh * kw + cout * kh * kw)) - 1.0) < 0.1


def test_bn_scale_tracks_init_gain():
    # BatchNorm scale is ALWAYS normal(1.0, init_gain) regardless of scheme
    # (networks.py:94-96)
    gen, disc = build_modules(
        Pix2PixConfig(ngf=4, ndf=16, init_type="xavier", init_gain=0.2)
    )
    params = disc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)), train=True)["params"]
    s = params["norm1"]["scale"]
    assert abs(float(jnp.mean(s)) - 1.0) < 0.1
    assert 0.1 < float(jnp.std(s)) < 0.3


def test_legacy_unet_threads_init():
    net = UnetGenerator(num_downs=5, ngf=8, init_type="kaiming")
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)), train=True)["params"]
    k = params["down2_conv"]["kernel"]
    kh, kw, cin, _ = k.shape
    expect = np.sqrt(2.0 / (cin * kh * kw))
    assert abs(float(jnp.std(k)) / expect - 1.0) < 0.15
