"""Inventory extras: edges (Prewitt/Canny), image pool, flow viz, legacy nets."""

import jax
import jax.numpy as jnp
import numpy as np

from healthivert_tpu.models.legacy import (
    DualHeadUNet,
    ResnetGenerator,
    SegDiscriminator,
    UnetGenerator,
    gradient_penalty,
)
from healthivert_tpu.ops.edges import canny_edges, prewitt_edges
from healthivert_tpu.ops.flow_viz import flow_to_image, offsets_to_flow_image
from healthivert_tpu.utils.image_pool import ImagePool


def test_prewitt_clips_and_detects_edge():
    x = jnp.zeros((1, 16, 16, 1)).at[:, :, 8:, :].set(1.0)
    e = np.asarray(prewitt_edges(x))
    assert e.max() == 1.0
    assert (e[0, :, 7:9, 0] > 0).all()
    assert e[0, 2:14, 2:5].sum() == 0  # flat region


def test_canny_thin_edges():
    x = jnp.zeros((1, 32, 32, 1)).at[:, :, 16:, :].set(1.0)
    e = np.asarray(canny_edges(x, threshold=2.0))
    # edge detected at the step, thinned to ~1 px (border columns excluded:
    # zero padding creates a faithful-to-reference artifact at the image edge)
    interior = np.nonzero(e[0, 16, 2:30, 0])[0] + 2
    assert len(interior) in (1, 2) and abs(interior.mean() - 15.5) < 1.6


def test_image_pool_mixes_history(rng):
    pool = ImagePool(4, seed=0)
    a = rng.random((4, 8, 8, 1)).astype(np.float32)
    out1 = pool.query(a)
    np.testing.assert_array_equal(out1, a)  # buffer filling: pass-through
    b = rng.random((4, 8, 8, 1)).astype(np.float32)
    out2 = pool.query(b)
    assert out2.shape == b.shape
    # pool_size=0 disables
    assert ImagePool(0).query(b) is b


def test_flow_viz_shapes(rng):
    flow = rng.standard_normal((2, 8, 8, 2)) * 3
    img = flow_to_image(flow)
    assert img.shape == (2, 8, 8, 3)
    assert img.min() >= 0 and img.max() <= 255
    off = rng.integers(0, 8, (1, 8, 8, 2))
    rgb = offsets_to_flow_image(off, upscale=4)
    assert rgb.shape == (1, 32, 32, 3)
    assert rgb.max() <= 1.0


def test_legacy_networks_shapes():
    x = jnp.zeros((1, 64, 64, 2))
    m = DualHeadUNet(num_downs=4, ngf=8)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    ct, mask = m.apply(v, x, train=False)
    assert ct.shape == (1, 64, 64, 1) and mask.shape == (1, 64, 64, 1)
    assert float(mask.min()) >= 0 and float(mask.max()) <= 1

    g = UnetGenerator(num_downs=5, ngf=8)
    v = g.init(jax.random.PRNGKey(0), x, train=False)
    out = g.apply(v, x, train=False)
    assert out.shape == (1, 64, 64, 1)
    assert float(out.min()) >= -1 and float(out.max()) <= 1

    r = ResnetGenerator(ngf=8, n_blocks=2)
    v = r.init(jax.random.PRNGKey(0), x, train=False)
    assert r.apply(v, x, train=False).shape == (1, 64, 64, 1)

    d = SegDiscriminator(ndf=8)
    v = d.init(jax.random.PRNGKey(0), x, train=False)
    logits, seg = d.apply(v, x, train=False)
    assert logits.shape[0] == 1 and logits.shape[-1] == 1
    assert seg.shape[:1] == (1,) and seg.shape[-1] == 1


def test_gradient_penalty_positive(rng):
    from healthivert_tpu.models.discriminator import NLayerDiscriminator

    d = NLayerDiscriminator(ndf=8)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 1)).astype(np.float32))
    v = d.init(jax.random.PRNGKey(0), x, train=False)

    def disc_fn(z):
        return d.apply(v, z, train=False)

    gp = gradient_penalty(disc_fn, x, x * 0.5, jax.random.PRNGKey(1))
    assert np.isfinite(float(gp)) and float(gp) >= 0
