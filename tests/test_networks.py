"""Shape/dtype/state tests for generator + discriminators on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from healthivert_tpu.models.discriminator import NLayerDiscriminator, gan_loss
from healthivert_tpu.models.generator import Generator
from healthivert_tpu.models.layers import SNConv


@pytest.fixture(scope="module")
def gen_setup():
    model = Generator(cnum=8)
    b, h = 2, 64
    x = jnp.zeros((b, h, h, 1))
    mask = jnp.zeros((b, h, h, 1))
    cam = jnp.zeros((b, h, h, 1))
    ratio = jnp.zeros((b,))
    variables = model.init(jax.random.PRNGKey(0), x, mask, cam, ratio)
    return model, variables, (x, mask, cam, ratio)


def test_generator_shapes(gen_setup):
    model, variables, (x, mask, cam, ratio) = gen_setup
    out, new_state = model.apply(variables, x, mask, cam, ratio, mutable=["sn"])
    b, h = x.shape[0], x.shape[1]
    assert out.coarse_seg.shape == (b, h, h, 1)
    assert out.fine_seg.shape == (b, h, h, 1)
    assert out.x_stage1.shape == (b, h, h, 1)
    assert out.x_stage2.shape == (b, h, h, 1)
    assert out.pred1_h.shape == (b,)
    assert out.pred2_h.shape == (b,)
    assert out.offsets.shape == (b, h // 8, h // 8, 2)
    # output ranges
    assert float(out.x_stage2.min()) >= -1.0 and float(out.x_stage2.max()) <= 1.0
    assert float(out.fine_seg.min()) >= 0.0 and float(out.fine_seg.max()) <= 1.0


def test_generator_sn_state_updates(gen_setup):
    model, variables, args = gen_setup
    _, s1 = model.apply(variables, *args, mutable=["sn"])
    u_before = jax.tree_util.tree_leaves(variables["sn"])[0]
    u_after = jax.tree_util.tree_leaves(s1["sn"])[0]
    assert u_before.shape == u_after.shape
    assert not np.allclose(np.asarray(u_before), np.asarray(u_after))


def test_snconv_normalizes_spectrum(rng):
    """After power iterations, the largest singular value of the effective
    weight must be ~1 (the defining property of spectral norm)."""
    m = SNConv(features=8, kernel_size=3, padding=1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32)) * 5
    variables = m.init(jax.random.PRNGKey(1), x)
    # scale kernel so sigma != 1 initially
    params = jax.tree_util.tree_map(lambda p: p * 7.0, variables["params"])
    state = {"params": params, "sn": variables["sn"]}
    for _ in range(30):
        _, upd = m.apply(state, x, mutable=["sn"])
        state = {"params": params, "sn": upd["sn"]}
    kernel = params["kernel"]
    mat = np.asarray(kernel).reshape(-1, 8).T
    u = np.asarray(state["sn"]["u"])
    v = mat.T @ u
    v /= np.linalg.norm(v)
    u2 = mat @ v
    u2 /= np.linalg.norm(u2)
    sigma_est = u2 @ mat @ v
    sigma_true = np.linalg.svd(mat, compute_uv=False)[0]
    assert sigma_est == pytest.approx(sigma_true, rel=1e-3)


def test_discriminator_shapes_and_batchstats():
    d = NLayerDiscriminator(ndf=16)
    x = jnp.zeros((2, 256, 256, 1))
    variables = d.init(jax.random.PRNGKey(0), x, train=True)
    out, new_state = d.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 30, 30, 1)  # 70x70 PatchGAN logit map
    assert "batch_stats" in new_state
    # eval mode uses running averages, no mutation needed
    out_eval = d.apply(variables, x, train=False)
    assert out_eval.shape == (2, 30, 30, 1)


def test_gan_loss_vanilla_matches_torch():
    import torch
    import torch.nn.functional as F

    logits = np.linspace(-3, 3, 12).reshape(3, 4).astype(np.float32)
    for real in (True, False):
        got = float(gan_loss(jnp.asarray(logits), real, "vanilla"))
        t = torch.from_numpy(logits)
        want = float(
            F.binary_cross_entropy_with_logits(t, torch.full_like(t, 1.0 if real else 0.0))
        )
        assert got == pytest.approx(want, rel=1e-5)
    # lsgan
    assert float(gan_loss(jnp.asarray(logits), True, "lsgan")) == pytest.approx(
        float(((logits - 1) ** 2).mean()), rel=1e-5
    )


@pytest.mark.parametrize(
    "net_d,n_layers_d,norm,out_hw",
    [
        ("basic", 3, "batch", 30),       # 70x70 PatchGAN on 256 input
        ("basic", 3, "instance", 30),
        ("basic", 3, "none", 30),
        ("n_layers", 2, "batch", 62),    # one fewer stride-2 stage
        ("n_layers", 4, "batch", 14),
        ("pixel", 3, "batch", 256),      # 1x1 PixelGAN preserves H,W
        ("pixel", 3, "instance", 256),
    ],
)
def test_define_d_dispatch_shapes(net_d, n_layers_d, norm, out_hw):
    """--netD/--n_layers_D/--norm select the discriminator (define_D parity,
    reference networks.py:163-209)."""
    import jax

    from healthivert_tpu.models.pix2pix import Pix2PixConfig, build_modules

    cfg = Pix2PixConfig(ngf=4, ndf=8, net_d=net_d, n_layers_d=n_layers_d, norm=norm)
    _, d = build_modules(cfg)
    x = jnp.zeros((2, 256, 256, 1), jnp.float32)
    variables = d.init(jax.random.PRNGKey(0), x, train=True)
    if norm == "batch":
        assert "batch_stats" in variables
    else:
        assert "batch_stats" not in variables
    out = d.apply(variables, x, train=True, mutable=["batch_stats"])[0]
    assert out.shape == (2, out_hw, out_hw, 1)


def test_define_d_seg_variant_trains():
    """--netD seg builds the shared-encoder seg discriminator; the train step
    consumes its patch logits."""
    import jax

    from healthivert_tpu.data.synthetic import SyntheticDataset
    from healthivert_tpu.models.legacy import SegDiscriminator
    from healthivert_tpu.models.pix2pix import (
        Pix2PixConfig, build_modules, init_state, train_step,
    )

    cfg = Pix2PixConfig(ngf=4, ndf=8, net_d="seg", image_size=64)
    _, d = build_modules(cfg)
    assert isinstance(d, SegDiscriminator)

    ds = SyntheticDataset(batch_size=2, seed=0, shape=(64, 64, 16),
                          vert_ids=(19, 20), vert_height=14, gap=8)
    batch = {k: jnp.asarray(v) for k, v in ds.sample_batch().items()}
    state = init_state(jax.random.PRNGKey(0), cfg, batch_size=2)
    state, losses = train_step(state, batch, jnp.float32(2e-4), cfg)
    assert np.isfinite(float(losses["D_real_1"]))
    assert int(state.step) == 1


def test_unknown_netd_raises():
    from healthivert_tpu.models.pix2pix import Pix2PixConfig, build_modules

    with pytest.raises(NotImplementedError):
        build_modules(Pix2PixConfig(net_d="nope"))
