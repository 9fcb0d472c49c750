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
