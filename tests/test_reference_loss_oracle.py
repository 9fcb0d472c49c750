"""Numeric parity of the FULL 12-loss training objective vs the reference's
own Pix2PixModel (torch CPU, imported from /root/reference as an oracle).

One `optimize_parameters()` call on the reference model and one `train_step`
here, on identical weights (reference state dicts shipped through
utils/pth.py for G and all three discriminators) and an identical batch,
with lr=0 so Adam leaves parameters untouched and the post-D-update G losses
are comparable without requiring bitwise optimizer parity. This pins, in one
shot: the generator forward + SHRM paste-back geometry, the D1/D2/D3 input
choices (fake_B / binarized fine seg / center-cropped local band), BatchNorm
train-mode semantics, GANLoss, the masked-L1 area rescale, both Dice terms,
the Sobel edge loss, and the height loss — every term of
pix2pix_model.py:267-354.

Skipped when torch or /root/reference is unavailable.
"""

import math
from argparse import Namespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_loader import (  # noqa: E402
    converge_spectral_norm,
    load_reference_models,
    neutralize_cuda,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)

B, S = 2, 256


def _make_batch():
    """One deterministic training batch in BOTH layouts (torch NCHW dict with
    the reference's key names / our NHWC dict)."""
    rng = np.random.default_rng(42)
    base = rng.standard_normal((B, 1, S // 8, S // 8)).astype(np.float32)
    full = torch.nn.functional.interpolate(
        torch.from_numpy(base), scale_factor=8, mode="bilinear", align_corners=False
    ).clamp(-1, 1).numpy()

    x1 = np.array([102, 98], np.int64)
    height = np.array([36, 38], np.int64)
    x2 = x1 + height
    mask = np.zeros((B, 1, S, S), np.float32)
    vert_seg = np.zeros((B, 1, S, S), np.float32)
    normal_vert = np.zeros((B, 1, S, S), np.float32)
    for i in range(B):
        mask[i, :, 100:140, :] = 1.0  # fixed 40-row band (aligned_dataset.py:213-231)
        vert_seg[i, :, x1[i] : x2[i], 60:196] = 1.0
        normal_vert[i, :, 98:138, 64:192] = 1.0
    context = full * (1 - mask)
    cam = rng.random((B, 1, S, S)).astype(np.float32)
    slice_ratio = rng.random((B,)).astype(np.float32)

    torch_batch = {
        "A": torch.from_numpy(context),
        "B": torch.from_numpy(full),
        "A_mask": torch.from_numpy(vert_seg),
        "CAM": torch.from_numpy(cam),
        "normal_vert": torch.from_numpy(normal_vert),
        "height": torch.from_numpy(height),
        "mask": torch.from_numpy(mask),
        "slice_ratio": torch.from_numpy(slice_ratio),
        "x1": torch.from_numpy(x1),
        "x2": torch.from_numpy(x2),
        "h2": torch.full((B,), 40.0),
        "A_paths": ["a"] * B,
        "B_paths": ["b"] * B,
    }
    nhwc = lambda a: jnp.asarray(np.transpose(a, (0, 2, 3, 1)))
    our_batch = {
        "context": nhwc(context),
        "full": nhwc(full),
        "vert_seg": nhwc(vert_seg),
        "normal_vert": nhwc(normal_vert),
        "cam": nhwc(cam),
        "mask": nhwc(mask),
        "slice_ratio": jnp.asarray(slice_ratio),
        "height": jnp.asarray(height.astype(np.int32)),
        "x1": jnp.asarray(x1.astype(np.int32)),
        "x2": jnp.asarray(x2.astype(np.int32)),
    }
    return torch_batch, our_batch


def _oracle_losses(tmp, gan_mode, net_d, n_layers_d):
    neutralize_cuda(torch)
    pix2pix_model = load_reference_models(
        "inpaint_tools",
        "inpaint_networks",
        "networks",
        "UnetG_CT_mask",
        "edge_operator",
        "base_model",
        "pix2pix_model",
    )[-1]

    opt = Namespace(
        gpu_ids=[],
        isTrain=True,
        checkpoints_dir=str(tmp),
        name="oracle",
        preprocess="none",
        direction="AtoB",
        gan_mode=gan_mode,
        lr=0.0,  # Adam with lr=0 leaves every parameter untouched
        beta1=0.5,
        lambda_L1=200.0,
        input_nc=1,
        output_nc=1,
        ndf=16,
        netD=net_d,
        n_layers_D=n_layers_d,
        norm="batch",
        init_type="normal",
        init_gain=0.02,
    )
    torch.manual_seed(0)
    ref = pix2pix_model.Pix2PixModel(opt)
    for mod in ref.netG.modules():
        if hasattr(mod, "use_cuda"):
            mod.use_cuda = False
    converge_spectral_norm(torch, ref.netG, iters=120)

    torch_batch, our_batch = _make_batch()
    ref.set_input(torch_batch)
    ref.optimize_parameters()
    ref_losses = {k: float(v) for k, v in ref.get_current_losses().items()}

    # ship every net's weights through the .pth reader into our train state
    g_pth = str(tmp / "latest_net_G.pth")
    torch.save(ref.netG.state_dict(), g_pth)
    d_pths = []
    for i, net in enumerate([ref.netD_1, ref.netD_2, ref.netD_3], start=1):
        p = str(tmp / f"latest_net_D_{i}.pth")
        torch.save(net.state_dict(), p)
        d_pths.append(p)

    from healthivert_tpu.models.pix2pix import Pix2PixConfig, init_state, train_step
    from healthivert_tpu.utils.pth import load_discriminator_pth, load_generator_pth

    cfg = Pix2PixConfig(
        ngf=16, ndf=16, image_size=S, gan_mode=gan_mode,
        net_d=net_d, n_layers_d=n_layers_d,
        # reference-exact semantics: the r5 throughput deviations change
        # D3's patch-mean normalization (crop_d3) — the oracle pins the
        # faithful path that --no-gan_head_preupdate --no-crop_d3 selects
        gan_head_preupdate=False, crop_d3=False,
    )
    state = init_state(jax.random.PRNGKey(0), cfg, batch_size=B)
    g_params, g_sn, _ = load_generator_pth(g_pth, state.g_params, state.g_sn)
    eff_layers = 3 if net_d == "basic" else n_layers_d
    d1p, d1s, n1 = load_discriminator_pth(
        d_pths[0], state.d1_params, state.d1_stats, n_layers=eff_layers
    )
    d2p, d2s, _ = load_discriminator_pth(
        d_pths[1], state.d2_params, state.d2_stats, n_layers=eff_layers
    )
    d3p, d3s, _ = load_discriminator_pth(
        d_pths[2], state.d3_params, state.d3_stats, n_layers=eff_layers
    )
    if net_d == "basic":
        # conv0/conv_out w+b, conv1..3 w only (BN convs drop bias), 3 BN
        # scale+bias pairs, 3 BN mean+var pairs
        assert n1 == 4 + 3 + 6 + 6
    state = state.replace(
        g_params=g_params, g_sn=g_sn,
        d1_params=d1p, d1_stats=d1s,
        d2_params=d2p, d2_stats=d2s,
        d3_params=d3p, d3_stats=d3s,
    )
    _, our_losses = train_step(state, our_batch, jnp.float32(0.0), cfg)
    our_losses = {k: float(v) for k, v in our_losses.items()}
    return ref_losses, our_losses


@pytest.fixture(scope="module")
def losses_pair(tmp_path_factory):
    """Default config: gan_mode=vanilla, --netD basic (the pix2pix path)."""
    return _oracle_losses(
        tmp_path_factory.mktemp("loss_oracle"), "vanilla", "basic", 3
    )


@pytest.fixture(scope="module")
def losses_pair_lsgan(tmp_path_factory):
    """Alternate config: lsgan GAN loss + --netD n_layers 2 (define_D
    dispatch + GANLoss MSE branch under the full objective)."""
    return _oracle_losses(
        tmp_path_factory.mktemp("loss_oracle_ls"), "lsgan", "n_layers", 2
    )


LOSS_NAMES = [
    "G_GAN", "G_maskL1", "G_Dice", "coarse_Dice", "edge",
    "D_real_1", "D_fake_1", "D_real_2", "D_fake_2", "D_real_3", "D_fake_3", "h",
]


@pytest.mark.parametrize("name", LOSS_NAMES)
def test_loss_parity_vs_reference_torch(losses_pair, name):
    ref_losses, our_losses = losses_pair
    assert math.isfinite(ref_losses[name])
    assert our_losses[name] == pytest.approx(ref_losses[name], rel=2e-3, abs=2e-4), (
        f"{name}: ours={our_losses[name]} ref={ref_losses[name]}"
    )


@pytest.mark.parametrize("name", LOSS_NAMES)
def test_loss_parity_lsgan_nlayers(losses_pair_lsgan, name):
    ref_losses, our_losses = losses_pair_lsgan
    assert math.isfinite(ref_losses[name])
    assert our_losses[name] == pytest.approx(ref_losses[name], rel=2e-3, abs=2e-4), (
        f"{name}: ours={our_losses[name]} ref={ref_losses[name]}"
    )


def test_restore_full_pth_loads_g_and_ds(tmp_path):
    """restore_full_pth picks up {epoch}_net_G.pth plus sibling D files
    (load_networks parity, base_model.py:189-212)."""
    neutralize_cuda(torch)
    networks = load_reference_models("networks")

    from healthivert_tpu.engine.checkpoint import restore_full_pth
    from healthivert_tpu.models.pix2pix import Pix2PixConfig, init_state

    cfg = Pix2PixConfig(ngf=4, ndf=8, image_size=64)
    state = init_state(jax.random.PRNGKey(0), cfg)

    torch.manual_seed(3)
    # G in reference layout via the inverse-mapping helper used elsewhere
    from test_pth_loader import _tree_to_torch_sd

    rng = np.random.default_rng(3)
    params_rand = jax.tree_util.tree_map(
        lambda a: rng.standard_normal(a.shape).astype(np.float32), state.g_params
    )
    torch.save(
        _tree_to_torch_sd(params_rand, state.g_sn), str(tmp_path / "latest_net_G.pth")
    )
    # two real reference discriminators; D_2 file intentionally missing
    for i in (1, 3):
        d = networks.define_D(1, cfg.ndf, "basic", 3, "batch", "normal", 0.02, [])
        torch.save(d.state_dict(), str(tmp_path / f"latest_net_D_{i}.pth"))

    state2 = restore_full_pth(state, str(tmp_path / "latest_net_G.pth"))
    for i, changed in [(1, True), (2, False), (3, True)]:
        before = jax.tree_util.tree_leaves(getattr(state, f"d{i}_params"))
        after = jax.tree_util.tree_leaves(getattr(state2, f"d{i}_params"))
        same = all(np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after))
        assert same != changed, f"D_{i}"
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(state2.g_params)[0]),
        jax.tree_util.tree_leaves(params_rand)[0],
    )
