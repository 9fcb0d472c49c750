"""End-to-end train-step tests: losses finite + decreasing, params update,
SN/batch-stats state threads through, and the step runs sharded on the
virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from healthivert_tpu.data.synthetic import SyntheticDataset
from healthivert_tpu.models.pix2pix import (
    Pix2PixConfig,
    init_state,
    linear_lr_scale,
    train_step,
)
from healthivert_tpu.parallel import make_mesh, replicate_state, shard_batch

CFG = Pix2PixConfig(ngf=4, ndf=8, image_size=64)


def _batch(bs=2, size=64, seed=0):
    ds = SyntheticDataset(
        batch_size=bs, seed=seed, shape=(size, size, 16),
        vert_ids=(19, 20), vert_height=14, gap=8,
    )
    b = ds.sample_batch()
    return {k: jnp.asarray(v) for k, v in b.items()}


@pytest.fixture
def state0():
    return init_state(jax.random.PRNGKey(0), CFG, batch_size=2)


def test_train_step_runs_and_losses_finite(state0):
    batch = _batch()
    # train_step donates the state; snapshot leaves before calling
    flat = lambda tree: np.concatenate(
        [np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(tree)]
    )
    before = {
        name: flat(tree)
        for name, tree in [
            ("g", state0.g_params), ("d1", state0.d1_params),
            ("d2", state0.d2_params), ("d3", state0.d3_params),
        ]
    }
    state1, losses = train_step(state0, batch, jnp.float32(2e-4), CFG)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    # all four optimizers advanced params
    after = {
        "g": state1.g_params, "d1": state1.d1_params,
        "d2": state1.d2_params, "d3": state1.d3_params,
    }
    for name, tree in after.items():
        assert not np.allclose(before[name], flat(tree)), name
    assert int(state1.step) == 1
    # expected loss set matches the reference's logged names
    for name in ["G_GAN", "G_maskL1", "G_Dice", "coarse_Dice", "edge",
                 "D_real_1", "D_fake_1", "D_real_2", "D_fake_2", "D_real_3",
                 "D_fake_3", "h"]:
        assert name in losses


def test_loss_decreases_over_steps(state0):
    state = state0
    batch = _batch()
    first = last = None
    for i in range(8):
        state, losses = train_step(state, batch, jnp.float32(2e-4), CFG)
        tot = float(losses["G_maskL1"]) + float(losses["h"])
        if first is None:
            first = tot
        last = tot
    assert last < first, (first, last)


def test_train_step_sharded_8dev():
    mesh = make_mesh("data:8")
    state = init_state(jax.random.PRNGKey(0), CFG, batch_size=8)
    state = replicate_state(state, mesh)
    batch = _batch(bs=8, seed=1)
    batch = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
    state1, losses = train_step(state, batch, jnp.float32(2e-4), CFG)
    assert np.isfinite(float(losses["G_maskL1"]))
    # params stay replicated
    leaf = jax.tree_util.tree_leaves(state1.g_params)[0]
    assert leaf.sharding.is_fully_replicated


@pytest.mark.parametrize(
    "net_d,norm,gan_mode",
    [
        ("pixel", "instance", "wgangp"),
        ("n_layers", "none", "lsgan"),
        ("basic", "instance", "wgangp"),
        ("seg", "batch", "vanilla"),
    ],
)
def test_train_step_config_matrix(net_d, norm, gan_mode):
    """Full train step at config-matrix corners no oracle covers (define_D
    dispatch x norm x GANLoss variants): one step, finite losses, params
    move."""
    cfg = Pix2PixConfig(
        ngf=4, ndf=8, image_size=64, net_d=net_d, norm=norm,
        gan_mode=gan_mode, n_layers_d=2,
    )
    state = init_state(jax.random.PRNGKey(0), cfg, batch_size=2)
    g_before = np.concatenate(
        [np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(state.g_params)]
    )
    state, losses = train_step(state, _batch(), jnp.float32(2e-4), cfg)
    assert all(np.isfinite(float(v)) for v in losses.values()), losses
    g_after = np.concatenate(
        [np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(state.g_params)]
    )
    assert not np.array_equal(g_before, g_after)


def test_vmap_discriminators_matches_sequential():
    """The opt-in stacked/vmapped D1-3 update variant (a measured TPU
    negative, kept for the record — Pix2PixConfig.vmap_discriminators) must
    produce the same step as the default sequential path."""
    # crop_d3=False: the stacked variant needs shape-identical D inputs
    cfg_s = Pix2PixConfig(ngf=4, ndf=8, image_size=64, crop_d3=False)
    cfg_v = Pix2PixConfig(ngf=4, ndf=8, image_size=64, crop_d3=False,
                          vmap_discriminators=True)
    batch = _batch()
    lr = jnp.float32(2e-4)
    s_seq = init_state(jax.random.PRNGKey(0), cfg_s, batch_size=2)
    s_vm = init_state(jax.random.PRNGKey(0), cfg_v, batch_size=2)
    s_seq, l_seq = train_step(s_seq, dict(batch), lr, cfg_s)
    s_vm, l_vm = train_step(s_vm, dict(batch), lr, cfg_v)
    for k in l_seq:
        np.testing.assert_allclose(
            float(l_vm[k]), float(l_seq[k]), rtol=2e-5, atol=2e-5, err_msg=k
        )
    for name in ("g_params", "d1_params", "d2_params", "d3_params"):
        a = jax.tree_util.tree_leaves(getattr(s_seq, name))
        b = jax.tree_util.tree_leaves(getattr(s_vm, name))
        for x, y in zip(a, b):
            np.testing.assert_allclose(
                np.asarray(y), np.asarray(x), rtol=2e-5, atol=2e-5
            )


def test_gan_head_preupdate_lr0_exact():
    """cfg.gan_head_preupdate (G-head GAN terms against PRE-update Ds so XLA
    can CSE the D(fake) forwards — a documented opt-in deviation) differs
    from the default only through the D optimizer step. At lr=0 the Adam
    delta is zero, pre-update == post-update params, and BatchNorm train-mode
    normalization uses batch (not running) stats — so the two modes must be
    EXACTLY equal, pinning that the rewiring touches nothing else."""
    cfg_ref = Pix2PixConfig(ngf=4, ndf=8, image_size=64,
                            gan_head_preupdate=False)  # reference semantics
    cfg_p = Pix2PixConfig(ngf=4, ndf=8, image_size=64, gan_head_preupdate=True)
    batch = _batch()
    lr = jnp.float32(0.0)
    s_base = init_state(jax.random.PRNGKey(0), cfg_ref, batch_size=2)
    s_pre = init_state(jax.random.PRNGKey(0), cfg_p, batch_size=2)
    s_base, l_base = train_step(s_base, dict(batch), lr, cfg_ref)
    s_pre, l_pre = train_step(s_pre, dict(batch), lr, cfg_p)
    for k in l_base:
        np.testing.assert_array_equal(np.asarray(l_pre[k]), np.asarray(l_base[k]), err_msg=k)
    for name in ("g_params", "d1_params", "d2_params", "d3_params"):
        a = jax.tree_util.tree_leaves(getattr(s_base, name))
        b = jax.tree_util.tree_leaves(getattr(s_pre, name))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_gan_head_preupdate_trains():
    """At a real lr the preupdate variant is a (tiny) semantic deviation —
    it must still run finite and update every parameter group."""
    cfg_p = Pix2PixConfig(ngf=4, ndf=8, image_size=64, gan_head_preupdate=True)
    batch = _batch()
    s = init_state(jax.random.PRNGKey(0), cfg_p, batch_size=2)
    g0 = jax.tree_util.tree_leaves(s.g_params)[0].copy()
    s, losses = train_step(s, dict(batch), jnp.float32(2e-4), cfg_p)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert not np.array_equal(np.asarray(jax.tree_util.tree_leaves(s.g_params)[0]), np.asarray(g0))


def test_remat_matches_baseline():
    """cfg.remat (jax.checkpoint around the retained-vjp generator forward)
    recomputes instead of storing activations — same math, so every loss and
    every updated parameter must match the non-remat step."""
    cfg_r = Pix2PixConfig(ngf=4, ndf=8, image_size=64, remat=True)
    batch = _batch()
    lr = jnp.float32(2e-4)
    s_base = init_state(jax.random.PRNGKey(0), CFG, batch_size=2)
    s_rem = init_state(jax.random.PRNGKey(0), cfg_r, batch_size=2)
    s_base, l_base = train_step(s_base, dict(batch), lr, CFG)
    s_rem, l_rem = train_step(s_rem, dict(batch), lr, cfg_r)
    for k in l_base:
        np.testing.assert_allclose(
            float(l_rem[k]), float(l_base[k]), rtol=1e-6, atol=1e-6, err_msg=k
        )
    for name in ("g_params", "d1_params", "d2_params", "d3_params"):
        a = jax.tree_util.tree_leaves(getattr(s_base, name))
        b = jax.tree_util.tree_leaves(getattr(s_rem, name))
        for x, y in zip(a, b):
            np.testing.assert_allclose(
                np.asarray(y), np.asarray(x), rtol=1e-6, atol=1e-6
            )


def test_linear_lr_scale():
    assert linear_lr_scale(1, 1, 200, 800) == 1.0
    assert linear_lr_scale(200, 1, 200, 800) == pytest.approx(1 - 1 / 801)
    assert linear_lr_scale(1000, 1, 200, 800) == pytest.approx(1 - 801 / 801)


def test_lr_schedule_policies():
    import types

    from healthivert_tpu.models.pix2pix import LRSchedule

    base = dict(epoch_count=1, n_epochs=10, n_epochs_decay=10, lr_decay_iters=5)
    lin = LRSchedule(types.SimpleNamespace(lr_policy="linear", **base))
    assert lin.scale(1) == 1.0 and lin.scale(20) < 0.1

    # --continue_train resume: the schedule is a function of the ABSOLUTE
    # epoch only — a late epoch_count must reproduce the fresh-run value
    # exactly (the reference's restarted LambdaLR counter + lambda_rule's
    # +epoch_count compose to the same thing). Regression: the old code
    # double-counted epoch_count and went NEGATIVE here.
    resumed = LRSchedule(
        types.SimpleNamespace(lr_policy="linear", epoch_count=15, n_epochs=10,
                              n_epochs_decay=10, lr_decay_iters=5)
    )
    for e in (15, 17, 20):
        assert resumed.scale(e) == pytest.approx(lin.scale(e))
        assert resumed.scale(e) >= 0.0

    step = LRSchedule(types.SimpleNamespace(lr_policy="step", **base))
    assert step.scale(4) == 1.0 and step.scale(5) == pytest.approx(0.1)

    cos = LRSchedule(types.SimpleNamespace(lr_policy="cosine", **base))
    assert cos.scale(0) == 1.0 and cos.scale(10) == pytest.approx(0.0, abs=1e-9)

    plat = LRSchedule(types.SimpleNamespace(lr_policy="plateau", lr=2e-4, **base))
    for _ in range(8):
        s = plat.scale(1, metric=1.0)  # no improvement
    assert s == pytest.approx(0.2)


def test_band_crop_preserves_d3_support():
    """ops/geometry.band_crop must contain EVERY nonzero pixel of D3's input
    (mask * img * center-columns) for band masks anywhere in the frame —
    including clamped at the top and bottom edges."""
    from healthivert_tpu.ops import geometry as geo

    rng = np.random.default_rng(0)
    s = 256
    center = np.asarray(geo.local_crop_mask(s, s))[..., None]
    for min_x in [0, 1, 2, 20, 100, 180, s - 41, s - 40]:
        img = rng.normal(size=(s, s, 1)).astype(np.float32)
        mask = np.zeros((s, s, 1), np.float32)
        mask[min_x: min_x + 41] = 1.0  # inclusive-end band: 41 rows
        local = mask * img * center
        crop = np.asarray(geo.band_crop(jnp.asarray(local), jnp.asarray(mask)))
        assert crop.shape == (48, 128, 1)
        np.testing.assert_allclose(np.abs(crop).sum(), np.abs(local).sum(),
                                   rtol=1e-6)

    # batched variant agrees with per-sample
    imgs = rng.normal(size=(3, s, s, 1)).astype(np.float32)
    masks = np.zeros((3, s, s, 1), np.float32)
    for i, mx in enumerate([0, 77, 215]):
        masks[i, mx: mx + 41] = 1.0
    out = np.asarray(geo.band_crop_batch(
        jnp.asarray(imgs * masks * center), jnp.asarray(masks), 48, 128))
    for i in range(3):
        one = np.asarray(geo.band_crop(
            jnp.asarray(imgs[i] * masks[i] * center), jnp.asarray(masks[i])))
        np.testing.assert_array_equal(out[i], one)


def test_crop_d3_train_step():
    """crop_d3 (the r5 default): the step runs, losses are finite, all four
    nets update, and the non-D3 loss terms match the full-frame path exactly
    (the crop only touches D3's input; G's forward and the D1/D2 chains are
    untouched — D1/D2 losses and every non-GAN G term must be
    bit-identical)."""
    cfg = Pix2PixConfig(ngf=4, ndf=8, image_size=64, crop_d3=True)
    cfg_full = Pix2PixConfig(ngf=4, ndf=8, image_size=64, crop_d3=False)
    batch = _batch()
    state = init_state(jax.random.PRNGKey(0), cfg, batch_size=2)
    state_ref = init_state(jax.random.PRNGKey(0), cfg_full, batch_size=2)
    s1, losses = train_step(state, batch, jnp.float32(2e-4), cfg)
    _, losses_ref = train_step(state_ref, batch, jnp.float32(2e-4), cfg_full)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert int(s1.step) == 1
    for k in ["D_fake_1", "D_real_1", "D_fake_2", "D_real_2", "G_maskL1",
              "G_Dice", "coarse_Dice", "edge", "h"]:
        assert float(losses[k]) == float(losses_ref[k]), k
    # D3 sees undiluted content: its loss must differ from the padded path
    assert float(losses["D_fake_3"]) != float(losses_ref["D_fake_3"])


def test_crop_d3_rejects_vmap_discriminators():
    cfg = Pix2PixConfig(ngf=4, ndf=8, image_size=64, crop_d3=True,
                        vmap_discriminators=True)
    state = init_state(jax.random.PRNGKey(0), cfg, batch_size=2)
    with pytest.raises(ValueError, match="incompatible"):
        train_step(state, _batch(), jnp.float32(2e-4), cfg)


def test_plateau_matches_torch():
    """Golden oracle: our plateau schedule reproduces torch's
    ReduceLROnPlateau(mode=min, factor=0.2, threshold=0.01, patience=5)
    (get_scheduler, /root/reference/models/networks.py:57-58) lr-for-lr on
    sequences exercising rel-threshold improvements, long plateaus with
    multiple reductions down to the eps=1e-8 floor, and recoveries."""
    import types

    import torch

    from healthivert_tpu.models.pix2pix import LRSchedule

    rng = np.random.default_rng(42)
    sequences = [
        # monotone plateau: repeated reductions until the eps floor
        [1.0] * 60,
        # sub-threshold "improvements" (rel mode: 0.5% better is NOT better)
        list(1.0 * 0.995 ** np.arange(30)),
        # real improvements interleaved with plateaus
        [5.0, 4.0, 4.0, 4.0, 4.0, 4.0, 4.0, 4.0, 3.0] + [3.0] * 10 + [1.0, 0.9],
        # random walks
        list(rng.uniform(0.5, 2.0, size=50)),
        list(np.abs(np.cumsum(rng.normal(0, 0.1, size=50))) + 0.1),
        # negative metrics (rel threshold flips meaning when best < 0)
        list(-np.abs(rng.uniform(0.5, 2.0, size=40))),
    ]
    base_lr = 2e-4
    for seq in sequences:
        opt = types.SimpleNamespace(lr_policy="plateau", lr=base_lr,
                                    epoch_count=1, n_epochs=10,
                                    n_epochs_decay=10, lr_decay_iters=5)
        sched = LRSchedule(opt)
        p = torch.nn.Parameter(torch.zeros(1))
        topt = torch.optim.Adam([p], lr=base_lr)
        tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            topt, mode="min", factor=0.2, threshold=0.01, patience=5)
        for e, m in enumerate(seq):
            ours = sched.scale(e, metric=float(m)) * base_lr
            tsched.step(float(m))
            theirs = topt.param_groups[0]["lr"]
            assert ours == pytest.approx(theirs, rel=1e-12), (
                f"epoch {e}, metric {m}: ours {ours} vs torch {theirs}")


def test_train_step_bfloat16():
    cfg = Pix2PixConfig(ngf=4, ndf=8, image_size=64, compute_dtype="bfloat16")
    state = init_state(jax.random.PRNGKey(0), cfg, batch_size=2)
    batch = _batch()
    state, losses = train_step(state, batch, jnp.float32(2e-4), cfg)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_reproducibility_same_seed():
    """Same seed -> identical synthetic batches and identical first-step loss."""
    def run():
        ds = SyntheticDataset(
            batch_size=2, seed=7, shape=(64, 64, 16),
            vert_ids=(19, 20), vert_height=14, gap=8,
        )
        b = {k: jnp.asarray(v) for k, v in ds.sample_batch().items()}
        state = init_state(jax.random.PRNGKey(3), CFG, batch_size=2)
        _, losses = train_step(state, b, jnp.float32(2e-4), CFG)
        return b, {k: float(v) for k, v in losses.items()}

    b1, l1 = run()
    b2, l2 = run()
    for k in b1:
        np.testing.assert_array_equal(np.asarray(b1[k]), np.asarray(b2[k]))
    assert l1 == l2
