"""The HealthiVert-GAN training graph: one jitted step updating D1/D2/D3/G.

TPU-native re-design of /root/reference/models/pix2pix_model.py:
- the reference's four sequential backward()+step() calls with
  set_requires_grad toggling become four jax.grad regions in ONE compiled
  step (stop_gradient replaces .detach(); partitioned grads replace
  requires_grad switches); the update order (D1, D2, D3, then G against the
  updated discriminators) is preserved
- the SHRM paste-back per-sample Python loop with .item() syncs
  (pix2pix_model.py:207-252) is the static-shape gather in ops.geometry
- BatchNorm in the discriminators uses the global batch statistics under
  pjit (sync-BN); the reference's DataParallel computed per-GPU stats

Loss surface (weights exactly as pix2pix_model.py:331-353):
  G_GAN   = (gan(D1(fake)) + gan(D2(fake_seg)) + gan(D3(fake_local))) / 6
  maskL1  = (L1(fake,real) + L1(fake_coarse,real)) * .5 * lambda_L1
            * (W*W / count_nonzero(mask)) * 2
  coarse_Dice = (1 - dice(coarse_seg, normal_vert)) * 10
  G_Dice  = (1 - dice(fine_seg, vert_seg)) * 15
  edge    = mse(sobel(binarized fine_seg), sobel(vert_seg)) * 800
  h       = mean(|pred1_h - h|/h * 40 + |pred2_h - h|/h * 40)

Note (faithful reproduction): D2's GAN term and the edge term flow through a
hard 0.5 threshold, so — exactly as in the reference — they contribute no
gradient to G; they are still computed and logged.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from healthivert_tpu.ops import geometry as geo
from healthivert_tpu.ops.image import sobel_edges, dice_coeff
from .discriminator import NLayerDiscriminator, PixelDiscriminator, gan_loss
from .generator import Generator


@dataclasses.dataclass(frozen=True)
class Pix2PixConfig:
    """Static training config (hashable; passed as a jit-static argument).

    ngf=16: the reference hard-codes the generator width to 16 regardless of
    the --ngf flag (pix2pix_model.py:103)."""

    ngf: int = 16
    ndf: int = 64
    net_d: str = "basic"  # basic | n_layers | pixel | seg (define_D parity)
    n_layers_d: int = 3  # effective when net_d == 'n_layers'
    norm: str = "batch"  # batch | instance | none (discriminator norm layers)
    lr: float = 2e-4
    beta1: float = 0.5
    lambda_l1: float = 200.0
    gan_mode: str = "vanilla"
    # --init_type/--init_gain (networks.py:68-99): applies to the
    # discriminators (define_D -> init_net parity); the two-stage generator
    # keeps its own init, as the reference builds it WITHOUT init_net
    # (pix2pix_model.py:104).
    init_type: str = "normal"  # normal | xavier | kaiming | orthogonal
    init_gain: float = 0.02
    maxheight: float = 40.0
    image_size: int = 256
    compute_dtype: str = "float32"  # float32 | bfloat16 | int8 (params stay
    # f32; int8 = inference-only post-training-quantized generator convs)
    pallas_attention: bool = False  # fused attention kernel (TPU only)
    compute_offsets: bool = False  # attention argmax offsets (flow viz)
    # MEASURED NEGATIVE on v5e (round 3): stacking D1/D2/D3 params and
    # vmapping the three update chains + G-head forwards into single
    # dispatches LOSES — 84.8 ms vs 79.2 @bs16, 218.4 vs 193.5 @bs64
    # (experiments/train_prof.py). vmap-over-params lowers each conv to a
    # batch-grouped conv, which the TPU conv emitter handles worse than
    # three back-to-back plain convs. Kept as an opt-in variant, pinned
    # equal to the sequential path by tests/test_train_step.py.
    vmap_discriminators: bool = False
    # Rematerialize the generator forward in the backward pass
    # (jax.checkpoint around the single retained-vjp forward): peak HBM drops
    # by the generator's activation footprint at the cost of ~one extra G
    # forward per step (~+29% @bs16 on v5e). Use to fit train batches that
    # otherwise OOM; numerics are unchanged (pinned by
    # tests/test_train_step.py::test_remat_matches_baseline).
    remat: bool = False
    # DOCUMENTED DEVIATION (DEFAULT-ON since r5): compute the G-head GAN
    # terms against the PRE-update discriminators instead of the reference's
    # post-update ones (pix2pix_model.py:356-382 updates D first, then G
    # against updated Ds). The D(fake) forward inside each D update and the
    # G-head D(fake) forward then share identical subexpressions, which XLA
    # CSE merges — saving one full PatchGAN forward per discriminator per
    # step. The discriminators are the FAT nets here (ndf=64..512 vs ngf=16:
    # one basic-D forward is ~6.2 GFLOP/sample vs the whole two-stage
    # generator's 13.8), so this is a real cut: +4.1% train throughput
    # @bs128 on v5e (experiments/train_trace.py). GAN-theoretically this is
    # the standard simultaneous (Jacobi-style) update instead of the
    # reference's alternating (Gauss-Seidel) one. Exactly equal to False at
    # lr=0 (pinned by tests/test_train_step.py); quality validated at the
    # full 1000-step bs32 recipe on-chip (r5: step-1000 eval SSIM 0.9445 /
    # PSNR 29.2 / Dice 0.9886 / IoU 0.977 vs the r4 post-update baseline
    # 0.933 / 27.6 / 0.988 / 0.979 — at or above on every metric).
    # --no-gan_head_preupdate restores exact reference update semantics.
    gan_head_preupdate: bool = True
    # DOCUMENTED DEVIATION (DEFAULT-ON since r5): feed D3 a static 48x128
    # crop around the band mask instead of the full frame. D3's input
    # (mask * fake_B * center-column window, reference pix2pix_model.py:
    # 254-260) is nonzero on ≤41 rows × 70 cols, yet the reference convolves
    # the full 256² of zeros through the ndf=64 PatchGAN — ~10.7x the FLOPs
    # of the content. The crop provably contains every nonzero pixel
    # (ops/geometry.band_crop) so D3 and the G gradient through it see all
    # the information; what changes is the GAN-loss normalization (the
    # patch-logit mean no longer averages ~90% zero-vs-zero patches, so
    # D3's learning signal is UNdiluted — a strictly sharper local critic)
    # and D3's BatchNorm statistics (computed over content, not
    # zero-padding). MEASURED (v5e, experiments/crop_d3_bench.py r5): train
    # step 255.5 -> 219.2 ms @bs128 (+16.6%; 500.9 -> 583.8 sl/s), +8.4%
    # @bs16. Quality validated at the full 1000-step bs32 recipe on-chip
    # (step-1000 eval SSIM 0.9331 / PSNR 27.40 / Dice 0.9878 / IoU 0.9868 /
    # DiffH 1.74 vs the r4 full-frame baseline 0.933 / 27.6 / 0.988 /
    # 0.979 / ~1.8 — at parity, IoU/DiffH better). --no-crop_d3 restores
    # the reference's full-frame D3; incompatible with vmap_discriminators
    # (the three D inputs no longer share shapes).
    crop_d3: bool = True


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    g_params: Any
    g_sn: Any
    d1_params: Any
    d1_stats: Any
    d2_params: Any
    d2_stats: Any
    d3_params: Any
    d3_stats: Any
    opt_g: Any
    opt_d1: Any
    opt_d2: Any
    opt_d3: Any


def build_modules(cfg: Pix2PixConfig):
    """Build (generator, discriminator). The discriminator dispatch mirrors
    define_D (/root/reference/models/networks.py:163-209): basic = 3-layer
    PatchGAN, n_layers = PatchGAN with --n_layers_D convs, pixel = 1x1
    PixelGAN, seg = shared-encoder PatchGAN + UNet seg decoder (the seg
    head's output is ignored by the GAN losses; only the patch logits feed
    them — see _d_forward)."""
    # "int8" is an inference-only sentinel consumed by SNConv (quantized
    # convs); discriminators never run at int8 (training forbids it)
    dtype = {"bfloat16": jnp.bfloat16, "int8": "int8"}.get(cfg.compute_dtype)
    gen = Generator(
        cnum=cfg.ngf, dtype=dtype, use_pallas_attention=cfg.pallas_attention,
        compute_offsets=cfg.compute_offsets,
    )
    if dtype == "int8":
        dtype = jnp.bfloat16
    init = dict(init_type=cfg.init_type, init_gain=cfg.init_gain)
    if cfg.net_d == "basic":
        d = NLayerDiscriminator(ndf=cfg.ndf, n_layers=3, norm=cfg.norm, dtype=dtype, **init)
    elif cfg.net_d == "n_layers":
        d = NLayerDiscriminator(
            ndf=cfg.ndf, n_layers=cfg.n_layers_d, norm=cfg.norm, dtype=dtype, **init
        )
    elif cfg.net_d == "pixel":
        d = PixelDiscriminator(ndf=cfg.ndf, norm=cfg.norm, dtype=dtype, **init)
    elif cfg.net_d == "seg":
        from .legacy import SegDiscriminator

        d = SegDiscriminator(ndf=cfg.ndf, n_layers=cfg.n_layers_d, **init)
    else:
        raise NotImplementedError(f"Discriminator model name [{cfg.net_d}] is not recognized")
    return gen, d


def make_optimizer(cfg: Pix2PixConfig):
    # torch.optim.Adam(lr, betas=(beta1, 0.999)) — lr applied dynamically so
    # the epoch-level linear decay schedule stays outside the compiled step.
    return optax.scale_by_adam(b1=cfg.beta1, b2=0.999, eps=1e-8)


def init_state(rng: jax.Array, cfg: Pix2PixConfig, batch_size: int = 1) -> TrainState:
    gen, disc = build_modules(cfg)
    s = cfg.image_size
    x = jnp.zeros((batch_size, s, s, 1))
    ratio = jnp.zeros((batch_size,))
    kg, k1, k2, k3 = jax.random.split(rng, 4)
    gv = gen.init(kg, x, x, x, ratio)
    d1 = disc.init(k1, x, train=True)
    d2 = disc.init(k2, x, train=True)
    d3 = disc.init(k3, x, train=True)
    opt = make_optimizer(cfg)
    # instance/none norm variants carry no batch_stats collection
    empty = {}
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=gv["params"],
        g_sn=gv["sn"],
        d1_params=d1["params"],
        d1_stats=d1.get("batch_stats", empty),
        d2_params=d2["params"],
        d2_stats=d2.get("batch_stats", empty),
        d3_params=d3["params"],
        d3_stats=d3.get("batch_stats", empty),
        opt_g=opt.init(gv["params"]),
        opt_d1=opt.init(d1["params"]),
        opt_d2=opt.init(d2["params"]),
        opt_d3=opt.init(d3["params"]),
    )


def generator_forward(
    gen: Generator,
    g_params,
    g_sn,
    batch: Dict[str, jnp.ndarray],
    cfg: Pix2PixConfig,
    update_sn: bool = True,
    g_quant=None,
):
    """Full forward incl. SHRM paste-back (pix2pix_model.py:180-264).

    g_quant: optional static int8 activation-scale tree (calibrate_int8);
    when given (and cfg.compute_dtype == "int8") the quantized convs use the
    calibrated per-tensor constants instead of per-sample dynamic scales."""
    if cfg.compute_dtype in ("bfloat16", "int8"):
        batch = {
            k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 and v.ndim == 4 else v)
            for k, v in batch.items()
        }
    cam_inv = 1.0 - batch["cam"]
    variables = {"params": g_params, "sn": g_sn}
    if g_quant is not None:
        variables["quant"] = g_quant
    if update_sn:
        out, mut = gen.apply(
            variables,
            batch["context"], batch["mask"], cam_inv, batch["slice_ratio"],
            mutable=["sn"],
        )
        new_sn = mut["sn"]
    else:
        out = gen.apply(
            variables,
            batch["context"], batch["mask"], cam_inv, batch["slice_ratio"],
        )
        new_sn = g_sn
    pred1_h = out.pred1_h * cfg.maxheight
    pred2_h = out.pred2_h * cfg.maxheight

    height = batch["height"].astype(jnp.int32)
    x1 = batch["x1"].astype(jnp.int32)
    x2 = batch["x2"].astype(jnp.int32)
    full = batch["full"]
    fake_b = geo.shrm_paste_batch(out.x_stage2, full, pred2_h, height, x1, x2)
    fake_b_coarse = geo.shrm_paste_batch(out.x_stage1, full, pred1_h, height, x1, x2)

    fine_seg_bin = (out.fine_seg > 0.5).astype(out.fine_seg.dtype)
    coarse_seg_bin = (out.coarse_seg > 0.5).astype(out.coarse_seg.dtype)

    s = cfg.image_size
    center = geo.local_crop_mask(s, s)[None, :, :, None]
    fake_local = batch["mask"] * fake_b * center
    real_local = batch["mask"] * full * center

    return dict(
        gen=out,
        new_sn=new_sn,
        pred1_h=pred1_h,
        pred2_h=pred2_h,
        fake_b=fake_b,
        fake_b_coarse=fake_b_coarse,
        fine_seg_bin=fine_seg_bin,
        coarse_seg_bin=coarse_seg_bin,
        fake_local=fake_local,
        real_local=real_local,
        fake_edges=sobel_edges(fine_seg_bin),
        real_edges=sobel_edges(batch["vert_seg"]),
    )


# Default calibration percentile for "auto" static-int8 scales. r5 sweep on
# the shipped checkpoint with bf16 output heads (experiments/
# int8_static_quality.py, calib held out from eval): p99.5 SSIM 0.9301 /
# PSNR 27.84 / IoU 0.9698 vs p99.9 0.9283 / 27.55 / 0.9730 vs bf16
# 0.9317 / 27.61 / 0.9767 — 99.5 is the balanced point (beats bf16 PSNR,
# SSIM within 0.002, IoU within 0.007); absmax (None) trails on all three.
INT8_CALIB_PERCENTILE = 99.5


def calib_to_quant(calib_tree, percentile=None):
    """Map a mutable-["calib"] output tree (per-conv activation stats sown
    by SNConv) to the "quant" variable tree SNConv reads: act_absmax (or
    the chosen entry of the act_pq quantile vector) -> act_scale = stat/127.

    percentile clips the top activation mass above that quantile, spending
    the 8-bit grid on the bulk (saturating conv inputs beyond the calibrated
    quantile instead of stretching the grid over outliers). Must be one of
    layers.CALIB_PERCENTILES — SNConv sows the whole grid in one sort, so
    sweeping costs nothing extra (experiments/int8_static_quality.py)."""
    from .layers import CALIB_PERCENTILES

    if percentile is not None and percentile not in CALIB_PERCENTILES:
        raise ValueError(
            f"percentile must be one of {CALIB_PERCENTILES} (the act_pq "
            f"calibration grid), got {percentile}")
    qidx = None if percentile is None else CALIB_PERCENTILES.index(percentile)

    def walk(node):
        out = {}
        for k, v in node.items():
            if k in ("act_absmax", "act_pq"):
                if (k == "act_pq") != (qidx is not None):
                    continue
                v = v[0] if isinstance(v, tuple) else v
                if qidx is not None:
                    v = v[qidx]
                out["act_scale"] = jnp.maximum(v.astype(jnp.float32), 1e-12) / 127.0
            else:
                out[k] = walk(v)
        return out

    return walk(calib_tree)


def merge_calib(a, b):
    """Elementwise-max merge of two calib trees (multi-batch calibration)."""
    if a is None:
        return b
    return jax.tree.map(jnp.maximum, a, b)


def calibrate_int8(gen: Generator, g_params, g_sn, batches, cfg: Pix2PixConfig,
                   percentile=None, return_calib=False):
    """Offline per-tensor int8 activation calibration (VERDICT r3 #3).

    Runs the int8 generator over the given generator_forward-style batches
    with the "calib" collection mutable — each SNConv sows its activation
    absmax — and returns the static "quant" tree to pass back in as
    generator_forward(..., g_quant=...). Static scales remove the dynamic
    abs->reduce_max->quantize HBM sweeps from every conv (the reason int8
    lost to bf16 in BENCH_r03) and are batch-composition invariant by
    construction.

    return_calib=True returns the raw merged calib tree instead (one
    calibration pass then serves a whole percentile sweep via repeated
    calib_to_quant calls — experiments/int8_static_quality.py)."""

    @jax.jit
    def one(g_params, g_sn, batch):
        b = {
            k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 and v.ndim == 4 else v)
            for k, v in batch.items()
        }
        _, mut = gen.apply(
            {"params": g_params, "sn": g_sn},
            b["context"], b["mask"], 1.0 - b["cam"], b["slice_ratio"],
            mutable=["calib"],
        )
        return mut["calib"]

    calib = None
    for batch in batches:
        calib = merge_calib(calib, jax.device_get(one(g_params, g_sn, batch)))
    if calib is None:
        raise ValueError("calibrate_int8 needs at least one batch")
    if return_calib:
        return calib
    return calib_to_quant(calib, percentile=percentile)


def _d_forward(disc, params, stats, x):
    out, mut = disc.apply(
        {"params": params, "batch_stats": stats}, x, train=True, mutable=["batch_stats"]
    )
    # --netD seg returns (patch_logits, seg_map); the GAN losses consume the
    # patch logits only (the reference's pix2pix path never trains the seg
    # head either — GANLoss on the raw tuple would be a crash there).
    logits = out[0] if isinstance(out, tuple) else out
    return logits, mut.get("batch_stats", {})


def _update_sn_tree(params, sn):
    """One power iteration on every stored u vector, from the weights alone
    (the same update SNConv applies in-place during a mutable forward).

    MEASURED NEGATIVE (v5e): batching the ~47 matvecs into shape-grouped
    einsums is NOT faster (3.0 vs 2.8 ms standalone) — stacking the kernels
    into (g, d, out) copies costs more than the tiny-matmul savings."""

    def upd(path, u):
        node = params
        for p in path[:-1]:
            node = node[p.key]
        k = node["kernel"]
        mat = k.reshape(-1, k.shape[-1]).T  # (out, d)
        v = mat.T @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u_new = mat @ v
        return u_new / (jnp.linalg.norm(u_new) + 1e-12)

    return jax.tree_util.tree_map_with_path(upd, sn)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    lr: jnp.ndarray,
    cfg: Pix2PixConfig = Pix2PixConfig(),
):
    """One full optimization step: D1, D2, D3, then G (reference order,
    pix2pix_model.py:356-382). Returns (new_state, losses dict).

    The generator runs ONCE: jax.vjp keeps its pullback so the G gradient is
    taken after the discriminators update (the reference retains the autograd
    graph the same way, pix2pix_model.py:357,380-382); SN power-iteration
    state advances from the weights alone."""
    gen, disc = build_modules(cfg)
    opt = make_optimizer(cfg)
    full = batch["full"]
    losses = {}

    def g_outputs(g_params):
        f = generator_forward(gen, g_params, state.g_sn, batch, cfg, update_sn=False)
        return (
            f["fake_b"], f["fake_b_coarse"], f["gen"].coarse_seg, f["gen"].fine_seg,
            f["pred1_h"], f["pred2_h"],
        )

    g_out_fn = jax.checkpoint(g_outputs) if cfg.remat else g_outputs
    with jax.named_scope("g_forward"):
        outs, g_vjp = jax.vjp(g_out_fn, state.g_params)
    fake_b, fake_b_coarse, coarse_seg, fine_seg, pred1_h, pred2_h = outs

    fine_seg_bin = (fine_seg > 0.5).astype(fine_seg.dtype)
    s = cfg.image_size
    center = geo.local_crop_mask(s, s)[None, :, :, None]
    fake_local = batch["mask"] * fake_b * center
    real_local = batch["mask"] * full * center
    if cfg.crop_d3:
        if cfg.vmap_discriminators:
            raise ValueError("crop_d3 is incompatible with vmap_discriminators "
                             "(the three D inputs no longer share shapes)")
        _r, _c = min(48, s), min(128, s)
        _crop = lambda x: geo.band_crop_batch(x, batch["mask"], _r, _c)
        fake_local = _crop(fake_local)
        real_local = _crop(real_local)
    real_edges = sobel_edges(batch["vert_seg"])

    # --- discriminator updates (fakes detached) ---
    def d_step(params, stats, opt_state, fake, real):
        def loss_fn(p, st):
            lf, st = _d_forward(disc, p, st, jax.lax.stop_gradient(fake))
            lr_, st = _d_forward(disc, p, st, real)
            l_fake = gan_loss(lf, False, cfg.gan_mode)
            l_real = gan_loss(lr_, True, cfg.gan_mode)
            return (l_fake + l_real) * 0.5, (st, l_fake, l_real)

        (_, (new_stats, l_fake, l_real)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, stats)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, jax.tree_util.tree_map(lambda u: -lr * u, updates))
        return params, new_stats, opt_state, l_fake, l_real

    # D1/D2/D3 are the SAME architecture (pix2pix_model.py:114-119). The
    # obvious TPU idea — stack their params and vmap the three update chains
    # into one dispatch — is a MEASURED NEGATIVE (see Pix2PixConfig.
    # vmap_discriminators): vmap-over-params lowers to batch-grouped convs.
    # Default: the reference's three sequential updates.
    if cfg.vmap_discriminators:
        stack3 = functools.partial(
            jax.tree_util.tree_map, lambda a, b, c: jnp.stack([a, b, c])
        )
        d_params3 = stack3(state.d1_params, state.d2_params, state.d3_params)
        d_stats3 = stack3(state.d1_stats, state.d2_stats, state.d3_stats)
        d_opt3 = stack3(state.opt_d1, state.opt_d2, state.opt_d3)
        fakes3 = jnp.stack([fake_b, fine_seg_bin, fake_local])
        reals3 = jnp.stack([full, batch["vert_seg"], real_local])
        d_params3, d_stats3, d_opt3, l_fake3, l_real3 = jax.vmap(d_step)(
            d_params3, d_stats3, d_opt3, fakes3, reals3
        )

        def unstack3(tree):
            return tuple(
                jax.tree_util.tree_map(lambda a: a[i], tree) for i in range(3)
            )

        d1_params, d2_params, d3_params = unstack3(d_params3)
        d1_stats, d2_stats, d3_stats = unstack3(d_stats3)
        opt_d1, opt_d2, opt_d3 = unstack3(d_opt3)
        for i in range(3):
            losses[f"D_fake_{i + 1}"] = l_fake3[i]
            losses[f"D_real_{i + 1}"] = l_real3[i]
        if cfg.gan_head_preupdate:
            h_params3 = stack3(state.d1_params, state.d2_params, state.d3_params)
            h_stats3 = stack3(state.d1_stats, state.d2_stats, state.d3_stats)
        else:
            h_params3, h_stats3 = d_params3, d_stats3
    else:
        with jax.named_scope("d1_update"):
            d1_params, d1_stats, opt_d1, losses["D_fake_1"], losses["D_real_1"] = d_step(
                state.d1_params, state.d1_stats, state.opt_d1, fake_b, full
            )
        with jax.named_scope("d2_update"):
            d2_params, d2_stats, opt_d2, losses["D_fake_2"], losses["D_real_2"] = d_step(
                state.d2_params, state.d2_stats, state.opt_d2, fine_seg_bin,
                batch["vert_seg"],
            )
        with jax.named_scope("d3_update"):
            d3_params, d3_stats, opt_d3, losses["D_fake_3"], losses["D_real_3"] = d_step(
                state.d3_params, state.d3_stats, state.opt_d3, fake_local, real_local
            )

    # G-head discriminator weights: post-update (reference semantics) or
    # pre-update (gan_head_preupdate — lets XLA CSE the D(fake) forwards
    # against the D-update branch; see the config docstring)
    if cfg.gan_head_preupdate:
        h1_params, h2_params, h3_params = state.d1_params, state.d2_params, state.d3_params
        h1_stats, h2_stats, h3_stats = state.d1_stats, state.d2_stats, state.d3_stats
    else:
        h1_params, h2_params, h3_params = d1_params, d2_params, d3_params
        h1_stats, h2_stats, h3_stats = d1_stats, d2_stats, d3_stats

    # --- generator update against the UPDATED discriminators: the loss head
    # runs on the saved forward outputs; its cotangents pull back through the
    # single retained forward graph ---
    def g_loss_head(outs):
        # reductions in f32 regardless of compute dtype
        fake_b, fake_b_coarse, coarse_seg, fine_seg, pred1_h, pred2_h = (
            o.astype(jnp.float32) for o in outs
        )
        seg_bin = (fine_seg > 0.5).astype(fine_seg.dtype)
        f_local = batch["mask"] * fake_b * center
        if cfg.crop_d3:
            f_local = geo.band_crop_batch(
                f_local, batch["mask"], min(48, s), min(128, s))
        if cfg.vmap_discriminators:
            def d_head(p, st, x):
                logits, _ = _d_forward(disc, p, st, x)
                return gan_loss(logits, True, cfg.gan_mode)

            l_gan3 = jax.vmap(d_head)(
                h_params3, h_stats3, jnp.stack([fake_b, seg_bin, f_local])
            )
            l_gan = jnp.sum(l_gan3) / 6.0
        else:
            p1, _ = _d_forward(disc, h1_params, h1_stats, fake_b)
            p2, _ = _d_forward(disc, h2_params, h2_stats, seg_bin)
            p3, _ = _d_forward(disc, h3_params, h3_stats, f_local)
            l_gan = (
                gan_loss(p1, True, cfg.gan_mode)
                + gan_loss(p2, True, cfg.gan_mode)
                + gan_loss(p3, True, cfg.gan_mode)
            ) / 6.0

        mask_count = jnp.count_nonzero(batch["mask"]).astype(jnp.float32)
        l_l1 = (
            (jnp.mean(jnp.abs(fake_b - full)) + jnp.mean(jnp.abs(fake_b_coarse - full)))
            * 0.5
            * cfg.lambda_l1
            * (s * s / jnp.maximum(mask_count, 1.0))
            * 2.0
        )
        l_coarse_dice = (1.0 - dice_coeff(coarse_seg, batch["normal_vert"])) * 10.0
        l_dice = (1.0 - dice_coeff(fine_seg, batch["vert_seg"])) * 15.0
        l_edge = jnp.mean((sobel_edges(seg_bin) - real_edges) ** 2) * 800.0
        h = batch["height"].astype(jnp.float32)
        l_h = jnp.mean(
            jnp.abs(pred1_h - h) / h * 40.0 + jnp.abs(pred2_h - h) / h * 40.0
        )
        total = l_gan + l_l1 + l_dice + l_edge + l_coarse_dice + l_h
        return total, dict(
            G_GAN=l_gan, G_maskL1=l_l1, G_Dice=l_dice, coarse_Dice=l_coarse_dice,
            edge=l_edge, h=l_h,
        )

    with jax.named_scope("g_head"):
        (g_total, g_losses), out_grads = jax.value_and_grad(g_loss_head, has_aux=True)(outs)
    with jax.named_scope("g_backward"):
        (g_grads,) = g_vjp(out_grads)
    with jax.named_scope("g_opt"):
        updates, opt_g = opt.update(g_grads, state.opt_g, state.g_params)
        g_params = optax.apply_updates(
            state.g_params, jax.tree_util.tree_map(lambda u: -lr * u, updates)
        )
    losses.update(g_losses)
    losses["G_total"] = g_total

    with jax.named_scope("sn_update"):
        new_g_sn = _update_sn_tree(state.g_params, state.g_sn)

    new_state = TrainState(
        step=state.step + 1,
        g_params=g_params,
        g_sn=new_g_sn,
        d1_params=d1_params, d1_stats=d1_stats,
        d2_params=d2_params, d2_stats=d2_stats,
        d3_params=d3_params, d3_stats=d3_stats,
        opt_g=opt_g, opt_d1=opt_d1, opt_d2=opt_d2, opt_d3=opt_d3,
    )
    return new_state, losses


def linear_lr_scale(epoch: int, epoch_count: int, n_epochs: int, n_epochs_decay: int) -> float:
    """networks.py:52-56: constant for n_epochs, then linear decay to zero."""
    return 1.0 - max(0, epoch + epoch_count - n_epochs) / float(n_epochs_decay + 1)


class LRSchedule:
    """Epoch-level LR multiplier, parity with get_scheduler
    (networks.py:39-65): linear | step | plateau | cosine.

    scale() takes the ABSOLUTE epoch (the train loop's counter). Deliberate
    deviation for step/cosine: the reference's torch schedulers count from 0
    on every launch, so a --continue_train resume restarts their decay from
    scratch; here they are functions of the absolute epoch, making resumed
    runs continue the fresh-run schedule exactly. linear compensates for the
    reference's counter restart itself (lambda_rule's +epoch_count), so it is
    resume-continuous in both implementations."""

    def __init__(self, opt):
        self.policy = getattr(opt, "lr_policy", "linear")
        self.opt = opt
        # ReduceLROnPlateau state (torch defaults: best=inf for mode=min,
        # cooldown=0, eps=1e-8, min_lr=0)
        self._plateau_best = float("inf")
        self._plateau_bad = 0
        self._plateau_cooldown = 0
        self._plateau_lr = float(getattr(opt, "lr", 2e-4))

    def scale(self, epoch: int, metric: float | None = None) -> float:
        o = self.opt
        if self.policy == "linear":
            # scale() receives the ABSOLUTE epoch. The reference's LambdaLR
            # counter restarts at 0 on every (re)launch, and lambda_rule adds
            # opt.epoch_count to recover the absolute epoch (networks.py:52-56)
            # — so convert back to the per-launch counter before applying the
            # rule. Passing the absolute epoch straight in double-counts
            # epoch_count on --continue_train resumes and drives the LR
            # negative (Adam then ASCENDS; seen in anger at epoch_count=801).
            rel = epoch - o.epoch_count + 1
            return linear_lr_scale(rel, o.epoch_count, o.n_epochs, o.n_epochs_decay)
        if self.policy == "step":
            return 0.1 ** (epoch // o.lr_decay_iters)
        if self.policy == "cosine":
            import math

            return 0.5 * (1.0 + math.cos(math.pi * epoch / o.n_epochs))
        if self.policy == "plateau":
            # torch.optim.lr_scheduler.ReduceLROnPlateau(mode='min',
            # factor=0.2, threshold=0.01, patience=5) — networks.py:57-58 —
            # reproducing torch's step() exactly: rel-threshold comparison
            # (a < best*(1-threshold)), best updates on EVERY improvement,
            # cooldown (default 0) zeroes bad-epoch counting, reductions
            # fire when num_bad > patience, and the eps=1e-8 guard skips
            # lr updates smaller than eps (flooring the decay ~1e-8).
            # Oracle-pinned against torch itself in
            # tests/test_train_step.py::test_plateau_matches_torch.
            if metric is not None:
                metric = float(metric)
                if metric < self._plateau_best * (1 - 0.01):
                    self._plateau_best = metric
                    self._plateau_bad = 0
                else:
                    self._plateau_bad += 1
                if self._plateau_cooldown > 0:
                    self._plateau_cooldown -= 1
                    self._plateau_bad = 0
                if self._plateau_bad > 5:
                    new_lr = max(self._plateau_lr * 0.2, 0.0)
                    if self._plateau_lr - new_lr > 1e-8:
                        self._plateau_lr = new_lr
                    self._plateau_cooldown = 0
                    self._plateau_bad = 0
            return self._plateau_lr / float(getattr(self.opt, "lr", 2e-4))
        raise NotImplementedError(f"learning rate policy [{self.policy}]")


# --- registry hookup -------------------------------------------------------

def _option_setter(parser, is_train):
    # pix2pix defaults (reference pix2pix_model.py:65-72): batchnorm Ds,
    # unet_256 netG name (cosmetic here — G is the inpaint Generator),
    # aligned dataset; + lambda_L1 when training
    parser.set_defaults(norm="batch", netG="unet_256", dataset_mode="aligned")
    if is_train:
        parser.set_defaults(pool_size=0, gan_mode="vanilla")
        parser.add_argument("--lambda_L1", type=float, default=200.0)
    return parser


class Pix2PixModel:
    """Thin driver-facing wrapper bundling config + state (see engine.train_loop)."""

    def __init__(self, opt):
        self.opt = opt
        self.cfg = Pix2PixConfig(
            ngf=16,  # reference hard-codes G width (pix2pix_model.py:103)
            ndf=opt.ndf,
            net_d=getattr(opt, "netD", "basic"),
            n_layers_d=getattr(opt, "n_layers_D", 3),
            norm=getattr(opt, "norm", "batch"),
            lr=opt.lr if hasattr(opt, "lr") else 2e-4,
            beta1=getattr(opt, "beta1", 0.5),
            lambda_l1=getattr(opt, "lambda_L1", 200.0),
            gan_mode=getattr(opt, "gan_mode", "vanilla"),
            image_size=opt.crop_size,
        )
        self.loss_names = [
            "G_GAN", "G_maskL1", "G_Dice", "coarse_Dice", "edge",
            "D_real_1", "D_fake_1", "D_real_2", "D_fake_2", "D_real_3", "D_fake_3", "h",
        ]
        self.state = None

    def setup(self, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(self.opt.seed)
        self.state = init_state(rng, self.cfg)
        return self


from . import register_model  # noqa: E402

register_model("pix2pix", Pix2PixModel, _option_setter)
