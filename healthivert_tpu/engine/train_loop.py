"""The training driver: epoch loop, LR schedule, checkpoints, periodic eval.

Structure parity with /root/reference/train.py:162-236 (print/save cadences,
eval every 15 epochs, 'latest'+epoch checkpoints), TPU-native internals:
state replicated over a device mesh, batches sharded on the 'data' axis,
one jitted step, no host syncs except the printed losses at print_freq.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from healthivert_tpu.data import create_dataset
from healthivert_tpu.data.prefetch import prefetch_to_device
from healthivert_tpu.models.pix2pix import (
    LRSchedule,
    Pix2PixConfig,
    init_state,
    train_step,
)
from healthivert_tpu.parallel import (
    ensure_initialized,
    make_mesh,
    pad_batch,
    process_batch_slice,
    replicate_state,
    shard_batch,
)
from . import checkpoint as ckpt
from .evaluate import evaluate_model
from .visualizer import HTMLGallery, Visualizer, save_images


def _save_web_visuals(g_params, g_sn, batch, cfg, run_dir, epoch, iters,
                      visualizer=None):
    """Training-time HTML gallery (reference visdom/HTML panels,
    train.py:200-203): context / fake / real / seg rows under {run}/web.
    Also mirrors the row to wandb when --use_wandb is on
    (util/visualizer.py:173-188).

    Multi-process callers must pass HOST-LOCAL params (jax.device_get of the
    replicated state): this runs on process 0 only, and a forward on the
    globally-replicated params would be a collective the other processes
    never join (observed as a Gloo rendezvous hang)."""
    import numpy as np

    from healthivert_tpu.models.pix2pix import build_modules, generator_forward

    gen, _ = build_modules(cfg)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    f = generator_forward(gen, g_params, g_sn, jb, cfg, update_sn=False)
    gallery = HTMLGallery(
        os.path.join(run_dir, "web"), "training progress", history=True
    )
    visuals = {
        "real_A": np.asarray(jb["context"][0]),
        "fake_B": np.asarray(f["fake_b"][0]),
        "real_B": np.asarray(jb["full"][0]),
        "fake_B_mask": np.asarray(f["fine_seg_bin"][0]),
        "coarse_seg": np.asarray(f["coarse_seg_bin"][0]),
        "CAM": np.asarray(jb["cam"][0]),
    }
    save_images(gallery, visuals, f"epoch{epoch:03d}_{iters:07d}",
                header=f"epoch [{epoch}] iter {iters}")
    gallery.save()
    if visualizer is not None:
        visualizer.log_images(visuals, iters)


def _print_networks(state, verbose=False):
    """Parameter-count banner, format parity with the reference's
    print_networks (/root/reference/models/base_model.py:214-230); verbose
    additionally prints the flax module tabulation."""
    print("---------- Networks initialized -------------")
    nets = [
        ("G", state.g_params), ("D_1", state.d1_params),
        ("D_2", state.d2_params), ("D_3", state.d3_params),
    ]
    for name, params in nets:
        n = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
        if verbose:
            print(jax.tree_util.tree_map(lambda l: l.shape, params))
        print("[Network %s] Total number of parameters : %.3f M" % (name, n / 1e6))
    print("-----------------------------------------------")


def run_training(opt, opt_test=None, max_steps=None, profile_steps=None):
    """Main entry (train.py CLI). Returns the final TrainState."""
    if getattr(opt, "compute_dtype", "float32") == "int8":
        raise SystemExit(
            "--compute_dtype int8 is inference-only (post-training "
            "quantization; no straight-through estimator) — train in "
            "bfloat16/float32 and pass int8 to test.py / eval_3d"
        )
    cfg = Pix2PixConfig(
        ngf=16,
        ndf=opt.ndf,
        net_d=getattr(opt, "netD", "basic"),
        n_layers_d=getattr(opt, "n_layers_D", 3),
        norm=getattr(opt, "norm", "batch"),
        lr=opt.lr,
        beta1=opt.beta1,
        lambda_l1=getattr(opt, "lambda_L1", 200.0),
        gan_mode=opt.gan_mode,
        init_type=getattr(opt, "init_type", "normal"),
        init_gain=getattr(opt, "init_gain", 0.02),
        image_size=opt.crop_size,
        compute_dtype=getattr(opt, "compute_dtype", "float32"),
        # MEASURED (v5e bf16, experiments/bwd_prof.py): with the kernel
        # emitting its s/probs/nrm VMEM intermediates as residuals, the
        # pallas path wins training at every batch size (fwd+bwd 10.5 vs
        # 10.7 ms @bs16, 33.9 vs 44.4 @bs64 against the XLA formulation).
        pallas_attention=jax.default_backend() == "tpu",
        remat=getattr(opt, "remat", False),
        gan_head_preupdate=getattr(opt, "gan_head_preupdate", True),
        crop_d3=getattr(opt, "crop_d3", True),
    )
    # multi-host: init jax.distributed when the standard env vars ask for it
    # (the reference's parallelism is single-process DataParallel,
    # /root/reference/models/networks.py:112-116; here DP spans hosts)
    multiproc = ensure_initialized()
    is_main = jax.process_index() == 0
    mesh = make_mesh(opt.mesh)
    n_data = mesh.shape.get("data", 1)
    if opt.batch_size % max(n_data, 1) != 0:
        raise ValueError(
            f"batch_size {opt.batch_size} must divide by data-axis size {n_data}"
        )
    local_bs = opt.batch_size // jax.process_count()
    if multiproc and opt.batch_size % jax.process_count() != 0:
        raise ValueError(
            f"batch_size {opt.batch_size} must divide by process count "
            f"{jax.process_count()}"
        )

    dataset = create_dataset(opt)
    print(f"The number of training images = {len(dataset)}")

    eval_dataset = None
    if opt_test is not None:
        try:
            eval_dataset = create_dataset(opt_test)
        except FileNotFoundError as e:
            print(f"eval split unavailable ({e}); training without periodic eval")

    run_dir = os.path.join(opt.checkpoints_dir, opt.name)
    os.makedirs(run_dir, exist_ok=True)
    # logs / web visuals / checkpoints are written by process 0 only
    visualizer = Visualizer(opt) if is_main else None

    state = init_state(jax.random.PRNGKey(opt.seed), cfg)
    if is_main:
        _print_networks(state, verbose=getattr(opt, "verbose", False))
    if getattr(opt, "load_pth", None):
        # training resume loads G + sibling D_1..3 files when present
        # (load_networks parity, base_model.py:189-212)
        state = ckpt.restore_full_pth(
            state, opt.load_pth, n_layers_d=getattr(opt, "n_layers_D", 3)
        )
    resume_tag = ckpt.resolve_tag(opt)  # --load_iter N > 0 picks iter_N
    if opt.continue_train and ckpt.latest_exists(run_dir, resume_tag):
        state = ckpt.restore_checkpoint(state, run_dir, resume_tag)
        print(f"resumed from {run_dir}/{resume_tag} at step {int(state.step)}")
    # host-side mirror of state.step (resume step + iterations). Used for the
    # profiler bracket and --max_steps so the loop never needs a blocking
    # int(state.step) device fetch per iteration (~0.5-1 s RTT each on the
    # tunneled backend).
    host_step = int(state.step)
    state = replicate_state(state, mesh)

    total_iters = 0
    done = False
    profiling = False
    if profile_steps and host_step >= profile_steps[1]:
        print(
            f"warning: --profile_steps window {profile_steps} is entirely "
            f"before the resume step {host_step}; no trace will be written"
        )
        profile_steps = None
    schedule = LRSchedule(opt)
    last_metric = None
    local = process_batch_slice(opt.batch_size)

    def _prep(b):
        # trailing partial batches (dataset drop_last=False parity) are
        # padded back to the static size by repetition: no recompile,
        # mesh-divisible. One step per epoch weights the repeats double —
        # the reference instead runs a genuinely smaller step there.
        n = next(iter(b.values())).shape[0]
        if multiproc and n > local_bs:
            # dataset yielded the GLOBAL batch on every process (e.g. the
            # synthetic dataset): keep only this process's disjoint slice
            b = pad_batch(b, opt.batch_size)
            b = {k: v[local] for k, v in b.items()}
        else:
            # dataset is process-aware (AlignedDataset) or single-process
            b = pad_batch(b, local_bs)
        return b, shard_batch(b, mesh, global_batch=opt.batch_size)

    for epoch in range(opt.epoch_count, opt.n_epochs + opt.n_epochs_decay + 1):
        epoch_start = time.time()
        lr = opt.lr * schedule.scale(epoch, last_metric)
        print(f"learning rate {lr:.7f} for epoch {epoch}")
        epoch_iter = 0
        iter_data_time = time.time()
        batches = prefetch_to_device(dataset, _prep, depth=2)
        for batch, sb in batches:
            iter_start = time.time()
            t_data = iter_start - iter_data_time
            total_iters += opt.batch_size
            epoch_iter += opt.batch_size
            # >= so a --continue_train resume landing inside [START, STOP)
            # still produces a (shortened) trace; the pre-loop guard cleared
            # profile_steps when the whole window precedes the resume step
            if profile_steps and not profiling and host_step >= profile_steps[0]:
                jax.profiler.start_trace(os.path.join(run_dir, "profile"))
                profiling = True
            state, losses = train_step(state, sb, jnp.float32(lr), cfg)
            host_step += 1
            if profiling and host_step >= profile_steps[1]:
                # value fetch, not block_until_ready: the latter returns
                # early on the tunneled backend (CLAUDE.md)
                float(jax.tree_util.tree_leaves(losses)[0])
                jax.profiler.stop_trace()
                profiling = False
                profile_steps = None  # one-shot window: don't re-arm START
                print(f"profiler trace written to {run_dir}/profile")

            if total_iters % opt.print_freq < opt.batch_size:
                host_losses = {k: float(v) for k, v in losses.items()}
                bad = [k for k, v in host_losses.items() if not np.isfinite(v)]
                if bad:
                    # failure detection (SURVEY.md §5: absent in the reference):
                    # stop rather than burn epochs on a diverged run
                    if profiling:
                        # the trace of the diverging steps is the one you
                        # most want — flush before raising
                        jax.profiler.stop_trace()
                        print(f"profiler trace (divergence abort) written to {run_dir}/profile")
                    raise FloatingPointError(
                        f"non-finite losses at step {int(state.step)}: {bad}"
                    )
                t_comp = (time.time() - iter_start) / opt.batch_size
                if is_main:
                    visualizer.print_current_losses(epoch, epoch_iter, host_losses, t_comp, t_data)
                    visualizer.log_scalars("train", host_losses, total_iters)

            if is_main and getattr(opt, "display_freq", 0) and total_iters % opt.display_freq < opt.batch_size:
                gp, gs = state.g_params, state.g_sn
                if multiproc:  # see _save_web_visuals docstring
                    gp, gs = jax.device_get((gp, gs))
                _save_web_visuals(gp, gs, batch, cfg, run_dir, epoch, total_iters, visualizer)

            # checkpoint saves run on EVERY process: orbax coordinates
            # internally (a cross-process sync barrier; only the primary
            # host writes) — gating on is_main would deadlock the barrier
            if total_iters % opt.save_latest_freq < opt.batch_size:
                tag = f"iter_{total_iters}" if opt.save_by_iter else "latest"
                ckpt.save_checkpoint(state, run_dir, tag)
            iter_data_time = time.time()
            if max_steps is not None and host_step >= max_steps:
                done = True
                break

        if epoch % opt.save_epoch_freq == 0 or done:
            ckpt.save_checkpoint(state, run_dir, "latest")
            ckpt.save_checkpoint(state, run_dir, epoch)

        if eval_dataset is not None and epoch % getattr(opt, "eval_freq", 15) == 0:
            # multi-process: params are fully replicated, so the eval forward
            # runs on host-local copies on EVERY process (identical compute,
            # no collectives -> no cross-process sync hazard); only process 0
            # logs. Keeping all processes on the same code path also keeps
            # the plateau LR policy's metric identical everywhere.
            g_params, g_sn = state.g_params, state.g_sn
            if multiproc:
                g_params = jax.device_get(g_params)
                g_sn = jax.device_get(g_sn)
            avg = evaluate_model(
                g_params, g_sn, eval_dataset, cfg,
                out_dir=os.path.join(run_dir, "eval_imgs") if is_main else None,
                epoch=epoch,
                # single-process multi-chip: shard eval batches too
                mesh=mesh if (not multiproc and mesh.devices.size > 1) else None,
            )
            if avg:
                last_metric = -avg["ssim"]  # plateau policy input (minimized)
                if is_main:
                    visualizer.log_scalars("eval", avg, epoch)
                    print(
                        f"epoch[{epoch}] SSIM: {avg['ssim']:.4f} PSNR: {avg['psnr']:.2f} "
                        f"Dice: {avg['dice']:.4f} IoU: {avg['iou']:.4f} DiffH: {avg['diff_h']:.2f}"
                    )
        print(
            f"End of epoch {epoch} / {opt.n_epochs + opt.n_epochs_decay} \t "
            f"Time Taken: {int(time.time() - epoch_start)} sec"
        )
        if done:
            break
    if profiling:
        # STOP landed past the last step (short run / --max_steps / resume):
        # flush the trace instead of silently losing it
        jax.profiler.stop_trace()
        print(f"profiler trace (truncated at run end) written to {run_dir}/profile")
    return state, cfg
