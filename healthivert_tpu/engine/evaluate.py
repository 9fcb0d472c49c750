"""In-training evaluation: masked SSIM/PSNR, coarse Dice, fine IoU, height
error — parity with /root/reference/train.py:50-160 — plus the eval PNG grid.

The reference moves every sample to numpy and loops; here one jitted batch
forward produces everything and only the final scalars leave the device.
"""

from __future__ import annotations

import functools
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from healthivert_tpu.models.pix2pix import Pix2PixConfig, generator_forward, build_modules
from healthivert_tpu.ops import image as I


@functools.partial(jax.jit, static_argnames=("cfg",))
def eval_batch(g_params, g_sn, batch, cfg: Pix2PixConfig, g_quant=None):
    """Per-sample metrics for one batch. Returns dict of (B,) arrays."""
    gen, _ = build_modules(cfg)
    f = generator_forward(gen, g_params, g_sn, batch, cfg, update_sn=False,
                          g_quant=g_quant)
    full = batch["full"]
    mask = batch["mask"]
    fake = f["fake_b"]

    def per_sample(fake_i, full_i, mask_i, coarse_bin, normal_i, fine_bin, vert_i, pred_h, h):
        gm = (full_i * mask_i)[:, :, 0]
        fm = (fake_i * mask_i)[:, :, 0]
        # reference data_range choices (train.py:122-125)
        dr_ssim = fake_i.max() - fake_i.min()
        dr_psnr = fake_i.max() - full_i.min()
        s = I.ssim(gm, fm, data_range=dr_ssim)
        p = I.psnr(gm, fm, data_range=dr_psnr)
        d = I.dice_score(coarse_bin, normal_i)
        iou = I.iou_score(fine_bin, vert_i)
        dh = jnp.abs(pred_h - h) / h * 100.0
        return s, p, d, iou, dh

    s, p, d, iou, dh = jax.vmap(per_sample)(
        fake, full, mask,
        f["coarse_seg_bin"], batch["normal_vert"], f["fine_seg_bin"], batch["vert_seg"],
        f["pred2_h"], batch["height"].astype(jnp.float32),
    )
    return dict(ssim=s, psnr=p, dice=d, iou=iou, diff_h=dh), f


def evaluate_model(g_params, g_sn, dataset, cfg: Pix2PixConfig, out_dir=None,
                   epoch=0, mesh=None, g_quant=None):
    """Average metrics over the eval dataset; optionally save a PNG grid of
    [context, fake, real, coarse_seg, normal, fine_seg, vert_seg, cam] rows
    (train.py:150-159).

    With `mesh`, each eval batch is sharded over the 'data' axis (per-sample
    metrics are batch-parallel, so sharding is exact); a trailing batch that
    does not divide the mesh is padded by repetition and the padded entries
    dropped from the sums."""
    sums: Dict[str, float] = {}
    count = 0
    last = None
    n_dev = mesh.shape.get("data", 1) if mesh is not None else 1
    if mesh is not None:
        import jax

        if jax.process_count() > 1:
            # multi-process eval runs host-locally on every process (see
            # train_loop); sharding a full local batch through the
            # multi-process shard_batch branch would assemble a wrong
            # global batch and turn this into a collective
            raise ValueError(
                "evaluate_model(mesh=...) is single-process only; "
                "multi-process runs evaluate host-locally per process"
            )
        from healthivert_tpu.parallel import pad_batch, replicate_state, shard_batch

        g_params, g_sn = replicate_state((g_params, g_sn), mesh)
    for batch in dataset:
        n = next(iter(batch.values())).shape[0]
        if mesh is not None:
            import numpy as _np

            batch = pad_batch(
                {k: _np.asarray(v) for k, v in batch.items()},
                -(-n // n_dev) * n_dev,
            )
            jb = shard_batch(batch, mesh)
            metrics, f = eval_batch(g_params, g_sn, jb, cfg, g_quant)
            metrics = {k: v[:n] for k, v in metrics.items()}
        else:
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            metrics, f = eval_batch(g_params, g_sn, jb, cfg, g_quant)
        for k, v in metrics.items():
            sums[k] = sums.get(k, 0.0) + float(jnp.sum(v))
        count += next(iter(metrics.values())).shape[0]
        last = (jb, f)
    if count == 0:
        return {}
    avg = {k: v / count for k, v in sums.items()}

    if out_dir is not None and last is not None:
        jb, f = last
        _save_grid(jb, f, out_dir, epoch)
    return avg


def _to_u8(x):
    x = np.asarray(x)
    lo, hi = x.min(), x.max()
    return ((x - lo) / (hi - lo + 1e-8) * 255).astype(np.uint8)


def _save_grid(jb, f, out_dir, epoch):
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    panels = [
        jb["context"], f["fake_b"], jb["full"], f["coarse_seg_bin"],
        jb["normal_vert"], f["fine_seg_bin"], jb["vert_seg"], jb["cam"],
    ]
    rows = []
    for i in range(min(4, jb["full"].shape[0])):
        rows.append(np.concatenate([_to_u8(p[i, :, :, 0]) for p in panels], axis=1))
    grid = np.concatenate(rows, axis=0)
    Image.fromarray(grid).save(os.path.join(out_dir, f"nepoch_{epoch:03d}_eval.png"))
