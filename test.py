#!/usr/bin/env python
"""Test CLI: run the generator over the test split and write an HTML gallery.

Drop-in surface for /root/reference/test.py (batch 1, serial, no flip,
results under {results_dir}/{name}/{phase}_{epoch}/index.html).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from healthivert_tpu.config.options import TestOptions
from healthivert_tpu.data import create_dataset
from healthivert_tpu.engine import checkpoint as ckpt
from healthivert_tpu.engine.visualizer import HTMLGallery, save_images
from healthivert_tpu.ops.flow_viz import offsets_to_flow_image
from healthivert_tpu.models.pix2pix import (
    Pix2PixConfig,
    generator_forward,
    build_modules,
    init_state,
)


def main(argv=None):
    opt = TestOptions().parse(argv)
    # hard-coded test settings (reference test.py:45-48)
    opt.num_threads = 0 or opt.num_threads
    opt.batch_size = 1
    opt.serial_batches = True
    opt.no_flip = True

    # compute_offsets: the reference renders the attention offset flow as a
    # standard visual every forward (inpaint_networks.py:368-374,389-408);
    # here the argmax map rides the same pallas/XLA attention dispatch
    cfg = Pix2PixConfig(
        ngf=16, ndf=opt.ndf, image_size=opt.crop_size,
        pallas_attention=jax.default_backend() == "tpu",
        compute_offsets=True,
        compute_dtype=getattr(opt, "compute_dtype", "float32"),
    )
    dataset = create_dataset(opt)
    gen, _ = build_modules(cfg)

    state = init_state(jax.random.PRNGKey(opt.seed), cfg)
    run_dir = os.path.join(opt.checkpoints_dir, opt.name)
    tag = ckpt.resolve_tag(opt)  # --load_iter N > 0 picks iter_N
    if getattr(opt, "load_pth", None):
        state = ckpt.restore_generator_pth(state, opt.load_pth)
    elif ckpt.latest_exists(run_dir, tag):
        state = ckpt.restore_checkpoint(state, run_dir, tag)
        print(f"loaded checkpoint {run_dir}/{tag}")
    elif ckpt.latest_exists(run_dir, "generator"):
        state = ckpt.restore_generator(state, run_dir)
        print(f"loaded generator-only checkpoint {run_dir}/generator")
    else:
        print(f"warning: no checkpoint at {run_dir}/{tag}; using init weights")

    web_dir = os.path.join(opt.results_dir, opt.name, f"{opt.phase}_{opt.epoch}")
    if getattr(opt, "load_iter", 0) > 0:
        # keep galleries from different --load_iter runs distinct
        # (/root/reference/test.py:61-62)
        web_dir = f"{web_dir}_iter{opt.load_iter}"
    gallery = HTMLGallery(web_dir, f"Experiment = {opt.name}, Phase = {opt.phase}, Epoch = {opt.epoch}")

    g_quant = None
    for i, batch in enumerate(dataset):
        if i >= opt.num_test:
            break
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        if (cfg.compute_dtype == "int8" and i == 0
                and getattr(opt, "int8_calib", "auto") == "auto"):
            # static per-tensor activation scales from the first batch: the
            # int8 mode that actually beats bf16 (experiments/int8_bench.py
            # r4; dynamic per-sample scales cost ~3 extra HBM sweeps/conv)
            from healthivert_tpu.models.pix2pix import (
                INT8_CALIB_PERCENTILE,
                calibrate_int8,
            )

            g_quant = calibrate_int8(gen, state.g_params, state.g_sn, [jb], cfg,
                                     percentile=INT8_CALIB_PERCENTILE)
        f = generator_forward(gen, state.g_params, state.g_sn, jb, cfg,
                              update_sn=False, g_quant=g_quant)
        visuals = {
            "real_A": jb["context"][0],
            "fake_B": f["fake_b"][0],
            "real_B": jb["full"][0],
            "fake_B_mask": f["fine_seg_bin"][0],
            "real_B_mask": jb["vert_seg"][0],
            "coarse_seg": f["coarse_seg_bin"][0],
        }
        visuals = {k: np.asarray(v) for k, v in visuals.items()}
        # rate * 4 = 8x nearest upsample back to image size (reference
        # inpaint_networks.py:405-407); host-side, on-demand only
        visuals["offset_flow"] = offsets_to_flow_image(
            np.asarray(f["gen"].offsets), upscale=8
        )[0]
        save_images(gallery, visuals, f"{i:04d}", width=opt.display_winsize,
                    aspect_ratio=getattr(opt, "aspect_ratio", 1.0))
        if i % 5 == 0:
            print(f"processing ({i:04d})-th image...")
    gallery.save()
    print(f"wrote {web_dir}/index.html")
    return cfg


if __name__ == "__main__":
    main(sys.argv[1:])
