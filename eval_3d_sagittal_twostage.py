#!/usr/bin/env python
"""Iterative two-stage 3D synthesis CLI.

Drop-in surface for /root/reference/eval_3d_sagittal_twostage.py, with flags
instead of hard-coded paths:

    python eval_3d_sagittal_twostage.py --dataroot <dir-with-CT,label> \
        --name exp --epoch latest --results_dir ./output_3d [--cam_dir ...]

For each {patient}_{vert}.nii.gz under {dataroot}/CT, synthesizes the
pseudo-healthy vertebra (upper neighbor -> lower neighbor -> target, all
slices batched per pass) and writes CT_fake/ and label_fake/ NIfTIs.
"""

import os
import sys
import time

import jax
import numpy as np

from healthivert_tpu.config.options import TestOptions
from healthivert_tpu.data.aligned import find_cam_path
from healthivert_tpu.engine import checkpoint as ckpt
from healthivert_tpu.engine.infer3d import synthesize_volumes
from healthivert_tpu.models.pix2pix import Pix2PixConfig, init_state
from healthivert_tpu.utils import nifti


def main(argv=None):
    import argparse

    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--axis", choices=["sagittal", "coronal"], default="sagittal")
    pre.add_argument("--slice_batch", type=int, default=64,
                     help="slices per device dispatch in each synthesis pass")
    pre.add_argument("--spine_batch", type=int, default=1,
                     help="1 (default): batch all of a patient's vertebrae "
                          "through shared synthesis passes; 0: one vertebra "
                          "per pass set (reference-style serial order)")
    # this inference CLI defaults to bfloat16 (the TPU-native throughput
    # choice); --compute_dtype float32 forces true-f32 convs, int8 the
    # quantized path — all three now actually reach the synthesis kernels.
    # The flag is declared on the pre-parser (not sniffed from the raw argv,
    # which argparse prefix abbreviations would slip past) and re-injected.
    pre.add_argument("--compute_dtype", default="bfloat16",
                     choices=["float32", "bfloat16", "int8"])

    ns, rest = pre.parse_known_args(argv)
    axis = 2 if ns.axis == "sagittal" else 1
    rest = list(rest) + ["--compute_dtype", ns.compute_dtype]
    opt = TestOptions().parse(rest)
    # --mesh (base option, default 'data:-1' = every device): shard each
    # pass's slice batch across chips (SURVEY.md §2.4). A 1-device mesh is
    # the plain single-chip dispatch.
    mesh = None
    if len(jax.devices()) > 1:
        from healthivert_tpu.parallel import make_mesh

        mesh = make_mesh(opt.mesh)
        print(f"sharding slice batches over mesh {dict(mesh.shape)}")
    cfg = Pix2PixConfig(
        ngf=16, image_size=opt.crop_size,
        compute_dtype=getattr(opt, "compute_dtype", "float32"),
    )

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

    ct_dir = os.path.join(opt.dataroot, "CT")
    out_ct = os.path.join(opt.results_dir, "CT_fake")
    out_lb = os.path.join(opt.results_dir, "label_fake")
    os.makedirs(out_ct, exist_ok=True)
    os.makedirs(out_lb, exist_ok=True)

    files = sorted(f for f in os.listdir(ct_dir) if f.endswith(".nii.gz"))
    files = [f for f in files if not os.path.exists(os.path.join(out_ct, f))]
    # crude resumability, as the reference (:157), applied per file above

    # group a patient's vertebrae so their three synthesis passes share
    # device dispatches (--spine_batch 0 restores one-vertebra groups)
    groups: dict = {}
    for f in files:
        patient = f[: -len(".nii.gz")].rsplit("_", 1)[0] if ns.spine_batch else f
        groups.setdefault(patient, []).append(f)

    done = 0
    for patient, group in groups.items():
        t0 = time.time()
        vols, imgs = [], []
        for fname in group:
            ct_img = nifti.load(os.path.join(ct_dir, fname))
            lb_img = nifti.load(os.path.join(opt.dataroot, "label", fname))
            pv = fname[: -len(".nii.gz")]
            vert_id = int(pv.rsplit("_", 1)[1])
            cam = None
            if opt.cam_dir:
                cp = find_cam_path(opt.cam_dir, pv)
                if cp:
                    cam = nifti.load(cp).get_fdata().astype(np.float32)
            vols.append((ct_img.get_fdata(), lb_img.get_fdata(), vert_id, cam))
            imgs.append(ct_img)

        # synthesize_volumes stacks slices across the group, so all members
        # must share the same slice shape along the chosen axis; a patient
        # with mismatched volume shapes degrades to per-shape sub-groups
        # instead of crashing in np.concatenate
        def _slice_shape(v):
            s = v[0].shape
            return (s[0], s[1]) if axis == 2 else (s[0], s[2])

        by_shape: dict = {}
        for i, v in enumerate(vols):
            by_shape.setdefault(_slice_shape(v), []).append(i)
        results = [None] * len(vols)
        for idxs in by_shape.values():
            sub = synthesize_volumes(
                state.g_params, state.g_sn, cfg, [vols[i] for i in idxs],
                batch_size=ns.slice_batch, axis=axis, mesh=mesh,
                use_bf16=opt.compute_dtype != "float32",
                # static per-tensor scales by default: the int8 mode that
                # actually beats bf16 (experiments/int8_bench.py r4)
                quant="auto" if (ns.compute_dtype == "int8"
                                 and opt.int8_calib == "auto") else None,
                # persisted next to the checkpoint: calibrate once on the
                # first call, then every later call (any --slice_batch or
                # volume grouping) reuses the same scales — int8 outputs
                # stay reproducible across partitions (ADVICE r4)
                quant_store=os.path.join(
                    opt.checkpoints_dir, opt.name, "int8_quant.msgpack")
                if ns.compute_dtype == "int8" and opt.int8_calib == "auto"
                else None,
            )
            for i, r in zip(idxs, sub):
                results[i] = r
        for fname, ct_img, (ct_fake, lb_fake) in zip(group, imgs, results):
            nifti.save(nifti.Nifti1Image(ct_fake.astype(np.float32), ct_img.affine),
                       os.path.join(out_ct, fname))
            nifti.save(nifti.Nifti1Image(lb_fake.astype(np.float32), ct_img.affine),
                       os.path.join(out_lb, fname))
        done += len(group)
        print(
            f"[{done}/{len(files)}] {patient}: {len(group)} vertebra(e) "
            f"synthesized in {time.time() - t0:.1f}s"
        )


if __name__ == "__main__":
    main(sys.argv[1:])
