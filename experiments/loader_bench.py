#!/usr/bin/env python
"""Measure AlignedDataset host-pipeline throughput at production shapes.

Question: can the loader feed the train step (481 slices/sec @bs128 on
v5e)? Each 1-slice example decompresses 2-3 FULL gzipped 256x256x64 NIfTI
volumes (the reference does the same per item via nibabel,
aligned_dataset.py:172-178), so the loader is gzip-bound. This measures
examples/sec over real files at several thread counts on this host
(1 CPU core — scale expectations by core count; zlib releases the GIL).

    python experiments/loader_bench.py [--n 24] [--batch 16] [--cam]
"""

import argparse
import json
import os
import sys
import tempfile
import time
import types

sys.path.insert(0, "/root/repo")

import numpy as np


def make_production_fixture(root, n, with_cam=False):
    from healthivert_tpu.data.synthetic import make_spine_volume
    from healthivert_tpu.utils import nifti

    rng = np.random.default_rng(0)
    ct, labels, _ = make_spine_volume(
        rng, shape=(256, 256, 64), vert_ids=(19, 20, 21), vert_height=30, gap=12
    )
    # realistic gzip cost: CT noise makes the stream poorly compressible,
    # like real windowed CT
    for d in ("CT", "label") + (("CAM",) if with_cam else ()):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    split = {"train": {}}
    aff = np.eye(4)
    sizes = []
    for i in range(n):
        pv = f"p{i}_20"
        split["train"][pv] = 0
        # unique content per file so OS page cache can't alias, but write
        # each once (page-cached reads ARE the steady state of epoch > 1)
        ct_i = np.clip(ct + rng.normal(0, 3, ct.shape), 0, 255).astype(np.float32)
        nifti.save(nifti.Nifti1Image(ct_i, aff), os.path.join(root, "CT", f"{pv}.nii.gz"))
        nifti.save(nifti.Nifti1Image(labels.astype(np.int16), aff),
                   os.path.join(root, "label", f"{pv}.nii.gz"))
        if with_cam:
            cam = rng.random(ct.shape).astype(np.float32)
            nifti.save(nifti.Nifti1Image(cam, aff), os.path.join(root, "CAM", f"{pv}_0.nii.gz"))
        sizes.append(os.path.getsize(os.path.join(root, "CT", f"{pv}.nii.gz")))
    with open(os.path.join(root, "vertebra_data_local.json"), "w") as f:
        f.write(json.dumps(split))
    return np.mean(sizes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--cam", action="store_true")
    ap.add_argument("--threads", type=int, nargs="*", default=[1, 4, 16])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from healthivert_tpu.data.aligned import AlignedDataset

    with tempfile.TemporaryDirectory() as root:
        mean_ct_gz = make_production_fixture(root, args.n, with_cam=args.cam)
        print(f"{args.n} vertebrae, CT gz ~{mean_ct_gz/1e6:.2f} MB each, cam={args.cam}")
        for cache_gb in (0.0, 8.0):
            for nt in args.threads:
                opt = types.SimpleNamespace(
                    batch_size=args.batch, seed=0, dataroot=root, phase="train",
                    vert_class="normal", num_threads=nt, serial_batches=True,
                    cam_dir=os.path.join(root, "CAM") if args.cam else None,
                    data_cache_gb=cache_gb,
                )
                ds = AlignedDataset(opt)
                # AlignedDataset clamps workers to os.cpu_count(); report
                # the EFFECTIVE count so rows on a small host aren't read
                # as "threads don't matter"
                nt_eff = ds.pool._max_workers
                # epoch 0 warms the OS page cache (and the volume cache);
                # epoch 1 is the steady state
                for _ in ds:
                    pass
                t0 = time.time()
                count = 0
                for b in ds:
                    count += next(iter(b.values())).shape[0]
                dt = time.time() - t0
                print(
                    f"cache={cache_gb:4.1f}GB threads={nt:3d} (effective {nt_eff}): "
                    f"{count / dt:8.1f} examples/sec "
                    f"({dt / (count / args.batch) * 1000:6.1f} ms/batch-{args.batch})"
                )
        print(
            "demand: train step wants 481 sl/s @bs128 on v5e "
            "(examples/sec must exceed it, x cores available)"
        )


if __name__ == "__main__":
    main()
