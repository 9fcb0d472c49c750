"""AlignedDataset: the real straightened-vertebra training set.

Parity with /root/reference/data/aligned_dataset.py: reads the split json
(vertebra_data_local.json / vertebra_data.json), partitions vertebrae into
normal (grade <= 1) vs abnormal (:57-82), loads per-vertebra CT/label (and
optional HGAM CAM) NIfTIs from {dataroot}/{CT,label}/{patient}_{vert}.nii.gz,
and builds batches with the shared host sampler. IO + geometry run in a
thread pool ('--num_threads') feeding the device.
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional

import numpy as np

from healthivert_tpu.utils import nifti
from . import register_dataset
from .sampler import build_example, collate


def load_split(path: str, phase: str):
    """Returns {patient_vert_id: grade} for a phase (train/test/val)."""
    with open(path) as f:
        data = json.load(f)
    return data[phase]


def partition_normal(split: Dict[str, int]):
    """grade <= 1 is 'normal' (aligned_dataset.py:62)."""
    normal, abnormal = [], []
    normal_by_patient: Dict[str, List[str]] = {}
    for pv, grade in split.items():
        patient, vert = pv.rsplit("_", 1)
        if int(grade) <= 1:
            normal.append(pv)
            normal_by_patient.setdefault(patient, []).append(vert)
        else:
            abnormal.append(pv)
    return normal, abnormal, normal_by_patient


def find_cam_path(cam_dir: str, pv: str) -> Optional[str]:
    """CAM heatmap lookup order: _0, _1, bare (aligned_dataset.py:164-170)."""
    for suffix in ("_0", "_1", ""):
        p = os.path.join(cam_dir, f"{pv}{suffix}.nii.gz")
        if os.path.exists(p):
            return p
    return None


class AlignedDataset:
    def __init__(self, opt):
        self.opt = opt
        self.batch_size = opt.batch_size
        self.rng = np.random.default_rng(opt.seed)
        self.dataroot = opt.dataroot
        self.cam_dir = getattr(opt, "cam_dir", None)

        # Search order: dataroot, cwd, then the shipped repo-root copy of the
        # Verse2019 splits (vertebra_data.json, 1460 vertebrae — the file the
        # reference consumes at data/aligned_dataset.py:49).
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        split_path = None
        for cand in ("vertebra_data_local.json", "vertebra_data.json"):
            for base in (self.dataroot or ".", ".", repo_root):
                p = os.path.join(base, cand)
                if os.path.exists(p):
                    split_path = p
                    break
            if split_path:
                break
        if split_path is None:
            raise FileNotFoundError(
                "no vertebra_data_local.json / vertebra_data.json found "
                f"in {self.dataroot!r} or cwd"
            )
        split = load_split(split_path, opt.phase)
        normal, abnormal, self.normal_by_patient = partition_normal(split)
        vert_class = getattr(opt, "vert_class", "normal")
        self.vertebra_ids = normal if vert_class == "normal" else abnormal
        # keep only vertebrae whose volumes exist on disk
        self.vertebra_ids = [
            pv for pv in self.vertebra_ids
            if os.path.exists(os.path.join(self.dataroot, "CT", pv + ".nii.gz"))
        ]
        if not self.vertebra_ids:
            raise FileNotFoundError(
                f"no CT volumes under {self.dataroot}/CT for split {opt.phase}"
            )
        self.pool = ThreadPoolExecutor(max_workers=max(1, opt.num_threads))
        self.serial = getattr(opt, "serial_batches", False)
        self._epoch = -1
        # multi-host data parallelism: every process derives the SAME epoch
        # order (shared seed) but loads only its own contiguous slice of each
        # global batch — disjoint data, no duplicated IO
        # (parallel/distributed.process_batch_slice; SURVEY.md §2.4).
        # TRAIN datasets only: eval/test splits are consumed host-locally by
        # every process (each computes the full metrics itself, keeping e.g.
        # the plateau-LR input identical everywhere), so they must NOT be
        # sliced — and their batch size need not divide the process count.
        self.local_slice = None
        import jax

        if jax.process_count() > 1 and getattr(opt, "isTrain", False):
            from healthivert_tpu.parallel.distributed import process_batch_slice

            if self.batch_size % jax.process_count() != 0:
                raise ValueError(
                    f"batch_size {self.batch_size} must divide by process "
                    f"count {jax.process_count()}"
                )
            self.local_slice = process_batch_slice(self.batch_size)

    def __len__(self):
        return len(self.vertebra_ids)

    def _load_example(self, pv: str, global_idx: int = 0):
        patient, vert = pv.rsplit("_", 1)
        vert_id = int(vert)
        ct = nifti.load(os.path.join(self.dataroot, "CT", pv + ".nii.gz")).get_fdata()
        labels = nifti.load(
            os.path.join(self.dataroot, "label", pv + ".nii.gz")
        ).get_fdata()
        cam = None
        if self.cam_dir:
            cp = find_cam_path(self.cam_dir, pv)
            if cp:
                cam = nifti.load(cp).get_fdata()
        normal_ids = [int(v) for v in self.normal_by_patient.get(patient, [])]
        # slice-sampling rng keyed by (seed, epoch, global example index):
        # deterministic regardless of process layout or thread scheduling, so
        # a P-process run consumes bit-identical global batches to a
        # single-process run (pinned by tests/test_multiprocess.py)
        rng = np.random.default_rng((self.opt.seed, self._epoch, global_idx))
        return build_example(rng, ct, labels, vert_id, normal_ids, cam)

    def __iter__(self):
        self._epoch += 1
        order = np.arange(len(self.vertebra_ids))
        if not self.serial:
            self.rng.shuffle(order)
        ids = [self.vertebra_ids[i] for i in order]
        # the final partial batch is yielded short, matching the reference
        # DataLoader's drop_last=False (/root/reference/data/__init__.py:88-93)
        # — every vertebra is seen each epoch/eval pass
        for i in range(0, len(ids), self.batch_size):
            chunk = ids[i : i + self.batch_size]
            gidx = list(range(i, i + len(chunk)))
            if self.local_slice is not None:
                if len(chunk) < self.batch_size:
                    # multi-process sharding needs the full static size: pad
                    # the global trailing chunk by repetition before slicing
                    reps = -(-self.batch_size // len(chunk))
                    chunk = (chunk * reps)[: self.batch_size]
                    gidx = (gidx * reps)[: self.batch_size]
                chunk = chunk[self.local_slice]
                gidx = gidx[self.local_slice]
            examples = list(self.pool.map(self._load_example, chunk, gidx))
            yield collate(examples)


register_dataset("aligned", AlignedDataset)
