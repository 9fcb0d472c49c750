"""Synthetic straightened-spine fixtures: hermetic stand-ins for Verse2019.

The reference has no test assets beyond 6 label volumes; this generator
produces full (CT, label, CAM) triplets shaped like the straightening
pipeline's output (256 x 256 x 64, vertebra ids stacked along rows ~40
apart), so training, 3D inference, RHLV and grading all run end-to-end
without external data (SURVEY.md §4 test strategy).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from . import register_dataset
from .sampler import build_example, collate


def make_spine_volume(
    rng: np.random.Generator,
    shape=(256, 256, 64),
    vert_ids=(18, 19, 20, 21, 22),
    vert_height: int = 26,
    gap: int = 10,
    fractured: Dict[int, float] | None = None,
):
    """Build one straightened vertebra stack.

    Each vertebra is an elliptic-cylinder body centered on the row axis;
    `fractured[vid] = f` compresses that body to f * height (anterior wedge).
    Returns (ct uint8-range float, labels int16, cam float in [0,1]).
    """
    h, w, z = shape
    ct = rng.normal(30, 8, shape)  # soft-tissue background
    labels = np.zeros(shape, np.int16)
    cam = np.zeros(shape, np.float32)
    fractured = fractured or {}

    n = len(vert_ids)
    pitch = vert_height + gap
    start = (h - n * pitch + gap) // 2
    rr, cc, zz = np.meshgrid(np.arange(h), np.arange(w), np.arange(z), indexing="ij")
    for i, vid in enumerate(vert_ids):
        c_row = start + i * pitch + vert_height // 2
        frac = fractured.get(vid, 1.0)
        # anterior wedge: height shrinks towards low column index
        col_t = cc / w
        eff_h = vert_height * (frac + (1 - frac) * col_t) / 2.0
        body = (
            (np.abs(rr - c_row) <= eff_h)
            & (np.abs(cc - w * 0.5) <= w * 0.18)
            & (np.abs(zz - z * 0.5) <= z * 0.42)
        )
        labels[body] = vid
        ct[body] = 160 + 25 * np.sin(rr[body] / 3.0)  # trabecular-ish texture
        if frac < 1.0:
            cam[body] = min(1.0, (1 - frac) * 1.5)
    ct = np.clip(ct + rng.normal(0, 4, shape), 0, 255)
    return ct, labels, cam


class SyntheticDataset:
    """Iterable dataset of synthetic vertebra examples (batch dicts)."""

    def __init__(
        self,
        opt=None,
        batch_size=None,
        seed=0,
        n_volumes=4,
        size=64,
        shape=(256, 256, 64),
        vert_ids=(18, 19, 20, 21, 22),
        vert_height=26,
        gap=10,
    ):
        self.batch_size = batch_size or (opt.batch_size if opt else 4)
        self.size = size
        self.rng = np.random.default_rng(seed if opt is None else opt.seed)
        if opt is not None and getattr(opt, "crop_size", 256) != shape[0]:
            s = opt.crop_size
            shape = (s, s, max(16, s // 4))
            vert_ids = vert_ids[: max(1, s // 80 + 1)]
            vert_height = max(10, s // 10)
            gap = max(4, s // 25)
        self.volumes = []
        self.fractured: List[set] = []
        for i in range(n_volumes):
            frac = {vert_ids[len(vert_ids) // 2]: 0.6} if i % 2 else {}
            self.volumes.append(
                make_spine_volume(
                    self.rng, shape, vert_ids, vert_height, gap, fractured=frac
                )
            )
            self.fractured.append(set(frac))
        self.items: List = []
        for vi, (_, labels, _) in enumerate(self.volumes):
            for vid in np.unique(labels)[1:]:
                self.items.append((vi, int(vid)))
        # optional example cache: slice sampling + band geometry on the host
        # is the training bottleneck on few-core hosts; pre-building a pool
        # amortizes it (opt.synthetic_cache or cache_size > 0)
        self.cache = None
        cache_size = getattr(opt, "synthetic_cache", 0) if opt is not None else 0
        if cache_size:
            self.cache = [self._one_example() for _ in range(cache_size)]

    def __len__(self):
        return self.size

    def __iter__(self):
        for _ in range(self.size // self.batch_size):
            yield self.sample_batch()

    def _one_example(self):
        while True:
            vi, vid = self.items[self.rng.integers(len(self.items))]
            ct, labels, cam = self.volumes[vi]
            normal_ids = [
                v for v in np.unique(labels)[1:] if int(v) not in self.fractured[vi]
            ]
            try:
                return build_example(self.rng, ct, labels.copy(), vid, normal_ids, cam)
            except ValueError:
                continue

    def sample_batch(self):
        if self.cache is not None:
            idx = self.rng.integers(len(self.cache), size=self.batch_size)
            return collate([self.cache[i] for i in idx])
        return collate([self._one_example() for _ in range(self.batch_size)])


register_dataset("synthetic", SyntheticDataset)
