"""Host-side (numpy) slice sampling and batch construction.

Mirrors the online geometry of /root/reference/data/aligned_dataset.py:
pyramid-weighted sagittal slice choice from the central 4/5 of the vertebra
z-extent (:104-127), the non-empty/height-bounded retry loop (:129-145),
small-connected-component cleanup (:16-30), the fixed 40-row band mask and
flank shifting (:213-245), and the uint8 + [-1,1] normalization chain
(:247-278).

This runs in host threads feeding the device pipeline; everything here is
plain numpy with dynamic shapes (fine off-device). The device-side twin of
the band geometry lives in ops.geometry for the jitted paths.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
from scipy.ndimage import label as cc_label

MAXHEIGHT = 40
_STRUCT8 = np.ones((3, 3), dtype=np.int32)  # 8-connectivity, as the reference


def remove_small_cc(arr: np.ndarray, min_size: int) -> np.ndarray:
    """Zero out connected components smaller than min_size (8-connected)."""
    labeled, n = cc_label(arr, _STRUCT8)
    if n == 0:
        return arr
    sizes = np.bincount(labeled.ravel())
    kill = np.isin(labeled, np.nonzero(sizes < min_size)[0])
    kill &= labeled > 0
    arr = arr.copy()
    arr[kill] = 0
    return arr


def weighted_slice(rng: np.random.Generator, z0: int, z1: int):
    """Pyramid-weighted random z in the central 4/5 of [z0, z1]."""
    range_length = z1 - z0 + 1
    new_len = int(range_length * 4 / 5)
    if new_len < 1:
        # single-slice extents (edge-truncated vertebrae): 4/5 rounds to an
        # empty candidate range and rng.choice would raise 'a cannot be
        # empty' out of the retry loop — use the full extent instead
        new_len = range_length
    nz0 = z0 + (range_length - new_len) // 2
    nz1 = nz0 + new_len - 1
    center = (nz0 + nz1) // 2
    denom = max(nz1 - nz0, 1)
    weights = np.array([1 - abs(i - center) / denom for i in range(nz0, nz1 + 1)])
    weights = weights / weights.sum()
    z = int(rng.choice(np.arange(nz0, nz1 + 1), p=weights))
    ratio = abs(z - center) / range_length * 2
    return z, ratio


def valid_slice(
    rng: np.random.Generator,
    vert_label: np.ndarray,
    z0: int,
    z1: int,
    maxheight: int = MAXHEIGHT,
    max_attempts: int = 100,
):
    """Retry until a slice has >50 fg px (after CC cleanup) and height < maxheight."""
    for _ in range(max_attempts):
        z, ratio = weighted_slice(rng, z0, z1)
        vert_label[:, :, z] = remove_small_cc(vert_label[:, :, z], 50)
        if vert_label[:, :, z].sum() > 50:
            rows = np.argwhere(vert_label[:, :, z])[:, 0]
            x1, x2 = int(rows.min()), int(rows.max())
            if x2 - x1 < maxheight:
                return z, ratio, x1, x2
    raise ValueError(f"Failed to find a non-empty slice after {max_attempts} attempts.")


def band_and_shift(
    full_img: np.ndarray, x1: int, x2: int, maxheight: int = MAXHEIGHT,
    inclusive_end: bool = False,
):
    """Band bounds + mask + shifted context for one (H, W) slice."""
    h = full_img.shape[0]
    mask_x = (x1 + x2) // 2
    if mask_x <= maxheight // 2:
        min_x = 0
    elif h - mask_x <= maxheight / 2:
        min_x = h - maxheight
    else:
        min_x = mask_x - maxheight // 2
    max_x = min_x + maxheight
    mask = np.zeros_like(full_img)
    mask[min_x : max_x + 1 if inclusive_end else max_x] = 1
    ctx = shift_rows(full_img, x1, x2, min_x, max_x)
    return min_x, max_x, mask, ctx


def shift_rows(img: np.ndarray, x1: int, x2: int, min_x: int, max_x: int) -> np.ndarray:
    """rows[:min_x] <- img[x1-min_x:x1]; rows[max_x:] <- img[x2:x2+H-max_x]."""
    h = img.shape[0]
    out = np.zeros_like(img)
    out[:min_x] = img[x1 - min_x : x1]
    tail = img[x2 : x2 + (h - max_x)]
    out[max_x : max_x + tail.shape[0]] = tail
    return out


def build_example(
    rng: np.random.Generator,
    ct: np.ndarray,  # (H, W, Z) uint8-range windowed CT
    labels: np.ndarray,  # (H, W, Z) integer vertebra ids
    vert_id: int,
    normal_ids,
    cam: Optional[np.ndarray] = None,  # (H, W, Z) in [0,1]; None -> zeros
    maxheight: int = MAXHEIGHT,
    cam_scaled: bool = False,  # True: cam already holds [0,255] values (the
    # aligned-dataset volume cache's uint8 encoding) — explicit flag, not a
    # dtype sniff, so a genuinely-[0,1] uint8 cam can't be misread
) -> Dict[str, np.ndarray]:
    """One training example for vertebra `vert_id` (aligned_dataset.__getitem__)."""
    # bool, not float64: the f64 full-volume materialization (33 MB/example
    # at 256x256x64) was 60% of build_example's cost; every consumer
    # (cc cleanup, sums, argwhere, *255 quantization) treats 0/1 identically
    vert = labels == vert_id
    zs = np.nonzero(vert.any(axis=(0, 1)))[0]
    z, ratio, x1, x2 = valid_slice(rng, vert, int(zs.min()), int(zs.max()), maxheight)

    normal = np.isin(labels[:, :, z], list(normal_ids)).astype(np.float64) if len(normal_ids) else np.zeros_like(vert[:, :, z])
    if cam is None:
        cam_sl = np.zeros(vert.shape[:2], np.float64)
    elif cam_scaled:  # already in [0,255] (volume cache): use as-is
        cam_sl = cam[:, :, z].astype(np.float64)
    else:
        cam_sl = cam[:, :, z] * 255

    full = ct[:, :, z].astype(np.float64)
    min_x, max_x, mask, ctx = band_and_shift(full, x1, x2, maxheight)
    normal_shift = shift_rows(normal, x1, x2, min_x, max_x)
    cam_shift = shift_rows(cam_sl, x1, x2, min_x, max_x)

    # uint8 quantization then normalization, as the PIL/transform chain does
    to_unit = lambda a: a.astype(np.uint8).astype(np.float32) / 255.0
    return dict(
        full=to_unit(full)[..., None] * 2 - 1,
        context=to_unit(ctx)[..., None] * 2 - 1,
        vert_seg=to_unit(vert[:, :, z] * 255)[..., None],
        mask=to_unit(mask * 255)[..., None],
        # the SHIFTED mask, like the reference's normal_vert_label_slice
        # (aligned_dataset.py:240-243): normal neighbors live in the flanks,
        # which the context shift moves — the coarse-Dice target must stay
        # aligned with the context the generator actually sees
        normal_vert=to_unit(normal_shift * 255)[..., None],
        cam=to_unit(cam_shift)[..., None],
        height=np.int32(x2 - x1),
        x1=np.int32(x1),
        x2=np.int32(x2),
        slice_ratio=np.float32(ratio),
    )


def collate(examples) -> Dict[str, np.ndarray]:
    return {k: np.stack([e[k] for e in examples]) for k in examples[0]}
