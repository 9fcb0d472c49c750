"""Image transform factory, parity with /root/reference/data/base_dataset.py.

The live pipeline uses --preprocess none, where the only active transform is
power-of-4 size rounding (base_dataset.py:82-114,117-127); resize/crop/flip
variants are provided for the other --preprocess modes. Works on numpy
(H, W) float arrays instead of PIL images.
"""

from __future__ import annotations

import numpy as np


def make_power_2(img: np.ndarray, base: int = 4) -> np.ndarray:
    """Round H, W down?—the reference rounds to the nearest multiple via
    int(round(x / base) * base) and bicubic-resizes (base_dataset.py:117-127)."""
    h, w = img.shape[:2]
    nh = int(round(h / base) * base)
    nw = int(round(w / base) * base)
    if (nh, nw) == (h, w):
        return img
    return resize_bilinear(img, nh, nw)


def resize_bilinear(img: np.ndarray, nh: int, nw: int) -> np.ndarray:
    h, w = img.shape[:2]
    ys = (np.arange(nh) + 0.5) * h / nh - 0.5
    xs = (np.arange(nw) + 0.5) * w / nw - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(ys - y0, 0, 1)[:, None]
    fx = np.clip(xs - x0, 0, 1)[None, :]
    a = img[np.ix_(y0, x0)]
    b = img[np.ix_(y0, x1)]
    c = img[np.ix_(y1, x0)]
    d = img[np.ix_(y1, x1)]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx + c * fy * (1 - fx) + d * fy * fx)


def get_transform(opt, rng: np.random.Generator | None = None, grayscale=True, convert=True):
    """Compose the transform chain for --preprocess (base_dataset.py:82-114).
    Returns a callable numpy (H, W) -> (H, W) or normalized float array."""
    rng = rng or np.random.default_rng()
    preprocess = getattr(opt, "preprocess", "none")
    load_size = getattr(opt, "load_size", 256)
    crop_size = getattr(opt, "crop_size", 256)
    no_flip = getattr(opt, "no_flip", False)

    def apply(img: np.ndarray) -> np.ndarray:
        out = np.asarray(img, np.float64)
        if "resize" in preprocess:
            out = resize_bilinear(out, load_size, load_size)
        elif "scale_width" in preprocess:
            h, w = out.shape[:2]
            nw = load_size
            nh = max(int(load_size * h / w), crop_size)
            out = resize_bilinear(out, nh, nw)
        if "crop" in preprocess:
            h, w = out.shape[:2]
            y = int(rng.integers(0, max(h - crop_size, 0) + 1))
            x = int(rng.integers(0, max(w - crop_size, 0) + 1))
            out = out[y : y + crop_size, x : x + crop_size]
        if preprocess == "none":
            out = make_power_2(out, base=4)
        if not no_flip and rng.random() > 0.5:
            out = out[:, ::-1]
        if convert:
            out = out.astype(np.float32) / 255.0 * 2.0 - 1.0
        return out

    return apply
