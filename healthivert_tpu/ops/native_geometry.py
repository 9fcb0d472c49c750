"""ctypes binding for the native C++ geometry kernels (native/geometry.cpp),
with pure-numpy fallbacks so everything works before `make -C native`.

Covers the reference's OpenCV usage in the de-pedicle pipeline
(straighten_mask_3d.py:365-436): connected components, minimum-area
rectangle (rotating calipers), convex-quad rasterization.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOAD_LOCK = threading.Lock()  # loaders run in host data threads
_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native"
)


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    with _LOAD_LOCK:
        return _load_locked()


def _load_locked():
    """Build + dlopen under _LOAD_LOCK: concurrent first calls must not race
    `make` against a half-written .so (one OSError would pin the process to
    the slow fallbacks for its lifetime)."""
    global _LIB
    if _LIB is not None:  # another thread finished while we waited
        return _LIB
    so = os.path.join(_NATIVE_DIR, "libhv_geometry.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True, timeout=120
            )
        except Exception:
            _LIB = False
            return False
    try:
        lib = ctypes.CDLL(so)
        lib.cc_label.restype = ctypes.c_int
        lib.cc_label.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.min_area_rect.restype = None
        lib.min_area_rect.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ]
        lib.fill_convex_quad.restype = None
        lib.fill_convex_quad.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.c_uint8, ctypes.POINTER(ctypes.c_uint8),
        ]
        _LIB = lib
    except OSError:
        _LIB = False
    return _LIB


def have_native() -> bool:
    return bool(_load())


def cc_label(img: np.ndarray):
    """8-connected components of a binary image -> (labels int32, count)."""
    img = np.ascontiguousarray(img != 0, np.uint8)
    lib = _load()
    if lib:
        h, w = img.shape
        labels = np.zeros((h, w), np.int32)
        n = lib.cc_label(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return labels, n
    from scipy.ndimage import label as _sl

    return _sl(img, np.ones((3, 3), np.int32))


def min_area_rect(points: np.ndarray):
    """points (n, 2) as (x, y) -> (corners (4, 2) float, center (2,) float).
    Minimum-area enclosing rectangle over the point set. Raises on empty
    input (an empty rect has no meaningful corners)."""
    pts = np.ascontiguousarray(points, np.float64)
    if pts.size == 0:
        raise ValueError("min_area_rect: empty point set")
    lib = _load()
    if lib:
        out = np.zeros(10, np.float64)
        xs = np.ascontiguousarray(pts[:, 0])
        ys = np.ascontiguousarray(pts[:, 1])
        lib.min_area_rect(
            xs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ys.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            len(pts), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out[:8].reshape(4, 2), out[8:10]
    return _min_area_rect_np(pts)


def _min_area_rect_np(pts: np.ndarray):
    """Numpy rotating calipers fallback."""
    from scipy.spatial import ConvexHull

    if len(pts) == 1:
        c = pts[0]
        return np.tile(c, (4, 1)), c.copy()
    uniq = np.unique(pts, axis=0)
    if len(uniq) < 3 or np.linalg.matrix_rank(uniq - uniq[0]) < 2:
        hull = uniq
    else:
        hull = uniq[ConvexHull(uniq).vertices]
    best = None
    for i in range(len(hull)):
        e = hull[(i + 1) % len(hull)] - hull[i]
        n = np.linalg.norm(e)
        if n < 1e-12:
            continue
        e = e / n
        nrm = np.array([-e[1], e[0]])
        pe = hull @ e
        pn = hull @ nrm
        area = (pe.max() - pe.min()) * (pn.max() - pn.min())
        if best is None or area < best[0]:
            corners = np.array(
                [
                    pe.min() * e + pn.min() * nrm,
                    pe.max() * e + pn.min() * nrm,
                    pe.max() * e + pn.max() * nrm,
                    pe.min() * e + pn.max() * nrm,
                ]
            )
            center = (pe.min() + pe.max()) / 2 * e + (pn.min() + pn.max()) / 2 * nrm
            best = (area, corners, center)
    if best is None:  # collinear points
        mn, mx = pts.min(0), pts.max(0)
        corners = np.array([mn, [mx[0], mn[1]], mx, [mn[0], mx[1]]], np.float64)
        return corners, (mn + mx) / 2
    return best[1], best[2]


def fill_convex_quad(corners: np.ndarray, shape, value: int = 255) -> np.ndarray:
    """Rasterize 4 integer (x, y) corners into a (h, w) uint8 image."""
    h, w = shape
    c = np.ascontiguousarray(np.rint(corners), np.int32)
    lib = _load()
    if lib:
        img = np.zeros((h, w), np.uint8)
        lib.fill_convex_quad(
            c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w,
            np.uint8(value), img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return img
    # numpy scanline fallback
    img = np.zeros((h, w), np.uint8)
    px, py = c[:, 0].astype(float), c[:, 1].astype(float)
    y0, y1 = max(int(np.floor(py.min())), 0), min(int(np.ceil(py.max())), h - 1)
    for y in range(y0, y1 + 1):
        xs = []
        for i in range(4):
            j = (i + 1) % 4
            ay, by = py[i], py[j]
            if y < min(ay, by) or y > max(ay, by):
                continue
            if abs(by - ay) < 1e-12:
                xs += [px[i], px[j]]
            else:
                xs.append(px[i] + (px[j] - px[i]) * (y - ay) / (by - ay))
        if not xs:
            continue
        # half-away-from-zero like the native kernel's std::lround —
        # np.round's half-to-even would rasterize different pixels on the
        # routine exact-.5 intersections of integer corners
        xa = max(_lround(min(xs)), 0)
        xb = min(_lround(max(xs)), w - 1)
        if xb >= xa:
            img[y, xa : xb + 1] = value
    return img


def _lround(v: float) -> int:
    """std::lround semantics: round half away from zero."""
    return int(np.floor(v + 0.5)) if v >= 0 else int(np.ceil(v - 0.5))
