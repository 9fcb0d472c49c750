"""RHLV math parity vs the reference's own calculate_heights/calculate_rhlv.

The reference functions (evaluation/RHLV_quantification.py:41-147) are pure
numpy; the module's unused heavy imports (nibabel, cv2, matplotlib) are
stubbed so it loads in this image. Random wedge-compressed vertebra pairs
exercise the per-slice column heights, anterior/middle/posterior thirds,
the scale-ratio correction, and the center-height threshold.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from ref_loader import REF, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


def _load_reference_rhlv():
    for name in ("nibabel", "cv2", "matplotlib", "matplotlib.pyplot"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["matplotlib"].pyplot = sys.modules["matplotlib.pyplot"]
    path = os.path.join(REF, "evaluation", "RHLV_quantification.py")
    spec = importlib.util.spec_from_file_location("_ref_rhlv", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_rhlv"] = mod
    spec.loader.exec_module(mod)
    return mod


def _make_pair(rng, compress=0.6, h=64, w=64, nz=24):
    """Fake (healthy) and label (possibly compressed) vertebra volumes:
    elliptic bodies with per-slice noise, label anteriorly wedged."""
    fake = np.zeros((h, w, nz))
    label = np.zeros((h, w, nz))
    for z in range(nz):
        cy, cx = h // 2, w // 2
        ry = 14 + rng.integers(-2, 3)
        rx = 20 + rng.integers(-2, 3)
        yy, xx = np.mgrid[:h, :w]
        body = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
        fake[:, :, z] = body
        # anterior wedge: compression factor ramps across columns
        frac = compress + (1.0 - compress) * (xx - (cx - rx)) / (2 * rx)
        frac = np.clip(frac, compress, 1.0)
        wedge = np.abs(yy - cy) <= ry * frac
        label[:, :, z] = body & wedge
    return fake, label


@pytest.mark.parametrize("compress,thr", [(0.6, 0.7), (0.85, 0.7), (1.0, 0.64)])
def test_rhlv_matches_reference(compress, thr):
    ref = _load_reference_rhlv()
    from healthivert_tpu.evaluation.rhlv import calculate_rhlv

    rng = np.random.default_rng(int(compress * 100))
    fake, label = _make_pair(rng, compress=compress)
    nz = fake.shape[2]
    center, length = nz // 2, nz // 5

    want = ref.calculate_rhlv(fake, label, center, length, "v20", thr)
    got = calculate_rhlv(fake, label, center, length, height_threshold=thr)
    np.testing.assert_allclose(got, want, rtol=1e-9, err_msg=f"c={compress}")


def test_rhlv_heights_match_reference_scale_correction():
    """Label taller than fake triggers the reference's scale-ratio branch
    (RHLV_quantification.py:76-97)."""
    ref = _load_reference_rhlv()
    from healthivert_tpu.evaluation.rhlv import calculate_heights

    rng = np.random.default_rng(7)
    fake, label = _make_pair(rng, compress=1.0)
    # make the LABEL taller: swap roles
    want = ref.calculate_heights(label, fake, 0.7)
    got = calculate_heights(label, fake, 0.7)
    keys = ("all_f", "all_l", "pre_f", "pre_l", "mid_f", "mid_l", "post_f", "post_l")
    for w, k in zip(want, keys):
        np.testing.assert_allclose(got[k], w, err_msg=k)
