"""Generation-quality eval parity vs the reference's own process_images.

The reference script (evaluation/generation_eval_sagittal.py:39-102) is
loaded with nibabel stubbed to this repo's NIfTI reader and skimage.metrics
stubbed to this repo's SSIM/PSNR (whose parity with skimage defaults is
pinned separately in tests/test_ops_image.py). With the metric kernels
identical by construction, the oracle pins the PLUMBING: 3D IoU/Dice/RVD,
the central-4/5 z-window, the >400-px slice filter, the vertebra-row patch
crop, per-slice data_range choices, NaN filtering, and averaging.
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


def _load_reference_geneval():
    from healthivert_tpu.evaluation.generation import _psnr, _ssim
    from healthivert_tpu.utils import nifti

    nib = types.ModuleType("nibabel")
    nib.load = nifti.load
    sys.modules.setdefault("nibabel", nib).load = nifti.load
    sk = types.ModuleType("skimage")
    skm = types.ModuleType("skimage.metrics")
    skm.peak_signal_noise_ratio = lambda a, b, data_range: _psnr(a, b, data_range)
    skm.structural_similarity = lambda a, b, data_range: _ssim(a, b, data_range)
    sys.modules["skimage"] = sk
    sys.modules["skimage.metrics"] = skm
    sk.metrics = skm

    path = os.path.join(REF, "evaluation", "generation_eval_sagittal.py")
    spec = importlib.util.spec_from_file_location("_ref_geneval", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_geneval"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_generation_eval_matches_reference(tmp_path):
    ref = _load_reference_geneval()
    from healthivert_tpu.data.synthetic import make_spine_volume
    from healthivert_tpu.evaluation.generation import process_images
    from healthivert_tpu.utils import nifti

    rng = np.random.default_rng(0)
    ct, labels, _ = make_spine_volume(rng, shape=(128, 128, 32), vert_ids=(19, 20, 21),
                                      vert_height=18, gap=8)
    # a plausible "fake": noisy CT + slightly eroded target segmentation
    fake_ct = np.clip(ct + rng.normal(0, 6, ct.shape), 0, 255)
    fake_lb = labels.copy().astype(np.float64)
    tgt = labels == 20
    fake_lb[tgt & (rng.random(ct.shape) < 0.07)] = 0.0

    paths = {}
    for name, vol in (("ori_ct", ct), ("fake_ct", fake_ct),
                      ("ori_seg", labels.astype(np.float64)), ("fake_seg", fake_lb)):
        p = str(tmp_path / f"{name}_0001_20.nii.gz")
        nifti.save(nifti.Nifti1Image(vol.astype(np.float32), np.eye(4)), p)
        paths[name] = p

    want = ref.process_images(paths["ori_ct"], paths["fake_ct"],
                              paths["ori_seg"], paths["fake_seg"])
    got = process_images(paths["ori_ct"], paths["fake_ct"],
                         paths["ori_seg"], paths["fake_seg"])

    w = dict(zip(("global_psnr", "global_ssim", "patch_psnr", "patch_ssim",
                  "iou", "rvd", "dice"), [float(x) for x in want]))
    for k in w:
        assert got[k] == pytest.approx(w[k], rel=1e-6), (k, got[k], w[k])
