"""Centroid-extraction parity vs the reference's own location_json_local.py.

The reference module executes process_directory('/mnt/g/...') at import, so
it is loaded with an `os` proxy whose listdir returns [] for nonexistent
directories (and nibabel stubbed to this repo's reader); the oracle then
drives process_directory on a real temp dataset and compares the written
jsons against write_centroid_json, including the tiny-end-vertebra filters.
"""

import importlib.util
import json
import os
import sys
import types

import numpy as np
import pytest

from ref_loader import REF, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


def _load_reference_locjson():
    import re

    from healthivert_tpu.utils import nifti

    nib = sys.modules.setdefault("nibabel", types.ModuleType("nibabel"))
    nib.load = nifti.load
    path = os.path.join(REF, "straighten", "location_json_local.py")
    mod = types.ModuleType("_ref_locjson")
    src = open(path).read()
    # the module is a script: it calls process_directory('/mnt/g/...') at
    # the top level — strip that entry-point call (nothing else) so the
    # functions load without the missing-directory side effect
    src = re.sub(r"^process_directory\(root_dir\)\s*$", "", src, flags=re.M)
    exec(compile(src, path, "exec"), mod.__dict__)
    sys.modules["_ref_locjson"] = mod
    return mod


def test_centroid_json_matches_reference(tmp_path):
    ref = _load_reference_locjson()
    from healthivert_tpu.straighten.pipeline import write_centroid_json
    from healthivert_tpu.utils import nifti

    rng = np.random.default_rng(0)
    root = tmp_path / "local"
    for pid, tiny_top in (("0007", True), ("0008", False)):
        seg = np.zeros((96, 96, 96), np.float32)
        z = 6
        for i, vid in enumerate((18, 19, 20, 21)):
            h = 18
            seg[20:70, 25:75, z : z + h][
                rng.random((50, 50, h)) < 0.9
            ] = vid
            z += h + 4
        if tiny_top:
            seg[40:50, 40:50, z : z + 6] = 22  # < 8000 voxels, max label
        d = root / pid
        d.mkdir(parents=True)
        nifti.save(nifti.Nifti1Image(seg, np.eye(4)), str(d / f"{pid}_msk.nii.gz"))

    ref.process_directory(str(root))

    for pid in ("0007", "0008"):
        ref_json = json.load(open(root / pid / f"{pid}.json"))
        ours = write_centroid_json(
            str(root / pid / f"{pid}_msk.nii.gz"), str(tmp_path / f"{pid}_ours.json")
        )
        assert len(ref_json) == len(ours)
        for a, b in zip(ref_json, ours):
            assert a["label"] == b["label"]
            for k in ("X", "Y", "Z"):
                assert a[k] == pytest.approx(b[k], abs=1e-12), (pid, a["label"], k)
    # the tiny max-label vertebra was dropped
    assert [e["label"] for e in json.load(open(root / "0007" / "0007.json"))] == [18, 19, 20, 21]
