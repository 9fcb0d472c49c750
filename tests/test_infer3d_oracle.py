"""Per-slice 3D-inference parity vs the reference's own run_model.

run_model (eval_3d_sagittal_twostage.py:46-133) is the reference's unit of
work: band geometry -> generator forward -> SHRM reassembly for one slice.
This oracle runs it (torch CPU, generator weights shared through the .pth
reader) against this repo's equivalent unit (_slice_geometry -> _forward ->
_reassemble) on the same slices, covering centered, edge-clamped, and
taller-than-40 vertebra geometries.

Deviations asserted around: our device path quantizes the synthesized band
to uint8 before reassembly (CT band rows compared at atol 0.51 in u8 units;
context rows and the label volume are exact).
"""

import importlib.util
import math
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_loader import (  # noqa: E402
    REF,
    converge_spectral_norm,
    load_reference_models,
    neutralize_cuda,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)

NGF = 8


def _load_reference_eval3d():
    neutralize_cuda(torch)
    load_reference_models("inpaint_tools", "inpaint_networks")
    # satisfy the script's absolute imports without executing the reference's
    # full registry/options machinery
    if "models" not in sys.modules or not hasattr(sys.modules["models"], "create_model"):
        models_pkg = types.ModuleType("models")
        models_pkg.create_model = lambda *a, **k: None
        models_pkg.inpaint_networks = sys.modules["_refmodels.inpaint_networks"]
        sys.modules["models"] = models_pkg
        sys.modules["models.inpaint_networks"] = models_pkg.inpaint_networks
    for name in ("options", "options.test_options", "nibabel"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["options.test_options"].TestOptions = object
    sys.modules["options"].test_options = sys.modules["options.test_options"]

    path = os.path.join(REF, "eval_3d_sagittal_twostage.py")
    spec = importlib.util.spec_from_file_location("_ref_eval3d", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_eval3d"] = mod
    spec.loader.exec_module(mod)
    return mod


def _a_transform(img):  # Grayscale + ToTensor + Normalize(.5, .5)
    a = np.asarray(img, np.float32) / 255.0 * 2.0 - 1.0
    return torch.from_numpy(a)[None]


def _mask_transform(img):  # ToTensor
    return torch.from_numpy(np.asarray(img, np.float32) / 255.0)[None]


def _make_slice(rng, vid=20, x1=100, height=36, wide=136):
    ct = (rng.random((256, 256)) * 255).astype(np.float64)
    label = np.zeros((256, 256))
    c0 = (256 - wide) // 2
    label[x1 : x1 + height, c0 : c0 + wide] = vid
    label[max(x1 - 50, 0) : max(x1 - 14, 0), c0 : c0 + wide] = vid - 1
    cam = (rng.random((256, 256)) * 255).astype(np.uint8)
    return ct, label, cam


@pytest.fixture(scope="module")
def shared(tmp_path_factory):
    ev = _load_reference_eval3d()
    nets = sys.modules["_refmodels.inpaint_networks"]
    torch.manual_seed(0)
    ref_g = nets.Generator({"input_dim": 1, "ngf": NGF}, use_cuda=False)
    converge_spectral_norm(torch, ref_g, iters=120)
    ref_g.eval()
    for m in ref_g.modules():
        if hasattr(m, "use_cuda"):
            m.use_cuda = False

    pth = str(tmp_path_factory.mktemp("e3d") / "net_G.pth")
    torch.save(ref_g.state_dict(), pth)

    from healthivert_tpu.models.pix2pix import Pix2PixConfig, init_state
    from healthivert_tpu.utils.pth import load_generator_pth

    cfg = Pix2PixConfig(ngf=NGF, image_size=256)
    state = init_state(jax.random.PRNGKey(0), cfg)
    g_params, g_sn, _ = load_generator_pth(pth, state.g_params, state.g_sn)
    return ev, ref_g, cfg, g_params, g_sn


@pytest.mark.parametrize(
    "x1,height,label_id",
    [
        (100, 36, 20),   # centered band
        (6, 30, 20),     # near the top edge (min_x clamp)
        (215, 34, 20),   # near the bottom edge (max_x clamp)
        (90, 52, 20),    # taller than MAXHEIGHT -> recentered 40-row band
    ],
)
def test_run_model_parity(shared, x1, height, label_id):
    ev, ref_g, cfg, g_params, g_sn = shared
    from healthivert_tpu.engine import infer3d

    rng = np.random.default_rng(x1)
    ct, label, cam = _make_slice(rng, vid=label_id, x1=x1, height=height)
    ratio = 0.35

    ref_out = ev.run_model(
        ref_g, cam.astype(np.float64), label, ct, label_id,
        torch.tensor([ratio]), _a_transform, _mask_transform, "cpu",
    )
    assert ref_out is not None
    ref_seg, ref_fake, ref_h = ref_out

    geo = infer3d._slice_geometry(label, ct, label_id)
    assert geo is not None
    # the pass-level window/crop-origin logic (_run_pass)
    need = 20 + max(infer3d.MAXHEIGHT, geo["height"])
    win = max(infer3d.WINDOW, -(-need // 32) * 32)
    geo["w0"] = min(max(geo["x1"] - 20, 0), max(geo["width"] - win, 0))
    cam_stack = jnp.asarray(cam[None])
    ints = {k: jnp.asarray(np.array([geo[k]], np.int32)) for k in
            ("x1", "x2", "min_x", "max_x", "w0")}
    x2_, seg, ph = infer3d._forward(
        g_params, g_sn, jnp.asarray(geo["ct_u8"][None]), cam_stack,
        jnp.asarray(np.array([0], np.int32)),
        ints["x1"], ints["x2"], ints["min_x"], ints["max_x"],
        jnp.asarray(np.array([ratio], np.float32)), ints["w0"],
        None, cfg, False, False, win,
    )
    fake, seg_full, h = infer3d._reassemble(
        geo, np.asarray(x2_)[0, :, :, 0], np.asarray(seg)[0, :, :, 0],
        float(np.asarray(ph)[0]), ct, label, label_id,
    )

    assert h == ref_h
    np.testing.assert_array_equal(seg_full, ref_seg)
    # synthesized band rows are uint8-quantized on device (atol 0.51 in u8
    # units); context rows go through the identical float chain
    np.testing.assert_allclose(fake, ref_fake, atol=0.51)
    # the predicted heights agree exactly through ceil
    ph_ref = None  # run_model folds pred_h into the paste; seg equality pins it
