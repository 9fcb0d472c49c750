"""Full-forward numeric parity against the reference's own torch Generator.

The strongest parity anchor in the suite: build the reference
`models/inpaint_networks.py:16` Generator (imported from /root/reference at
test time as an oracle — never copied), converge its spectral-norm u/v
buffers, save its real `state_dict()` with torch.save, ingest the .pth with
our no-torch reader (`healthivert_tpu/utils/pth.py`), and compare every
generator output of the flax model against the torch model on the same
input. This validates in one shot:

- the .pth key-name mapping against torch's actual spectral_norm layout
  (weight_orig / weight_u / weight_v), not our own inverse mapping;
- the whole two-stage forward math: conv paddings, ELU placement, SN
  division, dilations, nearest resizes, CAM concat points, contextual
  attention (batched einsum vs the reference per-sample loop,
  inpaint_networks.py:327), height heads, clamps and sigmoids.

Skipped when torch or /root/reference is unavailable.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_loader import (  # noqa: E402
    converge_spectral_norm,
    load_reference_models,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


def _load_reference_inpaint_networks():
    return load_reference_models("inpaint_tools", "inpaint_networks")[1]


def _converge_spectral_norm(model, iters=200):
    converge_spectral_norm(torch, model, iters=iters)


def _run_oracle(tmp_path_factory, h, hole):
    """Reference torch generator outputs + our flax generator outputs on the
    same batch, with weights flowing reference -> .pth -> our reader."""
    import jax
    import jax.numpy as jnp

    from healthivert_tpu.models.generator import Generator
    from healthivert_tpu.utils.pth import load_generator_pth

    nets = _load_reference_inpaint_networks()

    cnum, b = 8, 2
    torch.manual_seed(0)
    ref_g = nets.Generator({"input_dim": 1, "ngf": cnum}, use_cuda=False)
    _converge_spectral_norm(ref_g)
    ref_g.eval()

    # synthetic but structured inputs: a 40-row hole band in smooth context
    rng = np.random.default_rng(0)
    base = rng.standard_normal((b, 1, h // 8, h // 8)).astype(np.float32)
    ct = torch.nn.functional.interpolate(
        torch.from_numpy(base), scale_factor=8, mode="bilinear", align_corners=False
    ).clamp(-1, 1)
    mask = torch.zeros((b, 1, h, h))
    mask[:, :, hole[0] : hole[1], :] = 1.0
    x = ct * (1 - mask)
    cam = torch.from_numpy(rng.random((b, 1, h, h)).astype(np.float32))
    ratio = torch.from_numpy(rng.random((b,)).astype(np.float32))

    with torch.no_grad():
        coarse_seg, fine_seg, x_stage1, x_stage2, flow, p1, p2 = ref_g(x, mask, cam, ratio)
    ref_out = {
        "coarse_seg": coarse_seg.numpy(),
        "fine_seg": fine_seg.numpy(),
        "x_stage1": x_stage1.numpy(),
        "x_stage2": x_stage2.numpy(),
        "pred1_h": p1.numpy().reshape(-1),
        "pred2_h": p2.numpy().reshape(-1),
        "offset_flow": flow.numpy(),
    }

    pth = str(tmp_path_factory.mktemp("oracle") / "net_G.pth")
    torch.save(ref_g.state_dict(), pth)

    # compute_offsets mirrors the reference (it renders offset_flow every
    # forward); the flag only adds the argmax branch — the other outputs'
    # math is untouched
    gen = Generator(cnum=cnum, compute_offsets=True)
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    mj = jnp.asarray(np.transpose(mask.numpy(), (0, 2, 3, 1)))
    cj = jnp.asarray(np.transpose(cam.numpy(), (0, 2, 3, 1)))
    rj = jnp.asarray(ratio.numpy())
    variables = gen.init(jax.random.PRNGKey(0), xj, mj, cj, rj)
    params, sn, n_loaded = load_generator_pth(pth, variables["params"], variables["sn"])
    out = gen.apply({"params": params, "sn": sn}, xj, mj, cj, rj)
    ours = {
        "coarse_seg": np.transpose(np.asarray(out.coarse_seg), (0, 3, 1, 2)),
        "fine_seg": np.transpose(np.asarray(out.fine_seg), (0, 3, 1, 2)),
        "x_stage1": np.transpose(np.asarray(out.x_stage1), (0, 3, 1, 2)),
        "x_stage2": np.transpose(np.asarray(out.x_stage2), (0, 3, 1, 2)),
        "pred1_h": np.asarray(out.pred1_h),
        "pred2_h": np.asarray(out.pred2_h),
    }
    from healthivert_tpu.ops.flow_viz import offsets_to_flow_image

    ours["offset_flow"] = np.transpose(
        offsets_to_flow_image(np.asarray(out.offsets), upscale=8), (0, 3, 1, 2)
    )
    return ref_out, ours, n_loaded


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    return _run_oracle(tmp_path_factory, h=256, hole=(100, 140))


def test_state_dict_fully_consumed(oracle):
    _, _, n_loaded = oracle
    # every weight_orig/bias/weight_u in the reference generator maps in:
    # 96 conv kernel+bias pairs, 2 fc pairs, 48 SN u vectors region
    assert n_loaded > 140


@pytest.mark.parametrize(
    "key,atol",
    [
        # measured max abs err is ~6e-7 (pure f32 rounding) on every output
        ("x_stage1", 1e-5),
        ("coarse_seg", 1e-5),
        ("pred1_h", 1e-5),
        ("x_stage2", 1e-5),
        ("fine_seg", 1e-5),
        ("pred2_h", 1e-5),
    ],
)
def test_forward_parity_vs_reference_torch(oracle, key, atol):
    ref_out, ours, _ = oracle
    np.testing.assert_allclose(ours[key], ref_out[key], atol=atol, err_msg=key)


def test_offset_flow_parity_vs_reference_torch(oracle):
    """The resurrected offsets output (round-3): our argmax offsets rendered
    through ops/flow_viz must reproduce the reference's own offset_flow
    visual (inpaint_networks.py:368-408) pixel-for-pixel up to argmax ties
    and uint8 color rounding."""
    ref_out, ours, _ = oracle
    a, b = ref_out["offset_flow"], ours["offset_flow"]
    assert a.shape == b.shape
    # near-total agreement: ties in the argmax (probs equal to ~1e-6) may
    # flip isolated 8x8 blocks
    close = np.abs(a - b) <= (2.0 / 255.0)
    assert close.mean() > 0.99, f"flow agreement {close.mean():.4f}"


def test_forward_parity_128_bottom_hole(tmp_path_factory):
    """Second shape (128^2 -> attention L=256, two row tiles) with the hole
    band at the image BOTTOM, so soft attention queries reach the transposed-
    flatten wrap region — full-net parity vs the reference at the geometry
    that exposed the round-2 sigma+ wrap bug."""
    ref_out, ours, _ = _run_oracle(tmp_path_factory, h=128, hole=(88, 128))
    for key in ("x_stage1", "coarse_seg", "x_stage2", "fine_seg", "pred1_h", "pred2_h"):
        np.testing.assert_allclose(ours[key], ref_out[key], atol=1e-5, err_msg=key)
