"""Post-training int8 inference path (--compute_dtype int8).

Quality impact is measured in experiments/int8_quality.py (near-zero on the
shipped checkpoint); these tests pin the mechanics: the quantized conv
matches its own dequantized-f32 mirror, the generator runs end-to-end at
int8, training refuses the mode, and the test.py CLI surface accepts it.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_snconv_int8_matches_fakequant_mirror():
    """int8 x int8 -> int32 conv == f32 conv of the dequantized operands
    (int32 accumulation is exact; the f32 mirror only differs by summation
    rounding)."""
    from healthivert_tpu.models.layers import SNConv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1.7, (2, 16, 16, 5)).astype(np.float32))
    conv = SNConv(features=8, kernel_size=3, padding=1, use_sn=False, dtype="int8")
    v = conv.init(jax.random.PRNGKey(1), x)
    y = conv.apply(v, x)
    assert y.dtype == jnp.bfloat16

    k = v["params"]["kernel"]
    b = v["params"]["bias"]
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True), 1e-12) / 127.0
    qx = jnp.clip(jnp.round(x / sx), -127, 127) * sx
    sw = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)), 1e-12) / 127.0
    qk = jnp.clip(jnp.round(k / sw), -127, 127) * sw
    ref = jax.lax.conv_general_dilated(
        qx, qk, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    np.testing.assert_allclose(
        np.float32(y), np.float32(ref.astype(jnp.bfloat16)), rtol=0, atol=1e-2
    )
    # and it actually quantized: differs from the unquantized conv
    full = conv.copy(dtype=jnp.float32).apply(v, x)
    assert float(jnp.max(jnp.abs(full - y.astype(jnp.float32)))) > 1e-4


def test_int8_outputs_batch_invariant():
    """Per-SAMPLE activation scales: a sample's int8 output must not depend
    on what else shares the dispatch (serial-vs-batched / mesh-vs-unmeshed
    equivalence — a whole-batch max scale broke it)."""
    from healthivert_tpu.models.layers import SNConv

    rng = np.random.default_rng(2)
    a = rng.normal(0, 1, (1, 12, 12, 4)).astype(np.float32)
    b = rng.normal(0, 50, (1, 12, 12, 4)).astype(np.float32)  # huge-scale peer
    conv = SNConv(features=8, kernel_size=3, padding=1, dtype="int8")
    v = conv.init(jax.random.PRNGKey(0), jnp.asarray(a))
    solo = conv.apply(v, jnp.asarray(a))
    paired = conv.apply(v, jnp.asarray(np.concatenate([a, b])))[:1]
    np.testing.assert_array_equal(np.float32(solo), np.float32(paired))


def test_int8_narrow_heads_run_bf16():
    """Mixed-precision heads (r5): under dtype="int8" a conv with < 8
    output channels (the 1-channel image/seg heads, reference
    inpaint_networks.py:112-115,225-230) must run the bf16 path — bit-equal
    to the bf16 conv, not merely close — while wide convs stay quantized."""
    from healthivert_tpu.models.layers import SNConv

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1.3, (2, 16, 16, 9)).astype(np.float32))
    head8 = SNConv(features=1, kernel_size=3, padding=1, dtype="int8")
    v = head8.init(jax.random.PRNGKey(0), x)
    y8 = head8.apply(v, x)
    ybf = head8.copy(dtype=jnp.bfloat16).apply(v, x.astype(jnp.bfloat16))
    assert y8.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.float32(y8), np.float32(ybf))
    # a wide conv under the same dtype flag really quantizes
    wide = SNConv(features=8, kernel_size=3, padding=1, dtype="int8")
    vw = wide.init(jax.random.PRNGKey(0), x)
    yq = wide.apply(vw, x)
    yw = wide.copy(dtype=jnp.float32).apply(vw, x)
    assert float(jnp.max(jnp.abs(yw - yq.astype(jnp.float32)))) > 1e-4


def test_generator_convs_run_at_requested_dtype(monkeypatch):
    """Every conv in Generator(dtype=bf16) must actually execute in bf16:
    an f32 leak (ratio plane, attention output) once silently promoted the
    whole trunk to f32 convs in the dtype=None bench/infer3d paths
    (code-review r3). Records the lhs dtype of every conv dispatch."""
    from healthivert_tpu.models.generator import Generator

    seen = []
    orig = jax.lax.conv_general_dilated

    def spy(lhs, rhs, *a, **kw):
        seen.append(lhs.dtype)
        return orig(lhs, rhs, *a, **kw)

    monkeypatch.setattr(jax.lax, "conv_general_dilated", spy)
    gen = Generator(cnum=4, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 64, 64, 1), jnp.bfloat16)
    v = gen.init(jax.random.PRNGKey(0), x, x, 1.0 - x, jnp.zeros((1,)))
    seen.clear()
    with jax.disable_jit():  # eager so the spy sees every dispatch
        gen.apply(v, x, x, 1.0 - x, jnp.zeros((1,)))
    assert seen and all(d == jnp.bfloat16 for d in seen), set(seen)


def test_generator_runs_int8():
    from healthivert_tpu.models.pix2pix import Pix2PixConfig, build_modules, init_state

    cfg = Pix2PixConfig(ngf=4, ndf=8, image_size=64, compute_dtype="int8")
    state = init_state(jax.random.PRNGKey(0), cfg, batch_size=2)
    gen, _ = build_modules(cfg)
    x = jnp.zeros((2, 64, 64, 1))
    out = gen.apply(
        {"params": state.g_params, "sn": state.g_sn}, x, x, 1.0 - x,
        jnp.zeros((2,)),
    )
    for leaf in jax.tree_util.tree_leaves(out):
        assert bool(jnp.all(jnp.isfinite(leaf.astype(jnp.float32))))
    assert float(out.x_stage2.min()) >= -1.0 and float(out.x_stage2.max()) <= 1.0


def test_training_rejects_int8(tmp_path):
    import train

    with pytest.raises(SystemExit, match="inference-only"):
        train.main([
            "--dataset_mode", "synthetic", "--name", "i8", "--batch_size", "2",
            "--crop_size", "64", "--compute_dtype", "int8",
            "--checkpoints_dir", str(tmp_path),
        ])


def test_test_cli_int8(tmp_path):
    """test.py --compute_dtype int8 runs end-to-end and writes the gallery."""
    import test as test_cli

    test_cli.main([
        "--dataset_mode", "synthetic", "--name", "i8cli", "--crop_size", "64",
        "--ndf", "8", "--checkpoints_dir", str(tmp_path / "ck"),
        "--results_dir", str(tmp_path / "res"), "--num_test", "1",
        "--compute_dtype", "int8",
    ])
    assert (tmp_path / "res" / "i8cli" / "test_latest" / "index.html").exists()


def test_static_calibrated_scales():
    """Static per-tensor activation scales (calibrate_int8, r4): calibrating
    on the same data reproduces the dynamic path closely; the static tree is
    batch-composition invariant by construction; sown calib leaves are the
    batch absmax."""
    from healthivert_tpu.models.layers import SNConv
    from healthivert_tpu.models.pix2pix import calib_to_quant, merge_calib

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1.3, (4, 16, 16, 5)).astype(np.float32))
    conv = SNConv(features=8, kernel_size=3, padding=1, dtype="int8")
    v = conv.init(jax.random.PRNGKey(1), x)
    assert "calib" not in v  # init must not create the collection

    _, mut = conv.apply(v, x, mutable=["calib"])
    absmax = mut["calib"]["act_absmax"]
    np.testing.assert_allclose(float(absmax), float(jnp.max(jnp.abs(x))), rtol=1e-6)

    quant = calib_to_quant(mut["calib"])
    assert set(quant) == {"act_scale"}
    y_static = conv.apply({**v, "quant": quant}, x)
    y_dyn = conv.apply(v, x)
    # same data, per-tensor vs per-sample scale: small quantization-grid
    # difference only
    np.testing.assert_allclose(
        np.float32(y_static), np.float32(y_dyn), atol=0.15
    )

    # batch-composition invariance with the SAME static tree (the property
    # the per-sample dynamic path was built for)
    solo = conv.apply({**v, "quant": quant}, x[:1])
    np.testing.assert_array_equal(np.float32(solo), np.float32(y_static[:1]))

    # multi-batch merge takes the elementwise max
    _, mut2 = conv.apply(v, 2.0 * x, mutable=["calib"])
    merged = merge_calib(mut["calib"], mut2["calib"])
    np.testing.assert_allclose(
        float(merged["act_absmax"]), 2 * float(jnp.max(jnp.abs(x))), rtol=1e-6
    )


def test_generator_calibrate_int8_and_forward():
    """calibrate_int8 over generator_forward-style batches yields a quant
    tree the full generator accepts; static outputs stay close to dynamic."""
    from healthivert_tpu.data.synthetic import SyntheticDataset
    from healthivert_tpu.models.generator import Generator
    from healthivert_tpu.models.pix2pix import (
        Pix2PixConfig, calibrate_int8, generator_forward, init_state,
    )

    cfg = Pix2PixConfig(ngf=4, image_size=64, compute_dtype="int8")
    state = init_state(jax.random.PRNGKey(0), cfg)
    gen = Generator(cnum=cfg.ngf, dtype="int8")
    ds = SyntheticDataset(batch_size=2, seed=0, n_volumes=1, shape=(64, 64, 12))
    batch = {k: jnp.asarray(v) for k, v in ds.sample_batch().items()}

    quant = calibrate_int8(gen, state.g_params, state.g_sn, [batch], cfg)
    n_scales = len(jax.tree.leaves(quant))
    assert n_scales > 20  # one per quantized conv

    f_dyn = generator_forward(gen, state.g_params, state.g_sn, batch, cfg,
                              update_sn=False)
    f_st = generator_forward(gen, state.g_params, state.g_sn, batch, cfg,
                             update_sn=False, g_quant=quant)
    d = np.abs(np.float32(f_dyn["fake_b"]) - np.float32(f_st["fake_b"]))
    assert d.mean() < 0.05, d.mean()


def test_calibrate_int8_percentile():
    """percentile=99.9 calibration: per-conv scales are <= the absmax scales
    (outlier clipping can only shrink the grid), the quant tree has the same
    structure, and the generator accepts it."""
    from healthivert_tpu.data.synthetic import SyntheticDataset
    from healthivert_tpu.models.generator import Generator
    from healthivert_tpu.models.pix2pix import (
        Pix2PixConfig, calibrate_int8, generator_forward, init_state,
    )

    cfg = Pix2PixConfig(ngf=4, image_size=64, compute_dtype="int8")
    state = init_state(jax.random.PRNGKey(0), cfg)
    gen = Generator(cnum=cfg.ngf, dtype="int8")
    ds = SyntheticDataset(batch_size=2, seed=0, n_volumes=1, shape=(64, 64, 12))
    batch = {k: jnp.asarray(v) for k, v in ds.sample_batch().items()}

    q_max = calibrate_int8(gen, state.g_params, state.g_sn, [batch], cfg)
    q_p = calibrate_int8(gen, state.g_params, state.g_sn, [batch], cfg,
                         percentile=99.9)
    lm, lp = jax.tree.leaves(q_max), jax.tree.leaves(q_p)
    assert len(lm) == len(lp) and len(lm) > 20
    assert all(float(p) <= float(m) + 1e-9 for p, m in zip(lp, lm))
    assert any(float(p) < float(m) * 0.999 for p, m in zip(lp, lm)), \
        "percentile calibration should clip at least one conv's outliers"
    f = generator_forward(gen, state.g_params, state.g_sn, batch, cfg,
                          update_sn=False, g_quant=q_p)
    assert np.isfinite(np.float32(f["fake_b"])).all()

    import pytest as _pytest

    from healthivert_tpu.models.pix2pix import calib_to_quant

    with _pytest.raises(ValueError):
        calib_to_quant({}, percentile=95.0)


def test_quant_store_makes_int8_batch_independent(tmp_path):
    """quant='auto' + quant_store: the first call persists its calibrated
    scales; a later call with a DIFFERENT --slice_batch loads them and must
    produce bit-identical outputs (without the store, auto scales depend on
    what shares the first calibration chunk — ADVICE r4)."""
    from healthivert_tpu.data.synthetic import make_spine_volume
    from healthivert_tpu.engine.infer3d import synthesize_volumes
    from healthivert_tpu.models.pix2pix import Pix2PixConfig, init_state

    cfg = Pix2PixConfig(ngf=4, image_size=64, compute_dtype="int8")
    state = init_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ct, labels, cam = make_spine_volume(
        rng, shape=(64, 64, 16), vert_ids=(19, 20, 21), vert_height=12,
        gap=5, fractured={20: 0.6},
    )
    store = str(tmp_path / "int8_quant.msgpack")
    vols = [(ct, labels, 20, cam)]
    (a_ct, a_lb), = synthesize_volumes(
        state.g_params, state.g_sn, cfg, vols, batch_size=8, use_bf16=True,
        quant="auto", quant_store=store,
    )
    assert os.path.exists(store)
    (b_ct, b_lb), = synthesize_volumes(
        state.g_params, state.g_sn, cfg, vols, batch_size=4, use_bf16=True,
        quant="auto", quant_store=store,
    )
    np.testing.assert_array_equal(a_ct, b_ct)
    np.testing.assert_array_equal(a_lb, b_lb)


def test_quant_store_rejects_stale_or_corrupt(tmp_path):
    """The persisted quant tree is fingerprinted to the weights: a truncated
    file, a pre-fingerprint blob, or a store calibrated for DIFFERENT weights
    (checkpoint retrained under the same --name) must all trigger a warned
    recalibration instead of crashing or silently reusing stale scales."""
    import warnings

    from flax import serialization

    from healthivert_tpu.data.synthetic import make_spine_volume
    from healthivert_tpu.engine.infer3d import (
        _load_quant_store, _save_quant_store, synthesize_volumes,
    )
    from healthivert_tpu.models.pix2pix import Pix2PixConfig, init_state

    cfg = Pix2PixConfig(ngf=4, image_size=64, compute_dtype="int8")
    state = init_state(jax.random.PRNGKey(0), cfg)
    other = init_state(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(0)
    ct, labels, cam = make_spine_volume(
        rng, shape=(64, 64, 16), vert_ids=(19, 20, 21), vert_height=12,
        gap=5, fractured={20: 0.6},
    )
    store = str(tmp_path / "int8_quant.msgpack")
    vols = [(ct, labels, 20, cam)]
    (a_ct, _), = synthesize_volumes(
        state.g_params, state.g_sn, cfg, vols, batch_size=8, use_bf16=True,
        quant="auto", quant_store=store,
    )
    good = _load_quant_store(store, state.g_params)
    assert good is not None

    # different weights -> fingerprint mismatch -> recalibrate
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert _load_quant_store(store, other.g_params) is None
    assert any("different weights" in str(x.message) for x in w)

    # truncated file -> unreadable -> recalibrate (and the end-to-end call
    # must recover: it rewrites the store and still produces output)
    blob = open(store, "rb").read()
    with open(store, "wb") as f:
        f.write(blob[: len(blob) // 2])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        (b_ct, _), = synthesize_volumes(
            state.g_params, state.g_sn, cfg, vols, batch_size=8,
            use_bf16=True, quant="auto", quant_store=store,
        )
    assert any("unreadable" in str(x.message) for x in w)
    np.testing.assert_array_equal(a_ct, b_ct)
    assert _load_quant_store(store, state.g_params) is not None  # rewritten

    # legacy (pre-fingerprint) format: a bare tree without meta
    with open(store, "wb") as f:
        f.write(serialization.msgpack_serialize(jax.device_get(good)))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert _load_quant_store(store, state.g_params) is None
    assert any("pre-r5" in str(x.message) for x in w)

    # atomic save leaves no temp droppings
    _save_quant_store(store, good, state.g_params)
    assert [p for p in os.listdir(tmp_path)] == ["int8_quant.msgpack"]


def test_synthesize_volume_auto_quant():
    """quant='auto' calibrates from the call's own first batch and completes
    3D synthesis; output stays close to the dynamic-scale path."""
    from healthivert_tpu.data.synthetic import make_spine_volume
    from healthivert_tpu.engine.infer3d import synthesize_volume
    from healthivert_tpu.models.pix2pix import Pix2PixConfig, init_state

    cfg = Pix2PixConfig(ngf=4, image_size=64, compute_dtype="int8")
    state = init_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ct, labels, cam = make_spine_volume(
        rng, shape=(64, 64, 16), vert_ids=(19, 20, 21), vert_height=12,
        gap=5, fractured={20: 0.6},
    )
    kw = dict(batch_size=8, use_bf16=True)
    ct_dyn, lb_dyn = synthesize_volume(
        state.g_params, state.g_sn, cfg, ct, labels, 20, cam, **kw
    )
    ct_auto, lb_auto = synthesize_volume(
        state.g_params, state.g_sn, cfg, ct, labels, 20, cam, quant="auto", **kw
    )
    # same synthesized support, near-identical CT values
    inter = np.sum((lb_dyn > 0) & (lb_auto > 0))
    union = np.sum((lb_dyn > 0) | (lb_auto > 0))
    assert union == 0 or inter / union > 0.95
    sel = (ct_dyn != 0) | (ct_auto != 0)
    if sel.any():
        assert np.mean(np.abs(ct_dyn[sel] - ct_auto[sel])) < 10  # u8 scale

    with pytest.raises(ValueError):
        synthesize_volume(
            state.g_params, state.g_sn,
            Pix2PixConfig(ngf=4, image_size=64), ct, labels, 20, cam,
            quant="auto", **kw,
        )
