"""No-torch .pth ingestion: reader round-trips vs torch.save (both formats),
and reference-named generator state dicts map into the flax tree."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from healthivert_tpu.utils.pth import (  # noqa: E402
    load_generator_pth,
    map_generator_state,
    read_pth,
)


@pytest.mark.parametrize("zipfmt", [True, False])
def test_read_pth_roundtrip_dtypes_and_strides(tmp_path, zipfmt):
    rng = np.random.default_rng(0)
    base = torch.from_numpy(rng.standard_normal((4, 6)).astype(np.float32))
    sd = {
        "w.f32": torch.from_numpy(rng.standard_normal((2, 3, 4)).astype(np.float32)),
        "w.f64": torch.from_numpy(rng.standard_normal((5,)).astype(np.float64)),
        "w.i64": torch.arange(7),
        "w.u8": torch.from_numpy(rng.integers(0, 255, (3, 3)).astype(np.uint8)),
        "w.bool": torch.tensor([True, False, True]),
        "w.noncontig": base.t(),  # stride-swapped view
        "w.scalar": torch.tensor(2.5),
    }
    p = str(tmp_path / "sd.pth")
    torch.save(sd, p, _use_new_zipfile_serialization=zipfmt)
    got = read_pth(p)
    assert sorted(got) == sorted(sd)
    for k in sd:
        np.testing.assert_array_equal(got[k], sd[k].numpy(), err_msg=k)
        assert got[k].dtype == sd[k].numpy().dtype, k


def _tree_to_torch_sd(params, sn):
    """Inverse mapping: flax (params, sn) -> reference torch key space."""
    sd = {}

    def walk(node, path):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + [k])
            elif k == "kernel":
                a = np.asarray(v)
                if a.ndim == 4:  # HWIO -> OIHW, spectral-normed conv
                    sd[".".join(path) + ".weight_orig"] = torch.from_numpy(
                        np.transpose(a, (3, 2, 0, 1)).copy()
                    )
                else:  # Dense (in,out) -> Linear (out,in)
                    sd[".".join(path) + ".weight"] = torch.from_numpy(a.T.copy())
            elif k == "bias":
                sd[".".join(path) + ".bias"] = torch.from_numpy(np.asarray(v).copy())

    walk(params, [])

    def walk_sn(node, path):
        for k, v in node.items():
            if isinstance(v, dict):
                walk_sn(v, path + [k])
            elif k == "u":
                a = np.asarray(v)
                sd[".".join(path) + ".weight_u"] = torch.from_numpy(a.copy())
                sd[".".join(path) + ".weight_v"] = torch.zeros(1)  # ignored

    walk_sn(sn, [])
    return sd


def test_generator_pth_maps_into_flax_tree(tmp_path):
    from healthivert_tpu.models.generator import Generator

    gen = Generator(cnum=4)
    x = jnp.zeros((1, 64, 64, 1))
    variables = gen.init(jax.random.PRNGKey(0), x, x, x, jnp.zeros((1,)))
    params0, sn0 = variables["params"], variables["sn"]

    # build a torch checkpoint with DIFFERENT values in the reference layout
    rng = np.random.default_rng(1)
    params_rand = jax.tree_util.tree_map(
        lambda a: rng.standard_normal(a.shape).astype(np.float32), params0
    )
    sn_rand = jax.tree_util.tree_map(
        lambda a: rng.standard_normal(a.shape).astype(np.float32), sn0
    )
    p = str(tmp_path / "net_G.pth")
    torch.save(_tree_to_torch_sd(params_rand, sn_rand), p)

    params1, sn1, n = load_generator_pth(p, params0, sn0)
    assert n > 90  # 96 conv kernels+biases + 2 fc pairs + 47 sn u's region
    for got, want in zip(
        jax.tree_util.tree_leaves(params1), jax.tree_util.tree_leaves(params_rand)
    ):
        np.testing.assert_allclose(np.asarray(got), want)
    for got, want in zip(jax.tree_util.tree_leaves(sn1), jax.tree_util.tree_leaves(sn_rand)):
        np.testing.assert_allclose(np.asarray(got), want)

    # and the generator actually runs with the loaded weights
    out = gen.apply({"params": params1, "sn": sn1}, x, x, x, jnp.zeros((1,)))
    assert np.isfinite(float(jnp.sum(out.x_stage2)))


def test_generator_pth_nested_state_dict(tmp_path):
    """Checkpoints saved as torch.save({'state_dict': sd}) must unwrap and
    load identically to the flat layout (the flattened reader shows the
    nesting as a 'state_dict.' key prefix — code-review r3 found the old
    unwrap condition could never fire)."""
    from healthivert_tpu.models.generator import Generator

    gen = Generator(cnum=4)
    x = jnp.zeros((1, 64, 64, 1))
    variables = gen.init(jax.random.PRNGKey(0), x, x, x, jnp.zeros((1,)))
    params0, sn0 = variables["params"], variables["sn"]
    rng = np.random.default_rng(2)
    params_rand = jax.tree_util.tree_map(
        lambda a: rng.standard_normal(a.shape).astype(np.float32), params0
    )
    sn_rand = jax.tree_util.tree_map(
        lambda a: rng.standard_normal(a.shape).astype(np.float32), sn0
    )
    p = str(tmp_path / "nested.pth")
    torch.save({"state_dict": _tree_to_torch_sd(params_rand, sn_rand)}, p)
    params1, _, n = load_generator_pth(p, params0, sn0)
    assert n > 90
    for got, want in zip(
        jax.tree_util.tree_leaves(params1), jax.tree_util.tree_leaves(params_rand)
    ):
        np.testing.assert_allclose(np.asarray(got), want)


def test_pth_shape_mismatch_raises(tmp_path):
    sd = {"coarse_generator.conv1.conv.weight_orig": torch.zeros(4, 3, 9, 9),
          "coarse_generator.conv1.conv.bias": torch.zeros(4)}
    p = str(tmp_path / "bad.pth")
    torch.save(sd, p)
    from healthivert_tpu.models.generator import Generator

    gen = Generator(cnum=4)
    x = jnp.zeros((1, 64, 64, 1))
    v = gen.init(jax.random.PRNGKey(0), x, x, x, jnp.zeros((1,)))
    with pytest.raises(ValueError, match="shape mismatch"):
        load_generator_pth(p, v["params"], v["sn"])


def test_pth_unknown_key_raises(tmp_path):
    sd = {"coarse_generator.nonexistent.conv.weight_orig": torch.zeros(4, 3, 5, 5)}
    p = str(tmp_path / "bad2.pth")
    torch.save(sd, p)
    from healthivert_tpu.models.generator import Generator

    gen = Generator(cnum=4)
    x = jnp.zeros((1, 64, 64, 1))
    v = gen.init(jax.random.PRNGKey(0), x, x, x, jnp.zeros((1,)))
    with pytest.raises(KeyError):
        load_generator_pth(p, v["params"], v["sn"])


def test_map_generator_state_transposes():
    state = {
        "coarse_generator.conv1.conv.weight_orig": np.arange(2 * 3 * 5 * 5, dtype=np.float32).reshape(2, 3, 5, 5),
        "coarse_generator.conv1.conv.weight_u": np.ones(2, np.float32),
        "coarse_generator.conv1.conv.weight_v": np.ones(75, np.float32),
        "coarse_generator.conv1.conv.bias": np.zeros(2, np.float32),
        "coarse_generator.fc_height.weight": np.arange(16, dtype=np.float32).reshape(1, 16),
        "coarse_generator.fc_height.bias": np.zeros(1, np.float32),
    }
    params, sn = map_generator_state(state)
    k = params["coarse_generator"]["conv1"]["conv"]["kernel"]
    assert k.shape == (5, 5, 3, 2)  # HWIO
    np.testing.assert_array_equal(
        k, np.transpose(state["coarse_generator.conv1.conv.weight_orig"], (2, 3, 1, 0))
    )
    assert params["coarse_generator"]["fc_height"]["kernel"].shape == (16, 1)
    assert sn["coarse_generator"]["conv1"]["conv"]["u"].shape == (2,)
    assert "weight_v" not in str(params)


def test_restore_generator_pth_into_train_state(tmp_path):
    """--load_pth path: overlay a reference-format .pth onto a TrainState."""
    from healthivert_tpu.engine.checkpoint import restore_generator_pth
    from healthivert_tpu.models.pix2pix import Pix2PixConfig, init_state

    cfg = Pix2PixConfig(ngf=4, ndf=8, image_size=64)
    state = init_state(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(7)
    params_rand = jax.tree_util.tree_map(
        lambda a: rng.standard_normal(a.shape).astype(np.float32), state.g_params
    )
    sn_rand = jax.tree_util.tree_map(
        lambda a: rng.standard_normal(a.shape).astype(np.float32), state.g_sn
    )
    p = str(tmp_path / "latest_net_G.pth")
    torch.save(_tree_to_torch_sd(params_rand, sn_rand), p)

    state2 = restore_generator_pth(state, p)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(state2.g_params)[0]),
        jax.tree_util.tree_leaves(params_rand)[0],
    )
    # discriminators untouched
    assert jax.tree_util.tree_leaves(state2.d1_params)[0] is jax.tree_util.tree_leaves(state.d1_params)[0]
