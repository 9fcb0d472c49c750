"""Forward parity of the discriminators vs the reference's own define_D nets.

Builds each reference discriminator variant (networks.py:163-209) with torch,
maps its real state_dict through utils/pth.map_discriminator_state, and
compares patch logits on the same batch (train-mode BatchNorm = batch stats
on both sides). Complements the loss oracle (which covers --netD basic) by
pinning the n_layers / pixel / instance variants numerically.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_loader import load_reference_models, reference_available  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


def _map_pixel_state(state):
    """PixelDiscriminator (networks.py:724-753): sequential named ``net``,
    layout (conv@0, conv@2, norm@3, conv@5) = the n_layers=1 PatchGAN
    pattern; the generic mapper handles both names."""
    from healthivert_tpu.utils.pth import map_discriminator_state

    return map_discriminator_state(state, n_layers=1)


@pytest.mark.parametrize(
    "net_d,n_layers,norm",
    [
        ("basic", 3, "batch"),
        ("n_layers", 2, "batch"),
        ("n_layers", 4, "batch"),
        ("basic", 3, "instance"),
        ("pixel", 3, "batch"),
    ],
)
def test_discriminator_forward_parity(net_d, n_layers, norm):
    networks = load_reference_models("networks")
    from healthivert_tpu.models.discriminator import (
        NLayerDiscriminator,
        PixelDiscriminator,
    )
    from healthivert_tpu.utils.pth import map_discriminator_state

    ndf, b, s = 16, 2, 128
    torch.manual_seed(0)
    ref_d = networks.define_D(1, ndf, net_d, n_layers, norm, "normal", 0.02, [])
    ref_d.train()  # batch-stats BN, matching our train=True

    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, 1, s, s)).astype(np.float32)
    with torch.no_grad():
        want = ref_d(torch.from_numpy(x)).numpy()

    state = {k: v.numpy() for k, v in ref_d.state_dict().items()}
    if net_d == "pixel":
        ours = PixelDiscriminator(ndf=ndf, norm=norm)
        params, stats = _map_pixel_state(state)
    else:
        eff_layers = 3 if net_d == "basic" else n_layers
        ours = NLayerDiscriminator(ndf=ndf, n_layers=eff_layers, norm=norm)
        params, stats = map_discriminator_state(state, n_layers=eff_layers)

    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = ours.init(jax.random.PRNGKey(0), xj, train=True)
    from healthivert_tpu.utils.pth import _merge_validated

    params, n_p = _merge_validated(variables["params"], params)
    v = {"params": params}
    if "batch_stats" in variables:
        v["batch_stats"], _ = _merge_validated(variables["batch_stats"], stats)
        got = ours.apply(v, xj, train=True, mutable=["batch_stats"])[0]
    else:
        got = ours.apply(v, xj, train=True)
    assert n_p > 0
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=2e-4, err_msg=f"{net_d}/{norm}")
