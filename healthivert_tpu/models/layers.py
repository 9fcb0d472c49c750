"""Building-block layers: spectrally-normalized conv blocks (flax.linen).

TPU-native redesign of the reference's Conv2dBlock/gen_conv
(/root/reference/models/inpaint_networks.py:413-503): NHWC layout, explicit
symmetric padding integers (so output sizes match the reference's
padding arithmetic exactly), spectral norm as a power-iteration whose u
vector lives in a mutable 'sn' variable collection (torch keeps it as a
buffer updated in-place each forward).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

_ACT = {
    "relu": nn.relu,
    "elu": nn.elu,
    "lrelu": lambda x: nn.leaky_relu(x, 0.2),
    "tanh": jnp.tanh,
    "sigmoid": nn.sigmoid,
    "none": lambda x: x,
}


def _l2(x, eps=1e-12):
    return x / (jnp.linalg.norm(x) + eps)


class SNConv(nn.Module):
    """2D conv with spectral normalization (one power iteration per call).

    Matches torch.nn.utils.spectral_norm semantics: sigma is the largest
    singular value of the kernel reshaped to (out_features, -1); during
    training u is updated in place (here: stored in the 'sn' collection and
    updated when it is mutable); u/v are treated as constants for autodiff.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    use_sn: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, in_features, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )

        if self.use_sn:
            mat = kernel.reshape(-1, self.features).T  # (out, d)
            # u converges to the leading left singular vector within a few
            # steps regardless of init; a fixed key keeps init deterministic.
            u_var = self.variable(
                "sn",
                "u",
                lambda: _l2(jax.random.normal(jax.random.PRNGKey(0), (self.features,))),
            )
            u = jax.lax.stop_gradient(u_var.value)
            matc = jax.lax.stop_gradient(mat)
            v = _l2(matc.T @ u)
            u_new = _l2(matc @ v)
            if not self.is_initializing() and u_var.is_mutable():
                u_var.value = u_new
            sigma = u_new @ (mat @ v)
            kernel = kernel / sigma

        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            y = y + bias.astype(dtype)
        return y


class Conv2dBlock(nn.Module):
    """pad -> SN conv -> activation, the generator's universal block.

    gen_conv(input_dim, out, k, s, pad, rate, activation) equivalent
    (inpaint_networks.py:413-417): spectral norm on by default, ELU default.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    activation: str = "elu"
    use_sn: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = SNConv(
            self.features,
            self.kernel_size,
            self.stride,
            self.padding,
            self.dilation,
            use_sn=self.use_sn,
            dtype=self.dtype,
            name="conv",
        )(x)
        return _ACT[self.activation](y)


def normal_init(stddev=0.02, mean=0.0):
    """torch init.normal_(w, mean, 0.02) equivalent for conv kernels / BN scale."""

    def init(key, shape, dtype=jnp.float32):
        return mean + stddev * jax.random.normal(key, shape, dtype)

    return init
