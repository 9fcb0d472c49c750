"""PatchGAN discriminators (flax.linen, NHWC).

Parity with /root/reference/models/networks.py:555-602 (NLayerDiscriminator,
the 70x70 PatchGAN: 4x4 convs, stride 2,2,2,1,1, LeakyReLU 0.2, BatchNorm)
and :724 (PixelDiscriminator). Weight init matches init_weights 'normal'
(networks.py:82-96): conv kernels ~ N(0, 0.02), BN scale ~ N(1, 0.02).

BatchNorm under pjit/GSPMD computes GLOBAL batch statistics: a batch-sharded
array's mean/var reductions are lowered with cross-device collectives, so the
math is sync-BN regardless of device count (pinned by
tests/test_parallel.py::test_batchnorm_global_stats_across_shards). This
deliberately differs from the reference's torch.nn.DataParallel per-GPU
stats — global stats are the better-defined semantics and are what a
single-device run computes, so 1-vs-N device runs match bit-for-bit.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import normal_init, weight_init


class NLayerDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 3
    norm: str = "batch"  # batch | instance | none
    dtype: Any = None
    init_type: str = "normal"  # normal | xavier | kaiming | orthogonal
    init_gain: float = 0.02

    def _norm(self, train: bool, name: str):
        if self.norm == "batch":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                scale_init=normal_init(self.init_gain, mean=1.0),
                name=name,
            )
        if self.norm == "instance":
            # torch InstanceNorm2d(affine=False): per-sample spatial stats
            return lambda x: (x - x.mean((1, 2), keepdims=True)) * jax.lax.rsqrt(
                x.var((1, 2), keepdims=True) + 1e-5
            )
        return lambda x: x

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = lambda f, s, name, bias=True: nn.Conv(
            f,
            (4, 4),
            strides=(s, s),
            padding=((1, 1), (1, 1)),
            use_bias=bias,
            kernel_init=weight_init(self.init_type, self.init_gain),
            dtype=self.dtype,
            name=name,
        )
        use_bias = self.norm == "instance"

        h = nn.leaky_relu(conv(self.ndf, 2, "conv0")(x), 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2**n, 8)
            h = conv(self.ndf * nf, 2, f"conv{n}", bias=use_bias)(h)
            h = self._norm(train, f"norm{n}")(h)
            h = nn.leaky_relu(h, 0.2)
        nf = min(2**self.n_layers, 8)
        h = conv(self.ndf * nf, 1, f"conv{self.n_layers}", bias=use_bias)(h)
        h = self._norm(train, f"norm{self.n_layers}")(h)
        h = nn.leaky_relu(h, 0.2)
        return conv(1, 1, "conv_out")(h)  # (B, 30, 30, 1) logits for 256 input


class PixelDiscriminator(nn.Module):
    """1x1 PixelGAN (networks.py:724-753)."""

    ndf: int = 64
    norm: str = "batch"
    dtype: Any = None
    init_type: str = "normal"
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = lambda f, name, bias=True: nn.Conv(
            f, (1, 1), use_bias=bias, kernel_init=weight_init(self.init_type, self.init_gain),
            dtype=self.dtype, name=name
        )
        h = nn.leaky_relu(conv(self.ndf, "conv0")(x), 0.2)
        h = conv(self.ndf * 2, "conv1", bias=self.norm == "instance")(h)
        if self.norm == "batch":
            h = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                scale_init=normal_init(self.init_gain, mean=1.0),
                name="norm1",
            )(h)
        elif self.norm == "instance":
            h = (h - h.mean((1, 2), keepdims=True)) * jax.lax.rsqrt(
                h.var((1, 2), keepdims=True) + 1e-5
            )
        h = nn.leaky_relu(h, 0.2)
        return conv(1, "conv_out")(h)


def gan_loss(logits: jnp.ndarray, target_is_real: bool, mode: str = "vanilla") -> jnp.ndarray:
    """GANLoss equivalent (networks.py:212-278): vanilla = BCE-with-logits
    against constant labels, lsgan = MSE, wgangp = -+mean."""
    logits = logits.astype(jnp.float32)
    if mode == "vanilla":
        target = 1.0 if target_is_real else 0.0
        # BCEWithLogits: softplus(x) - target*x, mean-reduced
        return jnp.mean(jax.nn.softplus(logits) - target * logits)
    if mode == "lsgan":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean((logits - target) ** 2)
    if mode == "wgangp":
        return -jnp.mean(logits) if target_is_real else jnp.mean(logits)
    raise ValueError(f"gan mode {mode} not implemented")
