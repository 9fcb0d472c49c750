"""Alternative / legacy network variants from the reference inventory.

These exist in the reference but are not on its default training path; they
complete the component inventory (SURVEY.md §2):

- DualHeadUNet: shared-encoder UNet with separate CT (tanh-less, raw) and
  mask (sigmoid) decoders (/root/reference/models/UnetG_CT_mask.py:104-146,
  superseded by the inpainting generator, call site commented at
  pix2pix_model.py:96-100)
- UnetGenerator / ResnetGenerator: the original pix2pix backbones
  (/root/reference/models/networks.py:318-553)
- SegDiscriminator: encoder-shared PatchGAN + UNet seg decoder, selectable
  via --netD seg (/root/reference/models/networks.py:604-721)
- gradient_penalty: WGAN-GP penalty (/root/reference/models/networks.py:281-315)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import normal_init, weight_init


def _down(x, f, name, norm=True, train=True, bias=None, kinit=None, gain=0.02):
    use_bias = not norm if bias is None else bias
    x = nn.Conv(f, (4, 4), (2, 2), padding=((1, 1), (1, 1)), use_bias=use_bias,
                kernel_init=kinit or normal_init(0.02), name=f"{name}_conv")(x)
    if norm:
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         scale_init=normal_init(gain, 1.0), name=f"{name}_bn")(x)
    return nn.leaky_relu(x, 0.2)


def _up(x, f, name, train=True, act="relu", kinit=None, gain=0.02):
    # flax ConvTranspose padding: out = in*s + k - s - pads; (2,2) gives the
    # exact 2x upsample of torch conv_transpose2d(k=4, s=2, p=1)
    x = nn.ConvTranspose(f, (4, 4), (2, 2), padding=((2, 2), (2, 2)), use_bias=False,
                         kernel_init=kinit or normal_init(0.02), name=f"{name}_deconv")(x)
    x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                     scale_init=normal_init(gain, 1.0), name=f"{name}_bn")(x)
    if act == "relu":
        x = nn.relu(x)
    elif act == "sigmoid":
        x = nn.sigmoid(x)
    return x


class DualHeadUNet(nn.Module):
    """Shared encoder, two decoders (CT / sigmoid mask) with skip concats."""

    out_features: int = 1
    num_downs: int = 5
    ngf: int = 64
    init_type: str = "normal"  # --init_type/--init_gain (networks.py:68-99)
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x, train: bool = True):
        feats = []
        for i in range(self.num_downs):
            x = _down(
                x, self.ngf * 2**i, f"down{i}",
                norm=i != self.num_downs - 1, train=train,
                kinit=weight_init(self.init_type, self.init_gain),
                gain=self.init_gain,
            )
            feats.append(x)

        def decode(tag, final_act):
            h = feats[-1]
            for j, i in enumerate(reversed(range(self.num_downs))):
                f = self.ngf * 2 ** (i - 1) if i > 0 else self.out_features
                act = final_act if i == 0 else "relu"
                h = _up(h, f, f"{tag}_up{j}", train=train, act=act,
                        kinit=weight_init(self.init_type, self.init_gain,
                                          transpose=True),
                        gain=self.init_gain)
                if j < len(feats) - 1:
                    h = jnp.concatenate([h, feats[-2 - j]], axis=-1)
            return h

        return decode("ct", "none"), decode("mask", "sigmoid")


class UnetGenerator(nn.Module):
    """Plain recursive pix2pix UNet (networks.py:427-553 semantics)."""

    out_features: int = 1
    num_downs: int = 8
    ngf: int = 64
    init_type: str = "normal"  # --init_type/--init_gain (networks.py:68-99)
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x, train: bool = True):
        widths = [min(self.ngf * 2**i, self.ngf * 8) for i in range(self.num_downs)]
        feats = []
        h = x
        for i, f in enumerate(widths):
            h = _down(h, f, f"down{i}", norm=0 < i < self.num_downs - 1, train=train,
                      kinit=weight_init(self.init_type, self.init_gain),
                      gain=self.init_gain)
            feats.append(h)
        for j, i in enumerate(reversed(range(self.num_downs))):
            f = widths[i - 1] if i > 0 else self.out_features
            h = _up(h, f, f"up{j}", train=train, act="relu" if i > 0 else "none",
                    kinit=weight_init(self.init_type, self.init_gain,
                                      transpose=True),
                    gain=self.init_gain)
            if i > 0:
                h = jnp.concatenate([h, feats[i - 1]], axis=-1)
        return jnp.tanh(h)


class ResnetBlock(nn.Module):
    features: int
    init_type: str = "normal"  # --init_type/--init_gain (networks.py:68-99)
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        h = nn.Conv(self.features, (3, 3), padding="VALID",
                    kernel_init=weight_init(self.init_type, self.init_gain), name="conv1")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(h)
        h = nn.relu(h)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        h = nn.Conv(self.features, (3, 3), padding="VALID",
                    kernel_init=weight_init(self.init_type, self.init_gain), name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn2")(h)
        return x + h


class ResnetGenerator(nn.Module):
    """resnet_9blocks backbone (networks.py:318-414 semantics)."""

    out_features: int = 1
    ngf: int = 64
    n_blocks: int = 9
    init_type: str = "normal"  # --init_type/--init_gain (networks.py:68-99)
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        h = nn.Conv(self.ngf, (7, 7), padding="VALID", kernel_init=weight_init(self.init_type, self.init_gain),
                    name="stem")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="stem_bn")(h)
        h = nn.relu(h)
        for i in range(2):
            h = nn.Conv(self.ngf * 2 ** (i + 1), (3, 3), (2, 2), padding=1,
                        kernel_init=weight_init(self.init_type, self.init_gain), name=f"down{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name=f"down{i}_bn")(h)
            h = nn.relu(h)
        for i in range(self.n_blocks):
            h = ResnetBlock(self.ngf * 4, init_type=self.init_type,
                            init_gain=self.init_gain, name=f"block{i}")(h, train)
        for i in range(2):
            h = nn.ConvTranspose(self.ngf * 2 ** (1 - i), (3, 3), (2, 2), padding="SAME",
                                 kernel_init=weight_init(self.init_type, self.init_gain, transpose=True), name=f"up{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name=f"up{i}_bn")(h)
            h = nn.relu(h)
        h = jnp.pad(h, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        h = nn.Conv(self.out_features, (7, 7), padding="VALID",
                    kernel_init=weight_init(self.init_type, self.init_gain), name="head")(h)
        return jnp.tanh(h)


class SegDiscriminator(nn.Module):
    """Shared encoder emitting PatchGAN logits + a UNet seg decoder
    (networks.py:604-721, --netD seg)."""

    ndf: int = 64
    n_layers: int = 3
    init_type: str = "normal"  # --init_type/--init_gain (networks.py:68-99)
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x, train: bool = True):
        # encoder = PatchGAN trunk shared by both heads (networks.py:622-646)
        h = _down(x, self.ndf, "enc0", norm=False, train=train, bias=True,
                  kinit=weight_init(self.init_type, self.init_gain),
                  gain=self.init_gain)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2**n, 8)
            h = _down(h, self.ndf * nf, f"enc{n}", train=train,
                      kinit=weight_init(self.init_type, self.init_gain),
                      gain=self.init_gain)
        nf = min(2**self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, (4, 4), padding=((1, 1), (1, 1)), use_bias=False,
                    kernel_init=weight_init(self.init_type, self.init_gain), name="enc_final")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="enc_final_bn")(h)
        h = nn.leaky_relu(h, 0.2)
        logits = nn.Conv(1, (4, 4), padding=((1, 1), (1, 1)),
                         kernel_init=weight_init(self.init_type, self.init_gain), name="patch_out")(h)

        # decoder = plain upconv stack, NO skip connections (networks.py:652-695)
        s = h
        for i in range(1, self.n_layers + 1):
            f = max(self.ndf * min(2 ** (self.n_layers - i), 8), self.ndf)
            if i == 1:  # torch convT(k4, s1, p1): out = in + 1
                s = nn.ConvTranspose(f, (4, 4), (1, 1), padding=((1, 1), (1, 1)),
                                     kernel_init=weight_init(self.init_type, self.init_gain, transpose=True), name=f"dec{i}")(s)
            else:
                s = nn.ConvTranspose(f, (4, 4), (2, 2), padding=((2, 2), (2, 2)),
                                     kernel_init=weight_init(self.init_type, self.init_gain, transpose=True), name=f"dec{i}")(s)
            s = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"dec{i}_bn")(s)
            s = nn.relu(s)
        seg = nn.ConvTranspose(1, (4, 4), (2, 2), padding=((2, 2), (2, 2)),
                               kernel_init=weight_init(self.init_type, self.init_gain, transpose=True), name="seg_out")(s)
        return logits, nn.sigmoid(seg)


def gradient_penalty(disc_fn, real, fake, rng, constant: float = 1.0, lambda_gp: float = 10.0):
    """WGAN-GP penalty on mixed samples (networks.py:281-315)."""
    alpha = jax.random.uniform(rng, (real.shape[0],) + (1,) * (real.ndim - 1))
    mixed = alpha * real + (1 - alpha) * fake

    def d_sum(x):
        return jnp.sum(disc_fn(x))

    grads = jax.grad(d_sum)(mixed)
    grads = grads.reshape(real.shape[0], -1)
    norm = jnp.linalg.norm(grads + 1e-16, axis=1)
    return jnp.mean((norm - constant) ** 2) * lambda_gp
