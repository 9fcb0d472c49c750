"""Two-stage coarse->refine inpainting generator with SHRM height heads and
HGAM CAM injection (flax.linen, NHWC).

Architecture parity with /root/reference/models/inpaint_networks.py:16-232
(channel counts, strides, dilations, activation placement, CAM concat points,
height heads, stage-1 skip into stage-2 outputs), re-laid-out for TPU:
NHWC tensors, batched contextual attention (no per-sample loop), nearest
up/down-sampling as gathers.

Inputs are (B, 256, 256, 1) in [-1, 1]; mask/CAM in [0, 1]; slice_ratio (B,).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp
from flax import linen as nn

from healthivert_tpu.ops.contextual_attention import contextual_attention
from healthivert_tpu.ops.image import resize_nearest
from .layers import Conv2dBlock


class GeneratorOut(NamedTuple):
    coarse_seg: jnp.ndarray  # (B, H, W, 1) sigmoid
    fine_seg: jnp.ndarray  # (B, H, W, 1) sigmoid
    x_stage1: jnp.ndarray  # (B, H, W, 1) clamped [-1, 1]
    x_stage2: jnp.ndarray  # (B, H, W, 1) clamped [-1, 1]
    offsets: jnp.ndarray  # (B, H/8, W/8, 2) attention argmax coords
    pred1_h: jnp.ndarray  # (B,) sigmoid height fraction (coarse)
    pred2_h: jnp.ndarray  # (B,) sigmoid height fraction (fine)


def _bc_ratio(slice_ratio, h, w, dtype=jnp.float32):
    """(B,) -> (B, H, W, 1) constant plane (inpaint_networks.py:71).

    dtype must follow the image input: an f32 plane concatenated with bf16
    features silently promotes the whole trunk to f32, and SNConv(dtype=None)
    then runs every conv at the f32 MXU rate (caught by code review r3 —
    the bench headline and 3D-synthesis paths were paying it)."""
    return jnp.broadcast_to(
        slice_ratio.reshape(-1, 1, 1, 1).astype(dtype), (slice_ratio.shape[0], h, w, 1)
    )


class CoarseGenerator(nn.Module):
    """Encoder -> atrous trunk (+SHRM head) -> decoder with CAM injection.

    Layer-for-layer parity with inpaint_networks.py:36-117 (cnum=ngf):
    conv1 5x5 -> 2x stride-2 downs to cnum*4 @ H/4 -> 4 atrous convs rate
    2/4/8/16 -> height head (GAP+FC+sigmoid) -> decoder with CAM concat at
    H/2 (conv20) and H (conv19) -> dual heads: CT (clamp) + seg (sigmoid).
    """

    cnum: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask, cam, slice_ratio):
        c = self.cnum
        b, h, w, _ = x.shape
        g = lambda f, k, s, p, r=1, act="elu", name=None: Conv2dBlock(
            f, k, s, p, r, act, dtype=self.dtype, name=name
        )

        z = jnp.concatenate([x, _bc_ratio(slice_ratio, h, w, x.dtype), mask], axis=-1)
        z = g(c, 5, 1, 2, name="conv1")(z)
        z = g(c * 2, 3, 2, 1, name="conv2_downsample")(z)
        z = g(c * 2, 3, 1, 1, name="conv3")(z)
        z = g(c * 4, 3, 2, 1, name="conv4_downsample")(z)
        z = g(c * 4, 3, 1, 1, name="conv5")(z)
        z = g(c * 4, 3, 1, 1, name="conv6")(z)
        z = g(c * 4, 3, 1, 2, 2, name="conv7_atrous")(z)
        z = g(c * 4, 3, 1, 4, 4, name="conv8_atrous")(z)
        z = g(c * 4, 3, 1, 8, 8, name="conv9_atrous")(z)
        z = g(c * 4, 3, 1, 16, 16, name="conv10_atrous")(z)

        pooled = jnp.mean(z, axis=(1, 2))  # GAP (inpaint_networks.py:90)
        pred1_h = nn.sigmoid(nn.Dense(1, name="fc_height")(pooled))[:, 0]

        z = g(c * 4, 3, 1, 1, name="conv11")(z)
        z = g(c * 4, 3, 1, 1, name="conv12")(z)

        z = resize_nearest(z, h // 2, w // 2)
        cam_half = resize_nearest(cam, h // 2, w // 2)
        z = g(c * 4, 3, 1, 1, name="conv20")(jnp.concatenate([z, cam_half], axis=-1))
        z = g(c * 2, 3, 1, 1, name="conv13")(z)
        z = g(c * 2, 3, 1, 1, name="conv14")(z)
        z = resize_nearest(z, h, w)
        z = g(c * 2, 3, 1, 1, name="conv19")(jnp.concatenate([z, cam], axis=-1))
        z = g(c, 3, 1, 1, name="conv15")(z)
        z = g(c // 2, 3, 1, 1, name="conv16")(z)

        x_stage1 = jnp.clip(g(1, 3, 1, 1, act="none", name="conv17")(z), -1.0, 1.0)
        coarse_seg = g(1, 3, 1, 1, act="sigmoid", name="conv18")(z)
        return coarse_seg, x_stage1, pred1_h


class FineGenerator(nn.Module):
    """Dilated hallucination branch + contextual-attention branch, merged.

    Parity with inpaint_networks.py:120-232: both branches consume
    [x, coarse_seg, mask, slice_ratio]; attention runs at H/4 features; the
    merged trunk carries the second SHRM head; stage-1 CT is concatenated
    right before the two output heads.

    use_pallas_attention fuses the attention score pipeline into a VMEM-
    resident Pallas kernel (attention_v2_diff): kernel forward + analytic
    XLA backward via custom VJP, so it serves both inference and the TPU
    training path.
    """

    cnum: int = 16
    dtype: Any = None
    use_pallas_attention: bool = False
    compute_offsets: bool = False  # argmax offset map for flow viz
    # (inpaint_networks.py:368-374 computes it every forward; here it is
    # opt-in so training never pays for it)

    @nn.compact
    def __call__(self, xin, x_stage1, mask, coarse_seg, slice_ratio):
        c = self.cnum
        b, h, w, _ = xin.shape
        g = lambda f, k, s, p, r=1, act="elu", name=None: Conv2dBlock(
            f, k, s, p, r, act, dtype=self.dtype, name=name
        )

        xnow = jnp.concatenate(
            [xin, coarse_seg, mask, _bc_ratio(slice_ratio, h, w, xin.dtype)], axis=-1
        )

        # hallucination branch
        z = g(c, 5, 1, 2, name="conv1")(xnow)
        z = g(c, 3, 2, 1, name="conv2_downsample")(z)
        z = g(c * 2, 3, 1, 1, name="conv3")(z)
        z = g(c * 2, 3, 2, 1, name="conv4_downsample")(z)
        z = g(c * 4, 3, 1, 1, name="conv5")(z)
        z = g(c * 4, 3, 1, 1, name="conv6")(z)
        z = g(c * 4, 3, 1, 2, 2, name="conv7_atrous")(z)
        z = g(c * 4, 3, 1, 4, 4, name="conv8_atrous")(z)
        z = g(c * 4, 3, 1, 8, 8, name="conv9_atrous")(z)
        x_hallu = g(c * 4, 3, 1, 16, 16, name="conv10_atrous")(z)

        # attention branch
        a = g(c, 5, 1, 2, name="pmconv1")(xnow)
        a = g(c, 3, 2, 1, name="pmconv2_downsample")(a)
        a = g(c * 2, 3, 1, 1, name="pmconv3")(a)
        a = g(c * 4, 3, 2, 1, name="pmconv4_downsample")(a)
        a = g(c * 4, 3, 1, 1, name="pmconv5")(a)
        a = g(c * 4, 3, 1, 1, act="relu", name="pmconv6")(a)
        att = contextual_attention(
            a, a, mask, ksize=3, stride=1, rate=2, softmax_scale=10.0, fuse=True,
            use_pallas=self.use_pallas_attention,
            compute_offsets=self.compute_offsets,
        )
        a = g(c * 4, 3, 1, 1, name="pmconv9")(att.y)
        pm = g(c * 4, 3, 1, 1, name="pmconv10")(a)

        z = jnp.concatenate([x_hallu, pm], axis=-1)
        z = g(c * 4, 3, 1, 1, name="allconv11")(z)

        pooled = jnp.mean(z, axis=(1, 2))
        pred2_h = nn.sigmoid(nn.Dense(1, name="fc_height")(pooled))[:, 0]

        z = g(c * 4, 3, 1, 1, name="allconv12")(z)
        z = g(c * 4, 3, 1, 1, name="allconv19")(z)
        z = resize_nearest(z, h // 2, w // 2)
        z = g(c * 2, 3, 1, 1, name="allconv13")(z)
        z = g(c * 2, 3, 1, 1, name="allconv14")(z)
        z = resize_nearest(z, h, w)
        z = g(c, 3, 1, 1, name="allconv15")(z)
        z = g(c // 2, 3, 1, 1, name="allconv16")(z)
        z = jnp.concatenate([z, x_stage1], axis=-1)

        x_stage2 = jnp.clip(g(1, 3, 1, 1, act="none", name="allconv17")(z), -1.0, 1.0)
        fine_seg = g(1, 3, 1, 1, act="sigmoid", name="allconv18")(z)
        return fine_seg, x_stage2, att.offsets, pred2_h


class Generator(nn.Module):
    """Full two-stage generator (inpaint_networks.py:16-32).

    Reference wiring note: the refine stage upsamples from H/4 back to H/2
    then H (allconv13/15 interleaved with nearest x2), and the coarse stage
    decodes with CAM injected at both scales.
    """

    cnum: int = 16  # reference trains with ngf=16 (pix2pix_model.py:103)
    dtype: Any = None
    use_pallas_attention: bool = False
    compute_offsets: bool = False

    @nn.compact
    def __call__(self, x, mask, cam, slice_ratio) -> GeneratorOut:
        coarse_seg, x_stage1, pred1_h = CoarseGenerator(
            self.cnum, self.dtype, name="coarse_generator"
        )(x, mask, cam, slice_ratio)
        fine_seg, x_stage2, offsets, pred2_h = FineGenerator(
            self.cnum, self.dtype, name="fine_generator",
            use_pallas_attention=self.use_pallas_attention,
            compute_offsets=self.compute_offsets,
        )(x, x_stage1, mask, coarse_seg, slice_ratio)
        return GeneratorOut(
            coarse_seg, fine_seg, x_stage1, x_stage2, offsets, pred1_h, pred2_h
        )
