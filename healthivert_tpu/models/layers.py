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

# quantile grid sown by SNConv's int8 calibration pass (act_pq); the scale
# picked at quantization time is one of these (calibrate_int8(percentile=))
CALIB_PERCENTILES = (99.0, 99.5, 99.9, 99.99)

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
        if dtype == "int8":
            if self.features >= 8:
                return self._int8_conv(x, kernel, bias)
            # mixed-precision heads (r5): the 1-channel output convs
            # (conv17/18, allconv17/18 — reference inpaint_networks.py:
            # 112-115,225-230) quantize the FINAL image/seg directly for
            # ~1/16th of a trunk conv's FLOPs — all quality risk, no speed.
            # They run bf16 inside int8 mode; everything wide stays int8.
            dtype = jnp.bfloat16
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

    def _int8_conv(self, x, kernel, bias):
        """Post-training int8 conv (dtype="int8", inference only): symmetric
        absmax quantization — weights per-output-channel (post-SN), the
        activation per-tensor with a dynamic scale — int8 x int8 -> int32
        accumulation (the v5e int8 MXU runs ~2x the bf16 rate), dequantized
        and returned as bf16 so the surrounding elementwise/attention math
        stays on the fast path. Quality cost measured near-zero on the
        shipped checkpoint (experiments/int8_quality.py: SSIM 0.9326 ->
        0.9249, Dice/IoU unchanged)."""
        f32 = jnp.float32
        xf = x.astype(f32)
        # Calibration sow: when applied with mutable=["calib"] (see
        # pix2pix.calibrate_int8) each conv records its per-tensor activation
        # absmax; outside calibration the expression is dead and XLA removes
        # it.
        if not self.is_initializing() and self.is_mutable_collection("calib"):
            self.sow(
                "calib",
                "act_absmax",
                jnp.max(jnp.abs(xf)),
                init_fn=lambda: jnp.zeros((), f32),
                reduce_fn=jnp.maximum,
            )
            # high-quantile alternative for outlier-robust static scales
            # (calibrate_int8(percentile=...)): clipping the top ~0.1% of
            # activation mass spends the 8-bit grid on the bulk instead.
            # Estimated on a SPATIALLY-strided <=~2^20-element subsample,
            # sliced BEFORE the abs: percentile sorts, and sorting (or even
            # materializing |x| of) the full activation at production
            # calibration batches kills the TPU compile/HBM (seen r4:
            # remote-compile crash, then a 128MB-per-conv temp OOM).
            import math as _math

            stride = max(1, _math.ceil(_math.sqrt(xf.size / float(1 << 20))))
            sub = xf[:, ::stride, ::stride, :] if xf.ndim == 4 else xf
            # one sort serves the whole sweep grid: jnp.percentile takes a
            # vector q, so calibrating {99, 99.5, 99.9, 99.99} costs the
            # same as one quantile (calib_to_quant picks the index)
            self.sow(
                "calib",
                "act_pq",
                jnp.percentile(jnp.abs(sub), jnp.asarray(CALIB_PERCENTILES))
                .astype(f32),
                init_fn=lambda: jnp.zeros((len(CALIB_PERCENTILES),), f32),
                reduce_fn=jnp.maximum,
            )
        if self.has_variable("quant", "act_scale"):
            # STATIC calibrated per-tensor scale (a constant): the dynamic
            # path below costs ~3 extra HBM sweeps per conv (abs -> reduce_max
            # -> quantize as separate passes); with a constant scale the
            # quantize fuses into the producer and the reduction disappears —
            # the difference between int8 losing and winning vs bf16 (r4,
            # experiments/int8_bench.py). Constants are trivially
            # batch-composition invariant.
            sx = jnp.maximum(self.get_variable("quant", "act_scale"), 1e-12)
        else:
            # PER-SAMPLE dynamic activation scale: a whole-batch max would
            # make each sample's output depend on what else shares the
            # dispatch, breaking the serial-vs-batched / mesh-vs-unmeshed
            # equivalence every other dtype upholds (code-review r3). Conv is
            # linear per sample, so a per-sample scale dequantizes exactly.
            sx = jnp.maximum(
                jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True), 1e-12
            ) / 127.0
        qx = jnp.clip(jnp.round(xf / sx), -127.0, 127.0).astype(jnp.int8)
        kf = kernel.astype(f32)
        sw = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-12) / 127.0
        qw = jnp.clip(jnp.round(kf / sw), -127.0, 127.0).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            qx,
            qw,
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(f32) * (sx * sw)
        if bias is not None:
            y = y + bias
        return y.astype(jnp.bfloat16)


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


def weight_init(init_type: str = "normal", init_gain: float = 0.02,
                transpose: bool = False):
    """Conv/linear kernel initializer selected by --init_type/--init_gain.

    init_weights parity (/root/reference/models/networks.py:68-99):
      normal      -> N(0, init_gain)
      xavier      -> xavier_normal_(gain): std = gain*sqrt(2/(fan_in+fan_out))
      kaiming     -> kaiming_normal_(a=0, fan_in): std = sqrt(2/fan_in)
                     (the reference passes no gain here; init_gain is ignored)
      orthogonal  -> orthogonal_(gain)
    Fan conventions: for nn.Conv, torch's fan_in (= in_ch*kh*kw, computed
    from weight.size(1)=in_ch) matches jax's. For nn.ConvTranspose pass
    transpose=True: torch's deconv weight is (in, out, kh, kw), so its
    "fan_in" is OUT_ch*kh*kw — which is flax's fan_OUT for the
    (kh, kw, in, out) kernel — so kaiming maps to variance_scaling
    "fan_out" there. xavier (fan_avg) is symmetric in the two fans and
    needs no flip. torch's orthogonal_ flattens (dim0, rest) which matches
    no flax axis order exactly for 4-D kernels; the flax orthogonal
    (column_axis=-1) is kept for both — same distribution family, both are
    orthogonal bases, only the flattening convention differs.
    """
    if init_type == "normal":
        return normal_init(init_gain)
    if init_type == "xavier":
        return nn.initializers.variance_scaling(init_gain**2, "fan_avg", "normal")
    if init_type == "kaiming":
        return nn.initializers.variance_scaling(
            2.0, "fan_out" if transpose else "fan_in", "normal")
    if init_type == "orthogonal":
        return nn.initializers.orthogonal(scale=init_gain, column_axis=-1)
    raise NotImplementedError(
        f"initialization method [{init_type}] is not implemented"
    )
