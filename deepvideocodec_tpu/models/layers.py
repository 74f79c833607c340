"""Shared NN building blocks, NHWC / flax.linen, TPU-first.

Functional re-design of the block vocabulary the reference defines in
/root/reference/dmc/models/layers.py (residual blocks, sub-pixel upsamplers,
SpyNet optical flow, SE attention, UNet, autoencoder factories). Differences
from the reference are deliberate TPU choices:

  * NHWC layout everywhere (XLA's native conv layout on TPU).
  * PixelShuffle becomes depth_to_space (reshape/transpose XLA fuses into the
    producing conv).
  * grid_sample becomes ops.flow_warp (single fused gather).
  * Explicit ((1,1),(1,1)) conv padding so strided convs match the
    reference's pad-1 semantics exactly (XLA 'SAME' pads asymmetrically for
    stride 2 and would break golden parity).

Weight init: torch-DEFAULT kernels (kaiming_uniform(a=sqrt(5))) + constant
0.01 biases. This is a DELIBERATE deviation from the reference's
xavier-normal(sqrt(2)) (video_model.py:508-513): with ~40 chained convs,
additive residuals and no normalization, the xavier scale (~2.4x larger
std) cold-starts the frame branch at |x_hat| ~ 4e9 — an untrainable 1e24
RD loss, measured on TPU — while the torch-default scale starts O(1) and
trains through the full curriculum. See `codec_kernel_init` below and
docs/PARITY.md §"Initialization". Do NOT "restore" the xavier init.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import (
    flow_warp,
    bilinear_upsample_x2,
    avg_pool_2x2,
    max_pool_2x2,
    depth_to_space,
)

# Codec-wide initializers: torch Conv2d/Linear DEFAULT —
# kaiming_uniform(a=sqrt(5)): U(+-1/sqrt(fan_in)), variance 1/(3*fan_in)
# (= variance_scaling(1/3, fan_in, uniform)). Deliberately NOT the
# reference's xavier_normal(gain sqrt(2)) (video_model.py:508-513):
# the DMC pipeline chains ~40 convs with additive residuals and no
# normalization, so the xavier scale (~2.4x larger std) amplifies
# ~1.4x per layer and cold-starts the frame branch at |x_hat| ~ 1e9
# (measured), i.e. an untrainable 1e24 RD loss; the torch-default
# scale starts it at O(1) and trains through the curriculum.
codec_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")
codec_bias_init = nn.initializers.constant(0.01)

# Codec-wide computation dtype for conv/dense interiors. Mixed precision,
# TPU-style: bf16 doubles MXU throughput and halves activation HBM/gather
# traffic; everything precision-critical stays f32 — latents at the
# quantizer, flow fields, prior means/scales, entropy math, recon pixels —
# via dtype=jnp.float32 pins at those boundary layers. Set per-model from
# its config in setup() (trace-time, so each jitted program bakes the
# right dtype). Thread-local: the eval/bench paths trace programs from
# several worker threads, and two models with different dtypes (e.g. bf16
# inter + f32 intra) must not see each other's value mid-trace.
import threading as _threading

_DTYPE_TLS = _threading.local()


def set_compute_dtype(dtype) -> None:
    _DTYPE_TLS.value = jnp.float32 if dtype is None else jnp.dtype(dtype)


def get_compute_dtype():
    return getattr(_DTYPE_TLS, "value", jnp.float32)


def conv(features: int, kernel: int = 3, stride: int = 1,
         dtype=None, name: str | None = None) -> nn.Conv:
    """Conv with torch-style symmetric padding (pad = kernel // 2).

    `dtype=None` computes in the codec-wide compute dtype;
    pass jnp.float32 to pin a precision-critical layer. `name` pins the
    flax module name — required when an architecture variant removes or
    replaces an earlier unnamed module, which would otherwise shift the
    auto-name counters and silently misalign partial warm starts.
    """
    p = kernel // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((p, p), (p, p)),
        kernel_init=codec_kernel_init,
        bias_init=codec_bias_init,
        dtype=get_compute_dtype() if dtype is None else dtype,
        name=name,
    )


def leaky_relu(x, slope: float = 0.01):
    return nn.leaky_relu(x, negative_slope=slope)


class SubpelConv(nn.Module):
    """conv(k) producing r^2x channels, then depth-to-space x r upsample."""

    features: int
    r: int = 2
    kernel: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = conv(self.features * self.r * self.r, self.kernel,
                 dtype=self.dtype)(x)
        return depth_to_space(x, self.r)


class ResBlock(nn.Module):
    """Pre/post-activation residual block with optional bottleneck.

    slope < 1e-4 selects plain ReLU (the reference's UNet refinement stacks
    use slope=0); bottleneck halves channels in the middle conv pair.
    """

    channels: int
    slope: float = 0.01
    start_from_relu: bool = True
    end_with_relu: bool = False
    bottleneck: bool = False

    @nn.compact
    def __call__(self, x):
        act = (
            nn.relu
            if self.slope < 1e-4
            else lambda a: leaky_relu(a, self.slope)
        )
        mid = self.channels // 2 if self.bottleneck else self.channels
        out = act(x) if self.start_from_relu else x
        out = conv(mid)(out)
        out = act(out)
        out = conv(self.channels)(out)
        if self.end_with_relu:
            out = act(out)
        return x + out


class ResidualBlockWithStride(nn.Module):
    """Stride-2 residual downsampler with a 1x1 strided shortcut."""

    features: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        out = conv(self.features, 3, self.stride)(x)
        out = leaky_relu(out, 0.01)
        out = conv(self.features)(out)
        out = leaky_relu(out, 0.1)
        if self.stride != 1:
            x = conv(self.features, 1, self.stride)(x)
        elif x.shape[-1] != self.features:
            x = conv(self.features, 1)(x)
        return out + x


class ResidualBlockUpsample(nn.Module):
    """Sub-pixel x2 residual upsampler (shortcut is a second subpel conv).

    Both subpel 1x1 convs read the same input -> one widened 1x1 conv,
    split + depth-to-space per half (output lanes are the cost, extra
    channels nearly free — docs/PERFORMANCE.md).
    """

    features: int
    r: int = 2

    @nn.compact
    def __call__(self, x):
        f, r = self.features, self.r
        cin = x.shape[-1]
        n_out = f * r * r
        k_up = self.param("up_kernel", codec_kernel_init, (1, 1, cin, n_out))
        b_up = self.param("up_bias", codec_bias_init, (n_out,))
        k_sc = self.param("sc_kernel", codec_kernel_init, (1, 1, cin, n_out))
        b_sc = self.param("sc_bias", codec_bias_init, (n_out,))
        kk = jnp.concatenate([k_up, k_sc], axis=-1)
        bb = jnp.concatenate([b_up, b_sc])
        cd = get_compute_dtype()
        y = jax.lax.conv_general_dilated(
            x.astype(cd), kk.astype(cd), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bb.astype(cd)
        out = depth_to_space(y[..., :n_out], r)
        shortcut = depth_to_space(y[..., n_out:], r)
        out = leaky_relu(out, 0.01)
        out = conv(f)(out)
        out = leaky_relu(out, 0.1)
        return out + shortcut


class ResidualBlockSimple(nn.Module):
    """Two 3x3 convs with LeakyReLU and an identity shortcut."""

    features: int
    slope: float = 0.01

    @nn.compact
    def __call__(self, x):
        out = conv(self.features)(x)
        out = leaky_relu(out, self.slope)
        out = conv(self.features)(out)
        out = leaky_relu(out, self.slope)
        return out + x


class SELayer(nn.Module):
    """Squeeze-excitation channel gate (global mean -> FC bottleneck)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))  # (B, C)
        y = nn.Dense(c // self.reduction, use_bias=False,
                     kernel_init=codec_kernel_init,
                     dtype=get_compute_dtype())(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False, kernel_init=codec_kernel_init,
                     dtype=get_compute_dtype())(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class ConvBlockResidual(nn.Module):
    """conv-LReLU-conv(-SE) with a 1x1 projection shortcut (UNet block).

    The entry conv and the 1x1 shortcut read the same input, so they run
    as ONE widened 3x3 conv (the 1x1 kernel embedded at the center tap,
    zero ring): at these widths TPU convs are output-lane-bound, making
    the extra output channels nearly free while a separate full-res 1x1
    pass is not (docs/PERFORMANCE.md). Exact at borders — the zero ring
    contributes nothing under 'same' zero padding.
    """

    features: int
    se_layer: bool = True

    @nn.compact
    def __call__(self, x):
        from ..ops.phase import space_to_depth2, depth_to_space2, phase_conv

        f = self.features
        cin = x.shape[-1]
        k1 = self.param("conv1_kernel", codec_kernel_init, (3, 3, cin, f))
        b1 = self.param("conv1_bias", codec_bias_init, (f,))
        ks = self.param("shortcut_kernel", codec_kernel_init, (1, 1, cin, f))
        bs = self.param("shortcut_bias", codec_bias_init, (f,))
        kk = jnp.zeros((3, 3, cin, 2 * f), k1.dtype)
        kk = kk.at[:, :, :, :f].set(k1)
        kk = kk.at[1, 1, :, f:].set(ks[0, 0])
        bb = jnp.concatenate([b1, bs])
        cd = get_compute_dtype()
        y = jax.lax.conv_general_dilated(
            x.astype(cd), kk.astype(cd), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bb.astype(cd)
        out, shortcut = y[..., :f], y[..., f:]
        out = leaky_relu(out, 0.01)
        # Second conv: explicit params so the narrow full-res case can run
        # in phase space — a 3x3 conv at C<=32 is output-lane-bound
        # (~4.5 TF/s measured at 1080p) while the same math over the 2x2
        # phase decomposition runs at 128 lanes (ops/phase.py; exact up to
        # float reassociation, same on both codec sides).
        k2 = self.param("conv2_kernel", codec_kernel_init, (3, 3, f, f))
        b2 = self.param("conv2_bias", codec_bias_init, (f,))
        if (f <= 32 and out.shape[1] % 2 == 0 and out.shape[2] % 2 == 0
                and out.shape[1] * out.shape[2] >= 500_000):
            out = depth_to_space2(phase_conv(
                space_to_depth2(out), k2.astype(cd), b2.astype(cd)))
        else:
            out = jax.lax.conv_general_dilated(
                out, k2.astype(cd), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b2.astype(cd)
        if self.se_layer:
            out = SELayer()(out)
        return out + shortcut


class UNet(nn.Module):
    """3-level UNet with a 4x ResBlock(relu) refinement trunk.

    Default `width=32` gives the reference's 32/64/128 ladder
    (layers.py:300-341); tests shrink `width` to keep 1-core CPU compiles
    cheap without changing the topology.
    """

    features: int = 64
    width: int = 32

    @nn.compact
    def __call__(self, x):
        w = self.width
        x1 = ConvBlockResidual(w)(x)
        x2 = max_pool_2x2(x1)
        x2 = ConvBlockResidual(2 * w)(x2)
        x3 = max_pool_2x2(x2)
        x3 = ConvBlockResidual(4 * w)(x3)
        for _ in range(4):
            x3 = ResBlock(4 * w, slope=0.0)(x3)
        d3 = SubpelConv(2 * w, 2, kernel=1)(x3)
        d3 = ConvBlockResidual(2 * w)(jnp.concatenate([x2, d3], axis=-1))
        d2 = SubpelConv(w, 2, kernel=1)(d3)
        d2 = ConvBlockResidual(self.features)(
            jnp.concatenate([x1, d2], axis=-1))
        return d2


class MEBasic(nn.Module):
    """One SpyNet pyramid-level CNN: 8 -> 32 -> 64 -> 32 -> 16 -> 2, 7x7.

    `phase=True` evaluates the exact same convs in 2x2 phase space
    (ops/phase.py): at these widths a full-res 7x7 conv uses a fraction
    of the MXU lanes, while the phase form runs ~1.7x faster despite its
    ~2x FLOPs. Same parameters either way; output equal up to float
    reassociation. Used for the fine (large) pyramid levels.
    """

    @nn.compact
    def __call__(self, x, phase: bool = False):
        from ..ops.phase import space_to_depth2, depth_to_space2, phase_conv

        widths = (32, 64, 32, 16, 2)
        cd = get_compute_dtype()
        layers = []
        cin = x.shape[-1]
        for i, f in enumerate(widths):
            k = self.param(f"conv{i}_kernel", codec_kernel_init,
                           (7, 7, cin, f))
            b = self.param(f"conv{i}_bias", codec_bias_init, (f,))
            layers.append((k, b))
            cin = f

        def run(t, to_phase: bool):
            for i, (k, b) in enumerate(layers):
                last = i == len(layers) - 1
                dt = jnp.float32 if last else cd  # flow field stays f32
                t = t.astype(dt)
                if to_phase:
                    t = phase_conv(t, k.astype(dt), b.astype(dt))
                else:
                    t = jax.lax.conv_general_dilated(
                        t, k.astype(dt), (1, 1), ((3, 3), (3, 3)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    ) + b.astype(dt)
                if not last:
                    t = nn.relu(t)
            return t

        if phase:
            return depth_to_space2(run(space_to_depth2(x), True))
        return run(x, False)


class SpyNet(nn.Module):
    """Coarse-to-fine optical flow over an avg-pool pyramid.

    4 levels; at each level the previous flow is upsampled x2 (values x2),
    used to warp the reference image, and a per-level CNN predicts the
    residual flow from (im1, warped im2, upsampled flow).
    """

    levels: int = 4

    @nn.compact
    def __call__(self, im1, im2):
        # pyramids in the compute dtype: the per-level warps are
        # byte-count-sensitive gathers and MEBasic consumes the compute
        # dtype anyway (flow values themselves stay f32 throughout)
        cd = get_compute_dtype()
        pyr1, pyr2 = [im1.astype(cd)], [im2.astype(cd)]
        for _ in range(self.levels - 1):
            pyr1.append(avg_pool_2x2(pyr1[-1]))
            pyr2.append(avg_pool_2x2(pyr2[-1]))

        B, Hc, Wc, _ = pyr1[-1].shape
        flow = jnp.zeros((B, Hc // 2, Wc // 2, 2), im1.dtype)
        for level in range(self.levels):
            flow_up = bilinear_upsample_x2(flow) * 2.0
            i = self.levels - 1 - level
            inp = jnp.concatenate(
                [pyr1[i], flow_warp(pyr2[i], flow_up),
                 flow_up.astype(cd)], axis=-1)
            # phase-space conv pays off once the level is large enough to
            # be lane-bound (the two finest levels at 1080p)
            use_phase = inp.shape[1] * inp.shape[2] >= 500_000
            flow = flow_up + MEBasic(name=f"level_{level}")(
                inp, phase=use_phase)
        return flow


class AutoEncoder(nn.Module):
    """Motion/residual autoencoder factory: /16 analysis, x16 synthesis.

    Mirrors the reference's get_enc_dec_models topology
    (/root/reference/dmc/models/layers.py:344-366): four stride-2 stages of
    residual blocks down, mirrored subpel x2 stages up.

    `half_out=True` (DMCConfig.mv_half_dec) stops the synthesis ladder at
    /2 — a plain 3x3 conv replaces the final subpel upsample, so decode()
    emits the field at half resolution (values in /2-pixel units, learned
    by fine-tune). Used when every consumer of the decoded flow operates
    at /2 or below (warp_ctx_half contexts), where the full-res synthesis
    stage is dead compute. All other parameters keep their base paths.
    """

    out_channels: int
    channels: int
    half_out: bool = False

    def setup(self):
        ch = self.channels
        self.enc_blocks = [
            ResidualBlockWithStride(ch),
            ResidualBlockSimple(ch),
            ResidualBlockWithStride(ch),
            ResidualBlockSimple(ch),
            ResidualBlockWithStride(ch),
            ResidualBlockSimple(ch),
        ]
        # latent reaches the quantizer: f32 (bf16 steps are ~0.25 at
        # typical latent magnitudes — visible rate damage)
        self.enc_final = conv(ch, 3, 2, dtype=jnp.float32)
        self.dec_blocks = [
            ResidualBlockSimple(ch),
            ResidualBlockUpsample(ch),
            ResidualBlockSimple(ch),
            ResidualBlockUpsample(ch),
            ResidualBlockSimple(ch),
            ResidualBlockUpsample(ch),
            ResidualBlockSimple(ch),
        ]
        if self.half_out:
            # /2-native output head (fresh params; the shared dec_blocks
            # above keep their base paths for partial warm starts)
            self.dec_final_half = conv(self.out_channels, 3,
                                       dtype=jnp.float32)
        else:
            self.dec_final = SubpelConv(self.out_channels, 2, kernel=1,
                                        dtype=jnp.float32)

    def encode(self, x):
        for blk in self.enc_blocks:
            x = blk(x)
        return self.enc_final(x)

    def decode(self, y):
        for blk in self.dec_blocks:
            y = blk(y)
        if self.half_out:
            return self.dec_final_half(y)
        return self.dec_final(y)

    def __call__(self, x):
        return self.decode(self.encode(x))


class HyperEncoder(nn.Module):
    """Hyperprior analysis: 5 conv3x3 with two stride-2 stages (/4)."""

    z_channels: int

    @nn.compact
    def __call__(self, y):
        z = leaky_relu(conv(self.z_channels)(y))
        z = leaky_relu(conv(self.z_channels)(z))
        z = leaky_relu(conv(self.z_channels, 3, 2)(z))
        z = leaky_relu(conv(self.z_channels)(z))
        return conv(self.z_channels, 3, 2, dtype=jnp.float32)(z)


class HyperDecoder(nn.Module):
    """Hyperprior synthesis: x4 via two subpel x2, out 2*y_ch (means‖scales)."""

    y_channels: int

    @nn.compact
    def __call__(self, z):
        y = leaky_relu(conv(self.y_channels)(z))
        y = leaky_relu(SubpelConv(self.y_channels, 2, kernel=1)(y))
        y = leaky_relu(conv(self.y_channels * 3 // 2)(y))
        y = leaky_relu(SubpelConv(self.y_channels * 3 // 2, 2, kernel=1)(y))
        # output feeds prior means/scales (directly in the DVC/DCVC heads):
        # entropy math stays f32
        return conv(self.y_channels * 2, dtype=jnp.float32)(y)
