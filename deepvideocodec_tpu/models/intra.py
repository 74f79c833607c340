"""I-frame (intra) image codecs.

The reference delegates I-frames to a frozen pretrained CompressAI
`cheng2020_anchor` (/root/reference/dmc/train.py:564-569, test.py:108-110).
This module provides the framework's own intra family so the GOP loop and
the epoch>=50 training stage are self-contained:

  * FactorizedImageCodec   — analysis/synthesis + fully-factorized prior
                             (bmshj2018-factorized capability point).
  * HyperpriorImageCodec   — mean-scale hyperprior on top (mbt2018-mean).
  * CheckerboardImageCodec — residual-block transforms (cheng2020-class
                             capacity) + hyperprior + a TWO-PASS CHECKERBOARD
                             spatial context. This is the TPU-native answer
                             to cheng2020's autoregressive context model: the
                             serial raster scan is replaced by two dense conv
                             passes, which decode in O(1) model invocations
                             instead of O(H*W).

All use NHWC, GDN/IGDN nonlinearities on the transform path, and share the
entropy machinery with the video models.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..entropy.factorized import FactorizedEntropyBottleneck
from ..entropy.gaussian import gaussian_likelihood, quantize_gaussian
from ..ops.quant import quantize_ste
from .layers import (
    conv,
    leaky_relu,
    SubpelConv,
    ResidualBlockWithStride,
    ResidualBlockUpsample,
    ResidualBlockSimple,
)
from .gdn import GDN
from .context import (
    ContextModelBase,
    PriorFusion,
    _split2,
)


class AnalysisTransform(nn.Module):
    """4x stride-2 conv + GDN analysis (/16)."""

    n: int = 128
    m: int = 192

    @nn.compact
    def __call__(self, x):
        for feats in (self.n, self.n, self.n):
            x = GDN()(conv(feats, 5, 2)(x))
        return conv(self.m, 5, 2)(x)


class SynthesisTransform(nn.Module):
    """Mirrored x16 synthesis with IGDN, subpel upsampling."""

    n: int = 128

    @nn.compact
    def __call__(self, y):
        for _ in range(3):
            y = GDN(inverse=True)(SubpelConv(self.n, 2)(y))
        return SubpelConv(3, 2)(y)


class ResidualAnalysis(nn.Module):
    """Residual-block analysis (cheng2020-class capacity), /16."""

    n: int = 128
    m: int = 192

    @nn.compact
    def __call__(self, x):
        x = ResidualBlockWithStride(self.n)(x)
        x = ResidualBlockSimple(self.n)(x)
        x = ResidualBlockWithStride(self.n)(x)
        x = ResidualBlockSimple(self.n)(x)
        x = ResidualBlockWithStride(self.n)(x)
        x = ResidualBlockSimple(self.n)(x)
        return conv(self.m, 3, 2)(x)


class ResidualSynthesis(nn.Module):
    """Residual-block synthesis, x16 via subpel upsampling."""

    n: int = 128

    @nn.compact
    def __call__(self, y):
        y = ResidualBlockUpsample(self.n)(y)
        y = ResidualBlockSimple(self.n)(y)
        y = ResidualBlockUpsample(self.n)(y)
        y = ResidualBlockSimple(self.n)(y)
        y = ResidualBlockUpsample(self.n)(y)
        y = ResidualBlockSimple(self.n)(y)
        return SubpelConv(3, 2, kernel=1)(y)


class FactorizedImageCodec(nn.Module):
    """Analysis/synthesis + fully-factorized entropy model on y."""

    n: int = 128
    m: int = 192
    dtype: str = "float32"

    def setup(self):
        from .layers import set_compute_dtype
        set_compute_dtype(self.dtype)
        self.g_a = AnalysisTransform(self.n, self.m)
        self.g_s = SynthesisTransform(self.n)
        self.entropy_bottleneck = FactorizedEntropyBottleneck(self.m)

    def __call__(self, x, training: bool = False):
        y = self.g_a(x)
        noise_key = self.make_rng("noise") if training else None
        y_tilde, y_lk = self.entropy_bottleneck(y, training, noise_key)
        # decode path rounds around medians (STE for gradients)
        med = self.entropy_bottleneck.medians()[None, None, None, :]
        y_hat = quantize_ste(y - med) + med
        x_hat = self.g_s(y_hat if not training else y_tilde)
        return {"x_hat": x_hat, "likelihoods": {"y": y_lk}}

    def encode_stage(self, x):
        y = self.g_a(x)
        med = self.entropy_bottleneck.medians()[None, None, None, :]
        y_sym = jnp.round(y - med).astype(jnp.int32)
        y_hat = y_sym.astype(y.dtype) + med
        x_hat = jnp.clip(self.g_s(y_hat), 0.0, 1.0)
        return y_sym, x_hat

    def decode_stage(self, y_sym):
        med = self.entropy_bottleneck.medians()[None, None, None, :]
        y_hat = y_sym.astype(med.dtype) + med
        return jnp.clip(self.g_s(y_hat), 0.0, 1.0)

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class HyperpriorImageCodec(nn.Module):
    """Mean-scale hyperprior image codec."""

    n: int = 128
    m: int = 192
    dtype: str = "float32"

    def setup(self):
        from .layers import set_compute_dtype
        set_compute_dtype(self.dtype)
        self.g_a = AnalysisTransform(self.n, self.m)
        self.g_s = SynthesisTransform(self.n)
        self.h_a = _HyperAnalysis(self.n)
        self.h_s = _HyperSynthesis(self.m)
        self.entropy_bottleneck = FactorizedEntropyBottleneck(self.n)

    def _priors(self, z_hat):
        params = self.h_s(z_hat)
        return _split2(params)  # (means, scales)

    def __call__(self, x, training: bool = False):
        y = self.g_a(x)
        z = self.h_a(y)
        noise_key = self.make_rng("noise") if training else None
        _, z_lk = self.entropy_bottleneck(z, training, noise_key)
        med = self.entropy_bottleneck.medians()[None, None, None, :]
        z_hat = quantize_ste(z - med) + med
        means, scales = self._priors(z_hat)
        y_hat = quantize_ste(y - means) + means
        noise_key2 = self.make_rng("noise") if training else None
        y_tilde = quantize_gaussian(y, training, means, noise_key2)
        y_lk = gaussian_likelihood(y_tilde, scales, means)
        x_hat = self.g_s(y_hat)
        return {"x_hat": x_hat, "likelihoods": {"y": y_lk, "z": z_lk}}

    def encode_stage(self, x):
        y = self.g_a(x)
        z = self.h_a(y)
        med = self.entropy_bottleneck.medians()[None, None, None, :]
        z_sym = jnp.round(z - med).astype(jnp.int32)
        z_hat = z_sym.astype(z.dtype) + med
        means, scales = self._priors(z_hat)
        y_sym = jnp.round(y - means).astype(jnp.int32)
        y_hat = y_sym.astype(y.dtype) + means
        x_hat = jnp.clip(self.g_s(y_hat), 0.0, 1.0)
        return z_sym, y_sym, scales, x_hat

    def decode_prior_stage(self, z_sym):
        med = self.entropy_bottleneck.medians()[None, None, None, :]
        z_hat = z_sym.astype(med.dtype) + med
        means, scales = self._priors(z_hat)
        return means, scales

    def decode_stage(self, y_sym, means):
        y_hat = y_sym.astype(means.dtype) + means
        return jnp.clip(self.g_s(y_hat), 0.0, 1.0)

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class _HyperAnalysis(nn.Module):
    n: int = 128

    @nn.compact
    def __call__(self, y):
        z = leaky_relu(conv(self.n, 3)(jnp.abs(y)))
        z = leaky_relu(conv(self.n, 5, 2)(z))
        return conv(self.n, 5, 2)(z)


class _HyperSynthesis(nn.Module):
    m: int = 192

    @nn.compact
    def __call__(self, z):
        p = leaky_relu(SubpelConv(self.m, 2, kernel=5)(z))
        p = leaky_relu(SubpelConv(self.m * 3 // 2, 2, kernel=5)(p))
        return conv(self.m * 2, 3)(p)


class IntraContextModel(ContextModelBase):
    """Checkerboard dual-prior entropy model with a hyper-only fused prior."""

    def setup(self):
        super().setup()
        ch = self.y_channels
        # fusion input: hyper params (2ch) only
        self.y_prior_fusion = PriorFusion((ch * 3, ch * 2), ch)

    def fuse_prior(self, hyper_params, y_ref, extra):
        del y_ref, extra
        return _split2(self.y_prior_fusion(hyper_params))

    def __call__(self, y, training: bool = False):  # type: ignore[override]
        return super().__call__(y, y_ref=jnp.zeros_like(y), training=training)

    def encode_stage(self, y):  # type: ignore[override]
        return super().encode_stage(y, y_ref=jnp.zeros_like(y))

    def decode_prior_stage(self, z_hat):  # type: ignore[override]
        B, H, W, _ = z_hat.shape
        y_ref = jnp.zeros((B, H * 4, W * 4, self.y_channels), z_hat.dtype)
        return super().decode_prior_stage(z_hat, y_ref)


class CheckerboardImageCodec(nn.Module):
    """cheng2020-class intra codec with a parallel checkerboard context.

    Used as the framework's I-frame codec in the GOP loop (the reference's
    cheng2020_anchor slot) — same /16 latent geometry, decode in two dense
    passes rather than an O(H*W) raster scan.
    """

    n: int = 128
    m: int = 192
    dtype: str = "float32"

    def setup(self):
        from .layers import set_compute_dtype
        set_compute_dtype(self.dtype)
        self.g_a = ResidualAnalysis(self.n, self.m)
        self.g_s = ResidualSynthesis(self.n)
        self.context_model = IntraContextModel(
            y_channels=self.m, z_channels=self.n)

    def __call__(self, x, training: bool = False):
        y = self.g_a(x)
        y_hat, lk = self.context_model(y, training=training)
        x_hat = self.g_s(y_hat)
        return {"x_hat": x_hat, "likelihoods": lk}

    def encode_stage(self, x):
        y = self.g_a(x)
        y_hat, z_sym, q0, q1, i0, i1 = self.context_model.encode_stage(y)
        x_hat = jnp.clip(self.g_s(y_hat), 0.0, 1.0)
        return {"z_sym": z_sym, "q0": q0, "q1": q1, "i0": i0, "i1": i1,
                "x_hat": x_hat}

    # Encoder-only stages for the bit-exact staged path (eval/codec.py):
    # all prior computation runs through the decode_* programs.

    def encode_latent(self, x):
        return self.g_a(x)

    def encode_z(self, y):
        return self.context_model.encode_z_symbols(y)

    def encode_anchors(self, y, means):
        return self.context_model.encode_anchor_symbols(y, means)

    def encode_nonanchors(self, y, nm_0, nm_1):
        return self.context_model.encode_nonanchor_symbols(y, nm_0, nm_1)

    def decode_prior(self, z_sym):
        z_hat = self.context_model.z_dequant(z_sym)
        means, scales = self.context_model.decode_prior_stage(z_hat)
        idx_r0 = self.context_model.decode_anchor_indexes(scales)
        return means, scales, idx_r0

    def decode_spatial(self, y_quant_r0, means, scales):
        return self.context_model.decode_nonanchor_stage(
            y_quant_r0, means, scales)

    def decode_combine(self, yh_00, yh_11, nm_0, nm_1, y_quant_r1):
        return self.context_model.decode_combine_stage(
            yh_00, yh_11, nm_0, nm_1, y_quant_r1)

    def decode_reconstruct(self, y_hat):
        return jnp.clip(self.g_s(y_hat), 0.0, 1.0)

    def aux_loss(self):
        return self.context_model.aux_loss()


class ChengResidualBlockWithStride(nn.Module):
    """compressai-cheng2020 RBS: conv-leaky-conv-GDN + strided 1x1 skip.

    Differs from layers.ResidualBlockWithStride (the DMC-reference
    variant, /root/reference/dmc/models/layers.py:84-115) in the second
    nonlinearity: GDN instead of LeakyReLU(0.1). Param layout is the
    import target of tools/torch_import.import_cheng2020_transforms.
    """

    features: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        out = conv(self.features, 3, self.stride)(x)
        out = leaky_relu(out, 0.01)
        out = conv(self.features)(out)
        out = GDN()(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = conv(self.features, 1, self.stride)(x)
        return out + x


class ChengResidualBlockUpsample(nn.Module):
    """compressai-cheng2020 RBU: subpel3x3-leaky-conv-IGDN + subpel skip."""

    features: int

    @nn.compact
    def __call__(self, x):
        out = SubpelConv(self.features, 2, kernel=3)(x)
        out = leaky_relu(out, 0.01)
        out = conv(self.features)(out)
        out = GDN(inverse=True)(out)
        sc = SubpelConv(self.features, 2, kernel=3)(x)
        return out + sc


class Cheng2020Analysis(nn.Module):
    """cheng2020_anchor g_a: (RBS-GDN, RB) x3 + conv3x3 stride 2, all N ch."""

    n: int = 192

    @nn.compact
    def __call__(self, x):
        for _ in range(3):
            x = ChengResidualBlockWithStride(self.n)(x)
            x = ResidualBlockSimple(self.n)(x)
        return conv(self.n, 3, 2)(x)


class Cheng2020Synthesis(nn.Module):
    """cheng2020_anchor g_s: (RB, RBU-IGDN) x3 + RB + subpel3x3 to RGB."""

    n: int = 192

    @nn.compact
    def __call__(self, y):
        for _ in range(3):
            y = ResidualBlockSimple(self.n)(y)
            y = ChengResidualBlockUpsample(self.n)(y)
        y = ResidualBlockSimple(self.n)(y)
        return SubpelConv(3, 2, kernel=3)(y)


class Cheng2020HyperDecoder(nn.Module):
    """cheng2020 h_s: same ladder as layers.HyperDecoder but with 3x3
    subpel convs (the DMC video hyper uses subpel_conv1x1 — reference
    layers.py:382-393 vs compressai cheng2020's subpel_conv3x3)."""

    y_channels: int

    @nn.compact
    def __call__(self, z):
        y = leaky_relu(conv(self.y_channels)(z))
        y = leaky_relu(SubpelConv(self.y_channels, 2, kernel=3)(y))
        y = leaky_relu(conv(self.y_channels * 3 // 2)(y))
        y = leaky_relu(SubpelConv(self.y_channels * 3 // 2, 2, kernel=3)(y))
        return conv(self.y_channels * 2, dtype=jnp.float32)(y)


class Cheng2020ContextModel(IntraContextModel):
    """Checkerboard context model with the cheng2020 hyper decoder."""

    def make_hyper_nets(self):
        from .layers import HyperEncoder

        return (HyperEncoder(self.z_channels),
                Cheng2020HyperDecoder(self.y_channels))


class Cheng2020CheckerboardCodec(CheckerboardImageCodec):
    """cheng2020_anchor's exact transform/hyper topology + our checkerboard.

    Purpose: make a pretrained compressai `cheng2020_anchor` checkpoint's
    weights importable. The analysis/synthesis transforms (GDN residual
    blocks, N=M), the conv3x3 hyper pair, and the factorized bottleneck
    density import 1:1 via tools/torch_import.import_cheng2020_transforms
    (reference usage: /root/reference/dmc/train.py:564-569); only the
    autoregressive context head — serial raster scan, O(H*W) decode — is
    re-designed as the two-pass checkerboard and must be fine-tuned
    (cli.train_intra --init-from <merged npz> --init-partial). The staged
    codec API (encode_latent ... decode_reconstruct) is inherited, so
    eval/codec.IntraCodec drives this model unchanged.

    `n` is compressai's N (128 for qualities 1-3, 192 for 4-6); the `m`
    field is ignored (cheng2020 has M == N).
    """

    def setup(self):
        from .layers import set_compute_dtype
        set_compute_dtype(self.dtype)
        self.g_a = Cheng2020Analysis(self.n)
        self.g_s = Cheng2020Synthesis(self.n)
        self.context_model = Cheng2020ContextModel(
            y_channels=self.n, z_channels=self.n)


# Quality ladder. The reference maps its -q flag to CompressAI's pretrained
# cheng2020_anchor(quality, pretrained=True) (/root/reference/dmc/train.py:
# 564-569, test.py:108-110). This framework ships no external zoo, so -q
# maps to concrete (n, m, lambda) operating points for CheckerboardImageCodec
# trained by cli.train_intra: widths follow cheng2020's two-tier scheme
# (smaller transforms at low rates), lambda is the standard CompressAI MSE
# ladder scaled by 255^2 (this codebase's unscaled-pixel MSE convention,
# train/loss.py).
INTRA_QUALITIES = {
    1: (96, 128, 117.0),
    2: (96, 128, 228.0),
    3: (96, 128, 436.0),
    4: (128, 192, 845.0),
    5: (128, 192, 1625.0),
    6: (128, 192, 3140.0),
}


def intra_model_for_quality(q: int, dtype: str = "float32"):
    """(CheckerboardImageCodec, lambda) for one -q operating point."""
    if q not in INTRA_QUALITIES:
        raise ValueError(
            f"intra quality {q} not in {sorted(INTRA_QUALITIES)}")
    n, m, lmbda = INTRA_QUALITIES[q]
    return CheckerboardImageCodec(n=n, m=m, dtype=dtype), lmbda
