"""DCVC — conditional contextual coding with a propagated temporal context.

The second model family of the reference lineage (README.md:1-8; BASELINE
config "DCVC: conditional contextual coding with propagated temporal-context
features"). Instead of coding an explicit residual, the encoder/decoder are
*conditioned* on a single-scale temporal context mined from the reference
frame:

    context = refine(warp(feature(x_ref), mv_hat))
    y = g_a(x | context);   x_hat = g_s(y_hat | context)

with a hyperprior + temporal-prior entropy model on y. DMC extends this with
multi-scale contexts, latent refs, and the checkerboard spatial prior; DCVC
is the single-context capability point, built from the same blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..entropy.factorized import FactorizedEntropyBottleneck
from ..entropy.gaussian import gaussian_likelihood, quantize_gaussian
from ..ops import flow_warp
from ..ops.quant import quantize_ste
from .layers import conv, leaky_relu, SpyNet, AutoEncoder, ResBlock, \
    SubpelConv, HyperEncoder, HyperDecoder
from .context import _split2, _sym8z, _sym16, TemporalPriorEncoder
from .dvc import _HyperCoder


class ContextRefine(nn.Module):
    """Feature-domain context mining: extract, warp, refine."""

    channels: int = 64

    @nn.compact
    def __call__(self, x_ref, mv):
        feat = conv(self.channels)(x_ref)
        feat = ResBlock(self.channels)(feat)
        ctx = flow_warp(feat, mv)
        ctx = ResBlock(self.channels)(conv(self.channels)(ctx))
        return ctx


class ConditionalEncoder(nn.Module):
    """cat(x, context) -> /16 latent."""

    n: int = 64
    m: int = 96

    @nn.compact
    def __call__(self, x, context):
        f = jnp.concatenate([x, context], axis=-1)
        for _ in range(3):
            f = leaky_relu(conv(self.n, 3, 2)(f), 0.1)
            f = ResBlock(self.n)(f)
        return conv(self.m, 3, 2, dtype=jnp.float32)(f)  # latent: f32


class ConditionalDecoder(nn.Module):
    """x16 synthesis conditioned on the context at full resolution."""

    n: int = 64

    @nn.compact
    def __call__(self, y_hat, context):
        f = y_hat
        for _ in range(3):
            f = SubpelConv(self.n, 2)(f)
            f = ResBlock(self.n)(f)
        f = SubpelConv(self.n, 2)(f)
        f = jnp.concatenate([f, context], axis=-1)
        f = ResBlock(self.n * 2)(f)
        return conv(3, dtype=jnp.float32)(f)  # pixels: f32


class _ContextualCoder(nn.Module):
    """Hyperprior + temporal-prior entropy model for the DCVC latent."""

    y_channels: int
    z_channels: int
    ctx_channels: int

    def setup(self):
        self.hyper_encoder = HyperEncoder(self.z_channels)
        self.hyper_decoder = HyperDecoder(self.y_channels)
        self.entropy_bottleneck = FactorizedEntropyBottleneck(self.z_channels)
        self.temporal_prior_encoder = TemporalPriorEncoder(self.y_channels)
        # means/scales head: entropy math stays f32
        self.fusion = conv(self.y_channels * 2, 3, dtype=jnp.float32)

    def __call__(self, y, context_small, training: bool = False):
        z = self.hyper_encoder(y)
        noise_key = self.make_rng("noise") if training else None
        _, z_lk = self.entropy_bottleneck(z, training, noise_key)
        med = self.entropy_bottleneck.medians()[None, None, None, :]
        z_hat = quantize_ste(z - med) + med
        hyper = self.hyper_decoder(z_hat)
        temporal = self.temporal_prior_encoder(context_small)
        means, scales = _split2(
            self.fusion(jnp.concatenate([hyper, temporal], axis=-1)))
        y_hat = quantize_ste(y - means) + means
        key2 = self.make_rng("noise") if training else None
        y_tilde = quantize_gaussian(y, training, means, key2)
        y_lk = gaussian_likelihood(y_tilde, scales, means)
        return y_hat, {"y": y_lk, "z": z_lk}

    # staged real-coding helpers

    def encode_z_symbols(self, y):
        z = self.hyper_encoder(y)
        med = self.entropy_bottleneck.medians()[None, None, None, :]
        return _sym8z(z - med)

    def decode_prior(self, z_sym, context_small):
        from ..entropy.gaussian import build_indexes
        from ..entropy.cdf import get_scale_table

        med = self.entropy_bottleneck.medians()[None, None, None, :]
        z_hat = z_sym.astype(med.dtype) + med
        hyper = self.hyper_decoder(z_hat)
        temporal = self.temporal_prior_encoder(context_small)
        means, scales = _split2(
            self.fusion(jnp.concatenate([hyper, temporal], axis=-1)))
        idx = build_indexes(scales, jnp.asarray(get_scale_table()))
        return means, idx

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class DCVC(nn.Module):
    """Single-context conditional-coding P-frame codec."""

    ch_mv: int = 64
    n: int = 64
    m: int = 96

    dtype: str = "float32"

    def setup(self):
        from .layers import set_compute_dtype
        set_compute_dtype(self.dtype)
        self.optic_flow = SpyNet()
        self.motion_autoencoder = AutoEncoder(out_channels=2,
                                              channels=self.ch_mv)
        self.motion_coder = _HyperCoder(self.ch_mv, self.n)
        self.context_net = ContextRefine(self.n)
        self.contextual_encoder = ConditionalEncoder(self.n, self.m)
        self.contextual_decoder = ConditionalDecoder(self.n)
        self.frame_coder = _ContextualCoder(self.m, self.n, self.n)
        self.ctx_downsample = ContextDown(self.n)

    def forward_inter(self, x_cur, x_ref, training: bool = False):
        mv = self.optic_flow(x_cur, x_ref)
        y_mv = self.motion_autoencoder.encode(mv)
        y_mv_hat, mv_lk = self.motion_coder(y_mv, training=training)
        mv_hat = self.motion_autoencoder.decode(y_mv_hat)

        context = self.context_net(x_ref, mv_hat)
        context_small = self.ctx_downsample(context)

        y = self.contextual_encoder(x_cur, context)
        y_hat, frame_lk = self.frame_coder(y, context_small,
                                           training=training)
        x_rec = self.contextual_decoder(y_hat, context)
        return x_rec, {"motion": mv_lk, "frame": frame_lk}

    def __call__(self, frames, training: bool = False, **_unused):
        x_ref = frames[:, 0]
        recons, likelihoods = [], []
        for t in range(1, frames.shape[1]):
            x_rec, lk = self.forward_inter(frames[:, t], x_ref,
                                           training=training)
            recons.append(x_rec)
            likelihoods.append(lk)
            if frames.shape[1] >= 3:
                x_ref = jnp.clip(x_rec, 0.0, 1.0)
        return {"x_hat": jnp.stack(recons, axis=1),
                "likelihoods": likelihoods}

    # -- real-codec device stages --------------------------------------------

    def encode_motion(self, x_cur, x_ref):
        mv = self.optic_flow(x_cur, x_ref)
        y_mv = self.motion_autoencoder.encode(mv)
        return y_mv, self.motion_coder.encode_z_symbols(y_mv)

    def decode_motion_prior(self, z_sym):
        return self.motion_coder.decode_prior(z_sym)

    def encode_motion_symbols(self, y_mv, means):
        return self.motion_coder.encode_y_symbols(y_mv, means)

    def decode_context(self, y_mv_sym, means, x_ref):
        """Motion dequant/decode -> (context, context_small)."""
        y_mv_hat = self.motion_coder.dequant_y(y_mv_sym, means)
        mv_hat = self.motion_autoencoder.decode(y_mv_hat)
        context = self.context_net(x_ref, mv_hat)
        return context, self.ctx_downsample(context)

    def encode_frame(self, x_cur, context):
        y = self.contextual_encoder(x_cur, context)
        return y, self.frame_coder.encode_z_symbols(y)

    def decode_frame_prior(self, z_sym, context_small):
        return self.frame_coder.decode_prior(z_sym, context_small)

    def encode_frame_symbols(self, y, means):
        return _sym16(y - means)

    def decode_reconstruct(self, y_sym, means, context):
        y_hat = y_sym.astype(means.dtype) + means
        return jnp.clip(self.contextual_decoder(y_hat, context), 0.0, 1.0)

    def aux_loss(self):
        return self.motion_coder.aux_loss() + self.frame_coder.aux_loss()


class ContextDown(nn.Module):
    """Context /4 for the temporal prior (stride-2 conv pair)."""

    channels: int = 64

    @nn.compact
    def __call__(self, ctx):
        c = leaky_relu(conv(self.channels, 3, 2)(ctx), 0.1)
        return conv(self.channels, 3, 2)(c)
