"""DVC — explicit flow + warp + residual-coding P-frame codec.

The first of the three model families the reference re-implements
(README.md:1-8; BASELINE config "DVC: explicit flow + warp + residual
coding"). Unlike DMC's conditional coding, DVC codes the prediction residual
explicitly:

    mv   = SpyNet(x, x_ref)            motion estimation
    mv_hat                              via motion AE + mean-scale hyperprior
    x_pred = MC(x_ref, warp(x_ref, mv_hat), mv_hat)   compensation network
    r_hat                               via residual AE + hyperprior
    x_hat = x_pred + r_hat

State is a single reconstructed reference frame (no feature/latent refs).
Shares all blocks with the DMC stack; NHWC, fully jittable.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..entropy.factorized import FactorizedEntropyBottleneck
from ..entropy.gaussian import gaussian_likelihood, quantize_gaussian
from ..ops import flow_warp
from ..ops.quant import quantize_ste
from .layers import conv, leaky_relu, SpyNet, AutoEncoder, UNet, \
    HyperEncoder, HyperDecoder
from .context import _split2, _sym8z, _sym16


class _HyperCoder(nn.Module):
    """Mean-scale hyperprior head over a latent (no context/ref)."""

    y_channels: int
    z_channels: int

    def setup(self):
        self.hyper_encoder = HyperEncoder(self.z_channels)
        self.hyper_decoder = HyperDecoder(self.y_channels)
        self.entropy_bottleneck = FactorizedEntropyBottleneck(self.z_channels)

    def __call__(self, y, training: bool = False):
        z = self.hyper_encoder(y)
        noise_key = self.make_rng("noise") if training else None
        _, z_lk = self.entropy_bottleneck(z, training, noise_key)
        med = self.entropy_bottleneck.medians()[None, None, None, :]
        z_hat = quantize_ste(z - med) + med
        means, scales = _split2(self.hyper_decoder(z_hat))
        y_hat = quantize_ste(y - means) + means
        key2 = self.make_rng("noise") if training else None
        y_tilde = quantize_gaussian(y, training, means, key2)
        y_lk = gaussian_likelihood(y_tilde, scales, means)
        return y_hat, {"y": y_lk, "z": z_lk}

    # staged real-coding helpers (encoder drives decode_prior's program)

    def encode_z_symbols(self, y):
        z = self.hyper_encoder(y)
        med = self.entropy_bottleneck.medians()[None, None, None, :]
        return _sym8z(z - med)

    def decode_prior(self, z_sym):
        """z symbols -> (means, CDF-index plane) for the single y stream."""
        from ..entropy.gaussian import build_indexes
        from ..entropy.cdf import get_scale_table

        med = self.entropy_bottleneck.medians()[None, None, None, :]
        z_hat = z_sym.astype(med.dtype) + med
        means, scales = _split2(self.hyper_decoder(z_hat))
        idx = build_indexes(scales, jnp.asarray(get_scale_table()))
        return means, idx

    def encode_y_symbols(self, y, means):
        return _sym16(y - means)

    def dequant_y(self, y_sym, means):
        return y_sym.astype(means.dtype) + means

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class MotionCompensationNet(nn.Module):
    """Refines the warped prediction from (x_ref, warped, mv)."""

    channels: int = 64
    unet_width: int = 32

    @nn.compact
    def __call__(self, x_ref, x_warp, mv):
        inp = jnp.concatenate([x_ref, x_warp, mv], axis=-1)
        f = leaky_relu(conv(self.channels)(inp), 0.1)
        f = UNet(self.channels, self.unet_width)(f)
        return x_warp + conv(3, dtype=jnp.float32)(f)  # pixels: f32


class DVC(nn.Module):
    """Explicit-residual P-frame codec."""

    ch_mv: int = 64
    ch_res: int = 96
    n: int = 64
    unet_width: int = 32
    # bf16 interiors supported like DMC: latents/flow/priors/pixels stay
    # f32 via the layer-level pins
    dtype: str = "float32"

    def setup(self):
        from .layers import set_compute_dtype
        set_compute_dtype(self.dtype)
        self.optic_flow = SpyNet()
        self.motion_autoencoder = AutoEncoder(out_channels=2,
                                              channels=self.ch_mv)
        self.motion_coder = _HyperCoder(self.ch_mv, self.n)
        self.mc_net = MotionCompensationNet(self.n, self.unet_width)
        self.residual_autoencoder = AutoEncoder(out_channels=3,
                                                channels=self.ch_res)
        self.residual_coder = _HyperCoder(self.ch_res, self.n)

    def forward_inter(self, x_cur, x_ref, training: bool = False):
        mv = self.optic_flow(x_cur, x_ref)
        y_mv = self.motion_autoencoder.encode(mv)
        y_mv_hat, mv_lk = self.motion_coder(y_mv, training=training)
        mv_hat = self.motion_autoencoder.decode(y_mv_hat)

        x_warp = flow_warp(x_ref, mv_hat)
        x_pred = self.mc_net(x_ref, x_warp, mv_hat)

        res = x_cur - x_pred
        y_res = self.residual_autoencoder.encode(res)
        y_res_hat, res_lk = self.residual_coder(y_res, training=training)
        res_hat = self.residual_autoencoder.decode(y_res_hat)

        x_rec = x_pred + res_hat
        return x_rec, {"motion": mv_lk, "frame": res_lk}

    def __call__(self, frames, training: bool = False, **_unused):
        """frames: (B, T, H, W, 3); frame 0 is the reference."""
        x_ref = frames[:, 0]
        recons, likelihoods = [], []
        for t in range(1, frames.shape[1]):
            x_rec, lk = self.forward_inter(frames[:, t], x_ref,
                                           training=training)
            recons.append(x_rec)
            likelihoods.append(lk)
            if frames.shape[1] >= 3:
                x_rec = jnp.clip(x_rec, 0.0, 1.0)
                x_ref = x_rec
        return {"x_hat": jnp.stack(recons, axis=1),
                "likelihoods": likelihoods}

    # -- real-codec device stages (host rANS between them; the encoder
    # invokes the decode_* programs for every prior, mirroring the DMC
    # staging discipline for bit-exact round trips) --------------------------

    def encode_motion(self, x_cur, x_ref):
        mv = self.optic_flow(x_cur, x_ref)
        y_mv = self.motion_autoencoder.encode(mv)
        return y_mv, self.motion_coder.encode_z_symbols(y_mv)

    def decode_motion_prior(self, z_sym):
        return self.motion_coder.decode_prior(z_sym)

    def encode_motion_symbols(self, y_mv, means):
        return self.motion_coder.encode_y_symbols(y_mv, means)

    def decode_prediction(self, y_mv_sym, means, x_ref):
        """Motion dequant + decode + warp + MC refine -> x_pred."""
        y_mv_hat = self.motion_coder.dequant_y(y_mv_sym, means)
        mv_hat = self.motion_autoencoder.decode(y_mv_hat)
        x_warp = flow_warp(x_ref, mv_hat)
        return self.mc_net(x_ref, x_warp, mv_hat)

    def encode_residual(self, x_cur, x_pred):
        y_res = self.residual_autoencoder.encode(x_cur - x_pred)
        return y_res, self.residual_coder.encode_z_symbols(y_res)

    def decode_residual_prior(self, z_sym):
        return self.residual_coder.decode_prior(z_sym)

    def encode_residual_symbols(self, y_res, means):
        return self.residual_coder.encode_y_symbols(y_res, means)

    def decode_reconstruct(self, y_res_sym, means, x_pred):
        y_res_hat = self.residual_coder.dequant_y(y_res_sym, means)
        res_hat = self.residual_autoencoder.decode(y_res_hat)
        return jnp.clip(x_pred + res_hat, 0.0, 1.0)

    def aux_loss(self):
        return self.motion_coder.aux_loss() + self.residual_coder.aux_loss()
