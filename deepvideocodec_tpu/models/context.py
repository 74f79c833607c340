"""Hybrid spatio-temporal entropy context models with a two-pass
checkerboard dual spatial prior.

Behavioural parity target: MotionContextModel / FrameContextModel of the
reference (/root/reference/dmc/models/video_model.py:128-466). The latent is
split into two channel halves crossed with two checkerboard phases; anchors
(half0 x phase0, half1 x phase1) are coded from the fused prior, then a dense
CNN predicts the non-anchor parameters from the decoded anchors. Both passes
are dense convs with static masks — fully vectorized, no sequential scan, so
the whole thing jits into two conv stacks (TPU-friendly by construction; the
only intra-frame sequential dependency at *real* coding time is the
host-rANS anchor decode between the passes).

All likelihood math runs in fp32 regardless of compute dtype.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..entropy.factorized import FactorizedEntropyBottleneck
from ..entropy.gaussian import (
    gaussian_likelihood,
    quantize_gaussian,
    build_indexes,
)
from ..entropy.cdf import get_scale_table
from ..ops.quant import quantize_ste
from .layers import conv, leaky_relu, HyperEncoder, HyperDecoder


def checkerboard_masks(h: int, w: int, dtype=jnp.float32):
    """(1, h, w, 1) phase masks; mask_0 has 1 where (y + x) is even."""
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    mask_0 = (((yy + xx) % 2) == 0).astype(dtype)[None, :, :, None]
    return mask_0, 1.0 - mask_0


def _split2(t):
    c = t.shape[-1] // 2
    return t[..., :c], t[..., c:]


def _sym16(v):
    """Quantized symbols as int16: they cross the device->host link every
    frame and the link is the codec bottleneck. Clamping to int16 range is
    part of the codec contract (applied identically on the encoder's
    embedded decode and to bitstream-decoded symbols, so encode/decode stay
    bit-exact); trained-model symbols live in [-few hundred, few hundred].
    """
    return jnp.clip(jnp.round(v), -32767, 32767).astype(jnp.int16)


def _sym8z(v):
    """Hyper-latent (z) symbols as int8. z is the smallest, best-behaved
    latent (trained magnitudes ~tens); int8 quarters its share of the
    per-frame device<->host traffic vs int32. The clamp is part of the
    codec contract: z_hat is reconstructed from the *clamped* symbols on
    the encoder side too (encode_stage / the staged codec drivers), so
    encoder and decoder stay bit-exact even in the astronomically unlikely
    |z - median| > 127 case."""
    return jnp.clip(jnp.round(v), -127, 127).astype(jnp.int8)


def _process_with_mask(y, means, scales, mask):
    """STE-quantize the mean-removed latent on the masked positions."""
    means_hat = means * mask
    scales_hat = scales * mask
    y_quant = quantize_ste((y - means_hat) * mask)
    y_hat = y_quant + means_hat
    return y_quant, y_hat, means_hat, scales_hat


class PriorFusion(nn.Module):
    """3-conv prior fusion head: hidden widths taper to 2*out channels."""

    hidden: Tuple[int, ...]
    out_channels: int

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = leaky_relu(conv(h)(x), 0.2)
        # means/scales reach the quantizer + entropy coder: keep f32
        return conv(self.out_channels * 2, dtype=jnp.float32)(x)


class ContextModelBase(nn.Module):
    """Common machinery for motion / frame context models.

    Subclasses configure channel widths and how the fused prior is formed;
    this base owns the hyperprior pair, the factorized bottleneck on z, the
    dual-prior forward, and the symbol-level compress/decompress stages.
    """

    y_channels: int = 64
    z_channels: int = 64

    def make_hyper_nets(self):
        """Factory hook: (hyper_encoder, hyper_decoder). Subclasses with a
        different hyper topology (e.g. cheng2020's 3x3-subpel decoder,
        models/intra.py) override this instead of rewriting setup()."""
        return (HyperEncoder(self.z_channels),
                HyperDecoder(self.y_channels))

    def setup(self):
        self.hyper_encoder, self.hyper_decoder = self.make_hyper_nets()
        self.entropy_bottleneck = FactorizedEntropyBottleneck(
            self.z_channels)
        # Subclasses add y_prior_fusion / y_spatial_prior (+ extras) with
        # their own hidden widths in their setup().
        ch = self.y_channels
        self.y_spatial_prior = PriorFusion((ch * 3, ch * 3), ch)

    # -- dual spatial prior ------------------------------------------------

    def _spatial_prior_params(self, y_hat_0_0, y_hat_1_1, means, scales):
        params = jnp.concatenate(
            [y_hat_0_0, y_hat_1_1, means, scales], axis=-1)
        out = self.y_spatial_prior(params)
        q = out.shape[-1] // 4
        return (out[..., :q], out[..., q:2 * q],
                out[..., 2 * q:3 * q], out[..., 3 * q:])

    def forward_dual_prior(self, y, means, scales):
        """Training/val path: returns (y_hat, means_hat, scales_hat)."""
        _, H, W, _ = y.shape
        m0, m1 = checkerboard_masks(H, W, y.dtype)
        y_0, y_1 = _split2(y)
        means_0, means_1 = _split2(means)
        scales_0, scales_1 = _split2(scales)

        # pass 1: anchors = (half0, phase0) and (half1, phase1)
        _, yh_00, mh_00, sh_00 = _process_with_mask(
            y_0, means_0, scales_0, m0)
        _, yh_11, mh_11, sh_11 = _process_with_mask(
            y_1, means_1, scales_1, m1)

        # pass 2: dense CNN predicts non-anchor params from decoded anchors
        nm_0, ns_0, nm_1, ns_1 = self._spatial_prior_params(
            yh_00, yh_11, means, scales)
        _, yh_01, mh_01, sh_01 = _process_with_mask(y_0, nm_0, ns_0, m1)
        _, yh_10, mh_10, sh_10 = _process_with_mask(y_1, nm_1, ns_1, m0)

        y_hat = jnp.concatenate([yh_00 + yh_01, yh_11 + yh_10], axis=-1)
        means_hat = jnp.concatenate([mh_00 + mh_01, mh_11 + mh_10], axis=-1)
        scales_hat = jnp.concatenate([sh_00 + sh_01, sh_11 + sh_10], axis=-1)
        return y_hat, means_hat, scales_hat

    def dual_prior_compress(self, y, means, scales):
        """Real-coding path: also packs per-pass quantized values + scales.

        Pass w_0 carries the anchors of both halves folded onto one plane;
        pass w_1 the non-anchors — matching the 2-stream layout of the
        reference coder (video_model.py:209-214).
        """
        _, H, W, _ = y.shape
        m0, m1 = checkerboard_masks(H, W, y.dtype)
        y_0, y_1 = _split2(y)
        means_0, means_1 = _split2(means)
        scales_0, scales_1 = _split2(scales)

        yq_00, yh_00, _, sh_00 = _process_with_mask(y_0, means_0, scales_0, m0)
        yq_11, yh_11, _, sh_11 = _process_with_mask(y_1, means_1, scales_1, m1)

        nm_0, ns_0, nm_1, ns_1 = self._spatial_prior_params(
            yh_00, yh_11, means, scales)
        yq_01, yh_01, _, sh_01 = _process_with_mask(y_0, nm_0, ns_0, m1)
        yq_10, yh_10, _, sh_10 = _process_with_mask(y_1, nm_1, ns_1, m0)

        y_hat = jnp.concatenate([yh_00 + yh_01, yh_11 + yh_10], axis=-1)
        return (
            y_hat,
            yq_00 + yq_11,  # y_quant_w_0 (anchor stream)
            yq_01 + yq_10,  # y_quant_w_1 (non-anchor stream)
            sh_00 + sh_11,  # scales_w_0
            sh_01 + sh_10,  # scales_w_1
        )

    # -- z (hyper-latent) handling -----------------------------------------

    def _z_round_trip(self, z, training: bool):
        """STE round around the learned medians; z likelihoods via the
        factorized density (noisy during training)."""
        noise_key = self.make_rng("noise") if training else None
        _, z_lk = self.entropy_bottleneck(z, training, noise_key)
        med = self.entropy_bottleneck.medians()[None, None, None, :]
        z_hat = quantize_ste(z - med) + med
        return z_hat, z_lk

    # -- fused prior (subclass hook) ---------------------------------------

    def fuse_prior(self, hyper_params, y_ref, extra):
        """Return (means, scales) from hyper params + latent ref (+ extras).

        `extra` is the temporal context for the frame model, None for motion.
        """
        raise NotImplementedError

    # -- public paths -------------------------------------------------------

    def __call__(self, y, y_ref, extra=None, training: bool = False):
        """Training/val forward: (y_hat, {'y': lk, 'z': lk})."""
        z = self.hyper_encoder(y)
        z_hat, z_lk = self._z_round_trip(z, training)
        params = self.hyper_decoder(z_hat)
        if y_ref is None:
            y_ref = jnp.zeros_like(y)
        means, scales = self.fuse_prior(params, y_ref, extra)
        y_hat, means_hat, scales_hat = self.forward_dual_prior(
            y, means, scales)
        noise_key = self.make_rng("noise") if training else None
        y_tilde = quantize_gaussian(y, training, means_hat, noise_key)
        y_lk = gaussian_likelihood(y_tilde, scales_hat, means_hat)
        return y_hat, {"y": y_lk, "z": z_lk}

    # Real-codec device stages. The host rANS sits between these; each is a
    # pure function so the driver can jit them separately.

    def encode_stage(self, y, y_ref, extra=None):
        """Device side of compress: everything down to coder-ready planes.

        Returns (y_hat, z_symbols, int32 anchor/non-anchor symbol planes,
        int32 CDF-index planes). z round-trips deterministically on device
        (the bytes the host writes decode to exactly this z_hat), so the
        host coder only ever moves int32 planes — no float recompute.
        """
        z = self.hyper_encoder(y)
        med = self.entropy_bottleneck.medians()[None, None, None, :]
        z_symbols = _sym8z(z - med)
        z_hat = z_symbols.astype(z.dtype) + med
        params = self.hyper_decoder(z_hat)
        if y_ref is None:
            y_ref = jnp.zeros_like(y)
        means, scales = self.fuse_prior(params, y_ref, extra)
        y_hat, yq_w0, yq_w1, s_w0, s_w1 = self.dual_prior_compress(
            y, means, scales)
        table = jnp.asarray(get_scale_table())
        return (
            y_hat,
            z_symbols,
            _sym16(yq_w0),
            _sym16(yq_w1),
            build_indexes(s_w0, table),
            build_indexes(s_w1, table),
        )

    def decode_prior_stage(self, z_hat, y_ref, extra=None):
        """Device stage 1 of decompress: fused prior from decoded z."""
        params = self.hyper_decoder(z_hat)
        if y_ref is None:
            B, H, W, _ = z_hat.shape
            y_ref = jnp.zeros(
                (B, H * 4, W * 4, self.y_channels), z_hat.dtype)
        means, scales = self.fuse_prior(params, y_ref, extra)
        return means, scales

    def decode_anchor_indexes(self, scales):
        """Anchor-stream CDF indexes: fold the per-half scales by phase."""
        _, H, W, _ = scales.shape
        m0, m1 = checkerboard_masks(H, W, scales.dtype)
        s0, s1 = _split2(scales)
        table = jnp.asarray(get_scale_table())
        return build_indexes(s0 * m0 + s1 * m1, table)

    def decode_nonanchor_stage(self, y_quant_r0, means, scales):
        """Device stage 2: spatial prior on decoded anchors.

        Returns (anchor y_hat halves, non-anchor means halves, and the
        non-anchor stream's CDF-index plane).
        """
        _, H, W, _ = means.shape
        m0, m1 = checkerboard_masks(H, W, means.dtype)
        means_0, means_1 = _split2(means)
        yq = y_quant_r0.astype(means.dtype)
        yh_00 = (yq + means_0) * m0
        yh_11 = (yq + means_1) * m1
        nm_0, ns_0, nm_1, ns_1 = self._spatial_prior_params(
            yh_00, yh_11, means, scales)
        table = jnp.asarray(get_scale_table())
        idx_r1 = build_indexes(ns_0 * m1 + ns_1 * m0, table)
        return yh_00, yh_11, nm_0, nm_1, idx_r1

    def decode_combine_stage(self, yh_00, yh_11, nm_0, nm_1, y_quant_r1):
        """Device stage 3: fold the two decoded streams into y_hat."""
        _, H, W, _ = nm_0.shape
        m0, m1 = checkerboard_masks(H, W, nm_0.dtype)
        yq = y_quant_r1.astype(nm_0.dtype)
        yh_01 = (yq + nm_0) * m1
        yh_10 = (yq + nm_1) * m0
        return jnp.concatenate([yh_00 + yh_01, yh_11 + yh_10], axis=-1)

    def z_dequant(self, z_symbols):
        """z_hat from decoded integer symbols (adds back the medians)."""
        med = self.entropy_bottleneck.medians()[None, None, None, :]
        return z_symbols.astype(med.dtype) + med

    # -- encoder-side symbol extraction -------------------------------------
    # The bit-exact codec drives the *decoder's* jitted programs for every
    # prior computation (see eval/codec.py); the encoder contributes only
    # these cheap symbol extractions, always computed from decoder-produced
    # means so encoder/decoder can never diverge.

    def encode_z_symbols(self, y):
        """y -> (z_symbols int8). Deterministic round around medians."""
        z = self.hyper_encoder(y)
        med = self.entropy_bottleneck.medians()[None, None, None, :]
        return _sym8z(z - med)

    def encode_anchor_symbols(self, y, means):
        """Anchor-stream int32 symbol plane from decoder-produced means."""
        _, H, W, _ = y.shape
        m0, m1 = checkerboard_masks(H, W, y.dtype)
        y_0, y_1 = _split2(y)
        means_0, means_1 = _split2(means)
        q00 = jnp.round((y_0 - means_0) * m0)
        q11 = jnp.round((y_1 - means_1) * m1)
        return _sym16(q00 + q11)

    def encode_nonanchor_symbols(self, y, nm_0, nm_1):
        """Non-anchor-stream symbols from the spatial prior's means."""
        _, H, W, _ = y.shape
        m0, m1 = checkerboard_masks(H, W, y.dtype)
        y_0, y_1 = _split2(y)
        q01 = jnp.round((y_0 - nm_0) * m1)
        q10 = jnp.round((y_1 - nm_1) * m0)
        return _sym16(q01 + q10)

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class MotionContextModel(ContextModelBase):
    """Entropy model for the motion latent: hyper + latent-ref prior.

    Parity: /root/reference/dmc/models/video_model.py:128-291 (ch_mv=64).
    """

    def setup(self):
        super().setup()
        ch = self.y_channels
        # fusion input: hyper params (2ch) + y_ref (ch) = 3ch
        self.y_prior_fusion = PriorFusion((ch * 3, ch * 3), ch)

    def fuse_prior(self, hyper_params, y_ref, extra):
        del extra
        fused = self.y_prior_fusion(
            jnp.concatenate([hyper_params, y_ref], axis=-1))
        return _split2(fused)


class FrameContextModel(ContextModelBase):
    """Entropy model for the frame latent: hyper + temporal + latent-ref.

    Parity: /root/reference/dmc/models/video_model.py:294-466 (N=64, M=96).
    """

    def setup(self):
        super().setup()
        m = self.y_channels
        # fusion input: temporal (2M) + hyper (2M) + y_ref (M) = 5M
        self.y_prior_fusion = PriorFusion((m * 4, m * 3), m)
        self.temporal_prior_encoder = TemporalPriorEncoder(m)

    def fuse_prior(self, hyper_params, y_ref, extra):
        temporal_params = self.temporal_prior_encoder(extra)
        fused = self.y_prior_fusion(
            jnp.concatenate([temporal_params, hyper_params, y_ref], axis=-1))
        return _split2(fused)


class TemporalPriorEncoder(nn.Module):
    """Context3 (/4-scale temporal context) -> 2M-channel prior at /16."""

    m_channels: int

    @nn.compact
    def __call__(self, context):
        x = conv(self.m_channels * 3 // 2, 3, 2)(context)
        x = leaky_relu(x, 0.1)
        return conv(self.m_channels * 2, 3, 2)(x)
