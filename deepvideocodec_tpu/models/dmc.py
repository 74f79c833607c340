"""DMC — the flagship conditional-coding P-frame video codec.

Behavioural parity target: the DMC class of the reference
(/root/reference/dmc/models/video_model.py:469-679): SpyNet motion
estimation, compressed motion latent with a hyperprior + latent-ref entropy
model, multi-scale temporal-context mining via bilinear warping of propagated
reference features, contextual analysis/synthesis of the frame conditioned on
those contexts, and a hybrid spatio-temporal entropy model.

TPU-first design points:
  * NHWC + flax.linen; the whole P-frame step is one jittable pure function
    (one fused XLA program per curriculum stage).
  * The decoded-picture buffer (DPB) is a fixed-shape pytree (no Nones inside
    jit): zeros + a static `first_p` flag replace the reference's None
    switching, so eval streams frames with donated O(1) state.
  * Real coding splits into pure device stages with the host rANS between
    them (see eval/codec.py); the *encoder embeds the decoder* — identical
    ops in identical order — so bitstream round-trips are bit-exact.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import (flow_warp, bilinear_downsample_x2,
                   bilinear_upsample_x2, avg_pool_2x2)
from .layers import (
    conv,
    ResBlock,
    SubpelConv,
    SpyNet,
    UNet,
    AutoEncoder,
    set_compute_dtype,
)
from .context import MotionContextModel, FrameContextModel


@dataclasses.dataclass(frozen=True)
class DMCConfig:
    ch_mv: int = 64      # motion latent channels
    n: int = 64          # feature / hyper channels
    m: int = 96          # frame latent channels
    unet_width: int = 32  # recon UNet base width (32 = reference ladder)
    # computation dtype for transform interiors ("float32"/"bfloat16");
    # latents, flow, priors, entropy math and recon output stay f32 either
    # way (layer-level pins) so the coded bitstream semantics are stable.
    dtype: str = "float32"
    # Speed/RD architecture variants (default off = reference-parity
    # topology; RD impact must be validated by training — scripts/
    # campaign.sh trains both). Measured effects: docs/PERFORMANCE.md.
    #   warp_ctx_half: mine the full-res temporal context by warping the
    #     /2-pooled feature with the /2 flow and upsampling back — the
    #     full-res 64ch gather is the single most expensive device op.
    #   flow_half: run SpyNet on /2-pooled frames and upsample the flow
    #     (x2 values); quarters motion-estimation cost.
    warp_ctx_half: bool = False
    flow_half: bool = False
    #   ctx_lite: drop the full-resolution ResBlocks on the context-mining
    #     path (FeatureExtractor's l1 tail, the fusion net's c1 output
    #     branch) — 4 of the ~10 full-res C=n convs outside the recon
    #     UNets, which docs/PERFORMANCE.md's conv table puts at their
    #     formulation floor (half the MXU lanes at C=64).
    #   recon_single_unet: one recon UNet instead of the reference's two
    #     (video_model.py:112-125) — dec_fr_recon is the second-largest
    #     decode stage (160 ms at 1080p).
    ctx_lite: bool = False
    recon_single_unet: bool = False
    #   Round-3 cut set ("fast3" = fast2 + the three below). Each keeps the
    #   shared param paths of the fast2 tree (fresh leaves only where the
    #   graph genuinely diverges) so --init-partial warm starts work.
    #   mv_half_dec: the motion synthesis ladder stops at /2 (layers.py:
    #     AutoEncoder.half_out) — under warp_ctx_half every consumer of the
    #     decoded flow (c1/c2 warps at /2, c3 at /4) operates at <= /2, so
    #     the full-res synthesis stage + the immediate /2 downsample it fed
    #     are dead compute. Requires warp_ctx_half.
    #   ctx_half: context1 is mined, fused and consumed at /2 everywhere
    #     (fusion's c1 branch, the contextual encoder's conditioning, the
    #     recon ctx input) instead of being upsampled to full res right
    #     after the /2 warp. Removes the remaining full-res convs on the
    #     context path. Requires warp_ctx_half.
    #   recon_half: the recon UNet runs at /2 (the contextual decoder's
    #     final upsample is deferred past it); a subpel conv lifts the
    #     refined /2 feature to the full-res DPB feature, from which the
    #     RGB head reads. Moves the widest lane-bound full-res convs in
    #     the model (UNet C<=32 @ 5.4 TF/s — docs/PERFORMANCE.md) to /2.
    mv_half_dec: bool = False
    ctx_half: bool = False
    recon_half: bool = False
    #   Round-4 cut ("fast4" = fast3 + the below).
    #   feat_half: the DPB feature_ref itself lives at /2. After fast3 the
    #     /1 compute left per P-frame is feature_adaptor_p + the
    #     extractor's l1 conv (two 64->64 full-res convs, ~77 GMAC each at
    #     1080p), the recon up_half subpel lift producing the full-res
    #     64ch feature (another ~77 GMAC equivalent), and the full-res RGB
    #     head conv. feat_half deletes all four: the recon UNet's /2
    #     output IS the next frame's feature_ref, the extractor pyramid
    #     runs (/2, /2, /4) with the same kernel shapes (only strides
    #     change), and RGB is synthesized straight from the /2 feature by
    #     one fresh subpel head ("rgb_up_half"). Every shared path keeps
    #     its exact base shape, so --init-partial warm starts from fast3
    #     load everything but that head. Requires ctx_half + recon_half
    #     (the context/recon consumers must already be on the /2 path).
    feat_half: bool = False
    #   Round-5 cuts, ranked by the analytic per-stage FLOP table
    #   (scripts/flops_stages.py; docs/PERFORMANCE.md round-5). The two
    #   decode-side stages run TWICE per coded frame (the encoder embeds
    #   the decoder), so cuts there are doubly weighted.
    #   ctx_slim ("fast5" = fast4 + this): drop the /2 ResBlocks on the
    #     context path — the fusion net's c3_up/c2_up/c2_out branch
    #     blocks and the extractor's l2 block. MultiScaleContextFusion
    #     is the single largest module left in fast4 (~600 GFLOP/call of
    #     the 877 in dec_mv_combine_ctx, x2 calls/frame); the dropped
    #     blocks are ~460 GFLOP/frame, ~11% of the total. Drop-only =
    #     fast5's param tree is a strict subset of fast4's, so
    #     --init-partial warm starts load every remaining leaf.
    #   flow_quarter ("fast6" = fast5 + this): SpyNet runs on /4-pooled
    #     frames (4 levels from /4); the flow is upsampled back with
    #     value scaling. No param change. SpyNet is ~430 GFLOP of
    #     enc_motion's 491; this cuts ~75% of it (~8% of total) at the
    #     cost of twice-coarsened motion — RD must be re-measured.
    ctx_slim: bool = False
    flow_quarter: bool = False

    def __post_init__(self):
        if self.ctx_slim and not self.ctx_half:
            raise ValueError(
                "ctx_slim drops the /2 context-path ResBlocks of the "
                "ctx_half topology (fusion c1_half branch); enable "
                "ctx_half first")
        if self.flow_quarter and not self.flow_half:
            raise ValueError(
                "flow_quarter extends flow_half's pooled SpyNet input "
                "to /4; enable flow_half first")
        if (self.mv_half_dec or self.ctx_half) and not self.warp_ctx_half:
            raise ValueError(
                "mv_half_dec/ctx_half assume the /2 context-mining path "
                "(warp_ctx_half=True): without it the full-res flow is a "
                "live consumer and the cut is incorrect")
        if self.feat_half and not (self.ctx_half and self.recon_half):
            raise ValueError(
                "feat_half stores the DPB feature at /2; its consumers "
                "(context mining, recon refinement) must already run at "
                "/2 (ctx_half=True, recon_half=True)")


def empty_dpb(batch: int, h: int, w: int, cfg: DMCConfig = DMCConfig(),
              dtype=jnp.float32) -> Dict[str, jax.Array]:
    """Fixed-shape decoded-picture buffer for an (h, w) padded frame."""
    fh, fw = (h // 2, w // 2) if cfg.feat_half else (h, w)
    return {
        "x_ref": jnp.zeros((batch, h, w, 3), dtype),
        "feature_ref": jnp.zeros((batch, fh, fw, cfg.n), dtype),
        "y_ref": jnp.zeros((batch, h // 16, w // 16, cfg.m), dtype),
        "y_mv_ref": jnp.zeros((batch, h // 16, w // 16, cfg.ch_mv), dtype),
    }


class FeatureExtractor(nn.Module):
    """3-scale (/1, /2, /4) feature pyramid of the reference feature.

    `lite` (DMCConfig.ctx_lite) drops l1's full-resolution ResBlock —
    its two C=channels convs run at half the MXU lanes and are the
    stage's cost center (docs/PERFORMANCE.md conv table); the /2 and /4
    levels keep the reference ladder.

    `half` (DMCConfig.feat_half): the reference feature arrives at /2,
    so the pyramid runs (/2, /2, /4) — l2's conv drops its stride (same
    kernel shape/path, so warm starts load it) and the scales stay
    aligned with the /2 and /4 flow fields the warps consume.
    """

    channels: int = 64
    lite: bool = False
    half: bool = False
    slim: bool = False   # DMCConfig.ctx_slim: drop l2's ResBlock too

    @nn.compact
    def __call__(self, feature):
        # Explicit ResBlock names: flax auto-names are per-type counters,
        # so skipping l1's block in lite mode would silently shift
        # "ResBlock_0" onto the l2 block — corrupting any path+shape
        # partial warm start from base/fast weights (all blocks here are
        # shape-identical). The explicit names pin the base layout.
        l1 = conv(self.channels)(feature)
        if not self.lite:
            l1 = ResBlock(self.channels, name="ResBlock_0")(l1)
        l2 = conv(self.channels, 3, 1 if self.half else 2)(l1)
        if not self.slim:
            l2 = ResBlock(self.channels, name="ResBlock_1")(l2)
        l3 = conv(self.channels, 3, 2)(l2)
        l3 = ResBlock(self.channels, name="ResBlock_2")(l3)
        return l1, l2, l3


class MultiScaleContextFusion(nn.Module):
    """Cross-scale fusion of the three warped contexts (residual form).

    `lite` (DMCConfig.ctx_lite) drops the ResBlock on the full-resolution
    c1 output branch (the only full-res compute in this module); the /2
    and /4 branches keep the reference ladder.

    `c1_half` (DMCConfig.ctx_half): context1 arrives AND leaves at /2, so
    the c1 branch runs at /2 — the c2->c1 hand-up becomes a same-scale
    conv (fresh "c2_up_half" leaf) instead of a subpel upsample, and the
    cat21 conv keeps its exact base shape (128->c) and path. Unchanged
    branches are constructed with their base auto-names pinned explicitly
    so partial warm starts from base/fast/fast2 trees stay aligned.
    """

    channels: int = 64
    lite: bool = False
    c1_half: bool = False
    slim: bool = False   # DMCConfig.ctx_slim: drop the /2 branch blocks

    @nn.compact
    def __call__(self, context1, context2, context3):
        c = self.channels
        if not self.c1_half:
            c3_up = ResBlock(c)(SubpelConv(c, 2)(context3))
            c3_out = ResBlock(c)(conv(c)(context3))
            cat32 = jnp.concatenate([c3_up, context2], axis=-1)
            c2_up = ResBlock(c)(SubpelConv(c, 2)(cat32))
            c2_out = ResBlock(c)(conv(c)(cat32))
            cat21 = jnp.concatenate([c2_up, context1], axis=-1)
            c1_out = conv(c)(cat21)
            if not self.lite:
                c1_out = ResBlock(c)(c1_out)
            return (context1 + c1_out, context2 + c2_out,
                    context3 + c3_out)
        # /2-native c1 branch. Base auto-names pinned on shared modules.
        # `slim` (DMCConfig.ctx_slim) drops the three /2-scale ResBlocks
        # (c3_up / c2_up / c2_out tails — ~38.5 GMAC each at 1080p,
        # the fusion net's cost center after ctx_half); the /4-scale
        # ResBlock_1 stays (cheap, keeps c3-branch capacity). Drop-only:
        # the surviving conv leaves keep their exact paths.
        c3_up = SubpelConv(c, 2, name="SubpelConv_0")(context3)
        if not self.slim:
            c3_up = ResBlock(c, name="ResBlock_0")(c3_up)
        c3_out = ResBlock(c, name="ResBlock_1")(
            conv(c, name="Conv_0")(context3))
        cat32 = jnp.concatenate([c3_up, context2], axis=-1)
        c2_up = conv(c, name="c2_up_half")(cat32)  # same scale: no subpel
        if not self.slim:
            c2_up = ResBlock(c, name="ResBlock_2")(c2_up)
        c2_out = conv(c, name="Conv_1")(cat32)
        if not self.slim:
            c2_out = ResBlock(c, name="ResBlock_3")(c2_out)
        cat21 = jnp.concatenate([c2_up, context1], axis=-1)
        c1_out = conv(c, name="Conv_2")(cat21)
        if not self.lite:
            c1_out = ResBlock(c, name="ResBlock_4")(c1_out)
        return context1 + c1_out, context2 + c2_out, context3 + c3_out


class ContextualEncoder(nn.Module):
    """Frame analysis transform conditioned on the temporal contexts (/16).

    `c1_half` (DMCConfig.ctx_half): context1 arrives at /2, so the
    full-res stage convolves the frame alone (fresh 3->n "in_x_half"
    leaf) and context1 is injected by a 1x1 projection at /2 — the
    full-res concat conv over 3+n channels disappears. Every downstream
    block keeps its base shape and (explicitly pinned) base path.
    """

    n: int = 64
    m: int = 96
    c1_half: bool = False

    @nn.compact
    def __call__(self, x, context1, context2, context3):
        n = self.n
        if self.c1_half:
            f = (conv(n, 3, 2, name="in_x_half")(x)
                 + conv(n, 1, name="c1_proj_half")(context1))
        else:
            f = conv(n, 3, 2)(jnp.concatenate([x, context1], axis=-1))
        nm = {"name": "ResBlock_0"} if self.c1_half else {}
        f = ResBlock(n * 2, slope=0.1, bottleneck=True,
                     end_with_relu=True, **nm)(
            jnp.concatenate([f, context2], axis=-1))
        f = conv(n, 3, 2, **({"name": "Conv_1"} if self.c1_half else {}))(f)
        nm = {"name": "ResBlock_1"} if self.c1_half else {}
        f = ResBlock(n * 2, slope=0.1, bottleneck=True,
                     end_with_relu=True, **nm)(
            jnp.concatenate([f, context3], axis=-1))
        f = conv(n, 3, 2, **({"name": "Conv_2"} if self.c1_half else {}))(f)
        return conv(self.m, 3, 2, dtype=jnp.float32,
                    **({"name": "Conv_3"} if self.c1_half else {}))(f)


class ContextualDecoder(nn.Module):
    """Synthesis transform: x16 subpel with context conditioning, 32ch out.

    `half_out` (DMCConfig.recon_half): the final x2 subpel is replaced by
    a same-scale conv (fresh "out_half" leaf) so the residual feature
    leaves at /2 for the half-resolution recon path; everything before it
    keeps its base shape and path (only the final module changes, so the
    auto-name counters of the shared prefix are unaffected).
    """

    n: int = 64
    m: int = 96
    half_out: bool = False

    @nn.compact
    def __call__(self, y_hat, context2, context3):
        n = self.n
        f = SubpelConv(n, 2)(y_hat)
        f = SubpelConv(n, 2)(f)
        f = ResBlock(n * 2, slope=0.1, bottleneck=True,
                     end_with_relu=True)(
            jnp.concatenate([f, context3], axis=-1))
        f = SubpelConv(n, 2)(f)
        f = ResBlock(n * 2, slope=0.1, bottleneck=True,
                     end_with_relu=True)(
            jnp.concatenate([f, context2], axis=-1))
        if self.half_out:
            return conv(32, name="out_half")(f)
        return SubpelConv(32, 2)(f)


class ReconGeneration(nn.Module):
    """Two UNets refine (residual feature, context1) into RGB + the feature
    that becomes the next frame's feature_ref.

    Concat order (res, ctx) matches the reference call site, which passes
    x_rec_feature first (video_model.py:575 into forward(ctx, res) —
    the parameter names there are swapped; the dataflow is res-then-ctx).
    """

    channels: int = 64
    unet_width: int = 32
    single_unet: bool = False  # DMCConfig.recon_single_unet
    half: bool = False         # DMCConfig.recon_half
    feat_half: bool = False    # DMCConfig.feat_half

    @nn.compact
    def __call__(self, res, ctx):
        res = res.astype(ctx.dtype) if res.dtype != ctx.dtype else res
        if not self.half:
            f = conv(self.channels)(jnp.concatenate([res, ctx], axis=-1))
            f = UNet(self.channels, self.unet_width)(f)
            if not self.single_unet:
                f = UNet(self.channels, self.unet_width)(f)
            recon = conv(3, dtype=jnp.float32)(f)  # pixels: f32
            # feature_ref lives in the DPB (fixed f32 pytree)
            return f.astype(jnp.float32), recon
        # /2 refinement: res comes in at /2 (ContextualDecoder.half_out);
        # ctx is pooled unless the ctx_half path already mined it at /2.
        # The concat conv and UNet keep their exact base shapes/paths —
        # only the subpel lift to the full-res DPB feature is fresh.
        if ctx.shape[1] == 2 * res.shape[1]:
            ctx = avg_pool_2x2(ctx)
        f = conv(self.channels, name="Conv_0")(
            jnp.concatenate([res, ctx], axis=-1))
        f = UNet(self.channels, self.unet_width, name="UNet_0")(f)
        if not self.single_unet:
            f = UNet(self.channels, self.unet_width, name="UNet_1")(f)
        if self.feat_half:
            # /2-native DPB feature (DMCConfig.feat_half): the refined /2
            # feature IS next frame's feature_ref — no full-res lift at
            # all. RGB is synthesized by one fresh subpel head; pixels f32.
            recon = SubpelConv(3, 2, dtype=jnp.float32,
                               name="rgb_up_half")(f)
            return f.astype(jnp.float32), recon
        feature = SubpelConv(self.channels, 2, name="up_half")(f)
        recon = conv(3, dtype=jnp.float32, name="Conv_1")(feature)
        return feature.astype(jnp.float32), recon


class DMC(nn.Module):
    """Conditional-coding P-frame codec (training + real-codec stages)."""

    cfg: DMCConfig = DMCConfig()

    def setup(self):
        c = self.cfg
        set_compute_dtype(getattr(c, "dtype", "float32"))
        self.optic_flow = SpyNet()
        self.motion_autoencoder = AutoEncoder(
            out_channels=2, channels=c.ch_mv, half_out=c.mv_half_dec)
        self.motion_context_model = MotionContextModel(
            y_channels=c.ch_mv, z_channels=c.ch_mv)
        # feat_half: the I-frame adaptor downsamples the RGB reference to
        # the /2 feature grid (same 3->n kernel shape, stride 2); the
        # P-frame adaptor is 1x1 on the already-/2 feature_ref.
        self.feature_adaptor_i = conv(c.n, 3, 2 if c.feat_half else 1)
        self.feature_adaptor_p = conv(c.n, 1)
        self.feature_extractor = FeatureExtractor(
            c.n, lite=c.ctx_lite, half=c.feat_half, slim=c.ctx_slim)
        self.context_fusion_net = MultiScaleContextFusion(
            c.n, lite=c.ctx_lite, c1_half=c.ctx_half, slim=c.ctx_slim)
        self.contextual_encoder = ContextualEncoder(
            c.n, c.m, c1_half=c.ctx_half)
        self.contextual_decoder = ContextualDecoder(
            c.n, c.m, half_out=c.recon_half)
        self.frame_context_model = FrameContextModel(
            y_channels=c.m, z_channels=c.n)
        self.recon_generation_net = ReconGeneration(
            c.n, c.unet_width, single_unet=c.recon_single_unet,
            half=c.recon_half, feat_half=c.feat_half)

    # -- shared sub-graphs ---------------------------------------------------

    def multi_scale_feature_extractor(self, dpb, first_p: bool):
        if first_p:
            feature = self.feature_adaptor_i(dpb["x_ref"])
        else:
            feature = self.feature_adaptor_p(dpb["feature_ref"])
        return self.feature_extractor(feature)

    def _estimate_flow(self, x_cur, x_ref):
        if self.cfg.flow_quarter:
            # SpyNet on /4 pyramids (DMCConfig.flow_quarter): two pools
            # in, two value-scaled upsamples out. Same params as the
            # /2 form (SpyNet is input-scale-free).
            mv = self.optic_flow(avg_pool_2x2(avg_pool_2x2(x_cur)),
                                 avg_pool_2x2(avg_pool_2x2(x_ref)))
            mv = bilinear_upsample_x2(mv) * 2.0
            return bilinear_upsample_x2(mv) * 2.0
        if self.cfg.flow_half:
            mv = self.optic_flow(avg_pool_2x2(x_cur), avg_pool_2x2(x_ref))
            return bilinear_upsample_x2(mv) * 2.0
        return self.optic_flow(x_cur, x_ref)

    def motion_compensation(self, mv, dpb, first_p: bool,
                            need_xwarp: bool = True):
        """Warped multi-scale contexts (+ the warped frame when asked).

        `need_xwarp` is static: the real-codec decode stages never use the
        warped frame (it only feeds the motion-pretrain loss), so the
        warp_ctx_half variant skips that full-res gather entirely there.

        Under `mv_half_dec` the decoded field `mv` arrives at /2 in
        /2-pixel units — it IS mv2; the full-res flow is rebuilt (by
        upsampling) only when the warped frame is actually needed.
        """
        if self.cfg.mv_half_dec:
            mv2 = mv
            mv_full = (bilinear_upsample_x2(mv2) * 2.0
                       if need_xwarp else None)
        else:
            mv_full = mv
            mv2 = bilinear_downsample_x2(mv_full) / 2.0
        mv3 = bilinear_downsample_x2(mv2) / 2.0
        f1, f2, f3 = self.multi_scale_feature_extractor(dpb, first_p)
        if self.cfg.warp_ctx_half:
            # context1 mined at /2: pool the full-res feature, warp with
            # the /2 flow, upsample back (ctx_half keeps it at /2 — the
            # fusion/encoder/recon consumers run their c1 branches there).
            # The full-res 64ch gather is the single most expensive device
            # op (docs/PERFORMANCE.md); this quarters its index count at
            # an RD cost trained/measured by the campaign.
            # feat_half: f1 is already on the /2 grid — warp it directly.
            c1 = flow_warp(f1 if self.cfg.feat_half else avg_pool_2x2(f1),
                           mv2)
            if not self.cfg.ctx_half:
                c1 = bilinear_upsample_x2(c1)
            warpframe = (flow_warp(dpb["x_ref"].astype(f1.dtype), mv_full)
                         if need_xwarp else None)
        else:
            # x_ref and f1 share the full-res flow: one fused gather
            # instead of two (warp cost is per-index — channels free).
            both = flow_warp(
                jnp.concatenate(
                    [dpb["x_ref"].astype(f1.dtype), f1], axis=-1),
                mv_full)
            warpframe = both[..., :3]
            c1 = both[..., 3:]
        c2 = flow_warp(f2, mv2)
        c3 = flow_warp(f3, mv3)
        c1, c2, c3 = self.context_fusion_net(c1, c2, c3)
        return c1, c2, c3, warpframe

    # -- training forward ----------------------------------------------------

    def forward_inter(
        self,
        x_cur,
        dpb,
        first_p: bool = True,
        motion_pretrain: bool = False,
        frame_pretrain: bool = False,
        training: bool = False,
    ):
        """One P-frame step. Returns (x_rec, likelihoods, new_dpb).

        `first_p` is static: the first P-frame after an I-frame adapts the
        RGB reference and sees zero latent refs (the reference models this
        with Nones — video_model.py:529-534).
        """
        mv = self._estimate_flow(x_cur, dpb["x_ref"])
        y_mv = self.motion_autoencoder.encode(mv)
        y_mv_ref = None if first_p else dpb["y_mv_ref"]
        y_mv_hat, mv_lk = self.motion_context_model(
            y_mv, y_mv_ref, training=training)

        mv_hat = self.motion_autoencoder.decode(y_mv_hat)
        c1, c2, c3, x_warp = self.motion_compensation(
            mv_hat, dpb, first_p, need_xwarp=motion_pretrain or
            not self.cfg.warp_ctx_half)

        if motion_pretrain:
            return x_warp, {"motion": mv_lk}, dpb
        # NOTE: the reference's frame_pretrain stage detaches mv_hat *after*
        # the contexts were already computed and never uses it again
        # (video_model.py:568-569) — the detach is dead code, gradients flow
        # into the motion branch through the contexts. We reproduce that
        # actual dataflow (no stop_gradient) for training parity.
        del frame_pretrain

        y = self.contextual_encoder(x_cur, c1, c2, c3)
        y_ref = None if first_p else dpb["y_ref"]
        y_hat, frame_lk = self.frame_context_model(
            y, y_ref, extra=c3, training=training)

        x_rec_feature = self.contextual_decoder(y_hat, c2, c3)
        feature, x_rec = self.recon_generation_net(x_rec_feature, c1)

        new_dpb = {
            "x_ref": x_rec,
            "feature_ref": feature,
            "y_ref": y_hat,
            "y_mv_ref": y_mv_hat,
        }
        return x_rec, {"motion": mv_lk, "frame": frame_lk}, new_dpb

    def __call__(
        self,
        frames,  # (B, T, H, W, 3)
        motion_pretrain: bool = False,
        frame_pretrain: bool = False,
        training: bool = False,
        scan_frames: bool = False,
    ):
        """Training forward over a short clip; frame 0 is the reference.

        DPB propagates across P-frames only for clips of >= 3 frames,
        matching the reference (video_model.py:543-549). Returns
        {'x_hat': (B, T-1, H, W, 3), 'likelihoods': [per-frame dicts]}.

        `scan_frames` folds the steady-state P-frames (t >= 2, first_p
        False, identical graph every step) into one `nn.scan` over the
        DPB carry instead of a Python unroll. Same math, same remat
        memory behavior — but the host-side trace+lower cost becomes
        O(1) in cascade length instead of O(T), which is what makes
        long-cascade drift fine-tunes (--max-frames 9/15,
        scripts/campaign_r4c.sh) tractable on a 1-core host where a
        14-step unrolled trace costs the better part of an hour. The
        first P-frame stays unrolled (first_p=True is a different
        graph: RGB-adapted feature, no latent refs).
        """
        B, T, H, W, _ = frames.shape
        dpb = empty_dpb(B, H, W, self.cfg, frames.dtype)
        dpb["x_ref"] = frames[:, 0]

        # Rematerialize each P-frame step during training: the unrolled
        # recurrence otherwise keeps every frame's full-res activations
        # alive for the backward pass, which exceeds a single chip's HBM
        # at the reference's operating point (batch 8, 256^2, 3 frames on
        # 16 GB v5e). checkpoint trades one extra forward per frame for
        # O(1)-in-frames activation memory. Eval paths are untouched (the
        # codec's bit-exact stage programs never go through here).
        if training:
            remat_inter = nn.remat(
                lambda mdl, x, d, fp, mp, fpre, tr: mdl.forward_inter(
                    x, d, first_p=fp, motion_pretrain=mp,
                    frame_pretrain=fpre, training=tr),
                static_argnums=(3, 4, 5, 6),
            )

            def step_fn(x, d, fp, mp, fpre, tr):
                return remat_inter(self, x, d, fp, mp, fpre, tr)
        else:
            def step_fn(x, d, fp, mp, fpre, tr):
                return self.forward_inter(
                    x, d, first_p=fp, motion_pretrain=mp,
                    frame_pretrain=fpre, training=tr)

        if scan_frames and T >= 4 and not motion_pretrain:
            # t=1 unrolled (its graph differs), t>=2 scanned over the DPB.
            x_rec1, lk1, dpb = step_fn(
                frames[:, 1], dpb, True,
                motion_pretrain, frame_pretrain, training)

            def body(mdl, carry_dpb, x_t):
                x_rec, lk, new_dpb = mdl.forward_inter(
                    x_t, carry_dpb, first_p=False,
                    motion_pretrain=motion_pretrain,
                    frame_pretrain=frame_pretrain, training=training)
                return new_dpb, (x_rec, lk)

            if training:
                body = nn.remat(body)
            scanned = nn.scan(
                body,
                variable_broadcast="params",
                split_rngs={"params": False, "noise": True},
                in_axes=1, out_axes=0)
            dpb, (recs, lks) = scanned(self, dpb, frames[:, 2:])
            recons = [x_rec1] + [
                jax.tree_util.tree_map(lambda a, i=i: a[i], recs)
                for i in range(T - 2)]
            likelihoods = [lk1] + [
                jax.tree_util.tree_map(lambda a, i=i: a[i], lks)
                for i in range(T - 2)]
            return {
                "x_hat": jnp.stack(recons, axis=1),
                "likelihoods": likelihoods,
            }

        recons, likelihoods = [], []
        for t in range(1, T):
            first_p = t == 1
            x_rec, lk, new_dpb = step_fn(
                frames[:, t], dpb, first_p,
                motion_pretrain, frame_pretrain, training)
            recons.append(x_rec)
            likelihoods.append(lk)
            if T >= 3 and not motion_pretrain:
                dpb = new_dpb
        return {
            "x_hat": jnp.stack(recons, axis=1),
            "likelihoods": likelihoods,
        }

    # -- real-codec device stages (host rANS sits between them) -------------

    def encode_stage(self, x_cur, dpb, first_p: bool):
        """Full-device encode: all symbol planes + the embedded decode.

        The encoder runs the decoder's exact graph (same ops, same order) so
        the propagated DPB matches what the standalone decoder reconstructs
        from the bitstream (reference encode_inter: video_model.py:581-599).
        """
        mv = self._estimate_flow(x_cur, dpb["x_ref"])
        y_mv = self.motion_autoencoder.encode(mv)
        y_mv_ref = None if first_p else dpb["y_mv_ref"]
        (y_mv_hat, z_mv_sym, mv_q0, mv_q1, mv_i0, mv_i1) = (
            self.motion_context_model.encode_stage(y_mv, y_mv_ref))

        mv_hat = self.motion_autoencoder.decode(y_mv_hat)
        c1, c2, c3, _ = self.motion_compensation(
            mv_hat, dpb, first_p, need_xwarp=False)

        y = self.contextual_encoder(x_cur, c1, c2, c3)
        y_ref = None if first_p else dpb["y_ref"]
        (y_hat, z_sym, fr_q0, fr_q1, fr_i0, fr_i1) = (
            self.frame_context_model.encode_stage(y, y_ref, extra=c3))

        x_rec_feature = self.contextual_decoder(y_hat, c2, c3)
        feature, x_rec = self.recon_generation_net(x_rec_feature, c1)
        x_rec = jnp.clip(x_rec, 0.0, 1.0)

        new_dpb = {
            "x_ref": x_rec,
            "feature_ref": feature,
            "y_ref": y_hat,
            "y_mv_ref": y_mv_hat,
        }
        return {
            "motion": {"z_sym": z_mv_sym, "q0": mv_q0, "q1": mv_q1,
                       "i0": mv_i0, "i1": mv_i1},
            "frame": {"z_sym": z_sym, "q0": fr_q0, "q1": fr_q1,
                      "i0": fr_i0, "i1": fr_i1},
            "dpb": new_dpb,
        }

    # Encoder-only stages for the bit-exact codec path (eval/codec.py). All
    # prior/means computation happens in the *decoder* stages below, which
    # the encoder invokes on the same compiled programs — these methods only
    # run analysis transforms and integer symbol extraction.

    def encode_motion_latent(self, x_cur, dpb):
        mv = self._estimate_flow(x_cur, dpb["x_ref"])
        return self.motion_autoencoder.encode(mv)

    def encode_motion(self, x_cur, dpb):
        """Fused: flow + motion analysis + z symbols (one program)."""
        y_mv = self.encode_motion_latent(x_cur, dpb)
        return y_mv, self.motion_context_model.encode_z_symbols(y_mv)

    def encode_frame(self, x_cur, c1, c2, c3):
        """Fused: contextual analysis + z symbols (one program)."""
        y = self.contextual_encoder(x_cur, c1, c2, c3)
        return y, self.frame_context_model.encode_z_symbols(y)

    def encode_motion_z(self, y_mv):
        return self.motion_context_model.encode_z_symbols(y_mv)

    def encode_motion_anchors(self, y_mv, means):
        return self.motion_context_model.encode_anchor_symbols(y_mv, means)

    def encode_motion_nonanchors(self, y_mv, nm_0, nm_1):
        return self.motion_context_model.encode_nonanchor_symbols(
            y_mv, nm_0, nm_1)

    def encode_frame_latent(self, x_cur, c1, c2, c3):
        return self.contextual_encoder(x_cur, c1, c2, c3)

    def encode_frame_z(self, y):
        return self.frame_context_model.encode_z_symbols(y)

    def encode_frame_anchors(self, y, means):
        return self.frame_context_model.encode_anchor_symbols(y, means)

    def encode_frame_nonanchors(self, y, nm_0, nm_1):
        return self.frame_context_model.encode_nonanchor_symbols(
            y, nm_0, nm_1)

    def decode_motion_prior(self, z_mv_sym, dpb, first_p: bool):
        z_hat = self.motion_context_model.z_dequant(z_mv_sym)
        y_mv_ref = None if first_p else dpb["y_mv_ref"]
        means, scales = self.motion_context_model.decode_prior_stage(
            z_hat, y_mv_ref)
        idx_r0 = self.motion_context_model.decode_anchor_indexes(scales)
        return means, scales, idx_r0

    def decode_motion_spatial(self, y_quant_r0, means, scales):
        return self.motion_context_model.decode_nonanchor_stage(
            y_quant_r0, means, scales)


    def decode_contexts(self, y_mv_hat, dpb, first_p: bool):
        """Motion decode -> warped contexts (device stage between streams)."""
        mv_hat = self.motion_autoencoder.decode(y_mv_hat)
        return self.motion_compensation(mv_hat, dpb, first_p,
                                        need_xwarp=not self.cfg.warp_ctx_half)

    def decode_motion_combine_contexts(
        self, yh_00, yh_11, nm_0, nm_1, y_quant_r1, dpb, first_p: bool
    ):
        """Fused: fold motion streams + motion decode + context mining."""
        y_mv_hat = self.motion_context_model.decode_combine_stage(
            yh_00, yh_11, nm_0, nm_1, y_quant_r1)
        c1, c2, c3, x_warp = self.decode_contexts(y_mv_hat, dpb, first_p)
        return y_mv_hat, c1, c2, c3, x_warp

    def decode_frame_reconstruct(
        self, fh_00, fh_11, fm_0, fm_1, y_quant_r1, y_mv_hat, c1, c2, c3
    ):
        """Fused: fold frame streams + synthesis + recon -> (x_rec, dpb)."""
        y_hat = self.frame_context_model.decode_combine_stage(
            fh_00, fh_11, fm_0, fm_1, y_quant_r1)
        return self.decode_reconstruct(y_hat, y_mv_hat, c1, c2, c3)

    def decode_frame_prior(self, z_sym, dpb, context3, first_p: bool):
        z_hat = self.frame_context_model.z_dequant(z_sym)
        y_ref = None if first_p else dpb["y_ref"]
        means, scales = self.frame_context_model.decode_prior_stage(
            z_hat, y_ref, extra=context3)
        idx_r0 = self.frame_context_model.decode_anchor_indexes(scales)
        return means, scales, idx_r0

    def decode_frame_spatial(self, y_quant_r0, means, scales):
        return self.frame_context_model.decode_nonanchor_stage(
            y_quant_r0, means, scales)


    def decode_reconstruct(self, y_hat, y_mv_hat, c1, c2, c3):
        """Final device stage: synthesis + recon, returns (x_rec, new_dpb)."""
        x_rec_feature = self.contextual_decoder(y_hat, c2, c3)
        feature, x_rec = self.recon_generation_net(x_rec_feature, c1)
        x_rec = jnp.clip(x_rec, 0.0, 1.0)
        new_dpb = {
            "x_ref": x_rec,
            "feature_ref": feature,
            "y_ref": y_hat,
            "y_mv_ref": y_mv_hat,
        }
        return x_rec, new_dpb

    def aux_loss(self):
        return (self.motion_context_model.aux_loss()
                + self.frame_context_model.aux_loss())
