"""Import a reference (PyTorch) DMC checkpoint into this framework.

A user of the reference (/root/reference/dmc) holds trained checkpoints in
`torch.save({'state_dict': DMC().state_dict(), ...})` form (train.py:400-403).
This module converts that state_dict — a flat name->tensor mapping — into the
flax variables tree of `models.dmc.DMC`, so existing trained reference weights
run through this framework's TPU codec path directly (no retraining).

Layout/semantic transforms applied per parameter:

  * Conv2d OIHW -> flax HWIO kernel transpose; Linear (out,in) -> (in,out).
  * The reference's Sequential indices / attribute names (verified against
    /root/reference/dmc/models/video_model.py:469-513 and layers.py) map to
    this package's module names; the composition-level correctness of every
    mapping is pinned by output-parity tests (tests/test_golden_modules.py)
    which push transferred weights through both implementations.
  * compressai `EntropyBottleneck` density params (`_matrix{i}`, `_bias{i}`,
    `_factor{i}`, `quantiles` — several historical key spellings accepted)
    copy 1:1 onto `entropy/factorized.py`'s identically-shaped
    `matrix_{i}`/`bias_{i}`/`factor_{i}`/`quantiles`: both implement the
    same Ballé chain (softplus(matrix) matmul + bias + tanh-gated residual),
    so the values are directly compatible.
  * CDF buffers (`_quantized_cdf`, `_offset`, `_cdf_length`, `scale_table`)
    are intentionally dropped: this framework rebuilds integer CDF tables
    from the density/scale params at codec construction (entropy/cdf.py),
    replacing the reference's update()/update_registered_buffers lifecycle
    (docs/PARITY.md).

The intra codec imports PARTIALLY: the reference delegates I-frames to
compressai's pretrained `cheng2020_anchor` (train.py:564-569). Its
transforms, hyper pair, and bottleneck density import 1:1 into
`models.intra.Cheng2020CheckerboardCodec` (import_cheng2020_transforms);
only the autoregressive context head has no counterpart — this framework
deliberately replaces the O(H*W) raster scan with a two-pass checkerboard
— so the head fine-tunes on top of the imported transforms
(cli.train_intra --init-from --init-partial, with merge_params providing
the merged tree).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np

__all__ = ["import_dmc_state_dict", "load_reference_checkpoint"]


def _np(t) -> np.ndarray:
    """torch.Tensor | array-like -> float32/float64-preserving numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _j(p: str, s: str) -> str:
    """Join a state_dict prefix with a sub-path ('' prefix = top level)."""
    return f"{p}.{s}" if p else s


def _k(sd: Mapping, p: str) -> np.ndarray:
    """Conv2d weight at `p`: OIHW -> HWIO."""
    return _np(sd[_j(p, "weight")]).transpose(2, 3, 1, 0)


def _b(sd: Mapping, p: str) -> np.ndarray:
    return _np(sd[_j(p, "bias")])


def _conv(sd, p):
    return {"kernel": _k(sd, p), "bias": _b(sd, p)}


def _resblock(sd, p):
    return {"Conv_0": _conv(sd, _j(p, "conv1")),
            "Conv_1": _conv(sd, _j(p, "conv2"))}


def _res_stride(sd, p):
    out = {"Conv_0": _conv(sd, _j(p, "conv1")),
           "Conv_1": _conv(sd, _j(p, "conv2"))}
    if _j(p, "downsample.weight") in sd:
        out["Conv_2"] = _conv(sd, _j(p, "downsample"))
    return out


def _res_upsample(sd, p):
    # reference ResidualBlockUpsample: subpel_conv = Sequential(conv1x1, PS),
    # upsample (the shortcut) likewise; our module keeps both 1x1s as
    # separate params and fuses them at apply time (models/layers.py).
    return {
        "up_kernel": _k(sd, _j(p, "subpel_conv.0")),
        "up_bias": _b(sd, _j(p, "subpel_conv.0")),
        "sc_kernel": _k(sd, _j(p, "upsample.0")),
        "sc_bias": _b(sd, _j(p, "upsample.0")),
        "Conv_0": _conv(sd, _j(p, "conv")),
    }


def _subpel(sd, p):
    """subpel_conv1x1/3x3 Sequential(conv, PixelShuffle) -> SubpelConv."""
    return {"Conv_0": _conv(sd, _j(p, "0"))}


def _mebasic(sd, p):
    out: Dict[str, Any] = {}
    for i in range(5):
        out[f"conv{i}_kernel"] = _k(sd, _j(p, f"conv{i + 1}"))
        out[f"conv{i}_bias"] = _b(sd, _j(p, f"conv{i + 1}"))
    return out


def _spynet(sd, p):
    return {f"level_{i}": _mebasic(sd, _j(p, f"moduleBasic.{i}"))
            for i in range(4)}


def _se(sd, p):
    # torch Linear weight is (out, in); flax Dense kernel is (in, out).
    # The reference SELayer's Linears carry no bias (layers.py:267-280).
    return {
        "Dense_0": {"kernel": _np(sd[_j(p, "fc.0.weight")]).T},
        "Dense_1": {"kernel": _np(sd[_j(p, "fc.2.weight")]).T},
    }


def _conv_block_residual(sd, p):
    return {
        "conv1_kernel": _k(sd, _j(p, "conv.0")),
        "conv1_bias": _b(sd, _j(p, "conv.0")),
        "conv2_kernel": _k(sd, _j(p, "conv.2")),
        "conv2_bias": _b(sd, _j(p, "conv.2")),
        "SELayer_0": _se(sd, _j(p, "conv.3")),
        "shortcut_kernel": _k(sd, _j(p, "up_dim")),
        "shortcut_bias": _b(sd, _j(p, "up_dim")),
    }


def _unet(sd, p):
    return {
        "ConvBlockResidual_0": _conv_block_residual(sd, _j(p, "conv1")),
        "ConvBlockResidual_1": _conv_block_residual(sd, _j(p, "conv2")),
        "ConvBlockResidual_2": _conv_block_residual(sd, _j(p, "conv3")),
        **{f"ResBlock_{i}": _resblock(sd, _j(p, f"context_refine.{i}"))
           for i in range(4)},
        "SubpelConv_0": _subpel(sd, _j(p, "up3")),
        "ConvBlockResidual_3": _conv_block_residual(sd, _j(p, "up_conv3")),
        "SubpelConv_1": _subpel(sd, _j(p, "up2")),
        "ConvBlockResidual_4": _conv_block_residual(sd, _j(p, "up_conv2")),
    }


def _autoencoder(sd, enc_p, dec_p):
    """get_enc_dec_models Sequential pair -> AutoEncoder params."""
    return {
        "enc_blocks_0": _res_stride(sd, _j(enc_p, "0")),
        "enc_blocks_1": _resblock(sd, _j(enc_p, "1")),
        "enc_blocks_2": _res_stride(sd, _j(enc_p, "2")),
        "enc_blocks_3": _resblock(sd, _j(enc_p, "3")),
        "enc_blocks_4": _res_stride(sd, _j(enc_p, "4")),
        "enc_blocks_5": _resblock(sd, _j(enc_p, "5")),
        "enc_final": _conv(sd, _j(enc_p, "6")),
        "dec_blocks_0": _resblock(sd, _j(dec_p, "0")),
        "dec_blocks_1": _res_upsample(sd, _j(dec_p, "1")),
        "dec_blocks_2": _resblock(sd, _j(dec_p, "2")),
        "dec_blocks_3": _res_upsample(sd, _j(dec_p, "3")),
        "dec_blocks_4": _resblock(sd, _j(dec_p, "4")),
        "dec_blocks_5": _res_upsample(sd, _j(dec_p, "5")),
        "dec_blocks_6": _resblock(sd, _j(dec_p, "6")),
        "dec_final": _subpel(sd, _j(dec_p, "7")),
    }


def _hyper_enc(sd, p):
    # Sequential(conv, LReLU, conv, LReLU, conv, LReLU, conv, LReLU, conv)
    return {f"Conv_{i}": _conv(sd, _j(p, str(2 * i))) for i in range(5)}


def _hyper_dec(sd, p):
    return {
        "Conv_0": _conv(sd, _j(p, "0")),
        "SubpelConv_0": _subpel(sd, _j(p, "2")),
        "Conv_1": _conv(sd, _j(p, "4")),
        "SubpelConv_1": _subpel(sd, _j(p, "6")),
        "Conv_2": _conv(sd, _j(p, "8")),
    }


def _prior_fusion(sd, p):
    """3-conv Sequential (convs at indices 0/2/4) -> PriorFusion."""
    return {f"Conv_{i}": _conv(sd, _j(p, str(2 * i))) for i in range(3)}


def _temporal_prior(sd, p):
    return {"Conv_0": _conv(sd, _j(p, "0")), "Conv_1": _conv(sd, _j(p, "2"))}


# compressai EntropyBottleneck param key spellings across versions:
# register_parameter(f"_matrix{i}") (1.x), ParameterList variants.
_EB_SPELLINGS = ("_{n}{i}", "_{n}s.{i}", "{n}s.{i}", "_{n}es.{i}", "{n}es.{i}")


def _eb_param(sd, p, name, i):
    for spelling in _EB_SPELLINGS:
        key = _j(p, spelling.format(n=name, i=i))
        if key in sd:
            return _np(sd[key])
    raise KeyError(
        f"EntropyBottleneck param '{name}{i}' not found under '{p}.' "
        f"(tried spellings {_EB_SPELLINGS})")


def _entropy_bottleneck(sd, p, filters: int = 4):
    out: Dict[str, Any] = {"quantiles": _np(sd[_j(p, "quantiles")])}
    for i in range(filters + 1):
        out[f"matrix_{i}"] = _eb_param(sd, p, "matrix", i)
        out[f"bias_{i}"] = _eb_param(sd, p, "bias", i)
        if i < filters:
            out[f"factor_{i}"] = _eb_param(sd, p, "factor", i)
    return out


def _context_model(sd, p, frame: bool):
    out = {
        "hyper_encoder": _hyper_enc(sd, _j(p, "hyper_encoder")),
        "hyper_decoder": _hyper_dec(sd, _j(p, "hyper_decoder")),
        "entropy_bottleneck": _entropy_bottleneck(
            sd, _j(p, "entropy_bottleneck")),
        "y_prior_fusion": _prior_fusion(sd, _j(p, "y_prior_fusion")),
        "y_spatial_prior": _prior_fusion(sd, _j(p, "y_spatial_prior")),
    }
    if frame:
        out["temporal_prior_encoder"] = _temporal_prior(
            sd, _j(p, "temporal_prior_encoder"))
    return out


def _feature_extractor(sd, p):
    return {
        "Conv_0": _conv(sd, _j(p, "conv1")),
        "ResBlock_0": _resblock(sd, _j(p, "res_block1")),
        "Conv_1": _conv(sd, _j(p, "conv2")),
        "ResBlock_1": _resblock(sd, _j(p, "res_block2")),
        "Conv_2": _conv(sd, _j(p, "conv3")),
        "ResBlock_2": _resblock(sd, _j(p, "res_block3")),
    }


def _context_fusion(sd, p):
    return {
        "SubpelConv_0": _subpel(sd, _j(p, "conv3_up")),
        "ResBlock_0": _resblock(sd, _j(p, "res_block3_up")),
        "Conv_0": _conv(sd, _j(p, "conv3_out")),
        "ResBlock_1": _resblock(sd, _j(p, "res_block3_out")),
        "SubpelConv_1": _subpel(sd, _j(p, "conv2_up")),
        "ResBlock_2": _resblock(sd, _j(p, "res_block2_up")),
        "Conv_1": _conv(sd, _j(p, "conv2_out")),
        "ResBlock_3": _resblock(sd, _j(p, "res_block2_out")),
        "Conv_2": _conv(sd, _j(p, "conv1_out")),
        "ResBlock_4": _resblock(sd, _j(p, "res_block1_out")),
    }


def _contextual_encoder(sd, p):
    return {
        "Conv_0": _conv(sd, _j(p, "conv1")),
        "ResBlock_0": _resblock(sd, _j(p, "res1")),
        "Conv_1": _conv(sd, _j(p, "conv2")),
        "ResBlock_1": _resblock(sd, _j(p, "res2")),
        "Conv_2": _conv(sd, _j(p, "conv3")),
        "Conv_3": _conv(sd, _j(p, "conv4")),
    }


def _contextual_decoder(sd, p):
    return {
        "SubpelConv_0": _subpel(sd, _j(p, "up1")),
        "SubpelConv_1": _subpel(sd, _j(p, "up2")),
        "ResBlock_0": _resblock(sd, _j(p, "res1")),
        "SubpelConv_2": _subpel(sd, _j(p, "up3")),
        "ResBlock_1": _resblock(sd, _j(p, "res2")),
        "SubpelConv_3": _subpel(sd, _j(p, "up4")),
    }


def _recon_generation(sd, p):
    return {
        "Conv_0": _conv(sd, _j(p, "first_conv")),
        "UNet_0": _unet(sd, _j(p, "unet_1")),
        "UNet_1": _unet(sd, _j(p, "unet_2")),
        "Conv_1": _conv(sd, _j(p, "recon_conv")),
    }


def import_dmc_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference DMC state_dict -> flax variables {'params': ...} for
    models.dmc.DMC (base topology, unet_width=32 — the reference's).

    Accepts DataParallel checkpoints (leading 'module.' stripped) and the
    train.py save wrapper (pass wrapper['state_dict'] or use
    :func:`load_reference_checkpoint`).
    """
    sd = {re.sub(r"^module\.", "", k): v for k, v in state_dict.items()}
    params = {
        "optic_flow": _spynet(sd, "optic_flow"),
        "motion_autoencoder": _autoencoder(
            sd, "motion_encoder", "motion_decoder"),
        "motion_context_model": _context_model(
            sd, "motion_context_model", frame=False),
        "feature_adaptor_i": _conv(sd, "feature_adaptor_I"),
        "feature_adaptor_p": _conv(sd, "feature_adaptor_P"),
        "feature_extractor": _feature_extractor(sd, "feature_extractor"),
        "context_fusion_net": _context_fusion(sd, "context_fusion_net"),
        "contextual_encoder": _contextual_encoder(sd, "contextual_encoder"),
        "contextual_decoder": _contextual_decoder(sd, "contextual_decoder"),
        "frame_context_model": _context_model(
            sd, "frame_context_model", frame=True),
        "recon_generation_net": _recon_generation(
            sd, "recon_generation_net"),
    }
    return {"params": params}


def _gdn(sd, p):
    """compressai GDN -> models/gdn.GDN params.

    Both sides store the SAME sqrt-reparameterized values (sqrt(v +
    2^-18), squared with a lower bound on use), so beta/gamma copy
    verbatim; gamma transposes because torch's conv2d weight is
    gamma[out=i, in=j] while our einsum contracts gamma[j, i].
    """
    return {"beta": _np(sd[_j(p, "beta")]),
            "gamma": _np(sd[_j(p, "gamma")]).T}


def _cheng_rbs(sd, p):
    """compressai ResidualBlockWithStride (conv-leaky-conv-GDN + skip)."""
    out = {"Conv_0": _conv(sd, _j(p, "conv1")),
           "Conv_1": _conv(sd, _j(p, "conv2")),
           "GDN_0": _gdn(sd, _j(p, "gdn"))}
    for skip in ("skip", "downsample"):  # spelling varies by version
        if _j(p, f"{skip}.weight") in sd:
            out["Conv_2"] = _conv(sd, _j(p, skip))
            return out
    raise KeyError(f"no skip/downsample conv under '{p}.'")


def _cheng_rbu(sd, p):
    """compressai ResidualBlockUpsample (subpel-leaky-conv-IGDN + subpel)."""
    return {"SubpelConv_0": _subpel(sd, _j(p, "subpel_conv")),
            "Conv_0": _conv(sd, _j(p, "conv")),
            "GDN_0": _gdn(sd, _j(p, "igdn")),
            "SubpelConv_1": _subpel(sd, _j(p, "upsample"))}


def import_cheng2020_transforms(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """compressai cheng2020_anchor state_dict -> the importable subtree of
    models.intra.Cheng2020CheckerboardCodec params.

    Imports every tensor that has a 1:1 home: g_a / g_s (GDN residual
    transforms), h_a / h_s (the conv3x3 hyper pair — identical topology
    to the DMC video hyper), and the entropy_bottleneck density. The
    reference consumes exactly this model pretrained
    (/root/reference/dmc/train.py:564-569, test.py:108-110). NOT
    imported (no structural counterpart, by design):
    `context_prediction` (masked-conv autoregressive context — replaced
    by the two-pass checkerboard) and `entropy_parameters` (its fusion
    head, whose input includes the masked-conv features); the
    checkerboard head trains on top of the frozen-importable transforms
    via cli.train_intra --init-from/--init-partial. GaussianConditional
    buffers are CDF tables, rebuilt from params here (entropy/cdf.py).
    """
    sd = {re.sub(r"^module\.", "", k): v for k, v in state_dict.items()}
    g_a: Dict[str, Any] = {}
    for i in range(3):
        g_a[f"ChengResidualBlockWithStride_{i}"] = _cheng_rbs(
            sd, f"g_a.{2 * i}")
        g_a[f"ResidualBlockSimple_{i}"] = _resblock(sd, f"g_a.{2 * i + 1}")
    g_a["Conv_0"] = _conv(sd, "g_a.6")
    g_s: Dict[str, Any] = {}
    for i in range(3):
        g_s[f"ResidualBlockSimple_{i}"] = _resblock(sd, f"g_s.{2 * i}")
        g_s[f"ChengResidualBlockUpsample_{i}"] = _cheng_rbu(
            sd, f"g_s.{2 * i + 1}")
    g_s["ResidualBlockSimple_3"] = _resblock(sd, "g_s.6")
    g_s["SubpelConv_0"] = _subpel(sd, "g_s.7")
    return {"params": {
        "g_a": g_a,
        "g_s": g_s,
        "context_model": {
            "hyper_encoder": _hyper_enc(sd, "h_a"),
            "hyper_decoder": _hyper_dec(sd, "h_s"),
            "entropy_bottleneck": _entropy_bottleneck(
                sd, "entropy_bottleneck"),
        },
    }}


def merge_params(base: Dict[str, Any], imported: Mapping[str, Any],
                 _path: str = "") -> Dict[str, Any]:
    """Deep-merge an imported partial param tree over an init tree.

    Leaves present in `imported` replace `base`'s (shape-checked);
    everything else — e.g. the checkerboard head after a cheng2020
    transform import — keeps its init, ready for fine-tuning.
    """
    out = dict(base)
    for k, v in imported.items():
        path = f"{_path}/{k}"
        if k not in base:
            raise KeyError(f"imported param {path} not in the target tree")
        if isinstance(v, Mapping):
            out[k] = merge_params(base[k], v, path)
        else:
            tgt = np.shape(base[k])
            if tuple(np.shape(v)) != tuple(tgt):
                raise ValueError(
                    f"imported param {path}: shape {np.shape(v)} vs "
                    f"target {tgt}")
            out[k] = np.asarray(v, dtype=np.asarray(base[k]).dtype)
    return out


def load_reference_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference checkpoint file (.pth.tar) and convert.

    Handles both a bare state_dict and the reference train.py wrapper
    {'epoch', 'state_dict', 'loss', 'optimizer', ...} (train.py:400-403).
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    return import_dmc_state_dict(blob)
