"""Composite-module golden tests against the ACTUAL reference modules.

tests/test_golden.py pins the primitive layer vocabulary (conv padding,
subpel order, GDN) against hand-built torch; these tests go one level up:
they import the reference's own module definitions
(/root/reference/dmc/models/layers.py — torch-only imports — and the
pure-torch blocks of video_model.py via a compressai stub), transfer the
torch weights into the flax counterparts, and assert output parity. This
is the guard against silent architecture drift at the composition level
(block order, concat order, activation slopes, shortcut wiring).

The reference tree is read-only upstream content: it is loaded as data
(module objects to run), never copied.
"""

import importlib.machinery
import importlib.util
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

import deepvideocodec_tpu.models.layers as L
import deepvideocodec_tpu.models.dmc as D

KEY = jax.random.PRNGKey(0)
REF = "/root/reference/dmc/models"


# ---------------------------------------------------------------- loading

def _ensure_compressai_stub():
    """video_model.py imports compressai entropy models at module scope;
    the pure-torch transform blocks under test never touch them, so a
    bare stub satisfies the import."""
    if "compressai" in sys.modules:
        return
    pkg = types.ModuleType("compressai")
    em = types.ModuleType("compressai.entropy_models")

    class _Stub:  # never instantiated by these tests
        def __init__(self, *a, **k):
            raise RuntimeError("compressai stub: not constructible")

    em.EntropyBottleneck = _Stub
    em.GaussianConditional = _Stub
    pkg.entropy_models = em
    sys.modules["compressai"] = pkg
    sys.modules["compressai.entropy_models"] = em


def _load(name: str):
    """Load /root/reference/dmc/models/<name>.py as refmodels.<name>,
    resolving its relative imports inside a synthetic package."""
    pkg = "refmodels"
    if pkg not in sys.modules:
        spec = importlib.machinery.ModuleSpec(pkg, None, is_package=True)
        mod = importlib.util.module_from_spec(spec)
        mod.__path__ = [REF]
        sys.modules[pkg] = mod
    full = f"{pkg}.{name}"
    if full in sys.modules:
        return sys.modules[full]
    _ensure_compressai_stub()
    # relative imports (.utils, .base_model, .layers) resolve recursively
    for dep in {"utils": (), "base_model": ("utils",),
                "layers": (), "video_model": ("utils", "base_model",
                                              "layers")}.get(name, ()):
        _load(dep)
    spec = importlib.util.spec_from_file_location(full, f"{REF}/{name}.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules[full] = m
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def ref_layers():
    return _load("layers")


@pytest.fixture(scope="module")
def ref_video(ref_layers):
    return _load("video_model")


# ------------------------------------------------------- weight transfer

def _k(conv2d):
    """torch Conv2d OIHW -> flax HWIO."""
    return np.asarray(conv2d.weight.detach().numpy().transpose(2, 3, 1, 0))


def _b(conv2d):
    return np.asarray(conv2d.bias.detach().numpy())


def _conv(m):
    return {"kernel": _k(m), "bias": _b(m)}


def _resblock(m):
    return {"Conv_0": _conv(m.conv1), "Conv_1": _conv(m.conv2)}


def _res_stride(m):
    out = {"Conv_0": _conv(m.conv1), "Conv_1": _conv(m.conv2)}
    if m.downsample is not None:
        out["Conv_2"] = _conv(m.downsample)
    return out


def _res_upsample(m):
    return {
        "up_kernel": _k(m.subpel_conv[0]),
        "up_bias": _b(m.subpel_conv[0]),
        "sc_kernel": _k(m.upsample[0]),
        "sc_bias": _b(m.upsample[0]),
        "Conv_0": _conv(m.conv),
    }


def _subpel(seq):
    """torch subpel_conv1x1/3x3 Sequential(conv, PixelShuffle)."""
    return {"Conv_0": _conv(seq[0])}


def _mebasic(m):
    out = {}
    for i, c in enumerate((m.conv1, m.conv2, m.conv3, m.conv4, m.conv5)):
        out[f"conv{i}_kernel"] = _k(c)
        out[f"conv{i}_bias"] = _b(c)
    return out


def _se(m):
    # torch Linear weight is (out, in); flax Dense kernel is (in, out)
    return {
        "Dense_0": {"kernel": np.asarray(
            m.fc[0].weight.detach().numpy().T)},
        "Dense_1": {"kernel": np.asarray(
            m.fc[2].weight.detach().numpy().T)},
    }


def _conv_block_residual(m):
    return {
        "conv1_kernel": _k(m.conv[0]),
        "conv1_bias": _b(m.conv[0]),
        "conv2_kernel": _k(m.conv[2]),
        "conv2_bias": _b(m.conv[2]),
        "SELayer_0": _se(m.conv[3]),
        "shortcut_kernel": _k(m.up_dim),
        "shortcut_bias": _b(m.up_dim),
    }


def _unet(m):
    return {
        "ConvBlockResidual_0": _conv_block_residual(m.conv1),
        "ConvBlockResidual_1": _conv_block_residual(m.conv2),
        "ConvBlockResidual_2": _conv_block_residual(m.conv3),
        **{f"ResBlock_{i}": _resblock(m.context_refine[i])
           for i in range(4)},
        "SubpelConv_0": _subpel(m.up3),
        "ConvBlockResidual_3": _conv_block_residual(m.up_conv3),
        "SubpelConv_1": _subpel(m.up2),
        "ConvBlockResidual_4": _conv_block_residual(m.up_conv2),
    }


def _spynet(m):
    return {f"level_{i}": _mebasic(m.moduleBasic[i]) for i in range(4)}


def _enc(seq):
    """reference get_enc_dec_models encoder Sequential."""
    return {
        "enc_blocks_0": _res_stride(seq[0]),
        "enc_blocks_1": _resblock(seq[1]),
        "enc_blocks_2": _res_stride(seq[2]),
        "enc_blocks_3": _resblock(seq[3]),
        "enc_blocks_4": _res_stride(seq[4]),
        "enc_blocks_5": _resblock(seq[5]),
        "enc_final": _conv(seq[6]),
    }


def _dec(seq):
    return {
        "dec_blocks_0": _resblock(seq[0]),
        "dec_blocks_1": _res_upsample(seq[1]),
        "dec_blocks_2": _resblock(seq[2]),
        "dec_blocks_3": _res_upsample(seq[3]),
        "dec_blocks_4": _resblock(seq[4]),
        "dec_blocks_5": _res_upsample(seq[5]),
        "dec_blocks_6": _resblock(seq[6]),
        "dec_final": _subpel(seq[7]),
    }


def _hyper_enc(seq):
    return {f"Conv_{i}": _conv(seq[2 * i]) for i in range(5)}


def _hyper_dec(seq):
    return {
        "Conv_0": _conv(seq[0]),
        "SubpelConv_0": _subpel(seq[2]),
        "Conv_1": _conv(seq[4]),
        "SubpelConv_1": _subpel(seq[6]),
        "Conv_2": _conv(seq[8]),
    }


# ----------------------------------------------------------------- utils

def nchw(x):
    return torch.from_numpy(
        np.asarray(x).transpose(0, 3, 1, 2)).contiguous()


def to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def assert_close(got, ref_nchw, atol=1e-4):
    np.testing.assert_allclose(
        np.asarray(got), to_nhwc(ref_nchw), rtol=1e-4, atol=atol)


# ----------------------------------------------------------------- tests

def test_me_spynet_parity(rng, ref_layers):
    """ME_Spynet (layers.py:236-264) vs SpyNet under transferred weights."""
    torch.manual_seed(0)
    tm = ref_layers.ME_Spynet().eval()
    im1 = rng.random((1, 64, 64, 3), np.float32)
    im2 = rng.random((1, 64, 64, 3), np.float32)
    with torch.no_grad():
        ref = tm(nchw(im1), nchw(im2))
    fm = L.SpyNet()
    out = fm.apply({"params": _spynet(tm)}, jnp.asarray(im1),
                   jnp.asarray(im2))
    assert_close(out, ref)


def test_unet_parity(rng, ref_layers):
    """UNet (layers.py:300-341) incl. SE gates, fused-entry conv blocks."""
    torch.manual_seed(1)
    tm = ref_layers.UNet(64, 64).eval()
    x = rng.random((1, 16, 16, 64), np.float32)
    with torch.no_grad():
        ref = tm(nchw(x))
    out = L.UNet(64, 32).apply({"params": _unet(tm)}, jnp.asarray(x))
    assert_close(out, ref)


def test_motion_autoencoder_parity(rng, ref_layers):
    """get_enc_dec_models(2, 2, 64) (layers.py:344-366) vs AutoEncoder."""
    torch.manual_seed(2)
    enc, dec = ref_layers.get_enc_dec_models(2, 2, 64)
    enc, dec = enc.eval(), dec.eval()
    mv = (rng.random((1, 32, 32, 2), np.float32) - 0.5) * 4
    with torch.no_grad():
        y_ref = enc(nchw(mv))
        x_ref = dec(y_ref)
    fm = L.AutoEncoder(out_channels=2, channels=64)
    params = {"params": {**_enc(enc), **_dec(dec)}}
    y = fm.apply(params, jnp.asarray(mv), method=fm.encode)
    assert_close(y, y_ref)
    x = fm.apply(params, y, method=fm.decode)
    assert_close(x, x_ref)


def test_hyper_enc_dec_parity(rng, ref_layers):
    """get_hyper_enc_dec_models(64, 64) (layers.py:369-393)."""
    torch.manual_seed(3)
    enc, dec = ref_layers.get_hyper_enc_dec_models(64, 64)
    enc, dec = enc.eval(), dec.eval()
    y = rng.random((1, 16, 16, 64), np.float32)
    with torch.no_grad():
        z_ref = enc(nchw(y))
        p_ref = dec(z_ref)
    z = L.HyperEncoder(64).apply(
        {"params": _hyper_enc(enc)}, jnp.asarray(y))
    assert_close(z, z_ref)
    p = L.HyperDecoder(64).apply({"params": _hyper_dec(dec)}, z)
    assert_close(p, p_ref)


class TestVideoModelBlocks:
    """Pure-torch transform blocks of video_model.py (:15-125), imported
    through the compressai stub and weight-transferred."""

    def test_feature_extractor(self, rng, ref_video):
        torch.manual_seed(4)
        tm = ref_video.FeatureExtractor(64).eval()
        x = rng.random((1, 16, 16, 64), np.float32)
        with torch.no_grad():
            r1, r2, r3 = tm(nchw(x))
        params = {
            "Conv_0": _conv(tm.conv1), "ResBlock_0": _resblock(
                tm.res_block1),
            "Conv_1": _conv(tm.conv2), "ResBlock_1": _resblock(
                tm.res_block2),
            "Conv_2": _conv(tm.conv3), "ResBlock_2": _resblock(
                tm.res_block3),
        }
        l1, l2, l3 = D.FeatureExtractor(64).apply(
            {"params": params}, jnp.asarray(x))
        for got, ref in ((l1, r1), (l2, r2), (l3, r3)):
            assert_close(got, ref)

    def test_context_fusion(self, rng, ref_video):
        torch.manual_seed(5)
        tm = ref_video.MultiScaleContextFusion(64, 64).eval()
        c1 = rng.random((1, 16, 16, 64), np.float32)
        c2 = rng.random((1, 8, 8, 64), np.float32)
        c3 = rng.random((1, 4, 4, 64), np.float32)
        with torch.no_grad():
            r1, r2, r3 = tm(nchw(c1), nchw(c2), nchw(c3))
        params = {
            "SubpelConv_0": _subpel(tm.conv3_up),
            "ResBlock_0": _resblock(tm.res_block3_up),
            "Conv_0": _conv(tm.conv3_out),
            "ResBlock_1": _resblock(tm.res_block3_out),
            "SubpelConv_1": _subpel(tm.conv2_up),
            "ResBlock_2": _resblock(tm.res_block2_up),
            "Conv_1": _conv(tm.conv2_out),
            "ResBlock_3": _resblock(tm.res_block2_out),
            "Conv_2": _conv(tm.conv1_out),
            "ResBlock_4": _resblock(tm.res_block1_out),
        }
        f1, f2, f3 = D.MultiScaleContextFusion(64).apply(
            {"params": params}, jnp.asarray(c1), jnp.asarray(c2),
            jnp.asarray(c3))
        for got, ref in ((f1, r1), (f2, r2), (f3, r3)):
            assert_close(got, ref)

    def test_contextual_encoder(self, rng, ref_video):
        torch.manual_seed(6)
        tm = ref_video.ContextualEncoder(64, 96).eval()
        x = rng.random((1, 16, 16, 3), np.float32)
        c1 = rng.random((1, 16, 16, 64), np.float32)
        c2 = rng.random((1, 8, 8, 64), np.float32)
        c3 = rng.random((1, 4, 4, 64), np.float32)
        with torch.no_grad():
            ref = tm(nchw(x), nchw(c1), nchw(c2), nchw(c3))
        params = {
            "Conv_0": _conv(tm.conv1), "ResBlock_0": _resblock(tm.res1),
            "Conv_1": _conv(tm.conv2), "ResBlock_1": _resblock(tm.res2),
            "Conv_2": _conv(tm.conv3), "Conv_3": _conv(tm.conv4),
        }
        y = D.ContextualEncoder(64, 96).apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(c1),
            jnp.asarray(c2), jnp.asarray(c3))
        assert_close(y, ref)

    def test_contextual_decoder(self, rng, ref_video):
        torch.manual_seed(7)
        tm = ref_video.ContextualDecoder(64, 96).eval()
        y = rng.random((1, 1, 1, 96), np.float32)
        c2 = rng.random((1, 8, 8, 64), np.float32)
        c3 = rng.random((1, 4, 4, 64), np.float32)
        with torch.no_grad():
            ref = tm(nchw(y), nchw(c2), nchw(c3))
        params = {
            "SubpelConv_0": _subpel(tm.up1),
            "SubpelConv_1": _subpel(tm.up2),
            "ResBlock_0": _resblock(tm.res1),
            "SubpelConv_2": _subpel(tm.up3),
            "ResBlock_1": _resblock(tm.res2),
            "SubpelConv_3": _subpel(tm.up4),
        }
        out = D.ContextualDecoder(64, 96).apply(
            {"params": params}, jnp.asarray(y), jnp.asarray(c2),
            jnp.asarray(c3))
        assert_close(out, ref)

    def test_recon_generation(self, rng, ref_video):
        torch.manual_seed(8)
        tm = ref_video.ReconGeneration(64, 32, 64).eval()
        res = rng.random((1, 16, 16, 32), np.float32)
        ctx = rng.random((1, 16, 16, 64), np.float32)
        with torch.no_grad():
            # reference call site passes x_rec_feature FIRST
            # (video_model.py:575: forward(ctx=res_feature, res=context))
            feat_ref, rec_ref = tm(nchw(res), nchw(ctx))
        params = {
            "Conv_0": _conv(tm.first_conv),
            "UNet_0": _unet(tm.unet_1),
            "UNet_1": _unet(tm.unet_2),
            "Conv_1": _conv(tm.recon_conv),
        }
        feat, rec = D.ReconGeneration(64, 32).apply(
            {"params": params}, jnp.asarray(res), jnp.asarray(ctx))
        assert_close(feat, feat_ref)
        assert_close(rec, rec_ref)
