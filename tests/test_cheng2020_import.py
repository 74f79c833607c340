"""cheng2020_anchor transform import: layout + output parity.

The reference consumes compressai's pretrained cheng2020_anchor as its
frozen I-frame codec (/root/reference/dmc/train.py:564-569). compressai
is not installed here, so these tests hand-build torch modules with the
PUBLISHED cheng2020 architecture and compressai's exact state-dict
attribute names (conv1/conv2/gdn/skip, subpel_conv/igdn/upsample,
Sequential indices), then assert that tools.import_cheng2020_transforms
maps those weights onto models.intra.Cheng2020CheckerboardCodec with
output parity per transform — the same oracle style as
tests/test_golden.py uses for the layer vocabulary.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from test_golden_modules import _ensure_compressai_stub, nchw, to_nhwc

from deepvideocodec_tpu.models import Cheng2020CheckerboardCodec, fast_init
from deepvideocodec_tpu.tools import import_cheng2020_transforms, merge_params

N = 32  # small width: same topology, CPU-friendly
_PED = 2.0 ** -18


def conv3x3(i, o, s=1):
    return tnn.Conv2d(i, o, 3, stride=s, padding=1)


def conv1x1(i, o, s=1):
    return tnn.Conv2d(i, o, 1, stride=s)


def subpel3(i, o, r=2):
    return tnn.Sequential(tnn.Conv2d(i, o * r * r, 3, padding=1),
                          tnn.PixelShuffle(r))


class TGDN(tnn.Module):
    """compressai GDN: sqrt-reparameterized beta/gamma, 1x1-conv mix."""

    def __init__(self, c, inverse=False):
        super().__init__()
        self.inverse = inverse
        g = torch.Generator().manual_seed(c + int(inverse))
        # random but positive-definite-ish values; NON-symmetric gamma so
        # a missing transpose in the importer cannot pass silently
        self.beta = tnn.Parameter(
            torch.sqrt(1.0 + 0.5 * torch.rand(c, generator=g) + _PED))
        self.gamma = tnn.Parameter(torch.sqrt(
            0.1 * torch.eye(c) + 0.05 * torch.rand(c, c, generator=g)
            + _PED))

    def forward(self, x):
        beta = torch.clamp(self.beta, min=(1e-6 + _PED) ** 0.5) ** 2 - _PED
        gamma = torch.clamp(self.gamma, min=_PED ** 0.5) ** 2 - _PED
        c = x.shape[1]
        norm = F.conv2d(x * x, gamma.view(c, c, 1, 1), beta)
        norm = torch.sqrt(norm)
        return x * norm if self.inverse else x / norm


class TRBS(tnn.Module):
    def __init__(self, i, o, s=2):
        super().__init__()
        self.conv1 = conv3x3(i, o, s)
        self.conv2 = conv3x3(o, o)
        self.gdn = TGDN(o)
        self.skip = conv1x1(i, o, s)

    def forward(self, x):
        out = F.leaky_relu(self.conv1(x), 0.01)
        out = self.gdn(self.conv2(out))
        return out + self.skip(x)


class TRB(tnn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.conv1 = conv3x3(i, o)
        self.conv2 = conv3x3(o, o)

    def forward(self, x):
        out = F.leaky_relu(self.conv1(x), 0.01)
        out = F.leaky_relu(self.conv2(out), 0.01)
        return out + x


class TRBU(tnn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.subpel_conv = subpel3(i, o)
        self.conv = conv3x3(o, o)
        self.igdn = TGDN(o, inverse=True)
        self.upsample = subpel3(i, o)

    def forward(self, x):
        out = F.leaky_relu(self.subpel_conv(x), 0.01)
        out = self.igdn(self.conv(out))
        return out + self.upsample(x)


class TCheng(tnn.Module):
    """cheng2020_anchor module/key layout (g_a/g_s/h_a/h_s + bottleneck)."""

    def __init__(self, n=N):
        super().__init__()
        _ensure_compressai_stub()
        import compressai.entropy_models as em

        lr = tnn.LeakyReLU(0.01)
        self.g_a = tnn.Sequential(
            TRBS(3, n), TRB(n, n), TRBS(n, n), TRB(n, n), TRBS(n, n),
            TRB(n, n), conv3x3(n, n, 2))
        self.g_s = tnn.Sequential(
            TRB(n, n), TRBU(n, n), TRB(n, n), TRBU(n, n), TRB(n, n),
            TRBU(n, n), TRB(n, n), subpel3(n, 3))
        self.h_a = tnn.Sequential(
            conv3x3(n, n), lr, conv3x3(n, n), lr, conv3x3(n, n, 2), lr,
            conv3x3(n, n), lr, conv3x3(n, n, 2))
        self.h_s = tnn.Sequential(
            conv3x3(n, n), lr, subpel3(n, n), lr,
            conv3x3(n, n * 3 // 2), lr, subpel3(n * 3 // 2, n * 3 // 2),
            lr, conv3x3(n * 3 // 2, n * 2))
        self.entropy_bottleneck = em.EntropyBottleneck(n)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(3)
    tm = TCheng().eval()
    fm = Cheng2020CheckerboardCodec(n=N)
    variables = fast_init(fm, jax.random.PRNGKey(0))
    merged = merge_params(variables, import_cheng2020_transforms(
        tm.state_dict()))
    return tm, fm, merged


def _sub(fm, merged, fn, x):
    return fm.apply(merged, x, method=fn)


def test_analysis_parity(rng, pair):
    tm, fm, merged = pair
    x = rng.random((1, 32, 32, 3), np.float32)
    with torch.no_grad():
        ref = tm.g_a(nchw(x))
    got = _sub(fm, merged, lambda m, v: m.g_a(v), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref),
                               rtol=1e-4, atol=1e-4)


def test_synthesis_parity(rng, pair):
    tm, fm, merged = pair
    y = (rng.random((1, 4, 4, N), np.float32) - 0.5)
    with torch.no_grad():
        ref = tm.g_s(nchw(y))
    got = _sub(fm, merged, lambda m, v: m.g_s(v), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref),
                               rtol=1e-4, atol=1e-4)


def test_hyper_parity(rng, pair):
    tm, fm, merged = pair
    y = (rng.random((1, 8, 8, N), np.float32) - 0.5)
    with torch.no_grad():
        z_ref = tm.h_a(nchw(y))
        p_ref = tm.h_s(z_ref)
    z = _sub(fm, merged, lambda m, v: m.context_model.hyper_encoder(v),
             jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(z), to_nhwc(z_ref),
                               rtol=1e-4, atol=1e-4)
    p = _sub(fm, merged, lambda m, v: m.context_model.hyper_decoder(v),
             jnp.asarray(np.asarray(z)))
    np.testing.assert_allclose(np.asarray(p), to_nhwc(p_ref),
                               rtol=1e-4, atol=2e-4)


def test_merged_model_runs_end_to_end(rng, pair):
    """The merged tree (imported transforms + init checkerboard head)
    drives the full codec forward — the fine-tune starting point."""
    _, fm, merged = pair
    # 64^2: y sits at /16 (4x4) so the hyper's /4 + x4 round-trips cleanly
    x = rng.random((1, 64, 64, 3), np.float32)
    out = fm.apply(merged, jnp.asarray(x), training=False)
    assert out["x_hat"].shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out["x_hat"])).all()
    for lk in out["likelihoods"].values():
        a = np.asarray(lk)
        assert np.isfinite(a).all() and (a > 0).all()


def test_import_rejects_wrong_width(pair):
    tm, _, _ = pair
    fm = Cheng2020CheckerboardCodec(n=N * 2)
    variables = fast_init(fm, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="shape"):
        merge_params(variables, import_cheng2020_transforms(
            tm.state_dict()))

def test_cli_import_and_head_finetune(pair, tmp_path, monkeypatch):
    """End-to-end surface test: cli.import_torch --kind cheng2020 writes a
    merged npz, and cli.train_intra -m cheng2020 --init-from --init-partial
    warm-starts and trains one epoch on it (the pretrained-I-frame flow the
    reference gets from compressai, /root/reference/dmc/train.py:564-569)."""
    from PIL import Image

    from deepvideocodec_tpu.cli import import_torch as import_cli
    from deepvideocodec_tpu.cli import train_intra as train_cli

    tm, fm, merged = pair
    ckpt = tmp_path / "cheng2020_anchor.pth.tar"
    torch.save({"state_dict": tm.state_dict()}, ckpt)
    out = tmp_path / "cheng.npz"
    import_cli.main([str(ckpt), str(out), "--kind", "cheng2020",
                     "--n-channels", str(N)])
    assert out.exists()

    # imported transform leaf survives the npz round trip (f16 storage)
    from deepvideocodec_tpu.utils import restore_npz_export

    target = fast_init(fm, jax.random.PRNGKey(0))
    restored = restore_npz_export(str(out), target)
    got = restored["params"]["g_a"]["Conv_0"]["kernel"]
    want = tm.g_a[6].weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-2)

    # one fine-tune epoch from the merged npz (shapes match the verify
    # recipe's drive so the XLA programs are persistent-cache warm)
    rng_img = np.random.default_rng(7)
    for split, n_img in (("train", 4), ("test", 2)):
        d = tmp_path / "images" / split
        d.mkdir(parents=True)
        for i in range(n_img):
            arr = (rng_img.random((96, 96, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"im{i}.png")
    # checkpoints land cwd-relative under checkpoints/intra_<model>/<lmbda>
    monkeypatch.chdir(tmp_path)
    train_cli.main([
        "-d", str(tmp_path / "images"), "-m", "cheng2020",
        "--n-channels", str(N), "--init-from", str(out), "--init-partial",
        "--batch-size", "2", "-e", "1", "--patch-size", "64", "64",
        "--num-workers", "0", "--name", "t"])
    exports = list((tmp_path / "checkpoints").glob(
        "intra_cheng2020/*/params_export"))
    assert exports, "fine-tune epoch must write a best-params export"
