"""GOP-parallel coding is bit-identical to the serial evaluator.

GOPs are closed units (fresh I-frame + DPB per GOP — reference protocol,
/root/reference/dmc/test.py:162-172), so fanning GOP chunks out over codec
replicas on different devices must reproduce the serial container byte for
byte and the decoded frames exactly. Runs on the virtual 8-device CPU mesh
(conftest), exercising real cross-device replica placement.
"""

import numpy as np
import jax
import pytest

from deepvideocodec_tpu.models import (
    DMC, DMCConfig, CheckerboardImageCodec, fast_init)
from deepvideocodec_tpu.eval.codec import DmcCodec, IntraCodec
from deepvideocodec_tpu.eval.evaluator import evaluate_video, decode_video
from deepvideocodec_tpu.eval.gop_parallel import (
    replicate_codecs,
    evaluate_video_gop_parallel,
    decode_video_gop_parallel,
    scan_gop_offsets,
)

KEY = jax.random.PRNGKey(7)
SMALL = DMCConfig(ch_mv=16, n=16, m=24, unet_width=16)


def _frames(n, h=64, w=64, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = rng.random(3).astype(np.float32)
    out = []
    for t in range(n):
        img = np.stack(
            [0.5 + 0.4 * np.sin(2 * np.pi * (xx / 32 + 0.07 * t + b))
             * np.cos(2 * np.pi * (yy / 24 - 0.05 * t)) for b in base],
            axis=-1)
        out.append(np.clip(img, 0, 1)[None].astype(np.float32))
    return out


@pytest.fixture(scope="module")
def models_and_params():
    inter = DMC(cfg=SMALL)
    intra = CheckerboardImageCodec(n=16, m=24)
    return (inter, fast_init(inter, KEY),
            intra, fast_init(intra, KEY))


@pytest.fixture(scope="module")
def serial_codecs(models_and_params):
    inter, ip, intra, xp = models_and_params
    return DmcCodec(inter, ip), IntraCodec(intra, xp)


@pytest.fixture(scope="module")
def replicas(models_and_params):
    inter, ip, intra, xp = models_and_params
    assert len(jax.devices()) >= 2, "conftest provides 8 virtual devices"
    return replicate_codecs(inter, ip, intra, xp, jax.devices()[:2])


def test_encode_matches_serial_bytes_and_metrics(
        tmp_path, serial_codecs, replicas):
    frames = _frames(5)
    s = evaluate_video(*serial_codecs, frames, tmp_path / "serial.bits",
                       gop=2, video_name="v", per_frame=True)
    p = evaluate_video_gop_parallel(
        replicas, frames, tmp_path / "par.bits", gop=2, video_name="v",
        per_frame=True)
    assert (tmp_path / "par.bits").read_bytes() == \
        (tmp_path / "serial.bits").read_bytes()
    assert p["psnr_per_frame"] == s["psnr_per_frame"]
    assert p["bpp"] == s["bpp"]
    assert p["frames"] == s["frames"] == 5


def test_scan_gop_offsets_counts(tmp_path, serial_codecs):
    frames = _frames(5)
    evaluate_video(*serial_codecs, frames, tmp_path / "x.bits", gop=2)
    spans = scan_gop_offsets(tmp_path / "x.bits", gop=2)
    assert [n for _, n in spans] == [2, 2, 1]
    assert spans[0][0] == 0
    assert all(spans[i][0] < spans[i + 1][0] for i in range(len(spans) - 1))


def test_parallel_decode_matches_serial(tmp_path, serial_codecs, replicas):
    frames = _frames(5)
    evaluate_video(*serial_codecs, frames, tmp_path / "d.bits", gop=2)
    serial = list(decode_video(*serial_codecs, tmp_path / "d.bits", gop=2,
                               size=(64, 64)))
    par = list(decode_video_gop_parallel(replicas, tmp_path / "d.bits",
                                         gop=2, size=(64, 64)))
    assert len(par) == len(serial) == 5
    for a, b in zip(par, serial):
        np.testing.assert_array_equal(a, b)


def test_shared_replica_single_device(tmp_path, serial_codecs):
    """One chip, two workers sharing one codec object (the single-chip
    overlap mode): still byte-identical."""
    inter, intra = serial_codecs
    shared = [(inter, intra, None), (inter, intra, None)]
    frames = _frames(4)
    s = evaluate_video(inter, intra, frames, tmp_path / "s.bits", gop=2)
    p = evaluate_video_gop_parallel(shared, frames, tmp_path / "p.bits",
                                    gop=2)
    assert (tmp_path / "p.bits").read_bytes() == \
        (tmp_path / "s.bits").read_bytes()
    assert p["psnr"] == s["psnr"]


def test_parallel_decode_early_close(tmp_path, serial_codecs, replicas):
    """Abandoning the generator stops the workers at the next GOP
    boundary (no decoding of GOPs nobody will read, no join hang)."""
    import time

    frames = _frames(6)
    evaluate_video(*serial_codecs, frames, tmp_path / "ec.bits", gop=2)
    serial = list(decode_video(*serial_codecs, tmp_path / "ec.bits",
                               gop=2, size=(64, 64)))
    gen = decode_video_gop_parallel(replicas, tmp_path / "ec.bits",
                                    gop=2, size=(64, 64))
    first = next(gen)
    np.testing.assert_array_equal(first, serial[0])
    t0 = time.time()
    gen.close()
    assert time.time() - t0 < 30, "early close must not hang on workers"


def test_empty_sequence_raises(tmp_path, replicas):
    with pytest.raises(ValueError, match="no frames"):
        evaluate_video_gop_parallel(replicas, [], tmp_path / "e.bits",
                                    gop=2)
