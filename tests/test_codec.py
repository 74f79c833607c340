"""Bit-exact codec round-trip tests — the all-or-nothing correctness core.

Validates SURVEY.md hard part #1: the encoder drives the decoder's compiled
programs, so the DPB the encoder propagates must equal what the standalone
decoder reconstructs from the bytes, bit for bit, across multiple P-frames.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepvideocodec_tpu.models import (
    DMC, DMCConfig, CheckerboardImageCodec, fast_init)
from deepvideocodec_tpu.models.dmc import empty_dpb
from deepvideocodec_tpu.eval.codec import DmcCodec, IntraCodec
from deepvideocodec_tpu.eval.evaluator import evaluate_video

KEY = jax.random.PRNGKey(7)
SMALL = DMCConfig(ch_mv=16, n=16, m=24, unet_width=16)


def _synthetic_frames(n, h=64, w=64, seed=3):
    """Smooth moving pattern (more codable than white noise)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = rng.random(3).astype(np.float32)
    frames = []
    for t in range(n):
        img = np.stack(
            [
                0.5 + 0.4 * np.sin(2 * np.pi * (xx / 32 + 0.07 * t + b))
                * np.cos(2 * np.pi * (yy / 24 - 0.05 * t))
                for b in base
            ],
            axis=-1,
        )
        frames.append(np.clip(img, 0, 1)[None].astype(np.float32))
    return frames


@pytest.fixture(scope="module")
def dmc_codec():
    model = DMC(cfg=SMALL)
    frames = jax.random.uniform(KEY, (1, 3, 64, 64, 3))
    params = fast_init(model, KEY)
    return DmcCodec(model, params)


@pytest.fixture(scope="module")
def intra_codec():
    model = CheckerboardImageCodec(n=16, m=24)
    img = jax.random.uniform(KEY, (1, 64, 64, 3))
    params = fast_init(model, KEY)
    return IntraCodec(model, params)


class TestIntraRoundTrip:
    def test_compress_decompress_deterministic(self, intra_codec):
        x = _synthetic_frames(1)[0]
        out = intra_codec.compress(jnp.asarray(x))
        assert len(out["strings"]) == 3
        rec1 = np.asarray(intra_codec.decompress(out["strings"],
                                                 out["shape"]))
        rec2 = np.asarray(intra_codec.decompress(out["strings"],
                                                 out["shape"]))
        np.testing.assert_array_equal(rec1, rec2)
        assert rec1.shape == x.shape
        assert np.all(rec1 >= 0) and np.all(rec1 <= 1)

    def test_recompress_same_bytes(self, intra_codec):
        x = jnp.asarray(_synthetic_frames(1)[0])
        o1 = intra_codec.compress(x)
        o2 = intra_codec.compress(x)
        assert all(a == b for a, b in zip(o1["strings"], o2["strings"]))


class TestDmcRoundTrip:
    def test_pframe_bit_exact_dpb(self, dmc_codec):
        frames = _synthetic_frames(3)
        dpb = empty_dpb(1, 64, 64, SMALL)
        dpb["x_ref"] = jnp.asarray(frames[0])

        payload, enc_dpb = dmc_codec.encode_inter(
            jnp.asarray(frames[1]), dpb, first_p=True)
        x_rec, dec_dpb = dmc_codec.decode_inter(
            payload["strings"], payload["shape"], dpb, first_p=True)

        for k in enc_dpb:
            np.testing.assert_array_equal(
                np.asarray(enc_dpb[k]), np.asarray(dec_dpb[k]),
                err_msg=f"DPB field {k} drifted")

        # second P-frame chained on the decoded DPB, non-first path
        payload2, enc_dpb2 = dmc_codec.encode_inter(
            jnp.asarray(frames[2]), dec_dpb, first_p=False)
        _, dec_dpb2 = dmc_codec.decode_inter(
            payload2["strings"], payload2["shape"], dec_dpb, first_p=False)
        for k in enc_dpb2:
            np.testing.assert_array_equal(
                np.asarray(enc_dpb2[k]), np.asarray(dec_dpb2[k]),
                err_msg=f"frame-2 DPB field {k} drifted")

    def test_packed_fetch_matches_per_plane(self, dmc_codec):
        """The single packed uint8 fetch must carry byte-identical planes
        (device bitcast byte order == host numpy little-endian views)."""
        from deepvideocodec_tpu.eval.codec import _host_planes, _np

        frames = _synthetic_frames(2)
        dpb = empty_dpb(1, 64, 64, SMALL)
        dpb["x_ref"] = jnp.asarray(frames[0])
        planes, _ = dmc_codec.encode_device(
            jnp.asarray(frames[1]), dpb, first_p=True)
        assert "packed" in planes
        host = _host_planes(planes)
        for key in ("motion", "frame"):
            for f, a in planes[key].items():
                np.testing.assert_array_equal(
                    host[key][f], _np(a), err_msg=f"{key}/{f} corrupted")

    def test_symbol_plane_dtypes(self, dmc_codec):
        """Link dtype contract: y symbols int16, indexes uint8, z int8."""
        frames = _synthetic_frames(2)
        dpb = empty_dpb(1, 64, 64, SMALL)
        dpb["x_ref"] = jnp.asarray(frames[0])
        planes, _ = dmc_codec.encode_device(
            jnp.asarray(frames[1]), dpb, first_p=True)
        for key in ("motion", "frame"):
            u = planes[key]
            assert u["q0"].dtype == jnp.int16
            assert u["q1"].dtype == jnp.int16
            assert u["i0"].dtype == jnp.uint8
            assert u["i1"].dtype == jnp.uint8
            assert u["z_sym"].dtype == jnp.int8

    def test_stream_sizes_reasonable(self, dmc_codec):
        frames = _synthetic_frames(2)
        dpb = empty_dpb(1, 64, 64, SMALL)
        dpb["x_ref"] = jnp.asarray(frames[0])
        payload, _ = dmc_codec.encode_inter(
            jnp.asarray(frames[1]), dpb, first_p=True)
        total = sum(len(s) for unit in payload["strings"].values()
                    for s in unit)
        assert 0 < total < 64 * 64 * 3  # far below raw size


class TestGopEvaluation:
    def test_evaluate_video_end_to_end(self, dmc_codec, intra_codec,
                                       tmp_path):
        frames = _synthetic_frames(6)
        stats = evaluate_video(
            dmc_codec, intra_codec, frames,
            bits_path=tmp_path / "seq.bits",
            gop=4,
            results_path=tmp_path / "q0.json",
            video_name="synthetic", quality=0,
        )
        assert stats["frames"] == 6
        assert stats["bpp"] > 0
        assert np.isfinite(stats["psnr"])
        assert (tmp_path / "seq.bits").stat().st_size > 0
        import json
        results = json.loads((tmp_path / "q0.json").read_text())
        assert results[0]["video"] == "synthetic"


class TestStandaloneDecode:
    def test_decode_video_matches_inline_recon(self, dmc_codec, intra_codec,
                                               tmp_path):
        """decode_video must rebuild, from bytes alone, exactly the frames
        the evaluator's inline decode produced (true receiver parity)."""
        from deepvideocodec_tpu.eval.evaluator import decode_video

        frames = _synthetic_frames(6)
        evaluate_video(
            dmc_codec, intra_codec, frames,
            bits_path=tmp_path / "seq.bits", gop=4)

        decoded = list(decode_video(
            dmc_codec, intra_codec, tmp_path / "seq.bits", gop=4))
        assert len(decoded) == 6

        # replay the inline decode to get the expected reconstructions
        dpb = None
        for fi, (x, rec) in enumerate(zip(frames, decoded)):
            if fi % 4 == 0:
                out = intra_codec.compress(jnp.asarray(x))
                rec_pad = intra_codec.decompress(out["strings"], out["shape"])
                dpb = dmc_codec.init_dpb(rec_pad)
                first_p = True
            else:
                payload, _ = dmc_codec.encode_inter(
                    jnp.asarray(x), dpb, first_p=first_p)
                rec_pad, dpb = dmc_codec.decode_inter(
                    payload["strings"], payload["shape"], dpb,
                    first_p=first_p)
                first_p = False
            expect = np.clip(np.asarray(rec_pad)[0], 0.0, 1.0)
            np.testing.assert_array_equal(rec, expect,
                                          err_msg=f"frame {fi} drifted")


class TestPipelinedCoding:
    def test_pipelined_matches_serial_bitstream(
            self, dmc_codec, intra_codec, tmp_path):
        """The overlapped schedule must be a pure reordering: identical
        bytes and identical decoded quality vs the serial evaluator."""
        from deepvideocodec_tpu.eval.pipeline import code_sequence_pipelined

        frames = _synthetic_frames(6)
        serial = evaluate_video(
            dmc_codec, intra_codec, frames,
            bits_path=tmp_path / "serial.bits", gop=4)
        piped = code_sequence_pipelined(
            dmc_codec, intra_codec, frames,
            bits_path=tmp_path / "piped.bits", gop=4)
        sb = (tmp_path / "serial.bits").read_bytes()
        pb = (tmp_path / "piped.bits").read_bytes()
        assert sb == pb
        assert abs(serial["psnr"] - piped["psnr"]) < 1e-9
        assert serial["frames"] == piped["frames"] == 6


class TestParallelEvaluation:
    def test_parallel_matches_serial_bitstream(
            self, dmc_codec, intra_codec, tmp_path):
        """evaluate_sequences_parallel must write byte-identical .bits and
        matching metrics vs the serial evaluator (schedule-only change)."""
        from deepvideocodec_tpu.eval.multi import evaluate_sequences_parallel

        def seq(seed):
            return _synthetic_frames(5, seed=seed)

        serial = {}
        for s in (3, 9):
            serial[s] = evaluate_video(
                dmc_codec, intra_codec, seq(s),
                bits_path=tmp_path / f"serial_{s}.bits", gop=4,
                per_frame=True)

        stats = evaluate_sequences_parallel(
            dmc_codec, intra_codec,
            [(f"s{s}", seq(s), tmp_path / f"par_{s}.bits") for s in (3, 9)],
            gop=4, streams=2, per_frame=True)

        for s, st in zip((3, 9), stats):
            assert (tmp_path / f"par_{s}.bits").read_bytes() == \
                (tmp_path / f"serial_{s}.bits").read_bytes()
            assert abs(st["psnr"] - serial[s]["psnr"]) < 1e-9
            assert st["bpp"] == serial[s]["bpp"]
            # --per-frame contract on BOTH schedulers (the streams path
            # silently dropped the flag before r5): identical PSNR
            # trajectories, one wall-time sample per frame
            assert st["psnr_per_frame"] == serial[s]["psnr_per_frame"]
            assert len(st["sec_per_frame"]) == st["frames"]
            assert len(serial[s]["sec_per_frame"]) == serial[s]["frames"]


class TestOddResolution:
    def test_non_multiple_of_64_end_to_end(self, dmc_codec, intra_codec,
                                           tmp_path):
        """Frames that need center padding (reference pad/crop semantics,
        test.py:75-103) must code and measure correctly."""
        frames = _synthetic_frames(4, h=72, w=100)
        stats = evaluate_video(
            dmc_codec, intra_codec, frames,
            bits_path=tmp_path / "odd.bits", gop=4)
        assert stats["frames"] == 4
        # bpp accounted over the TRUE (un-padded) pixel count
        nbits = (tmp_path / "odd.bits").stat().st_size * 8
        assert abs(stats["bpp"] - nbits / (72 * 100 * 4)) < 1e-9
        assert np.isfinite(stats["psnr"])


_VARIANT_FLAGS = {
    "fast": dict(warp_ctx_half=True, flow_half=True),
    "fast2": dict(warp_ctx_half=True, flow_half=True,
                  ctx_lite=True, recon_single_unet=True),
    "fast3": dict(warp_ctx_half=True, flow_half=True,
                  ctx_lite=True, recon_single_unet=True,
                  mv_half_dec=True, ctx_half=True, recon_half=True),
    "fast4": dict(warp_ctx_half=True, flow_half=True,
                  ctx_lite=True, recon_single_unet=True,
                  mv_half_dec=True, ctx_half=True, recon_half=True,
                  feat_half=True),
    "fast5": dict(warp_ctx_half=True, flow_half=True,
                  ctx_lite=True, recon_single_unet=True,
                  mv_half_dec=True, ctx_half=True, recon_half=True,
                  feat_half=True, ctx_slim=True),
    "fast6": dict(warp_ctx_half=True, flow_half=True,
                  ctx_lite=True, recon_single_unet=True,
                  mv_half_dec=True, ctx_half=True, recon_half=True,
                  feat_half=True, ctx_slim=True, flow_quarter=True),
}


@pytest.mark.parametrize("flags", _VARIANT_FLAGS.values(),
                         ids=_VARIANT_FLAGS.keys())
class TestVariantRoundTrip:
    """The speed/RD architecture variants (DMCConfig.warp_ctx_half /
    flow_half / ctx_lite / recon_single_unet) must preserve the codec's
    bit-exact encoder/decoder symmetry — they change the graph, not the
    coding contract."""

    def test_variant_pframe_bit_exact_dpb(self, flags):
        cfg = DMCConfig(ch_mv=16, n=16, m=24, unet_width=16, **flags)
        model = DMC(cfg=cfg)
        params = fast_init(model, KEY)
        codec = DmcCodec(model, params)

        frames = _synthetic_frames(3)
        dpb = empty_dpb(1, 64, 64, cfg)
        dpb["x_ref"] = jnp.asarray(frames[0])

        payload, enc_dpb = codec.encode_inter(
            jnp.asarray(frames[1]), dpb, first_p=True)
        _, dec_dpb = codec.decode_inter(
            payload["strings"], payload["shape"], dpb, first_p=True)
        for k in enc_dpb:
            np.testing.assert_array_equal(
                np.asarray(enc_dpb[k]), np.asarray(dec_dpb[k]),
                err_msg=f"variant DPB field {k} drifted")

        payload2, enc_dpb2 = codec.encode_inter(
            jnp.asarray(frames[2]), dec_dpb, first_p=False)
        _, dec_dpb2 = codec.decode_inter(
            payload2["strings"], payload2["shape"], dec_dpb, first_p=False)
        for k in enc_dpb2:
            np.testing.assert_array_equal(
                np.asarray(enc_dpb2[k]), np.asarray(dec_dpb2[k]),
                err_msg=f"variant frame-2 DPB field {k} drifted")

    def test_variant_training_forward_finite(self, flags):
        cfg = DMCConfig(ch_mv=16, n=16, m=24, unet_width=16, **flags)
        model = DMC(cfg=cfg)
        frames = jax.random.uniform(KEY, (1, 3, 64, 64, 3))
        params = fast_init(model, KEY)
        for flags in ({"motion_pretrain": True}, {}):
            out = model.apply(params, frames, training=True,
                              rngs={"noise": KEY}, **flags)
            assert np.all(np.isfinite(np.asarray(out["x_hat"])))
