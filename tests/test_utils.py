"""Utils tests: metrics, meters, checkpointing round trip."""

import numpy as np
import jax.numpy as jnp
import pytest

from deepvideocodec_tpu.utils import (
    psnr,
    msssim,
    AverageMeter,
    save_checkpoint,
    restore_checkpoint,
    latest_step,
)


class TestMetrics:
    def test_psnr_known_value(self):
        a = np.zeros((1, 8, 8, 3))
        b = np.full((1, 8, 8, 3), 0.1)
        assert abs(psnr(a, b) - 20.0) < 1e-6

    def test_psnr_identical(self):
        a = np.random.default_rng(0).random((1, 8, 8, 3))
        assert psnr(a, a) > 100

    def test_msssim_identity(self, rng):
        a = rng.random((1, 192, 192, 3)).astype(np.float32)
        assert abs(msssim(a, a) - 1.0) < 1e-5

    def test_msssim_orders_quality(self, rng):
        a = rng.random((1, 192, 192, 3)).astype(np.float32)
        slightly = np.clip(a + rng.normal(0, 0.02, a.shape), 0, 1).astype(
            np.float32)
        badly = np.clip(a + rng.normal(0, 0.3, a.shape), 0, 1).astype(
            np.float32)
        assert msssim(a, slightly) > msssim(a, badly)


class TestAverageMeter:
    def test_running_average(self):
        m = AverageMeter()
        m.update(1.0)
        m.update(3.0)
        assert m.avg == 2.0
        m.update(5.0, n=2)
        assert abs(m.avg - (1 + 3 + 10) / 4) < 1e-9


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        state = {"params": {"w": jnp.arange(4.0)}, "step": jnp.int32(7)}
        save_checkpoint(tmp_path, 7, state, metrics={"loss": 1.5},
                        is_best=True)
        assert latest_step(tmp_path) == 7
        target = {"params": {"w": jnp.zeros(4)}, "step": jnp.int32(0)}
        restored = restore_checkpoint(tmp_path, 7, target)
        np.testing.assert_array_equal(
            np.asarray(restored["params"]["w"]), np.arange(4.0))
        assert int(restored["step"]) == 7
        assert (tmp_path / "best.json").is_file()


class TestBjontegaard:
    def test_identical_curves_zero(self):
        from deepvideocodec_tpu.eval.bdrate import bd_rate, bd_psnr

        r = [0.1, 0.2, 0.4, 0.8]
        p = [30.0, 33.0, 36.0, 39.0]
        assert abs(bd_rate(r, p, r, p)) < 1e-9
        assert abs(bd_psnr(r, p, r, p)) < 1e-9

    def test_halved_rate_is_minus_fifty(self):
        from deepvideocodec_tpu.eval.bdrate import bd_rate, bd_psnr

        r = [0.1, 0.2, 0.4, 0.8]
        p = [30.0, 33.0, 36.0, 39.0]
        r_half = [x / 2 for x in r]
        assert abs(bd_rate(r, p, r_half, p) - (-50.0)) < 1e-6
        # and at equal rate, the test curve gains the dB of one doubling
        gain = bd_psnr(r, p, r_half, p)
        assert 2.9 < gain < 3.1

    def test_non_overlapping_raises(self):
        import pytest
        from deepvideocodec_tpu.eval.bdrate import bd_rate

        with pytest.raises(ValueError):
            bd_rate([0.1, 0.2], [30, 31], [0.1, 0.2], [40, 41])
