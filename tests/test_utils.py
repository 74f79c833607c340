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


class TestPartialWarmStart:
    """Shape-tolerant warm start across topology changes (the
    --init-partial path for e.g. --unet-width fine-tunes)."""

    def test_merge_rules(self, tmp_path):
        from deepvideocodec_tpu.utils import (
            save_params_export, restore_params_export_partial)

        donor = {
            "shared": {"w": jnp.full((3, 3), 2.0)},
            "resized": {"w": jnp.ones((4, 4))},
            "donor_only": {"w": jnp.ones(2)},
        }
        save_params_export(tmp_path, donor)

        target = {
            "shared": {"w": jnp.zeros((3, 3))},       # path+shape match
            "resized": {"w": jnp.zeros((6, 6))},      # shape mismatch
            "fresh_only": {"w": jnp.full(5, 7.0)},    # not in donor
        }
        merged, hit, skipped = restore_params_export_partial(
            tmp_path, target)

        np.testing.assert_array_equal(
            np.asarray(merged["shared"]["w"]), 2.0 * np.ones((3, 3)))
        np.testing.assert_array_equal(
            np.asarray(merged["resized"]["w"]), np.zeros((6, 6)))
        np.testing.assert_array_equal(
            np.asarray(merged["fresh_only"]["w"]), np.full(5, 7.0))
        assert hit == ["/shared/w"]
        assert any(s.startswith("/resized/w") for s in skipped)
        # missing subtrees are recorded at the highest absent level
        assert "/fresh_only" in skipped

    def test_missing_export_returns_none(self, tmp_path):
        from deepvideocodec_tpu.utils import restore_params_export_partial

        assert restore_params_export_partial(
            tmp_path / "nope", {"w": jnp.zeros(1)}) is None

    def test_npz_donor(self, tmp_path):
        from deepvideocodec_tpu.utils import (
            save_npz_export, restore_params_export_partial)

        donor = {"a": {"w": jnp.full((3,), 2.0)},
                 "b": {"w": jnp.ones((4,))}}
        save_npz_export(tmp_path / "d.npz", donor)
        target = {"a": {"w": jnp.zeros((3,))},
                  "b": {"w": jnp.zeros((5,))}}
        merged, hit, skipped = restore_params_export_partial(
            tmp_path / "d.npz", target)
        np.testing.assert_array_equal(np.asarray(merged["a"]["w"]), 2.0)
        np.testing.assert_array_equal(np.asarray(merged["b"]["w"]), 0.0)
        assert hit == ["/a/w"] and any("/b/w" in s for s in skipped)

    def test_npz_keeps_entropy_density_params_f32(self, tmp_path):
        """Storage-precision contract of save_npz_export: the factorized-
        density params (matrix_{i}/bias_{i}/factor_{i}/quantiles — names
        from entropy/factorized.py) must NOT ride f16, while generic conv
        kernels/biases do. Regression: the f32 allowlist used to spell the
        tokens 'matrices/biases/factors', matching nothing."""
        from deepvideocodec_tpu.utils import save_npz_export

        tree = {"eb": {"matrix_0": jnp.full((2, 3, 1), 1e-4),
                       "bias_0": jnp.ones((2, 3, 1)),
                       "factor_0": jnp.ones((2, 3, 1)),
                       "quantiles": jnp.ones((2, 1, 3))},
                "conv": {"kernel": jnp.ones((3, 3, 2, 2)),
                         "bias": jnp.ones((2,))}}
        save_npz_export(tmp_path / "e.npz", tree)
        with np.load(tmp_path / "e.npz") as data:
            for key, arr in data.items():
                if "eb" in key:
                    assert arr.dtype == np.float32, key
                else:
                    assert arr.dtype == np.float16, key

    def test_dtype_cast_to_target(self, tmp_path):
        from deepvideocodec_tpu.utils import (
            save_params_export, restore_params_export_partial)

        save_params_export(tmp_path, {"w": jnp.ones(3, jnp.float32)})
        merged, _, _ = restore_params_export_partial(
            tmp_path, {"w": jnp.zeros(3, jnp.bfloat16)})
        assert merged["w"].dtype == jnp.bfloat16


class TestRestoreAnyParams:
    """One dispatch for every CLI checkpoint flag: .npz file /
    params_export dir / Orbax step dir."""

    def test_npz_file(self, tmp_path):
        from deepvideocodec_tpu.utils import (save_npz_export,
                                              restore_any_params)

        target = {"w": jnp.zeros(4, jnp.float32)}
        save_npz_export(tmp_path / "x.npz", {"w": jnp.full(4, 3.0)})
        out = restore_any_params(tmp_path / "x.npz", target)
        np.testing.assert_array_equal(np.asarray(out["w"]), 3.0)

    def test_export_dir(self, tmp_path):
        from deepvideocodec_tpu.utils import (save_params_export,
                                              restore_any_params)

        target = {"w": jnp.zeros(4)}
        save_params_export(tmp_path, {"w": jnp.full(4, 5.0)})
        out = restore_any_params(tmp_path, target)
        np.testing.assert_array_equal(np.asarray(out["w"]), 5.0)

    def test_missing_raises(self, tmp_path):
        from deepvideocodec_tpu.utils import restore_any_params

        with pytest.raises(FileNotFoundError):
            restore_any_params(tmp_path / "nope", {"w": jnp.zeros(1)})


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


class TestCompileRetry:
    def test_retries_remote_compile_signature(self):
        from deepvideocodec_tpu.utils import retry_flaky_compile

        calls = []

        def fn(x):
            calls.append(x)
            if len(calls) < 3:
                raise RuntimeError(
                    "INTERNAL: http://127.0.0.1:8103/remote_compile: "
                    "HTTP 500: tpu_compile_helper subprocess exit "
                    "signal SIGKILL (9)")
            return x * 2

        wrapped = retry_flaky_compile(fn, retries=4, base_sleep=0.0)
        assert wrapped(21) == 42
        assert len(calls) == 3

    def test_reraises_other_errors(self):
        from deepvideocodec_tpu.utils import retry_flaky_compile

        def fn():
            raise ValueError("not a compile failure")

        with pytest.raises(ValueError):
            retry_flaky_compile(fn, base_sleep=0.0)()

    def test_exhausted_retries_reraise(self):
        from deepvideocodec_tpu.utils import retry_flaky_compile

        def fn():
            raise RuntimeError("remote_compile died")

        with pytest.raises(RuntimeError):
            retry_flaky_compile(fn, retries=2, base_sleep=0.0)()


class TestNpzExport:
    def test_roundtrip_and_f16_policy(self, tmp_path):
        import jax
        from deepvideocodec_tpu.utils import (save_npz_export,
                                              restore_npz_export)

        params = {
            "conv": {"kernel": jnp.arange(8, dtype=jnp.float32) / 7.0,
                     "bias": jnp.zeros((4,), jnp.float32)},
            "bottleneck": {"quantiles": jnp.asarray(
                [-1.0, 0.0, 1.0], jnp.float32) * 1e-4},
        }
        path = tmp_path / "w.npz"
        save_npz_export(path, params)
        back = restore_npz_export(path, params)
        # structure + dtypes restored
        assert jax.tree_util.tree_structure(back) == \
            jax.tree_util.tree_structure(params)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(back)):
            assert a.dtype == b.dtype
        # entropy-critical leaves kept exact (f32 storage)
        np.testing.assert_array_equal(
            np.asarray(back["bottleneck"]["quantiles"]),
            np.asarray(params["bottleneck"]["quantiles"]))
        # other leaves within f16 rounding
        np.testing.assert_allclose(
            np.asarray(back["conv"]["kernel"]),
            np.asarray(params["conv"]["kernel"]), rtol=1e-3)

    def test_missing_param_raises(self, tmp_path):
        from deepvideocodec_tpu.utils import (save_npz_export,
                                              restore_npz_export)

        params = {"a": jnp.zeros((2,), jnp.float32)}
        path = tmp_path / "w.npz"
        save_npz_export(path, params)
        bigger = {"a": jnp.zeros((2,), jnp.float32),
                  "b": jnp.zeros((2,), jnp.float32)}
        with pytest.raises(KeyError):
            restore_npz_export(path, bigger)
