"""Tests for entropy models: likelihood math, CDF tables, aux loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.stats import norm

from deepvideocodec_tpu.entropy import (
    FactorizedEntropyBottleneck,
    gaussian_likelihood,
    quantize_gaussian,
    build_indexes,
    get_scale_table,
    pmf_to_quantized_cdf,
    gaussian_cdf_tables,
    factorized_cdf_tables,
)


class TestGaussianConditional:
    def test_likelihood_matches_closed_form(self, rng):
        v = rng.standard_normal((2, 4, 4, 3)).astype(np.float32) * 3
        means = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
        scales = (rng.random((2, 4, 4, 3)).astype(np.float32) * 5 + 0.2)
        lk = np.asarray(
            gaussian_likelihood(jnp.asarray(v), jnp.asarray(scales),
                                jnp.asarray(means))
        )
        d = np.abs(v - means)
        expected = norm.cdf((0.5 - d) / scales) - norm.cdf((-0.5 - d) / scales)
        np.testing.assert_allclose(lk, np.maximum(expected, 1e-9),
                                   rtol=1e-4, atol=1e-7)

    def test_scale_floor(self):
        # tiny scales are clamped to 0.11, not passed through
        lk_small = gaussian_likelihood(jnp.zeros((1, 1, 1, 1)),
                                       jnp.full((1, 1, 1, 1), 1e-6))
        lk_floor = gaussian_likelihood(jnp.zeros((1, 1, 1, 1)),
                                       jnp.full((1, 1, 1, 1), 0.11))
        np.testing.assert_allclose(np.asarray(lk_small), np.asarray(lk_floor))

    def test_likelihood_sums_to_one(self):
        # sum over integer grid ~ 1 for a centered Gaussian
        grid = jnp.arange(-30, 31, dtype=jnp.float32).reshape(1, -1, 1, 1)
        lk = gaussian_likelihood(grid, jnp.full_like(grid, 2.0))
        assert abs(float(jnp.sum(lk)) - 1.0) < 1e-5

    def test_quantize_eval_rounds_around_means(self):
        x = jnp.array([[1.4, -0.2]])
        means = jnp.array([[1.2, 0.3]])
        out = np.asarray(quantize_gaussian(x, training=False, means=means))
        np.testing.assert_allclose(out, [[1.2, 0.3]], atol=1e-6)

    def test_quantize_train_noise_bounded(self):
        key = jax.random.PRNGKey(0)
        x = jnp.zeros((1000,))
        out = np.asarray(quantize_gaussian(x, training=True, noise_key=key))
        assert np.all(np.abs(out) <= 0.5)
        assert np.std(out) > 0.1

    def test_build_indexes_bucketing(self):
        table = jnp.asarray(get_scale_table())
        scales = jnp.array([0.01, 0.11, 0.2, 10.0, 255.0, 500.0])
        idx = np.asarray(build_indexes(scales, table))
        t = np.asarray(table)
        # index = smallest i with scale <= table[i] (after flooring at 0.11)
        assert idx[0] == 0 and idx[1] == 0
        assert t[idx[2]] >= 0.2 and (idx[2] == 0 or t[idx[2] - 1] < 0.2)
        assert idx[5] == len(t) - 1

    def test_reference_bucketing_formula(self, rng):
        # cross-check vectorized searchsorted against the subtractive formula
        table = np.asarray(get_scale_table())
        scales = np.maximum(rng.random(1000).astype(np.float32) * 300, 0.11)
        ours = np.asarray(build_indexes(jnp.asarray(scales),
                                        jnp.asarray(table)))
        ref = np.full(scales.shape, len(table) - 1, np.int32)
        for s in table[:-1]:
            ref -= (scales <= s).astype(np.int32)
        np.testing.assert_array_equal(ours, ref)


class TestFactorizedBottleneck:
    @pytest.fixture
    def eb(self):
        model = FactorizedEntropyBottleneck(channels=8)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 8)),
                            training=False)
        return model, params

    def test_likelihood_shape_and_range(self, eb, rng):
        model, params = eb
        x = jnp.asarray(rng.standard_normal((2, 6, 6, 8)).astype(np.float32))
        _, lk = model.apply(params, x, training=False)
        assert lk.shape == x.shape
        lk = np.asarray(lk)
        assert np.all(lk > 0) and np.all(lk <= 1.0)

    def test_likelihood_integrates_to_one(self, eb):
        model, params = eb
        # integer grid per channel; total probability ~1 per channel
        # (init density has scale ~init_scale=10, so go well past +/-10 sigma)
        grid = jnp.tile(
            jnp.arange(-150, 151, dtype=jnp.float32)[None, :, None, None],
            (1, 1, 1, 8),
        )
        _, lk = model.apply(params, grid, training=False)
        sums = np.asarray(jnp.sum(lk, axis=(0, 1, 2)))
        np.testing.assert_allclose(sums, 1.0, atol=1e-3)

    def test_training_noise_path(self, eb, rng):
        model, params = eb
        x = jnp.asarray(rng.standard_normal((1, 4, 4, 8)).astype(np.float32))
        xt, lk = model.apply(params, x, training=True,
                             noise_key=jax.random.PRNGKey(1))
        assert np.all(np.abs(np.asarray(xt - x)) <= 0.5)
        assert lk.shape == x.shape

    def test_aux_loss_trains_quantiles_only(self, eb):
        model, params = eb

        def aux(p):
            return model.apply(p, method=model.aux_loss)

        g = jax.grad(aux)(params)
        flat = jax.tree_util.tree_flatten_with_path(g)[0]
        for path, leaf in flat:
            name = jax.tree_util.keystr(path)
            if "quantiles" in name:
                assert float(jnp.sum(jnp.abs(leaf))) > 0
            else:
                assert float(jnp.sum(jnp.abs(leaf))) == 0, name

    def test_density_grads_exclude_quantiles(self, eb, rng):
        model, params = eb
        x = jnp.asarray(rng.standard_normal((1, 4, 4, 8)).astype(np.float32))

        def rate(p):
            _, lk = model.apply(p, x, training=True,
                                noise_key=jax.random.PRNGKey(2))
            return -jnp.sum(jnp.log(lk))

        g = jax.grad(rate)(params)
        flat = jax.tree_util.tree_flatten_with_path(g)[0]
        saw_density_grad = False
        for path, leaf in flat:
            name = jax.tree_util.keystr(path)
            if "quantiles" in name:
                assert float(jnp.sum(jnp.abs(leaf))) == 0
            elif float(jnp.sum(jnp.abs(leaf))) > 0:
                saw_density_grad = True
        assert saw_density_grad


class TestCdfTables:
    def test_pmf_to_quantized_cdf_properties(self, rng):
        pmf = rng.random(17)
        cdf = pmf_to_quantized_cdf(pmf)
        assert cdf[0] == 0 and cdf[-1] == 1 << 16
        assert np.all(np.diff(cdf) >= 1)

    def test_pmf_with_zeros(self):
        pmf = np.array([0.0, 0.5, 0.0, 0.5, 0.0])
        cdf = pmf_to_quantized_cdf(pmf)
        assert np.all(np.diff(cdf) >= 1)
        assert cdf[-1] == 1 << 16

    def test_gaussian_tables(self):
        table = gaussian_cdf_tables(get_scale_table())
        assert table.quantized_cdf.shape[0] == 64
        for r in range(64):
            n = table.cdf_length[r]
            row = table.quantized_cdf[r, :n]
            assert row[0] == 0 and row[-1] == 1 << 16
            assert np.all(np.diff(row) >= 1)
        # small scales -> narrow support
        assert table.cdf_length[0] < table.cdf_length[-1]

    def test_factorized_tables(self):
        model = FactorizedEntropyBottleneck(channels=4)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 2, 4)),
                            training=False)

        def logits_fn(samples):
            return model.apply(
                params, jnp.asarray(samples), False,
                method=model._logits_cumulative)

        quantiles = params["params"]["quantiles"]
        table = factorized_cdf_tables(logits_fn, np.asarray(quantiles))
        assert table.quantized_cdf.shape[0] == 4
        for r in range(4):
            n = table.cdf_length[r]
            row = table.quantized_cdf[r, :n]
            assert row[0] == 0 and row[-1] == 1 << 16
            assert np.all(np.diff(row) >= 1)
