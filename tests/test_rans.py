"""Round-trip tests for the native rANS coder (all-or-nothing correctness)."""

import numpy as np
import pytest

from deepvideocodec_tpu.entropy import (
    CdfTable,
    get_scale_table,
    gaussian_cdf_tables,
    pmf_to_quantized_cdf,
)
from deepvideocodec_tpu.entropy.rans import (
    encode_with_indexes,
    encode_with_indexes_reference,
    decode_with_indexes,
    pmf_to_quantized_cdf_native,
)


@pytest.fixture(scope="module")
def gauss_table():
    return gaussian_cdf_tables(get_scale_table())


class TestRoundTrip:
    def test_simple_roundtrip(self, gauss_table, rng):
        n = 10_000
        indexes = rng.integers(0, 64, n).astype(np.int32)
        scales = np.asarray(get_scale_table())[indexes]
        values = np.round(rng.standard_normal(n) * scales).astype(np.int32)
        data = encode_with_indexes(values, indexes, gauss_table)
        decoded = decode_with_indexes(data, indexes, gauss_table)
        np.testing.assert_array_equal(decoded, values)

    def test_out_of_range_values_escape(self, gauss_table, rng):
        # values far outside the CDF support must bypass-code exactly
        n = 512
        indexes = np.zeros(n, np.int32)  # narrowest scale row
        values = rng.integers(-100_000, 100_000, n).astype(np.int32)
        data = encode_with_indexes(values, indexes, gauss_table)
        decoded = decode_with_indexes(data, indexes, gauss_table)
        np.testing.assert_array_equal(decoded, values)

    def test_fast_encoder_bytes_identical(self, gauss_table, rng):
        """The table-accelerated single-pass encoder must emit the exact
        byte stream of the buffered/division encoder — in-range symbols,
        escapes with multi-chunk bypasses, and the escape-bin value."""
        n = 20_000
        indexes = rng.integers(0, 64, n).astype(np.int32)
        scales = np.asarray(get_scale_table())[indexes]
        values = np.round(rng.standard_normal(n) * scales).astype(np.int32)
        # salt in extremes: deep escapes and exact escape-bin hits
        values[:64] = rng.integers(-2**31, 2**31 - 1, 64)
        values[64] = 2**31 - 1
        values[65] = -2**31
        fast = encode_with_indexes(values, indexes, gauss_table)
        ref = encode_with_indexes_reference(values, indexes, gauss_table)
        assert fast == ref
        np.testing.assert_array_equal(
            decode_with_indexes(fast, indexes, gauss_table), values)

    def test_empty(self, gauss_table):
        data = encode_with_indexes(
            np.zeros(0, np.int32), np.zeros(0, np.int32), gauss_table)
        out = decode_with_indexes(data, np.zeros(0, np.int32), gauss_table)
        assert out.size == 0

    def test_rate_close_to_entropy(self, gauss_table, rng):
        # coding cost should be within a few percent of the model entropy
        n = 100_000
        idx = 40  # a mid-size scale
        scale = float(np.asarray(get_scale_table())[idx])
        values = np.round(rng.standard_normal(n) * scale).astype(np.int32)
        indexes = np.full(n, idx, np.int32)
        data = encode_with_indexes(values, indexes, gauss_table)

        from scipy.stats import norm
        grid = np.arange(-10 * scale, 10 * scale + 1)
        p = norm.cdf((grid + 0.5) / scale) - norm.cdf((grid - 0.5) / scale)
        entropy_bits = -np.sum(p * np.log2(np.maximum(p, 1e-30)))
        actual_bits = len(data) * 8 / n
        assert actual_bits < entropy_bits * 1.05 + 0.1

    def test_multi_row_interleaved(self, gauss_table, rng):
        # symbols on alternating rows round-trip as one stream
        n = 4096
        indexes = np.tile(np.array([0, 13, 63, 7], np.int32), n // 4)
        scales = np.asarray(get_scale_table())[indexes]
        values = np.round(rng.standard_normal(n) * scales).astype(np.int32)
        data = encode_with_indexes(values, indexes, gauss_table)
        np.testing.assert_array_equal(
            decode_with_indexes(data, indexes, gauss_table), values)

    def test_deterministic(self, gauss_table, rng):
        n = 1000
        indexes = rng.integers(0, 64, n).astype(np.int32)
        values = rng.integers(-5, 6, n).astype(np.int32)
        d1 = encode_with_indexes(values, indexes, gauss_table)
        d2 = encode_with_indexes(values, indexes, gauss_table)
        assert d1 == d2


class TestNativeCdf:
    def test_matches_python_builder(self, rng):
        pmf = rng.random(33)
        pmf = pmf / pmf.sum() * 0.999
        tail = 0.001
        native = pmf_to_quantized_cdf_native(pmf, tail)
        python = pmf_to_quantized_cdf(np.concatenate([pmf, [tail]]))
        assert native[0] == 0 and native[-1] == 1 << 16
        assert np.all(np.diff(native) >= 1)
        # same contract; exact freqs may differ by rounding strategy details
        assert native.shape == python.shape

    def test_roundtrip_with_native_cdf(self, rng):
        pmf = np.array([0.1, 0.2, 0.4, 0.2, 0.05])
        cdf = pmf_to_quantized_cdf_native(pmf, 0.05)
        table = CdfTable(
            quantized_cdf=cdf[None, :],
            cdf_length=np.array([cdf.size]),
            offset=np.array([-2]),
        )
        values = rng.integers(-2, 3, 2000).astype(np.int32)
        indexes = np.zeros(2000, np.int32)
        data = encode_with_indexes(values, indexes, table)
        np.testing.assert_array_equal(
            decode_with_indexes(data, indexes, table), values)


class TestExtremeSymbols:
    def test_full_int32_range_roundtrips(self):
        """Regression: INT32_MIN symbols used to hang the bypass encoder.

        -2*value-1 overflowed int32 (UB) and the arithmetic right shift in
        the chunk-count loop never reached zero. An untrained model can emit
        such garbage symbols (NaN/overflow latents -> int32 cast), and the
        coder must stay total over the whole input domain.
        """
        from deepvideocodec_tpu.entropy.cdf import (
            gaussian_cdf_tables, get_scale_table)

        table = gaussian_cdf_tables(get_scale_table())
        values = np.array(
            [0, 1, -1, 2**31 - 1, -(2**31), 123456789, -987654321, 40, -40],
            np.int32)
        indexes = (np.arange(values.size) % 64).astype(np.int32)
        data = encode_with_indexes(values, indexes, table)
        out = decode_with_indexes(data, indexes, table)
        np.testing.assert_array_equal(out, values)
