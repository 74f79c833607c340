"""Post-training integer CDF table construction for the rANS coder.

Lifecycle mirrors the reference (train -> freeze -> `update()` builds tables
-> code; /root/reference/dmc/models/video_model.py:665-679): densities are
sampled on an integer grid, converted to 16-bit quantized CDFs, and handed to
the host-side C++ rANS coder. Table building runs once on the host in numpy;
the per-frame hot path only looks tables up.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64
CDF_PRECISION = 16


def get_scale_table(
    smin: float = SCALES_MIN,
    smax: float = SCALES_MAX,
    levels: int = SCALES_LEVELS,
) -> np.ndarray:
    """64 log-spaced Gaussian scales, the conditional coder's bucket table."""
    return np.exp(
        np.linspace(math.log(smin), math.log(smax), levels)
    ).astype(np.float32)


@dataclasses.dataclass
class CdfTable:
    """Quantized CDF rows for one entropy head.

    quantized_cdf: (rows, max_len) int32, each row a nondecreasing CDF with
      cdf[0] == 0 and cdf[cdf_length-1] == 2**precision; the last in-range
      bin is the escape/tail symbol.
    cdf_length: (rows,) int32 — valid row prefix length (pmf_length + 2).
    offset: (rows,) int32 — symbol s codes value (s + offset).
    """

    quantized_cdf: np.ndarray
    cdf_length: np.ndarray
    offset: np.ndarray

    def __post_init__(self):
        # Private copies (np.array copy=True, not ascontiguousarray, which
        # returns the SAME object for already-contiguous int32 input and
        # would freeze the caller's own buffers below).
        self.quantized_cdf = np.array(self.quantized_cdf, np.int32)
        self.cdf_length = np.array(self.cdf_length, np.int32)
        self.offset = np.array(self.offset, np.int32)
        # Immutable by contract: the native coder caches acceleration
        # tables per CdfTable instance (entropy/rans.py:_coder_tables);
        # in-place mutation would silently desync them. Rebuild a fresh
        # CdfTable instead of editing one (update()-style refreshes do).
        for a in (self.quantized_cdf, self.cdf_length, self.offset):
            a.flags.writeable = False


def pmf_to_quantized_cdf(
    pmf: np.ndarray, precision: int = CDF_PRECISION
) -> np.ndarray:
    """Quantize a pmf (with its tail mass as the final entry) to an integer CDF.

    Returns a length len(pmf)+1 CDF with cdf[0] = 0, cdf[-1] = 2**precision,
    every bin nonzero. Deficits/surpluses from rounding are repaid by stealing
    from the largest bins, preserving codeability of every symbol.
    """
    pmf = np.asarray(pmf, np.float64)
    if np.any(pmf < 0) or not np.all(np.isfinite(pmf)):
        raise ValueError("pmf must be finite and nonnegative")
    total = 1 << precision
    p = pmf / max(pmf.sum(), 1e-300)
    freqs = np.round(p * total).astype(np.int64)
    freqs = np.maximum(freqs, 1)
    # Rebalance so freqs sum exactly to `total`, stealing from/giving to the
    # largest bins (largest can always afford to lose 1 while staying >= 1).
    diff = total - freqs.sum()
    while diff != 0:
        if diff > 0:
            idx = int(np.argmax(p - freqs / total))
            take = diff
            freqs[idx] += take
            diff = 0
        else:
            order = np.argsort(-freqs)
            for idx in order:
                room = freqs[idx] - 1
                if room <= 0:
                    continue
                take = min(room, -diff)
                freqs[idx] -= take
                diff += take
                if diff == 0:
                    break
            else:  # pragma: no cover - cannot happen when len(pmf) <= total
                raise ValueError("cannot normalize pmf")
    cdf = np.zeros(len(pmf) + 1, np.int32)
    cdf[1:] = np.cumsum(freqs)
    assert cdf[-1] == total
    return cdf


def _pack_rows(pmfs, tail_masses, pmf_lengths, precision=CDF_PRECISION):
    """Build a padded CdfTable matrix out of variable-length pmf rows.

    Uses the native C++ quantizer when available (the Python twin is kept
    as the portable fallback and for cross-checking in tests).
    """
    try:
        from .rans import pmf_to_quantized_cdf_native as _native
    except Exception:  # pragma: no cover - toolchain-less hosts
        _native = None

    rows = len(pmf_lengths)
    max_len = int(max(pmf_lengths)) + 2
    out = np.zeros((rows, max_len), np.int32)
    for r in range(rows):
        n = int(pmf_lengths[r])
        if _native is not None and precision == CDF_PRECISION:
            out[r, : n + 2] = _native(pmfs[r][:n], float(tail_masses[r]))
        else:
            row_pmf = np.concatenate([pmfs[r][:n], [tail_masses[r]]])
            out[r, : n + 2] = pmf_to_quantized_cdf(row_pmf, precision)
    return out


_GAUSSIAN_TABLE_CACHE = {}


def gaussian_cdf_tables(
    scale_table: np.ndarray, tail_mass: float = 1e-9
) -> CdfTable:
    """One CDF row per quantized scale, centered pmfs over +/- tail range.

    Memoized: every codec instance shares the standard 64-scale table.
    """
    key = (scale_table.tobytes(), float(tail_mass))
    cached = _GAUSSIAN_TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    from scipy.stats import norm  # available via jax's scipy dep

    scale_table = np.asarray(scale_table, np.float64)
    multiplier = -norm.ppf(tail_mass / 2)
    pmf_center = np.ceil(scale_table * multiplier).astype(np.int64)
    pmf_length = 2 * pmf_center + 1
    max_length = int(pmf_length.max())

    samples = np.abs(
        np.arange(max_length, dtype=np.float64)[None, :] - pmf_center[:, None]
    )
    upper = _std_cdf((0.5 - samples) / scale_table[:, None])
    lower = _std_cdf((-0.5 - samples) / scale_table[:, None])
    pmf = upper - lower
    tail = 2.0 * lower[:, :1]

    quantized = _pack_rows(pmf, tail[:, 0], pmf_length)
    table = CdfTable(
        quantized_cdf=quantized,
        cdf_length=(pmf_length + 2).astype(np.int32),
        offset=(-pmf_center).astype(np.int32),
    )
    _GAUSSIAN_TABLE_CACHE[key] = table
    return table


def _std_cdf(x):
    from scipy.special import erfc

    return 0.5 * erfc(-x / math.sqrt(2.0))


def factorized_cdf_tables(
    logits_cumulative_fn, quantiles: np.ndarray
) -> CdfTable:
    """CDF rows for a trained factorized bottleneck.

    Args:
      logits_cumulative_fn: maps a (C, 1, N) fp array to cumulative logits,
        evaluated with the trained density parameters (host-side numpy or a
        jitted apply).
      quantiles: (C, 1, 3) learned (lower-tail, median, upper-tail) points.
    """
    quantiles = np.asarray(quantiles, np.float64)
    medians = quantiles[:, 0, 1]
    minima = np.maximum(np.ceil(medians - quantiles[:, 0, 0]), 0).astype(
        np.int64
    )
    maxima = np.maximum(np.ceil(quantiles[:, 0, 2] - medians), 0).astype(
        np.int64
    )
    pmf_length = minima + maxima + 1
    max_length = int(pmf_length.max())
    pmf_start = medians - minima

    samples = (
        np.arange(max_length, dtype=np.float64)[None, :] + pmf_start[:, None]
    )
    samples = samples[:, None, :]  # (C, 1, N)
    lower = np.asarray(
        logits_cumulative_fn((samples - 0.5).astype(np.float32)), np.float64
    )
    upper = np.asarray(
        logits_cumulative_fn((samples + 0.5).astype(np.float32)), np.float64
    )
    sign = -np.sign(lower + upper)
    pmf = np.abs(_sigmoid(sign * upper) - _sigmoid(sign * lower))[:, 0, :]
    tail = (_sigmoid(lower[:, 0, :1]) + _sigmoid(-upper[:, 0, -1:]))[:, 0]

    quantized = _pack_rows(pmf, tail, pmf_length)
    return CdfTable(
        quantized_cdf=quantized,
        cdf_length=(pmf_length + 2).astype(np.int32),
        offset=(-minima).astype(np.int32),
    )


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def factorized_tables_from_params(
    param_dict, filters=(3, 3, 3, 3)
) -> CdfTable:
    """Build CDF tables directly from a FactorizedEntropyBottleneck's params.

    `param_dict` is the flax param subtree: {'matrix_i', 'bias_i',
    'factor_i', 'quantiles'} as arrays. Pure numpy — runs once on the host
    at codec-construction time.
    """
    k = len(filters)
    mats = [np.asarray(param_dict[f"matrix_{i}"], np.float64)
            for i in range(k + 1)]
    biases = [np.asarray(param_dict[f"bias_{i}"], np.float64)
              for i in range(k + 1)]
    factors = [np.asarray(param_dict[f"factor_{i}"], np.float64)
               for i in range(k)]

    def softplus(v):
        return np.logaddexp(0.0, v)

    def logits_fn(x):  # x: (C, 1, N)
        logits = np.asarray(x, np.float64)
        for i in range(k + 1):
            m = softplus(mats[i])
            logits = np.einsum("cij,cjn->cin", m, logits) + biases[i]
            if i < k:
                logits = logits + np.tanh(factors[i]) * np.tanh(logits)
        return logits

    return factorized_cdf_tables(logits_fn, np.asarray(
        param_dict["quantiles"]))
