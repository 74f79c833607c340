"""Bjontegaard metrics: BD-rate / BD-PSNR between two RD curves.

The comparison protocol for this framework vs the reference
(BASELINE.md: hold BD-rate deviation within ~0.1 dB-equivalent on the
same UVG/GOP-32 protocol the reference's evaluator measures —
/root/reference/dmc/test.py:106-241 produces the (bpp, psnr) points).

Standard Bjontegaard 2001 method: fit cubic polynomials to PSNR as a
function of log-rate (and vice versa), integrate the difference over the
overlapping interval.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def _poly_integral(x: np.ndarray, y: np.ndarray, lo: float, hi: float):
    coeffs = np.polyfit(x, y, min(3, len(x) - 1))
    integ = np.polyint(coeffs)
    return np.polyval(integ, hi) - np.polyval(integ, lo)


def bd_rate(
    rate_anchor: Sequence[float], psnr_anchor: Sequence[float],
    rate_test: Sequence[float], psnr_test: Sequence[float],
) -> float:
    """Average bitrate difference (%) of `test` vs `anchor` at equal
    quality. Negative = test needs fewer bits. Needs >= 2 RD points per
    curve (4 for the standard cubic)."""
    ra = np.log(np.asarray(rate_anchor, np.float64))
    rt = np.log(np.asarray(rate_test, np.float64))
    pa = np.asarray(psnr_anchor, np.float64)
    pt = np.asarray(psnr_test, np.float64)
    if min(len(ra), len(rt)) < 2:
        raise ValueError("need at least 2 RD points per curve")
    lo = max(pa.min(), pt.min())
    hi = min(pa.max(), pt.max())
    if hi <= lo:
        raise ValueError("RD curves do not overlap in quality")
    int_a = _poly_integral(pa, ra, lo, hi)
    int_t = _poly_integral(pt, rt, lo, hi)
    avg_log_diff = (int_t - int_a) / (hi - lo)
    return float((np.exp(avg_log_diff) - 1.0) * 100.0)


def bd_psnr(
    rate_anchor: Sequence[float], psnr_anchor: Sequence[float],
    rate_test: Sequence[float], psnr_test: Sequence[float],
) -> float:
    """Average PSNR difference (dB) of `test` vs `anchor` at equal rate.
    Positive = test is better."""
    ra = np.log(np.asarray(rate_anchor, np.float64))
    rt = np.log(np.asarray(rate_test, np.float64))
    pa = np.asarray(psnr_anchor, np.float64)
    pt = np.asarray(psnr_test, np.float64)
    if min(len(ra), len(rt)) < 2:
        raise ValueError("need at least 2 RD points per curve")
    lo = max(ra.min(), rt.min())
    hi = min(ra.max(), rt.max())
    if hi <= lo:
        raise ValueError("RD curves do not overlap in rate")
    int_a = _poly_integral(ra, pa, lo, hi)
    int_t = _poly_integral(rt, pt, lo, hi)
    return float((int_t - int_a) / (hi - lo))
