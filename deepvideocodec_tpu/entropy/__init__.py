"""Entropy models and coding tables.

Replaces the reference's external compressai dependency
(/root/reference/dmc/models/base_model.py:37, video_model.py:7):

  * `FactorizedEntropyBottleneck` — the Balle fully-factorized learned prior
    (flexible per-channel CDF via a chained matrix/bias/factor density) used
    on hyper-latents z. Likelihoods are computed on-device in fp32.
  * `gaussian` — the conditional Gaussian likelihood / quantization helpers
    used on latents y (means/scales predicted by priors).
  * `cdf` — post-training integer CDF table construction (scale table,
    pmf -> 16-bit quantized CDFs) feeding the host-side rANS coder.
"""

from .factorized import FactorizedEntropyBottleneck
from .gaussian import (
    gaussian_likelihood,
    quantize_gaussian,
    build_indexes,
)
from .cdf import (
    get_scale_table,
    pmf_to_quantized_cdf,
    gaussian_cdf_tables,
    factorized_cdf_tables,
    factorized_tables_from_params,
    CdfTable,
    SCALES_MIN,
    SCALES_MAX,
    SCALES_LEVELS,
)

__all__ = [
    "FactorizedEntropyBottleneck",
    "gaussian_likelihood",
    "quantize_gaussian",
    "build_indexes",
    "get_scale_table",
    "pmf_to_quantized_cdf",
    "gaussian_cdf_tables",
    "factorized_cdf_tables",
    "factorized_tables_from_params",
    "CdfTable",
    "SCALES_MIN",
    "SCALES_MAX",
    "SCALES_LEVELS",
]
