"""Model families of the TPU video codec framework.

  layers.py — shared NN building blocks (residual blocks, SpyNet optical
              flow, UNet, SE attention, autoencoder factories)
  dmc.py    — the flagship DMC conditional-coding P-frame codec
  intra.py  — I-frame image codecs (factorized / hyperprior / checkerboard)
  dvc.py    — DVC: explicit flow + warp + residual coding
  dcvc.py   — DCVC: conditional contextual coding
"""

from .dmc import DMC, DMCConfig
from .init import fast_init
from .intra import (
    FactorizedImageCodec,
    HyperpriorImageCodec,
    CheckerboardImageCodec,
    Cheng2020CheckerboardCodec,
    INTRA_QUALITIES,
    intra_model_for_quality,
)
from .dvc import DVC
from .dcvc import DCVC
from .factory import build_inter_model

__all__ = [
    "build_inter_model",
    "DMC",
    "DMCConfig",
    "fast_init",
    "FactorizedImageCodec",
    "HyperpriorImageCodec",
    "CheckerboardImageCodec",
    "Cheng2020CheckerboardCodec",
    "INTRA_QUALITIES",
    "intra_model_for_quality",
    "DVC",
    "DCVC",
]
