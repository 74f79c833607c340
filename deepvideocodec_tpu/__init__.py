"""deepvideocodec_tpu — a TPU-native learned video codec framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the PyTorch
reference `lumingzzz/DeepVideoCodec` (DVC / DCVC / DMC conditional-coding
P-frame codecs): SpyNet optical flow, compressed motion fields, multi-scale
temporal-context mining via bilinear warping, conditional contextual
analysis/synthesis transforms, hybrid spatio-temporal entropy models with a
two-pass checkerboard spatial prior, and a real rANS bitstream (C++ coder on
the TPU-VM host fed by device-computed CDFs).

Layout (bottom-up):
  ops/       low-level image/compute ops (warp, resize, pixel-shuffle, STE)
  entropy/   entropy models (factorized bottleneck, conditional Gaussian) + CDFs
  coder/     C++ rANS range coder + CDF quantizer (host-side native code)
  models/    NN building blocks and the DMC / DCVC / DVC / intra model families
  data/      host-side data pipelines (Vimeo-90K septuplets, image folders)
  train/     RD loss, curriculum, dual optimizers, jitted train steps
  eval/      GOP codec loop, bitstream container, bpp/PSNR metrics
  parallel/  device mesh + sharding helpers (data-parallel over ICI)
  utils/     metrics, logging, checkpoint helpers
"""

__version__ = "0.1.0"
