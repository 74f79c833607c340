"""Rate-distortion loss with a per-latent bpp breakdown.

Semantics match the reference's RateDistortionLoss + collect_likelihoods_list
(/root/reference/dmc/train.py:74-211): per-P-frame MSE averaged over
channels, bpp summed over every latent of every frame normalized by
H*W*num_frames, `loss = mean(lambda * avg_frame_distortion) + mean(bpp)`.
The detailed breakdown (`bpp.<label>.<frame>.<field>`) mirrors the
reference's bpp_info_dict for observability parity.

Likelihood logs are computed in fp32 (the values span 1e-9..1).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

_LN2 = math.log(2.0)


def collect_bpp(
    likelihoods_list: List[Dict[str, Dict[str, jax.Array]]],
    num_pixels: int,
    return_details: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Total bpp per batch element (B,) + optional per-latent breakdown."""
    details: Dict[str, jax.Array] = {}
    bpp_total = None
    for i, frame_lk in enumerate(likelihoods_list):
        frame_bpp = None
        for label, fields in frame_lk.items():
            label_bpp = None
            for field, lk in fields.items():
                bits = jnp.sum(
                    jnp.log(lk.astype(jnp.float32)), axis=(1, 2, 3)
                ) / (-_LN2 * num_pixels)
                bpp_total = bits if bpp_total is None else bpp_total + bits
                frame_bpp = bits if frame_bpp is None else frame_bpp + bits
                label_bpp = bits if label_bpp is None else label_bpp + bits
                if return_details:
                    details[f"bpp.{label}.{i}.{field}"] = jnp.sum(bits)
            if return_details and label_bpp is not None:
                details[f"bpp.{label}.{i}"] = jnp.sum(label_bpp)
        if return_details and frame_bpp is not None:
            details[f"bpp.{i}"] = jnp.sum(frame_bpp)
    return bpp_total, details


def rate_distortion_loss(
    output: Dict[str, Any],
    target: jax.Array,  # (B, T-1, H, W, 3): the P-frames being coded
    lmbda: float,
    return_details: bool = False,
) -> Dict[str, jax.Array]:
    """Returns {'loss', 'mse_loss', 'bpp_loss', 'distortion', ...details}."""
    x_hat = output["x_hat"]
    if x_hat.shape != target.shape:
        raise ValueError(f"shape mismatch {x_hat.shape} vs {target.shape}")
    B, num_frames, H, W, _ = target.shape
    num_pixels = H * W * num_frames

    # per-frame distortion, averaged over pixels+channels -> (B, T-1)
    sq = jnp.square(x_hat.astype(jnp.float32) - target.astype(jnp.float32))
    per_frame = jnp.mean(sq, axis=(2, 3, 4))

    out: Dict[str, jax.Array] = {}
    if return_details:
        for i in range(num_frames):
            out[f"frame{i}.mse_loss"] = jnp.mean(per_frame[:, i])
    mse_loss = jnp.mean(per_frame)
    distortions = jnp.sum(per_frame, axis=1) / num_frames  # (B,)

    bpp, details = collect_bpp(
        output["likelihoods"], num_pixels, return_details)
    if return_details:
        out.update(details)

    bpp_loss = jnp.mean(bpp)
    out["mse_loss"] = mse_loss
    out["distortion"] = jnp.mean(distortions)
    out["bpp_loss"] = bpp_loss
    out["loss"] = jnp.mean(lmbda * distortions) + bpp_loss
    return out
