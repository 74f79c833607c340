"""Phase-space (space-to-depth) convolution: run a full-resolution conv as
a half-resolution conv over the 2x2 phase decomposition.

Why: TPU convs at narrow channel counts are output-lane-bound and their
NHWC tensors pad to 128 lanes — a 3x3 conv on (H, W, 32) runs at ~5 TF/s
while the same math arranged as (H/2, W/2, 128) runs at ~38 TF/s
(docs/PERFORMANCE.md). The decomposition is exact: writing x_p for the
2x2-phase stacking of x (channel block (pi*2+pj) holding phase (pi, pj)),
a k x k stride-1 'same' conv becomes a kp x kp conv over x_p whose kernel
is a fixed rearrangement of the original weights:

    out phase p at (i, j), tap (di, dj)  reads  full-res (2i+pi+di, ...)
      = input phase qi=(pi+di) mod 2  at row  i + floor((pi+di)/2)

so each (input-phase, output-phase) pair sees the original taps of
matching parity at consecutive phase-space offsets. Taps that would read
beyond the original zero padding land on zero kernel entries, so border
behaviour is identical. Cost: the phase kernel holds each original weight
once among 4x the channels -> (kp^2 * 16)/(k^2) x the FLOPs (4x for k=3,
~2x for k=7), far outweighed by the lane-utilization gain at C <= 32.

Used by encoder-side stacks (SpyNet's fine pyramid levels); output equals
the direct conv up to float reassociation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def space_to_depth2(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel block (pi*2+pj) = phase."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space2(x: jax.Array) -> jax.Array:
    """Inverse of space_to_depth2."""
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h2, w2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h2 * 2, w2 * 2, c)


def _phase_extent(k: int):
    half = k // 2
    lo = min((pi + di) // 2 for pi in (0, 1) for di in range(-half, half + 1))
    hi = max((pi + di) // 2 for pi in (0, 1) for di in range(-half, half + 1))
    return lo, hi


def phase_conv_kernel(w: jax.Array):
    """(k, k, C, C') kernel -> ((kp, kp, 4C, 4C') phase kernel, (lo, hi)).

    Assembled from strided slices of `w` (one per input/output phase
    pair), zero elsewhere; returns the symmetric-ish padding (pad by
    (-lo, hi) on each spatial dim).
    """
    k = int(w.shape[0])
    half = k // 2
    lo, hi = _phase_extent(k)
    kp = hi - lo + 1

    out_blocks = []
    for pi in (0, 1):
        for pj in (0, 1):
            in_blocks = []
            for qi in (0, 1):
                for qj in (0, 1):
                    i0 = (qi - pi + half) % 2
                    j0 = (qj - pj + half) % 2
                    sub = w[i0::2, j0::2]
                    di_first = i0 - half
                    dj_first = j0 - half
                    ti = (pi + di_first) // 2 - lo
                    tj = (pj + dj_first) // 2 - lo
                    in_blocks.append(jnp.pad(
                        sub,
                        ((ti, kp - sub.shape[0] - ti),
                         (tj, kp - sub.shape[1] - tj),
                         (0, 0), (0, 0))))
            # input-phase blocks stack on the C axis
            out_blocks.append(jnp.concatenate(in_blocks, axis=2))
    # output-phase blocks stack on the C' axis
    wp = jnp.concatenate(out_blocks, axis=3)
    return wp, (-lo, hi)


def phase_conv(x_p: jax.Array, w: jax.Array, b=None) -> jax.Array:
    """Apply the k x k 'same' conv `w` (+ bias) to a phase-space tensor."""
    wp, (plo, phi) = phase_conv_kernel(w.astype(x_p.dtype))
    y = jax.lax.conv_general_dilated(
        x_p, wp, (1, 1), ((plo, phi), (plo, phi)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + jnp.tile(b, 4).astype(y.dtype)
    return y
