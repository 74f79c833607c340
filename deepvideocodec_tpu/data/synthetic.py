"""Synthetic video generators for tests and benchmarks (no dataset needed)."""

from __future__ import annotations

from typing import List

import numpy as np


def synthetic_video_frames(
    n_frames: int, h: int, w: int, seed: int = 0
) -> List[np.ndarray]:
    """Smooth drifting sinusoid pattern — codable, non-trivial motion."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    phases = rng.random(3).astype(np.float32)
    out = []
    for t in range(n_frames):
        img = np.stack(
            [
                0.5
                + 0.35 * np.sin(2 * np.pi * (xx / 64 + 0.08 * t + p))
                * np.cos(2 * np.pi * (yy / 48 - 0.06 * t + p))
                for p in phases
            ],
            axis=-1,
        )
        out.append(np.clip(img, 0.0, 1.0)[None].astype(np.float32))
    return out


def synthetic_clip_batch(
    batch: int, n_frames: int, h: int, w: int, seed: int = 0
) -> np.ndarray:
    """(B, T, H, W, 3) batch of distinct synthetic clips."""
    clips = []
    for b in range(batch):
        frames = synthetic_video_frames(n_frames, h, w, seed + b)
        clips.append(np.concatenate(frames, axis=0))
    return np.stack(clips)
