"""GOP-structured video evaluation with a real bitstream.

Protocol parity with the reference evaluator
(/root/reference/dmc/test.py:106-241): frames are center-padded to
multiples of 64, every GOP-th frame is intra-coded, P-frames run
encode -> (bytes) -> decode through the real coder (decoded PSNR is true
decode fidelity), bpp comes from the actual file size (headers included),
PSNR is per-frame -10*log10(MSE) on un-padded [0,1] RGB.
"""

from __future__ import annotations

import json
import math
import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from .bitstream import write_body, read_body
from .codec import DmcCodec, IntraCodec


def pad_to_multiple(x: np.ndarray, p: int = 64) -> np.ndarray:
    """Center zero-pad (B, H, W, C) spatially to multiples of p."""
    _, h, w, _ = x.shape
    H = (h + p - 1) // p * p
    W = (w + p - 1) // p * p
    top = (H - h) // 2
    left = (W - w) // 2
    return np.pad(
        x,
        ((0, 0), (top, H - h - top), (left, W - w - left), (0, 0)),
        mode="constant",
    )


def crop_to(x: np.ndarray, size) -> np.ndarray:
    """Center crop (B, H, W, C) back to (h, w)."""
    _, H, W, _ = x.shape
    h, w = size
    top = (H - h) // 2
    left = (W - w) // 2
    return x[:, top:top + h, left:left + w, :]


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return -10.0 * math.log10(max(mse, 1e-12))


def load_png_frames(frame_dir, num_frames: Optional[int] = None):
    """Sorted *.png frames as float [0,1] RGB (1, H, W, 3) arrays."""
    from PIL import Image

    paths = sorted(Path(frame_dir).glob("*.png"))
    if num_frames is not None:
        paths = paths[:num_frames]
    for p in paths:
        img = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
        yield img[None]


def evaluate_video(
    inter_codec: DmcCodec,
    intra_codec: IntraCodec,
    frames,                      # iterable of (1, H, W, 3) float arrays
    bits_path,
    gop: int = 32,
    results_path=None,
    video_name: str = "",
    quality: int = 0,
) -> Dict[str, float]:
    """Code a sequence end-to-end; returns {'bpp', 'psnr', 'frames', ...}."""
    bits_path = Path(bits_path)
    bits_path.parent.mkdir(parents=True, exist_ok=True)

    tic = time.time()
    sum_psnr = 0.0
    n_frames = 0
    h = w = None
    dpb = None

    with bits_path.open("wb") as f:
        for fi, x in enumerate(frames):
            _, h, w, _ = x.shape
            x_pad = pad_to_multiple(x, 64)

            if fi % gop == 0:
                out = intra_codec.compress(x_pad)
                rec_pad = intra_codec.decompress(
                    out["strings"], out["shape"])
                rec_pad = np.asarray(rec_pad)
                write_body(f, out["shape"], out["strings"])
                dpb = inter_codec.init_dpb(rec_pad)
                first_p = True
            else:
                payload, _enc_dpb = inter_codec.encode_inter(
                    x_pad, dpb, first_p=first_p)
                rec_pad, dpb = inter_codec.decode_inter(
                    payload["strings"], payload["shape"], dpb,
                    first_p=first_p)
                rec_pad = np.asarray(rec_pad)
                for key in ("motion", "frame"):
                    write_body(f, payload["shape"][key],
                               payload["strings"][key])
                first_p = False

            rec = crop_to(rec_pad, (h, w))
            sum_psnr += psnr(np.asarray(x), rec)
            n_frames += 1

    num_pixels = h * w * n_frames
    avg_bpp = bits_path.stat().st_size * 8.0 / num_pixels
    stats = {
        "video": str(video_name),
        "quality": quality,
        "bpp": avg_bpp,
        "psnr": sum_psnr / n_frames,
        "frames": n_frames,
        "seconds": time.time() - tic,
    }

    if results_path is not None:
        results_path = Path(results_path)
        results_path.parent.mkdir(parents=True, exist_ok=True)
        existing: List = []
        if results_path.is_file():
            existing = json.loads(results_path.read_text())
        existing.append(stats)
        results_path.write_text(json.dumps(existing, indent=2))
    return stats
