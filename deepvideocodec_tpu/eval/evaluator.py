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

_MSE_FNS = {}


def device_mse(x_pad_dev, rec_pad_dev, size):
    """Center-cropped MSE computed on device; returns a device scalar.

    Downloading the padded reconstruction for a host-side PSNR costs a
    ~25 MB device->host transfer per 1080p frame — on a transfer-bound
    link that alone dwarfs the codec. Cropping + reducing on device makes
    the metric a single scalar readback.
    """
    import jax
    import jax.numpy as jnp

    h, w = size
    H, W = x_pad_dev.shape[1], x_pad_dev.shape[2]
    key = (h, w, H, W)
    fn = _MSE_FNS.get(key)
    if fn is None:
        top, left = (H - h) // 2, (W - w) // 2

        def f(a, b):
            ac = a[:, top:top + h, left:left + w, :].astype(jnp.float32)
            bc = b[:, top:top + h, left:left + w, :].astype(jnp.float32)
            d = ac - bc
            return jnp.mean(d * d)

        fn = jax.jit(f)
        _MSE_FNS[key] = fn
    return fn(x_pad_dev, rec_pad_dev)


def mses_to_psnrs(mses) -> np.ndarray:
    """Device-scalar MSE list -> host PSNR array (one readback)."""
    import jax

    vals = np.asarray(jax.device_get(list(mses)), np.float64)
    return -10.0 * np.log10(np.maximum(vals, 1e-12))


_MSSSIM_FNS = {}


def device_msssim(x_pad_dev, rec_pad_dev, size):
    """Center-cropped MS-SSIM on device; returns a device scalar."""
    import jax
    import jax.numpy as jnp

    from ..utils.metrics import msssim_value

    h, w = size
    H, W = x_pad_dev.shape[1], x_pad_dev.shape[2]
    key = (h, w, H, W)
    fn = _MSSSIM_FNS.get(key)
    if fn is None:
        top, left = (H - h) // 2, (W - w) // 2

        def f(a, b):
            ac = a[:, top:top + h, left:left + w, :].astype(jnp.float32)
            bc = b[:, top:top + h, left:left + w, :].astype(jnp.float32)
            return msssim_value(ac, bc)

        fn = jax.jit(f)
        _MSSSIM_FNS[key] = fn
    return fn(x_pad_dev, rec_pad_dev)


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


def append_result(results_path, stats: Dict) -> None:
    """Append one sequence record to the per-quality results JSON list."""
    results_path = Path(results_path)
    results_path.parent.mkdir(parents=True, exist_ok=True)
    existing: List = []
    if results_path.is_file():
        existing = json.loads(results_path.read_text())
    existing.append(stats)
    results_path.write_text(json.dumps(existing, indent=2))


def evaluate_video(
    inter_codec: DmcCodec,
    intra_codec: IntraCodec,
    frames,                      # iterable of (1, H, W, 3) float arrays
    bits_path,
    gop: int = 32,
    results_path=None,
    video_name: str = "",
    quality: int = 0,
    compute_msssim: bool = False,
    per_frame: bool = False,
) -> Dict[str, float]:
    """Code a sequence end-to-end; returns {'bpp', 'psnr', 'frames', ...}
    (+ 'msssim' when compute_msssim)."""
    bits_path = Path(bits_path)
    bits_path.parent.mkdir(parents=True, exist_ok=True)

    import jax.numpy as jnp

    tic = time.time()
    mses = []
    msssims = []
    frame_secs = []
    n_frames = 0
    h = w = None
    dpb = None

    with bits_path.open("wb") as f:
        for fi, x in enumerate(frames):
            f_tic = time.perf_counter()
            _, h, w, _ = x.shape
            x_pad = jnp.asarray(pad_to_multiple(np.asarray(x), 64))

            if fi % gop == 0:
                out = intra_codec.compress(x_pad)
                rec_pad = intra_codec.decompress(
                    out["strings"], out["shape"])
                write_body(f, out["shape"], out["strings"])
                # all-intra coding (gop=1, inter_codec=None) never
                # propagates a DPB
                if inter_codec is not None:
                    dpb = inter_codec.init_dpb(rec_pad)
                first_p = True
            else:
                payload, _enc_dpb = inter_codec.encode_inter(
                    x_pad, dpb, first_p=first_p)
                rec_pad, dpb = inter_codec.decode_inter(
                    payload["strings"], payload["shape"], dpb,
                    first_p=first_p)
                for key in ("motion", "frame"):
                    write_body(f, payload["shape"][key],
                               payload["strings"][key])
                first_p = False

            mses.append(device_mse(x_pad, rec_pad, (h, w)))
            if compute_msssim:
                msssims.append(device_msssim(x_pad, rec_pad, (h, w)))
            n_frames += 1
            frame_secs.append(time.perf_counter() - f_tic)

    psnrs = mses_to_psnrs(mses)
    num_pixels = h * w * n_frames
    avg_bpp = bits_path.stat().st_size * 8.0 / num_pixels
    stats = {
        "video": str(video_name),
        "quality": quality,
        "gop": gop,
        "bpp": avg_bpp,
        "psnr": float(np.mean(psnrs)),
        "frames": n_frames,
        "seconds": time.time() - tic,
    }
    if per_frame:
        # drift visibility: the PSNR trajectory within/across GOPs
        stats["psnr_per_frame"] = [round(float(v), 3) for v in psnrs]
        # wall-time trajectory: diagnoses whether the GOP-32 eval-time
        # anomaly (12 vs 4.5 min at equal frame counts, docs/NEXT.md)
        # grows within the P-chain (drift->wider symbols->rANS bypass
        # escapes) or is flat (link/compile overhead)
        stats["sec_per_frame"] = [round(t, 4) for t in frame_secs]
    if compute_msssim:
        import jax

        stats["msssim"] = float(np.mean(np.asarray(
            jax.device_get(list(msssims)), np.float64)))

    if results_path is not None:
        append_result(results_path, stats)
    return stats


def decode_video(
    inter_codec: DmcCodec,
    intra_codec: IntraCodec,
    bits_path,
    gop: int = 32,
    size=None,
):
    """Decode a .bits container back to frames — bitstream + params only.

    The standalone-receiver path the reference never ships (its test.py
    decodes inline from in-memory strings, /root/reference/dmc/test.py:
    165,187): reads the container until clean EOF, threading the DPB
    through each GOP. Frame count is implied by the stream (an I unit
    every `gop` frames, two units per P frame). Yields (H, W, 3) float
    arrays in [0, 1], cropped to `size` when the original extent is given
    (the container, like the reference's, stores only latent shapes).
    """
    from .bitstream import try_read_body

    with Path(bits_path).open("rb") as f:
        fi = 0
        dpb = None
        first_p = True
        while True:
            unit = try_read_body(f)
            if unit is None:
                return
            shape, strings = unit
            if fi % gop == 0:
                rec_pad = intra_codec.decompress(strings, shape)
                dpb = inter_codec.init_dpb(rec_pad)
                first_p = True
            else:
                try:
                    f_shape, f_strings = read_body(f)
                except EOFError as e:
                    # the container is not GOP-self-describing (wire
                    # parity with the reference's writer): an EOF midway
                    # through a P-frame's motion/frame unit pair almost
                    # always means the caller's gop doesn't match the
                    # encoder's, not real truncation.
                    raise EOFError(
                        f"{e} at frame {fi} — is --gop (got {gop}) the "
                        "value the stream was encoded with?") from e
                rec_pad, dpb = inter_codec.decode_inter(
                    {"motion": strings, "frame": f_strings},
                    {"motion": shape, "frame": f_shape},
                    dpb, first_p=first_p)
                first_p = False
            rec = np.clip(np.asarray(rec_pad)[0], 0.0, 1.0)
            yield crop_to(rec[None], size)[0] if size is not None else rec
            fi += 1
