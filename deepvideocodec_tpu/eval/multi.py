"""Parallel multi-sequence evaluation: N sequences share the chip.

The per-frame codec path has long device<->host latencies (host rANS,
symbol-plane transfers) that a single sequence's strictly-serial frame
recurrence cannot hide. Running several sequences concurrently — each with
its own DPB and bitstream, all sharing the compiled stage programs —
overlaps one sequence's host coding with another's device compute, the
same schedule bench.py uses (measured ~2x dataset throughput at 4 streams
on the axon link). Bitstreams and metrics are identical to the serial
evaluator: per-sequence state never crosses streams.
"""

from __future__ import annotations

import threading
import time
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from .bitstream import write_body
from .evaluator import (
    pad_to_multiple,
    device_mse,
    mses_to_psnrs,
    append_result,
)


class _SeqWorker:
    """One sequence's full encode+decode loop, run on its own thread."""

    def __init__(self, inter_codec, intra_codec, frames, bits_path,
                 gop: int):
        self.inter = inter_codec
        self.intra = intra_codec
        self.frames = frames
        self.bits_path = Path(bits_path)
        self.gop = gop
        self.mses: List = []
        self.frame_secs: List[float] = []
        self.h = self.w = None
        self.n = 0
        self.tic = time.time()
        self.error: Optional[BaseException] = None
        self.thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        try:
            import jax
            import jax.numpy as jnp

            self.bits_path.parent.mkdir(parents=True, exist_ok=True)
            enc_dpb = dec_dpb = None
            first_p = True
            with self.bits_path.open("wb") as f:
                for fi, x in enumerate(self.frames):
                    f_tic = time.perf_counter()
                    _, self.h, self.w, _ = x.shape
                    x_pad = jnp.asarray(pad_to_multiple(np.asarray(x), 64))
                    if fi % self.gop == 0:
                        out = self.intra.compress(x_pad)
                        rec_pad = self.intra.decompress(
                            out["strings"], out["shape"])
                        write_body(f, out["shape"], out["strings"])
                        if self.inter is not None:
                            enc_dpb = self.inter.init_dpb(rec_pad)
                            dec_dpb = enc_dpb
                        first_p = True
                    else:
                        planes, enc_dpb = self.inter.encode_device(
                            x_pad, enc_dpb, first_p=first_p)
                        payload = self.inter.encode_bytes(planes)
                        rec_pad, dec_dpb = self.inter.decode_inter(
                            payload["strings"], payload["shape"], dec_dpb,
                            first_p=first_p)
                        for key in ("motion", "frame"):
                            write_body(f, payload["shape"][key],
                                       payload["strings"][key])
                        first_p = False
                    self.mses.append(device_mse(x_pad, rec_pad,
                                                (self.h, self.w)))
                    self.n += 1
                    self.frame_secs.append(time.perf_counter() - f_tic)
            if self.n == 0:
                raise ValueError(
                    f"sequence for {self.bits_path} yielded no frames")
            jax.block_until_ready(self.mses[-1])
        except BaseException as e:  # surfaced in join()
            self.error = e

    def stats(self, video_name: str, quality: int,
              per_frame: bool = False) -> Dict[str, float]:
        psnrs = mses_to_psnrs(self.mses)
        out = {
            "video": video_name,
            "quality": quality,
            "bpp": self.bits_path.stat().st_size * 8.0
                   / (self.h * self.w * self.n),
            "psnr": float(np.mean(psnrs)),
            "frames": self.n,
            "seconds": time.time() - self.tic,
        }
        if per_frame:
            # parity with evaluate_video's --per-frame (previously the
            # flag was silently dropped on the streams path); wall time
            # per frame includes stream-interleave waits but still shows
            # whether cost grows along the P-chain (the GOP-32 anomaly)
            out["psnr_per_frame"] = [round(float(v), 3) for v in psnrs]
            out["sec_per_frame"] = [round(t, 4) for t in self.frame_secs]
        return out


def evaluate_sequences_parallel(
    inter_codec,
    intra_codec,
    sequences: Sequence[Tuple[str, Iterable, Path]],  # (name, frames, bits)
    gop: int = 32,
    streams: int = 4,
    results_path=None,
    quality: int = 0,
    per_frame: bool = False,
) -> List[Dict[str, float]]:
    """Evaluate sequences `streams` at a time; returns per-sequence stats.

    Same bitstreams/metrics as evaluate_video (per-sequence state is
    fully independent); only the schedule interleaves.
    """
    results: List[Dict[str, float]] = []
    pending = list(sequences)
    while pending:
        batch, pending = pending[:streams], pending[streams:]
        workers = [
            _SeqWorker(inter_codec, intra_codec, frames, bits, gop)
            for (_, frames, bits) in batch
        ]
        for wk in workers:
            wk.thread.start()
        for (name, _, _), wk in zip(batch, workers):
            wk.thread.join()
            if wk.error is not None:
                raise wk.error
            stats = wk.stats(name, quality, per_frame=per_frame)
            if results_path is not None:
                append_result(results_path, stats)
            results.append(stats)
    return results
