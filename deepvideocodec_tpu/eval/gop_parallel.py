"""GOP-parallel coding: one sequence's independent GOPs across codec replicas.

Every GOP is a closed coding unit — it opens with an I-frame and a fresh
DPB, and nothing crosses the boundary (reference protocol:
/root/reference/dmc/test.py:162-172) — so a sequence's GOPs are
data-independent and can be coded concurrently. This is the third
concurrency axis of the evaluator, orthogonal to the other two:

  - eval/pipeline.py — within a frame chain, host rANS overlaps device NN;
  - eval/multi.py    — across sequences, N streams share one chip;
  - this module      — within one sequence, GOP k goes to replica k % W.

It is also the unit of multi-chip serving scale-out: `replicate_codecs`
places one codec replica per device (`jax.device_put` of the params commits
every stage program to that chip), so a GOP-32, 96-frame sequence encodes on
3 chips in ~1/3 the wall clock with a container byte-identical to the serial
evaluator's (per-GOP payloads depend only on that GOP's frames; asserted in
tests/test_gop_parallel.py). On a single chip the same scheduler still helps
the way multi-streaming does — one GOP's host coding overlaps another's
device compute — with replicas sharing one codec object.
"""

from __future__ import annotations

import io
import os
import threading
import time
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .bitstream import read_uints, write_body, read_body
from .evaluator import (
    pad_to_multiple,
    crop_to,
    device_mse,
    device_msssim,
    mses_to_psnrs,
    append_result,
)


def replicate_codecs(inter_model, inter_params, intra_model, intra_params,
                     devices, inter_cls=None):
    """One (inter, intra) codec replica per device.

    Params are committed to each device, so every stage program an instance
    jits compiles for — and runs on — that chip. Returns a list of
    (inter_codec, intra_codec, device) triples usable as the `replicas`
    argument below. Passing the same device several times is supported but
    wasteful — repeat the returned triple instead (codec objects are
    thread-safe; bench.py's streams share one).
    """
    import jax

    from .codec import DmcCodec, IntraCodec

    inter_cls = inter_cls or DmcCodec
    out = []
    for d in devices:
        inter = None
        if inter_model is not None:
            inter = inter_cls(inter_model, jax.device_put(inter_params, d))
        intra = IntraCodec(intra_model, jax.device_put(intra_params, d))
        out.append((inter, intra, d))
    return out


def _put(x_np, device):
    import jax
    import jax.numpy as jnp

    return (jax.device_put(x_np, device) if device is not None
            else jnp.asarray(x_np))


class _EncodeWorker:
    """Codes its assigned GOP chunks; one thread, one codec replica."""

    def __init__(self, replica, compute_msssim: bool = False):
        self.inter, self.intra, self.dev = replica
        self.compute_msssim = compute_msssim
        self.q: "list" = []
        self.cv = threading.Condition()
        self.done = False
        self.results: Dict[int, tuple] = {}
        self.error: Optional[BaseException] = None
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def submit(self, idx: int, chunk: List[np.ndarray]):
        # backpressure: at most 2 queued chunks per worker, so a long
        # sequence never materializes whole in worker queues (the serial
        # evaluator streams; this bounds us at ~3 GOPs x replicas)
        with self.cv:
            while len(self.q) >= 2 and self.error is None:
                self.cv.wait()
            self.q.append((idx, chunk))
            self.cv.notify_all()

    def close(self):
        with self.cv:
            self.done = True
            self.cv.notify_all()

    def _code_chunk(self, chunk, compute_msssim):
        import jax

        buf = io.BytesIO()
        mses, msssims = [], []
        h = w = None
        dpb = None
        first_p = True
        for fi, x in enumerate(chunk):
            _, h, w, _ = x.shape
            x_pad = _put(pad_to_multiple(np.asarray(x), 64), self.dev)
            if fi == 0:
                out = self.intra.compress(x_pad)
                rec_pad = self.intra.decompress(out["strings"],
                                                out["shape"])
                write_body(buf, out["shape"], out["strings"])
                if self.inter is not None:
                    dpb = self.inter.init_dpb(rec_pad)
            else:
                payload, _ = self.inter.encode_inter(x_pad, dpb,
                                                     first_p=first_p)
                rec_pad, dpb = self.inter.decode_inter(
                    payload["strings"], payload["shape"], dpb,
                    first_p=first_p)
                for key in ("motion", "frame"):
                    write_body(buf, payload["shape"][key],
                               payload["strings"][key])
                first_p = False
            mses.append(device_mse(x_pad, rec_pad, (h, w)))
            if compute_msssim:
                msssims.append(device_msssim(x_pad, rec_pad, (h, w)))
        # materialize this chunk's device scalars before reporting done so
        # cross-device result merging never blocks on in-flight programs
        jax.block_until_ready(mses[-1])
        return buf.getvalue(), mses, msssims, (h, w)

    def _run(self):
        try:
            while True:
                with self.cv:
                    while not self.q and not self.done:
                        self.cv.wait()
                    if not self.q:
                        return
                    idx, chunk = self.q.pop(0)
                    self.cv.notify_all()  # wake a blocked submit
                self.results[idx] = self._code_chunk(
                    chunk, self.compute_msssim)
        except BaseException as e:  # noqa: BLE001 — reraised by the driver
            self.error = e
            with self.cv:
                self.cv.notify_all()


def evaluate_video_gop_parallel(
    replicas: Sequence[tuple],     # (inter_codec, intra_codec, device)
    frames,                        # iterable of (1, H, W, 3) float arrays
    bits_path,
    gop: int = 32,
    results_path=None,
    video_name: str = "",
    quality: int = 0,
    compute_msssim: bool = False,
    per_frame: bool = False,
) -> Dict[str, float]:
    """evaluate_video with GOP chunks fanned out over codec replicas.

    Produces a byte-identical container and identical metrics to the serial
    `evaluate_video` (same protocol keys in the stats dict); `replicas` may
    repeat one codec pair to multi-stream a single chip, or carry
    `replicate_codecs(...)` output to fan out over real devices.
    """
    bits_path = Path(bits_path)
    bits_path.parent.mkdir(parents=True, exist_ok=True)
    tic = time.time()

    workers = [_EncodeWorker(r, compute_msssim) for r in replicas]

    # stream frames in, submitting each complete GOP chunk round-robin
    n_chunks = 0
    chunk: List[np.ndarray] = []
    for x in frames:
        chunk.append(np.asarray(x))
        if len(chunk) == gop:
            workers[n_chunks % len(workers)].submit(n_chunks, chunk)
            n_chunks += 1
            chunk = []
    if chunk:
        workers[n_chunks % len(workers)].submit(n_chunks, chunk)
        n_chunks += 1
    for wk in workers:
        wk.close()
    for wk in workers:
        wk.thread.join()
    for wk in workers:
        if wk.error is not None:
            raise wk.error
    if n_chunks == 0:
        raise ValueError(f"sequence for {bits_path} yielded no frames")

    # merge in GOP order: container bytes, then metrics
    mses, msssims = [], []
    h = w = None
    n_frames = 0
    with bits_path.open("wb") as f:
        for idx in range(n_chunks):
            data, c_mses, c_msssims, (h, w) = \
                workers[idx % len(workers)].results[idx]
            f.write(data)
            mses.extend(c_mses)
            msssims.extend(c_msssims)
            n_frames += len(c_mses)

    psnrs = mses_to_psnrs(mses)
    avg_bpp = bits_path.stat().st_size * 8.0 / (h * w * n_frames)
    stats = {
        "video": str(video_name),
        "quality": quality,
        "gop": gop,
        "bpp": avg_bpp,
        "psnr": float(np.mean(psnrs)),
        "frames": n_frames,
        "seconds": time.time() - tic,
        "gop_parallel": len(replicas),
    }
    if per_frame:
        stats["psnr_per_frame"] = [round(float(v), 3) for v in psnrs]
    if compute_msssim:
        import jax

        stats["msssim"] = float(np.mean(np.asarray(
            jax.device_get(list(msssims)), np.float64)))
    if results_path is not None:
        append_result(results_path, stats)
    return stats


def _skip_unit(f) -> bool:
    """Advance past one coded unit; False at clean EOF.

    Seeks are bounds-checked against the file size so a container
    truncated mid-payload fails HERE at scan time (where the offset is
    known), not later inside a decode worker as a generic rANS error.
    """
    header = f.read(12)
    if not header:
        return False
    if len(header) != 12:
        raise EOFError("truncated bitstream")
    size = os.fstat(f.fileno()).st_size
    n = int.from_bytes(header[8:12], "big")
    for _ in range(n):
        (length,) = read_uints(f, 1)
        f.seek(length, 1)
        if f.tell() > size:
            raise EOFError(
                f"truncated bitstream: unit at offset declares a "
                f"{length}-byte string that overruns the {size}-byte file "
                f"(ends at {f.tell()})")
    return True


def scan_gop_offsets(bits_path, gop: int) -> List[Tuple[int, int]]:
    """(byte offset, frame count) of every GOP in a .bits container.

    The container is not GOP-self-describing (wire parity with the
    reference's writer — eval/bitstream.py), but it IS cheaply skippable:
    every unit's string lengths are in its header, so one pass of
    header-reads + seeks — no rANS, no device — indexes the GOP starts
    that `decode_video_gop_parallel` fans out over. An EOF midway through
    a P-frame's motion/frame unit pair means the caller's `gop` does not
    match the encoder's (same failure surface as the serial decoder).
    """
    out: List[Tuple[int, int]] = []
    with Path(bits_path).open("rb") as f:
        while True:
            off = f.tell()
            if not _skip_unit(f):       # I-frame unit (or clean end)
                return out
            n_frames = 1
            for _ in range(gop - 1):    # P frames: motion + frame units
                probe = f.tell()
                if not _skip_unit(f):
                    break
                if not _skip_unit(f):
                    raise EOFError(
                        f"truncated P-frame unit pair at offset {probe} — "
                        f"is --gop (got {gop}) the value the stream was "
                        "encoded with?")
                n_frames += 1
            out.append((off, n_frames))


class _DecodeWorker:
    """Decodes its assigned GOPs from (offset, n_frames) container slices."""

    def __init__(self, replica, bits_path, size):
        self.inter, self.intra, self.dev = replica
        self.bits_path = bits_path
        self.size = size
        self.q: "list" = []
        self.cv = threading.Condition()
        self.done = False
        self.cancel = False
        self.results: Dict[int, List[np.ndarray]] = {}
        self.ready = threading.Condition()
        self.error: Optional[BaseException] = None
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def stop(self):
        """Abandon remaining GOPs (consumer gone); wakes all waits."""
        self.cancel = True
        with self.cv:
            self.cv.notify_all()
        with self.ready:
            self.ready.notify_all()

    def submit(self, idx: int, span: Tuple[int, int]):
        with self.cv:
            self.q.append((idx, span))
            self.cv.notify()

    def close(self):
        with self.cv:
            self.done = True
            self.cv.notify()

    def _decode_gop(self, f, n_frames) -> List[np.ndarray]:
        recs = []
        dpb = None
        first_p = True
        for fi in range(n_frames):
            if fi == 0:
                shape, strings = read_body(f)
                rec_pad = self.intra.decompress(strings, shape)
                if self.inter is not None:
                    dpb = self.inter.init_dpb(rec_pad)
            else:
                m_shape, m_strings = read_body(f)
                f_shape, f_strings = read_body(f)
                rec_pad, dpb = self.inter.decode_inter(
                    {"motion": m_strings, "frame": f_strings},
                    {"motion": m_shape, "frame": f_shape},
                    dpb, first_p=first_p)
                first_p = False
            rec = np.clip(np.asarray(rec_pad)[0], 0.0, 1.0)
            recs.append(crop_to(rec[None], self.size)[0]
                        if self.size is not None else rec)
        return recs

    def _run(self):
        try:
            with Path(self.bits_path).open("rb") as f:
                while True:
                    with self.cv:
                        while (not self.q and not self.done
                               and not self.cancel):
                            self.cv.wait()
                        if not self.q or self.cancel:
                            return
                        idx, (off, n_frames) = self.q.pop(0)
                    f.seek(off)
                    res = self._decode_gop(f, n_frames)
                    with self.ready:
                        self.results[idx] = res
                        self.ready.notify_all()
                        # backpressure: at most 2 undelivered GOPs per
                        # worker (decoded 1080p frames are ~24 MB each;
                        # racing ahead of the in-order consumer would
                        # buffer a whole sequence in RAM)
                        while len(self.results) >= 2 and not self.cancel:
                            self.ready.wait()
        except BaseException as e:  # noqa: BLE001 — reraised by the driver
            self.error = e
            with self.ready:
                self.ready.notify_all()


def decode_video_gop_parallel(
    replicas: Sequence[tuple],     # (inter_codec, intra_codec, device)
    bits_path,
    gop: int = 32,
    size=None,
):
    """decode_video with GOPs fanned out over codec replicas.

    Scans the container's GOP offsets (header skips only), decodes GOP k on
    replica k % W, and yields frames strictly in order — the parallel
    receiver matching `evaluate_video_gop_parallel`'s transmitter. Output
    frames are identical to the serial `decode_video`'s (asserted in
    tests/test_gop_parallel.py).
    """
    spans = scan_gop_offsets(bits_path, gop)
    workers = [_DecodeWorker(r, bits_path, size) for r in replicas]
    for idx, span in enumerate(spans):
        workers[idx % len(workers)].submit(idx, span)
    for wk in workers:
        wk.close()

    try:
        for idx in range(len(spans)):
            wk = workers[idx % len(workers)]
            with wk.ready:
                while idx not in wk.results and wk.error is None:
                    wk.ready.wait()
                if wk.error is not None:
                    raise wk.error
                recs = wk.results.pop(idx)
                wk.ready.notify_all()  # wake a backpressured worker
            yield from recs
    finally:
        # consumer gone or done: abandon undecoded GOPs at the next
        # boundary instead of burning device time nobody will read
        for wk in workers:
            wk.stop()
        for wk in workers:
            wk.thread.join(timeout=60)
    for wk in workers:
        if wk.error is not None:
            raise wk.error
