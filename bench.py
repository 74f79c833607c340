"""Benchmark: DMC 1080p encode+decode frames/sec on one TPU chip.

Protocol: pad 1080p to 1088x1920 (x64 multiple, reference test.py:159),
stream P-frames through the REAL codec path — all device NN stages plus the
host rANS coder on actual bytes — exactly what `evaluate_video` runs per
frame, scheduled as the streaming pipeline (eval/pipeline.py): device
encode drives the recurrence, host rANS and the standalone decoder overlap
it. Frames enter as uint8 (what a real video source delivers) and are
converted on device. Reports one JSON line for the driver.

vs_baseline: the reference publishes no speed numbers (BASELINE.md — README
is an empty TODO list). The denominator used here is 1.5 fps, a documented
estimate of this model class's torch GPU enc+dec throughput at 1080p
(DCVC-TCM/HEM-line reimplementations run ~0.5-1 s/frame on datacenter
GPUs); BASELINE.json's target of >=5x reference GPU fps therefore maps to
vs_baseline >= 5.
"""

from __future__ import annotations

import json
import os
import queue
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

BASELINE_FPS = 1.5


def _axon_relay_preflight(timeout_s: float = 180.0):
    """Probe the axon TPU relay; return a diagnostic string if it is down.

    The axon backend dials 127.0.0.1:<relay ports>; when the relay
    process has died (observed 2026-08-17), jaxlib spins its silent 1 s
    connect-retry loop indefinitely — so probe the primary port with a
    grace window for transient restarts BEFORE letting jax init the
    backend. On failure the caller measures an XLA:CPU fallback run (a
    real number, clearly labeled) instead of emitting value:null: the
    driver's scoreboard artifact must never be empty on account of
    infrastructure.
    """
    if os.environ.get("BENCH_FORCE_CPU_FALLBACK") == "1":
        # Test knob: exercise the relay-down path (diagnostic print + CPU
        # fallback protocol) regardless of actual relay state. The r4
        # scoreboard was lost to an untested crash on exactly this path
        # (a function-local `import sys` shadowing the module import);
        # tests/test_bench_fallback.py runs bench end to end with this.
        return ("forced CPU fallback (BENCH_FORCE_CPU_FALLBACK=1) — "
                "smoke-testing the relay-down path")
    if "axon" not in os.environ.get("JAX_PLATFORMS", "axon"):
        return None
    import socket

    deadline = time.time() + timeout_s
    while True:
        try:
            with socket.create_connection(("127.0.0.1", 8083), timeout=3):
                return None
        except OSError:
            if time.time() >= deadline:
                return ("axon TPU relay unreachable (127.0.0.1:8083 "
                        f"refused for {timeout_s:.0f}s) — infrastructure "
                        "down, not a codec regression; measuring the "
                        "XLA:CPU fallback protocol instead")
            time.sleep(5)


def _axon_client_probe(timeout_s: float = 240.0):
    """Second-stage relay probe: init a real jax client in a subprocess.

    Observed 2026-08-19 ~22:45: the relay can die in a ZOMBIE state
    where 127.0.0.1:8083 still accepts TCP connects but every jax
    client hangs forever in backend init — the TCP preflight above
    passes and bench would hang with no JSON. So, after the port
    answers, prove an end-to-end scalar fetch in a killable subprocess
    before letting this process init the (unkillable-once-hung) axon
    backend. Warm healthy init is ~15 s; the generous default timeout
    covers a cold relay restart.
    """
    if "axon" not in os.environ.get("JAX_PLATFORMS", "axon"):
        return None
    import subprocess

    code = ("import jax, jax.numpy as jnp;"
            "print('probe-ok', float(jnp.sum(jnp.ones(()))))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=timeout_s)
        if r.returncode == 0 and "probe-ok" in r.stdout:
            return None
        return ("axon client probe exited rc=%d (%s) — relay broken; "
                "measuring the XLA:CPU fallback protocol instead"
                % (r.returncode, (r.stderr or "").strip()[-200:]))
    except subprocess.TimeoutExpired:
        return (f"axon relay ZOMBIE: port 8083 answers but a jax client "
                f"hung in backend init for {timeout_s:.0f}s — "
                "infrastructure down, not a codec regression; measuring "
                "the XLA:CPU fallback protocol instead")


# Last successful TPU run before the relay died (docs/PERFORMANCE.md
# round-4 table) — context attached to any CPU-fallback record.
_LAST_TPU_MEASURED = {
    "value": 2.278, "vs_baseline": 1.518,
    "date": "2026-08-19", "variant": "fast4",
    "weights": "trained-checkpoint (ckpts/dmc_fast4_2048_mf5.npz, "
               "full restore)",
    "note": "uncontended post-reboot full-protocol run (1080p, 24 "
            "frames x 4 streams, real bitstream), ~40 min before the "
            "relay re-died in zombie mode; docs/PERFORMANCE.md round-4",
}


def main():
    preflight_grace = float(os.environ.get("BENCH_RELAY_GRACE_S", "180"))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    relay_error = _axon_relay_preflight(preflight_grace)
    if relay_error is None:
        relay_error = _axon_client_probe(
            float(os.environ.get("BENCH_CLIENT_PROBE_S", "240")))
    cpu_fallback = relay_error is not None
    if cpu_fallback:
        print(f"bench: {relay_error}", file=sys.stderr)
    import jax

    # Honor an explicit JAX_PLATFORMS even when the axon sitecustomize
    # already imported jax and forced jax_platforms="axon,cpu" (its
    # register() runs at interpreter startup, so env-var-only forcing is
    # too late — same trick as tests/conftest.py). Makes the CPU dev
    # path (BENCH_SIZE=64x64 JAX_PLATFORMS=cpu) work without PYTHONPATH
    # surgery.
    if cpu_fallback:
        jax.config.update("jax_platforms", "cpu")
    elif os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    import numpy as np

    from deepvideocodec_tpu.models import fast_init
    from deepvideocodec_tpu.eval.codec import DmcCodec
    from deepvideocodec_tpu.data.synthetic import synthetic_video_frames
    from deepvideocodec_tpu.eval.evaluator import pad_to_multiple

    # BENCH_SIZE=HxW: dev smoke-testing knob (e.g. 64x64 on CPU when the
    # TPU tunnel is down); the headline protocol is the 1080p default.
    # CPU fallback shrinks the protocol so a 1-core run finishes inside
    # the driver's window (the number is labeled with its protocol).
    default_size = "256x448" if cpu_fallback else "1080x1920"
    default_frames = "4" if cpu_fallback else "24"
    h, w = (int(v) for v in
            os.environ.get("BENCH_SIZE", default_size).split("x"))
    # long enough that tunnel/host noise averages out (~1 min timed)
    n_frames = int(os.environ.get("BENCH_FRAMES", default_frames))
    # bf16 default: conv time dominates and the MXU gain outweighs the
    # casts at the f32 pins; the codec is bit-exact encoder/decoder in
    # either mode (entropy math stays f32). Stream count 4 measured best
    # among {2,3,4,5} within noise (link RTTs overlap across streams;
    # see docs/PERFORMANCE.md link cost model).
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")

    # BENCH_MODEL selects the codec family (dmc is the flagship/default;
    # dvc and dcvc share the identical streaming-codec driver API).
    model_name = os.environ.get("BENCH_MODEL", "dmc")
    # Committed default: ckpts/bench_default.json points at a trained npz
    # export + the topology variant it was trained with, so a bare
    # `python bench.py` benches trained serving behavior. Env knobs
    # (BENCH_VARIANT / BENCH_CHECKPOINT / BENCH_NPZ) override it.
    default_npz = None
    default_variant = "base"
    meta = {}
    meta_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "ckpts", "bench_default.json")
    if model_name == "dmc" and os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        default_npz = os.path.join(os.path.dirname(meta_path), meta["npz"])
        default_variant = meta.get("variant", "base")
    # BENCH_VARIANT=fast enables the speed/RD architecture variants
    # (DMCConfig.warp_ctx_half + flow_half — see models/dmc.py); 'base'
    # is the reference-parity topology.
    variant = os.environ.get("BENCH_VARIANT", default_variant)
    # BENCH_UNET_WIDTH: recon UNet base width (must match the weights'
    # topology; bench_default.json may pin it for the committed default).
    unet_w = os.environ.get("BENCH_UNET_WIDTH", meta.get("unet_width"))
    key = jax.random.PRNGKey(0)
    from deepvideocodec_tpu.models import build_inter_model

    model = build_inter_model(model_name, variant,
                              int(unet_w) if unet_w else None, dtype)
    if model_name == "dmc":
        codec_cls = DmcCodec
    else:
        from deepvideocodec_tpu.eval.codec import DvcCodec, DcvcCodec

        codec_cls = DvcCodec if model_name == "dvc" else DcvcCodec
    params = jax.block_until_ready(fast_init(model, key))
    # BENCH_CHECKPOINT: bench with trained weights (a params export dir or
    # an Orbax checkpoint dir). Trained weights shrink symbol payloads
    # ~50x vs random init, so host rANS + link costs reflect real serving.
    ckpt = os.environ.get("BENCH_CHECKPOINT")
    npz = os.environ.get("BENCH_NPZ", None if ckpt else default_npz)
    ckpt_loaded = False
    # BENCH_PARTIAL=1: shape-tolerant warm start — bench a topology
    # variant (fast2 / --unet-width trades) whose param tree is a strict
    # subset of a committed export's. Trained entropy/transform weights
    # keep the payload sizes realistic; only the changed modules run
    # fresh-init.
    partial = os.environ.get("BENCH_PARTIAL") == "1"
    if npz and not ckpt:
        if partial:
            from deepvideocodec_tpu.utils import (
                restore_params_export_partial)

            params, hit, miss = restore_params_export_partial(npz, params)
            print(f"partial restore: {len(hit)} loaded, {len(miss)} fresh",
                  file=sys.stderr, flush=True)
        else:
            from deepvideocodec_tpu.utils import restore_npz_export

            params = restore_npz_export(npz, params)
        ckpt_loaded = True
    elif ckpt:
        from deepvideocodec_tpu.utils import restore_any_params

        params = restore_any_params(ckpt, params)
        ckpt_loaded = True
    codec = codec_cls(model, params)

    # 8-bit source frames converted to float on device. Default ingestion
    # is YUV 4:2:0 — the production video delivery format — packed into
    # ONE flat uint8 buffer per frame: 3.1 MB and a single transfer floor
    # over the host link instead of 6.3 MB RGB (BENCH_INPUT=rgb for the
    # old path). Device converts (ops/colorspace.py) inside the same jit.
    input_fmt = os.environ.get("BENCH_INPUT", "yuv420")
    rgb_u8 = [
        (pad_to_multiple(f) * 255.0 + 0.5).astype(np.uint8)
        for f in synthetic_video_frames(n_frames + 2, h, w, seed=0)
    ]
    Hp, Wp = rgb_u8[0].shape[1:3]
    if input_fmt == "yuv420":
        from deepvideocodec_tpu.ops.colorspace import (
            rgb_to_yuv420_np, yuv420_to_rgb)

        def pack(f):
            y, u, v = rgb_to_yuv420_np(f)
            return np.concatenate([y.ravel(), u.ravel(), v.ravel()])

        frames_u8 = [pack(f) for f in rgb_u8]
        ny, nc = Hp * Wp, (Hp // 2) * (Wp // 2)

        @jax.jit
        def to_f32(buf):
            y = buf[:ny].reshape(1, Hp, Wp, 1)
            u = buf[ny:ny + nc].reshape(1, Hp // 2, Wp // 2, 1)
            v = buf[ny + nc:].reshape(1, Hp // 2, Wp // 2, 1)
            return yuv420_to_rgb(y, u, v)
    else:
        frames_u8 = rgb_u8
        to_f32 = jax.jit(lambda u8: u8.astype(jnp.float32) / 255.0)

    dpb = codec.init_dpb(to_f32(jnp.asarray(frames_u8[0])))

    # warmup / compile both first_p variants of every program
    pl, dpb1 = codec.encode_device(to_f32(jnp.asarray(frames_u8[1])), dpb,
                                   first_p=True)
    pay = codec.encode_bytes(pl)
    _, dpb1 = codec.decode_inter(pay["strings"], pay["shape"], dpb,
                                 first_p=True)
    pl, dpb2 = codec.encode_device(to_f32(jnp.asarray(frames_u8[2])), dpb1,
                                   first_p=False)
    pay = codec.encode_bytes(pl)
    _, dpb2 = codec.decode_inter(pay["strings"], pay["shape"], dpb1,
                                 first_p=False)
    jax.block_until_ready(dpb2["x_ref"])

    # timed: n_frames P-frames x n_streams concurrent sequences. Per
    # stream: the encoder drives the device recurrence, rANS byte
    # production and the standalone decoder (bytes -> pixels) overlap it.
    # Multiple independent streams keep the chip busy while one stream's
    # host coding / transfers are in flight — the per-chip *throughput*
    # a serving deployment gets (each stream's frames remain strictly
    # sequential, exactly like the single-stream path).
    n_streams = int(os.environ.get("BENCH_STREAMS",
                                   "1" if cpu_fallback else "4"))
    err = []

    # Frame uploads ride a prefetch thread (depth 2): the 6 MB/frame host->
    # device transfer overlaps the previous frame's device work instead of
    # stalling the dispatch loop (upload bandwidth is the scarcest link
    # resource in this environment — docs/PERFORMANCE.md).
    upq: "queue.Queue" = queue.Queue(maxsize=2)

    def uploader():
        try:
            for i in range(n_frames):
                x = to_f32(jnp.asarray(frames_u8[2 + i % n_frames]))
                upq.put(x)
        except BaseException as e:  # pragma: no cover
            err.append(e)
            upq.put(None)

    class Stream:
        def __init__(self, dpb):
            self.enc_dpb = dpb
            self.dec_dpb = dpb
            self.q: "queue.Queue" = queue.Queue(maxsize=2)
            self.thread = threading.Thread(target=self._run, daemon=True)

        def _run(self):
            try:
                while True:
                    fut = self.q.get()
                    if fut is None:
                        jax.block_until_ready(self.dec_dpb["x_ref"])
                        return
                    pay = fut.result()
                    _, self.dec_dpb = codec.decode_inter(
                        pay["strings"], pay["shape"], self.dec_dpb,
                        first_p=False)
            except BaseException as e:  # pragma: no cover
                err.append(e)

    pool = ThreadPoolExecutor(max_workers=max(2, n_streams))
    streams = [Stream(dpb2) for _ in range(n_streams)]

    t0 = time.perf_counter()
    threading.Thread(target=uploader, daemon=True).start()
    for s in streams:
        s.thread.start()
    for i in range(n_frames):
        x = upq.get()
        if x is None:
            break
        for s in streams:
            planes, s.enc_dpb = codec.encode_device(
                x, s.enc_dpb, first_p=False)
            s.q.put(pool.submit(codec.encode_bytes, planes))
    for s in streams:
        s.q.put(None)
    for s in streams:
        s.thread.join()
    pool.shutdown(wait=True)
    elapsed = time.perf_counter() - t0
    if err:
        raise err[0]

    fps = n_frames * n_streams / elapsed
    if cpu_fallback:
        metric = (f"{h}x{w} {model_name.upper()} enc+dec frames/sec "
                  "(real bitstream, XLA:CPU 1-core fallback — TPU relay "
                  "down)")
    else:
        size = "1080p" if (h, w) == (1080, 1920) else f"{h}x{w}"
        metric = (f"{size} {model_name.upper()} enc+dec frames/sec/chip "
                  "(real bitstream)")
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "baseline_fps": BASELINE_FPS,
        "baseline_provenance": (
            "estimated torch-GPU enc+dec fps for this model class at "
            "1080p; the reference publishes no speed numbers "
            "(BASELINE.md)"),
        "weights": "trained-checkpoint" if ckpt_loaded else "random-init",
        "variant": variant,
        **({"unet_width": int(unet_w)} if unet_w else {}),
        **({"error": relay_error,
            "platform": "cpu-fallback",
            "protocol": f"{h}x{w}, {n_frames} frames x {n_streams} "
                        "stream(s) on the 1-core host",
            "last_measured_tpu": _LAST_TPU_MEASURED} if cpu_fallback
           else {}),
    }))


if __name__ == "__main__":
    main()
