"""Benchmark: DMC 1080p encode+decode frames/sec on one TPU chip.

Protocol: pad 1080p to 1088x1920 (x64 multiple, reference test.py:159),
stream P-frames through the REAL codec path — all device NN stages plus the
host rANS coder on actual bytes — exactly what `evaluate_video` runs per
frame. Reports one JSON line for the driver.

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
import time

BASELINE_FPS = 1.5


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepvideocodec_tpu.models import DMC, fast_init
    from deepvideocodec_tpu.models.dmc import empty_dpb
    from deepvideocodec_tpu.eval.codec import DmcCodec
    from deepvideocodec_tpu.data.synthetic import synthetic_video_frames
    from deepvideocodec_tpu.eval.evaluator import pad_to_multiple

    h, w = 1080, 1920
    n_frames = int(os.environ.get("BENCH_FRAMES", "8"))

    key = jax.random.PRNGKey(0)
    model = DMC()
    params = jax.block_until_ready(fast_init(model, key))
    codec = DmcCodec(model, params)

    frames = [
        pad_to_multiple(f) for f in
        synthetic_video_frames(n_frames + 2, h, w, seed=0)
    ]
    Hp, Wp = frames[0].shape[1:3]

    dpb = empty_dpb(1, Hp, Wp, model.cfg)
    dpb["x_ref"] = jnp.asarray(frames[0])

    # warmup / compile both first_p variants
    payload, _ = codec.encode_inter(jnp.asarray(frames[1]), dpb,
                                    first_p=True)
    _, dpb1 = codec.decode_inter(payload["strings"], payload["shape"],
                                 dpb, first_p=True)
    payload, _ = codec.encode_inter(jnp.asarray(frames[2]), dpb1,
                                    first_p=False)
    _, dpb2 = codec.decode_inter(payload["strings"], payload["shape"],
                                 dpb1, first_p=False)
    jax.block_until_ready(dpb2["x_ref"])

    # timed: n_frames P-frames, full encode+decode incl. host rANS
    cur = dpb2
    t0 = time.perf_counter()
    for i in range(n_frames):
        x = jnp.asarray(frames[2 + i])
        payload, _ = codec.encode_inter(x, cur, first_p=False)
        _, cur = codec.decode_inter(payload["strings"], payload["shape"],
                                    cur, first_p=False)
    jax.block_until_ready(cur["x_ref"])
    elapsed = time.perf_counter() - t0

    fps = n_frames / elapsed
    print(json.dumps({
        "metric": "1080p DMC enc+dec frames/sec/chip (real bitstream)",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
