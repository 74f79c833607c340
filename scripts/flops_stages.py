"""Per-stage analytic FLOP/byte ranking of the DMC codec — CPU-only.

    JAX_PLATFORMS=cpu python scripts/flops_stages.py

The wall-clock profile (scripts/profile_stages.py) needs a live TPU
relay and a quiet host, and has now been killed twice by exactly those
(docs/NEXT.md). This is the relay-independent complement: it codes two
real P-frames at a small CPU-feasible size to capture every stage's
production argument shapes, then runs XLA's `lower().cost_analysis()`
on each jitted stage program and scales FLOPs/bytes linearly to the
1080p protocol grid — exact for this model (every stage is a fixed-depth
convolutional program, so cost is linear in H*W; SpyNet's pyramid depth
is static).

Output: a markdown table of est. GFLOP + GB-accessed per stage at
1080p, plus an est-ms column from the measured achievable rates in
docs/PERFORMANCE.md (MXU conv rate by channel width; HBM ~800 GB/s for
bandwidth-bound stages) — the ranking that picks the next device cut
when the real profile cannot run. Env knobs: FLOPS_VARIANT (default
fast4), FLOPS_DTYPE (bfloat16), FLOPS_REC_SIZE (256x448 recording grid).
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# CPU is the point of this script; force it even under the axon
# sitecustomize (which latches JAX_PLATFORMS=axon at interpreter start).
jax.config.update("jax_platforms", "cpu")

TARGET_H, TARGET_W = 1088, 1920  # padded 1080p protocol grid


def main():
    from deepvideocodec_tpu.models import build_inter_model, fast_init
    from deepvideocodec_tpu.eval.codec import DmcCodec

    variant = os.environ.get("FLOPS_VARIANT", "fast4")
    dtype = os.environ.get("FLOPS_DTYPE", "bfloat16")
    rec_h, rec_w = (int(v) for v in
                    os.environ.get("FLOPS_REC_SIZE", "256x448").split("x"))
    scale = (TARGET_H * TARGET_W) / (rec_h * rec_w)

    model = build_inter_model("dmc", variant, dtype=dtype)
    params = fast_init(model, jax.random.PRNGKey(0))
    codec = DmcCodec(model, params)

    # Hook every jitted stage program with an argument recorder, then
    # code two P-frames (first_p + steady state) so each stage sees
    # production shapes — same capture scheme as profile_stages.py.
    stage_names = [n for n in vars(codec) if n.startswith(("_enc", "_dec"))]
    recorded = {}

    def hook(name, fn):
        def wrapper(*a, **kw):
            recorded.setdefault(name, []).append((a, kw))
            return fn(*a, **kw)
        return wrapper

    originals = {n: getattr(codec, n) for n in stage_names}
    for n in stage_names:
        setattr(codec, n, hook(n, originals[n]))

    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (1, rec_h, rec_w, 3), np.uint8) / 255.0
              for _ in range(3)]
    dpb = codec.init_dpb(jnp.asarray(frames[0], jnp.float32))
    print(f"recording stage args ({variant}, {rec_h}x{rec_w}, {dtype}, "
          "cpu) ...", flush=True)
    payload, dpb = codec.encode_inter(jnp.asarray(frames[1], jnp.float32),
                                      dpb, first_p=True)
    payload2, dpb2 = codec.encode_inter(
        jnp.asarray(frames[2], jnp.float32), dpb, first_p=False)
    codec.decode_inter(payload2["strings"], payload2["shape"], dpb,
                       first_p=False)
    for n in stage_names:
        setattr(codec, n, originals[n])

    rows = []
    for name, calls in sorted(recorded.items()):
        a, kw = calls[-1]  # steady state
        # codec stages are retry_flaky_compile wrappers (functools.wraps
        # keeps the jitted fn on __wrapped__); .lower lives on the jit.
        fn = getattr(originals[name], "__wrapped__", originals[name])
        try:
            cost = fn.lower(*a, **kw).cost_analysis()
        except Exception as e:
            print(f"  {name}: cost_analysis failed ({e})")
            continue
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        gflop = float(cost.get("flops", 0.0)) * scale / 1e9
        gbytes = float(cost.get("bytes accessed", 0.0)) * scale / 1e9
        rows.append((name, gflop, gbytes, len(calls)))

    # Achievable-rate model for the est-ms column (docs/PERFORMANCE.md
    # measured table): v5e MXU peaks ~197 TF/s bf16 but the C=64 convs
    # in this model measure 10-18 TF/s (lane under-utilisation) and the
    # C<=32 UNet ~5.4 TF/s; use a blended 12 TF/s for compute and
    # 500 GB/s effective HBM for the byte term (roofline max of the two).
    EFF_TFLOPS, EFF_GBS = 12.0, 500.0
    # GFLOP / (TF/s) = milliseconds directly (1e9/1e12 = 1e-3 s).
    est_ms = lambda gflop, gbytes: max(gflop / EFF_TFLOPS,
                                       gbytes / EFF_GBS)
    rows.sort(key=lambda r: -est_ms(r[1], r[2]))
    print(f"\nEstimated 1080p per-stage cost ({variant}, {dtype}; FLOPs "
          f"scaled x{scale:.1f} from {rec_h}x{rec_w} lowered HLO):\n")
    print("| stage | GFLOP | GB moved | est ms (roofline) | calls/2f |")
    print("|---|---|---|---|---|")
    tot_ms = 0.0
    for name, gflop, gbytes, cnt in rows:
        ms = est_ms(gflop, gbytes)
        tot_ms += ms
        print(f"| {name} | {gflop:.1f} | {gbytes:.2f} | {ms:.1f} | {cnt} |")
    if tot_ms:
        print(f"\nroofline enc+dec device total ≈ {tot_ms:.0f} ms/frame "
              f"≈ {1000.0 / tot_ms:.2f} fps serial ceiling")


if __name__ == "__main__":
    main()
