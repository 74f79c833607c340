"""Per-stage device-time profile of the DMC codec at 1080p on the TPU.

    PROF_VARIANT=fast3 python scripts/profile_stages.py

Hooks every jitted stage program of a DmcCodec instance with an
argument recorder, codes two real P-frames (first_p and steady-state)
through encode_device + decode_inter so each stage sees production
inputs, then re-times each recorded (stage, args) invocation K times.

Measurement method for this environment (docs/PERFORMANCE.md traps):
axon defers execution until a fetch, and block_until_ready alone proves
nothing — so each timed invocation is followed by a scalar-sum fetch of
the stage's first output leaf, and the fetch round trip (measured on a
trivial program) is subtracted. Stages below ~2x the RTT are reported
but flagged as link-noise-bound.

Output: a markdown table sorted by steady-state per-frame ms, plus the
encode/decode totals — the ranking that picks the next architecture cut
(docs/PERFORMANCE.md round-4 roadmap).
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

H, W = 1088, 1920
K = int(os.environ.get("PROF_REPS", "4"))


def main():
    from deepvideocodec_tpu.models import build_inter_model, fast_init
    from deepvideocodec_tpu.eval.codec import DmcCodec
    from deepvideocodec_tpu.utils import restore_params_export_partial

    variant = os.environ.get("PROF_VARIANT", "fast3")
    npz = os.environ.get(
        "PROF_NPZ", "/root/repo/ckpts/dmc_fast2_2048_mf5.npz")
    dtype = os.environ.get("PROF_DTYPE", "bfloat16")

    # bf16 interiors like the bench
    model = build_inter_model("dmc", variant, dtype=dtype)
    params = fast_init(model, jax.random.PRNGKey(0))
    try:
        params, hit, miss = restore_params_export_partial(npz, params)
        print(f"partial restore: {len(hit)} loaded, {len(miss)} fresh")
    except Exception as e:  # profile still valid on random init
        print(f"WARNING random init ({e})")

    codec = DmcCodec(model, params)

    # -- hook every stage program with an argument recorder ------------
    stage_names = [n for n in vars(codec) if n.startswith(("_enc", "_dec"))]
    recorded = {}  # name -> list of (args, kwargs)

    def hook(name, fn):
        def wrapper(*a, **kw):
            recorded.setdefault(name, []).append((a, kw))
            return fn(*a, **kw)
        return wrapper

    originals = {n: getattr(codec, n) for n in stage_names}
    for n in stage_names:
        setattr(codec, n, hook(n, originals[n]))

    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (1, H, W, 3), np.uint8) / 255.0
              for _ in range(3)]
    dpb = codec.init_dpb(jnp.asarray(frames[0], jnp.float32))

    print(f"coding warm-up frames ({variant}, {H}x{W}, {dtype}) ...")
    payload, dpb = codec.encode_inter(jnp.asarray(frames[1], jnp.float32),
                                      dpb, first_p=True)
    # steady state (first_p=False) is what a GOP spends 31/32 frames in
    payload2, dpb2 = codec.encode_inter(
        jnp.asarray(frames[2], jnp.float32), dpb, first_p=False)
    _, _ = codec.decode_inter(payload2["strings"], payload2["shape"],
                              dpb, first_p=False)
    jax.block_until_ready(dpb2["x_ref"])
    float(jnp.sum(dpb2["x_ref"]))  # drain the queue

    for n in stage_names:  # un-hook
        setattr(codec, n, originals[n])

    # -- RTT baseline ---------------------------------------------------
    tiny = jnp.zeros((), jnp.float32)
    for _ in range(3):
        float(jnp.sum(tiny))
    t0 = time.perf_counter()
    R = 10
    for _ in range(R):
        float(jnp.sum(tiny + 1.0))
    rtt = (time.perf_counter() - t0) / R
    print(f"fetch RTT baseline: {rtt*1e3:.1f} ms")
    # PROF_RTT_MAX (seconds) overrides the abort threshold for windows
    # where a slower link is the accepted baseline (e.g. a fresh VM's
    # tunnel). NOTE 2026-08-19: a quiet-box 67 ms reading preceded the
    # relay dying outright by ~2 min — treat an elevated baseline as a
    # relay health warning first, an override candidate second.
    if rtt > float(os.environ.get("PROF_RTT_MAX", "0.060")):
        # Usual RTT here is ~28 ms; a multiple of that means the core
        # or the tunnel is contended and every RTT-corrected number
        # below would be garbage (round-4 lesson: a contended run
        # measured 166 ms RTT and every stage came out negative).
        raise SystemExit(
            f"ABORT: fetch RTT {rtt*1e3:.0f} ms >> the ~28 ms quiet-host"
            " baseline — check `ps --sort=-pcpu` for CPU hogs and rerun"
            " in a clean window (docs/PERFORMANCE.md measurement traps)")

    def first_leaf(o):
        return jax.tree_util.tree_leaves(o)[0]

    # -- time each recorded invocation -----------------------------------
    rows = []
    for name, calls in sorted(recorded.items()):
        # last call = steady state (first_p=False where applicable)
        a, kw = calls[-1]
        fn = originals[name]
        out = fn(*a, **kw)           # warm (compile cached)
        float(jnp.sum(first_leaf(out).astype(jnp.float32)))
        best = float("inf")
        for _ in range(K):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            float(jnp.sum(first_leaf(out).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        ms = (best - rtt) * 1e3
        rows.append((name, ms, len(calls)))

    rows.sort(key=lambda r: -r[1])
    print(f"\n| stage | ms/call (min of {K}, RTT-corrected) | calls/2-frames |")
    print("|---|---|---|")
    total = 0.0
    for name, ms, cnt in rows:
        flag = " (~link noise)" if ms < 2 * rtt * 1e3 else ""
        print(f"| {name} | {ms:.1f}{flag} | {cnt} |")
        total += ms
    # encode runs enc_* + all dec_* stages; decode runs dec_* only
    enc = sum(ms for n, ms, _ in rows)
    dec = sum(ms for n, ms, _ in rows if n.startswith("_dec"))
    print(f"\nencode device total ≈ {enc:.0f} ms/frame; "
          f"decode ≈ {dec:.0f} ms/frame; "
          f"enc+dec ceiling ≈ {1000.0/(enc+dec):.2f} fps serial")


if __name__ == "__main__":
    main()
