"""Export a trained checkpoint to a single committed npz for the bench.

    python scripts/export_weights.py <ckpt_dir> <out.npz> \
        [--model dmc] [--variant base|fast] [--quality 6]

The npz (utils.save_npz_export: f16 storage except entropy-critical
leaves) is small enough to check into the repo, so `python bench.py`
can run trained weights on any machine (ckpts/bench_default.json points
the bench at the default export + topology variant).
"""

import argparse
import os
import sys

# `python scripts/export_weights.py` puts scripts/ (not the repo root)
# on sys.path; add the root so the package import works from anywhere.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force the CPU backend: this machine's profile PINS JAX_PLATFORMS=axon
# (remote TPU), so a setdefault would keep axon and hang/fail when the
# tunnel is down — and a weight export never needs a TPU.
os.environ["JAX_PLATFORMS"] = os.environ.get("EXPORT_PLATFORM", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("ckpt")
    p.add_argument("out")
    p.add_argument("--model", default="dmc",
                   choices=["dmc", "dvc", "dcvc", "intra"])
    p.add_argument("--variant", default="base", choices=["base", "fast", "fast2", "fast3", "fast4", "fast5", "fast6"])
    p.add_argument("--quality", type=int, default=6,
                   help="intra ladder point (--model intra)")
    p.add_argument("--unet-width", type=int, default=None,
                   help="recon UNet base width (must match the "
                        "checkpoint's; default 32)")
    args = p.parse_args(argv)

    import jax

    # The axon sitecustomize imports jax at interpreter startup and
    # forces jax_platforms="axon,cpu", so the env assignment above is
    # too late on its own — re-force via config (same trick as bench.py
    # / tests/conftest.py). Without this the export hangs forever in
    # backend init when the TPU relay is down.
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from deepvideocodec_tpu.models import (
        build_inter_model, fast_init, intra_model_for_quality)
    from deepvideocodec_tpu.utils import restore_any_params, save_npz_export

    if args.model == "intra":
        model, _ = intra_model_for_quality(args.quality)
    else:
        model = build_inter_model(args.model, args.variant,
                                  args.unet_width)
    params = fast_init(model, jax.random.PRNGKey(0))

    save_npz_export(args.out, restore_any_params(args.ckpt, params))
    print(f"wrote {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main(sys.argv[1:])
