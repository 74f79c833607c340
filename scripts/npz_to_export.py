"""Rebuild a checkpoint dir (params_export) from a committed .npz export.

The campaign scripts warm-start and evaluate from Orbax ``params_export``
directories under a work tree (scripts/campaign*.sh). When the work tree
is lost (e.g. the 2026-08-19 machine reboot wiped /root/campaign), the
committed single-file ``ckpts/*.npz`` exports are the surviving trained
artifacts. This tool re-materializes a ``<out>/params_export`` from one,
so every campaign chain can resume from the committed state.

    python scripts/npz_to_export.py ckpts/intra_q6.npz out/intra_q6 \
        --kind intra -q 6
    python scripts/npz_to_export.py ckpts/dmc_2048_mf5.npz out/dmc_mf5/2048.0 \
        --kind dmc --variant base
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("npz")
    p.add_argument("out")
    p.add_argument("--kind", choices=["dmc", "dvc", "dcvc", "intra",
                                      "cheng2020"], default="dmc")
    p.add_argument("--variant", default="base")
    p.add_argument("--unet-width", type=int, default=None)
    p.add_argument("-q", type=int, default=6, help="intra quality point")
    args = p.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from deepvideocodec_tpu.models import fast_init
    from deepvideocodec_tpu.utils import (restore_any_params,
                                          save_params_export)

    if args.kind in ("intra", "cheng2020"):
        from deepvideocodec_tpu.models.intra import intra_model_for_quality

        model, _ = intra_model_for_quality(args.q)
        if args.kind == "cheng2020":
            from deepvideocodec_tpu.models.intra import (
                Cheng2020CheckerboardCodec)

            model = Cheng2020CheckerboardCodec(n=model.n, m=model.m)
    else:
        from deepvideocodec_tpu.models import build_inter_model

        model = build_inter_model(args.kind, args.variant,
                                  args.unet_width, "float32")
    params = fast_init(model, jax.random.PRNGKey(0))
    params = restore_any_params(args.npz, params)
    save_params_export(args.out, params)
    print(f"wrote {args.out}/params_export from {args.npz}")


if __name__ == "__main__":
    main()
