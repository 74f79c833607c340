"""Import a reference (PyTorch) DMC checkpoint into a committed npz export.

Switchover path for users of the reference implementation: their trained
`checkpoint_best_loss.pth.tar` (reference train.py:400-403, 510) converts
into this framework's single-file params export, accepted anywhere a
--checkpoint / --init-from flag takes one (evaluate, decode, bench,
fine-tuning warm starts).

    python -m deepvideocodec_tpu.cli.import_torch \
        checkpoints/dmc/2048.0/checkpoint_best_loss.pth.tar \
        ckpts/dmc_2048_ref.npz

The converted tree is validated against the framework's own init structure
(same param paths, same shapes) before writing, so a mismatched or truncated
checkpoint fails loudly instead of producing a half-mapped model.
"""

from __future__ import annotations

import argparse
import os
import sys

# Weight conversion never needs a TPU; the machine profile may pin
# JAX_PLATFORMS to a remote backend, so force CPU before jax init.
os.environ["JAX_PLATFORMS"] = os.environ.get("IMPORT_PLATFORM", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.dirname(os.path.abspath(__file__)))),
                          ".jax_cache"))


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Convert a reference PyTorch DMC checkpoint to an npz "
                    "params export")
    p.add_argument("checkpoint", help=".pth.tar (train.py wrapper or bare "
                                      "state_dict)")
    p.add_argument("out", help="output .npz export path")
    p.add_argument("--kind", choices=["dmc", "cheng2020"], default="dmc",
                   help="dmc = full reference DMC checkpoint (every tensor "
                        "maps). cheng2020 = a compressai cheng2020_anchor "
                        "intra checkpoint: transforms/hyper/density import "
                        "1:1 and the npz carries them MERGED over a fresh "
                        "checkerboard head — fine-tune the head with "
                        "cli.train_intra -m cheng2020 --init-from <out> "
                        "--init-partial")
    p.add_argument("--n-channels", type=int, default=192,
                   help="cheng2020 N (128 for compressai q1-3, 192 for "
                        "q4-6)")
    return p.parse_args(argv)


def _import_cheng2020(args):
    import jax
    import torch

    from ..models import Cheng2020CheckerboardCodec, fast_init
    from ..tools import import_cheng2020_transforms, merge_params
    from ..utils import save_npz_export

    blob = torch.load(args.checkpoint, map_location="cpu",
                      weights_only=True)
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    imported = import_cheng2020_transforms(blob)

    model = Cheng2020CheckerboardCodec(n=args.n_channels)
    target = fast_init(model, jax.random.PRNGKey(0))
    merged = merge_params(target, imported)  # shape-checks every leaf

    n_imported = len(jax.tree_util.tree_leaves(imported))
    n_total = len(jax.tree_util.tree_leaves(merged))
    save_npz_export(args.out, merged)
    print(f"wrote {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB): "
          f"{n_imported}/{n_total} leaves imported from the cheng2020 "
          f"checkpoint, the rest (checkerboard head) at init — fine-tune "
          f"with cli.train_intra -m cheng2020 --init-from --init-partial")


def main(argv=None):
    args = parse_args(argv)

    if args.kind == "cheng2020":
        _import_cheng2020(args)
        return

    import jax
    import numpy as np

    from ..models import build_inter_model, fast_init
    from ..tools import load_reference_checkpoint
    from ..utils import save_npz_export

    imported = load_reference_checkpoint(args.checkpoint)

    # Structural validation against the framework's own init: identical
    # param paths and shapes (the reference topology is base, unet_width 32).
    model = build_inter_model("dmc", "base")
    target = fast_init(model, jax.random.PRNGKey(0))
    tgt = {k: np.shape(v) for k, v in
           ((jax.tree_util.keystr(p), leaf) for p, leaf in
            jax.tree_util.tree_flatten_with_path(target)[0])}
    got = {k: np.shape(v) for k, v in
           ((jax.tree_util.keystr(p), leaf) for p, leaf in
            jax.tree_util.tree_flatten_with_path(imported)[0])}
    missing = sorted(set(tgt) - set(got))
    extra = sorted(set(got) - set(tgt))
    bad = sorted(k for k in set(tgt) & set(got) if tgt[k] != got[k])
    if missing or extra or bad:
        for k in missing[:10]:
            print(f"missing param: {k}", file=sys.stderr)
        for k in extra[:10]:
            print(f"unexpected param: {k}", file=sys.stderr)
        for k in bad[:10]:
            print(f"shape mismatch {k}: checkpoint {got[k]} vs model "
                  f"{tgt[k]}", file=sys.stderr)
        raise SystemExit(
            f"conversion failed structural validation: {len(missing)} "
            f"missing, {len(extra)} unexpected, {len(bad)} mismatched")

    save_npz_export(args.out, imported)
    print(f"wrote {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB, "
          f"{len(got)} params)")


if __name__ == "__main__":
    main(sys.argv[1:])
