"""Standalone decoder CLI — reconstruct frames from a .bits container.

The receiver-side tool the reference lacks (its test.py only decodes
inline from in-memory strings, /root/reference/dmc/test.py:165,187): given
a bitstream file written by `cli.evaluate` and the model parameters, this
decodes every frame using nothing but the bytes, writes PNGs, and (when
--orig is given) reports the true decode PSNR.

    python -m deepvideocodec_tpu.cli.decode \
        --bits cache/uvg-dmc-q6-gop32-num96/Beauty.bits \
        --checkpoint ckpts/dmc/2048.0 --intra-checkpoint ckpts/intra/q6 \
        --gop 32 --size 1080 1920 --out decoded/Beauty
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Decode a .bits video bitstream")
    p.add_argument("-m", "--model", default="dmc",
                   choices=["dmc", "dvc", "dcvc"])
    p.add_argument("--bits", required=True, help=".bits container file")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="inter-codec checkpoint dir (random init if absent)")
    p.add_argument("--intra-checkpoint", type=str, default=None,
                   help="intra params (.npz / export dir / ckpt dir); a "
                        "{q} placeholder resolves to --quality")
    p.add_argument("-q", "--quality", type=int, default=None,
                   help="intra ladder point the stream was encoded with "
                        "(selects the I-frame codec's (n, m) topology; "
                        "default: the q4-6 geometry)")
    p.add_argument("-g", "--gop", type=int, default=32)
    p.add_argument("--size", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="original (unpadded) frame extent; the container "
                        "stores only latent shapes, like the reference's")
    p.add_argument("--out", type=str, default=None,
                   help="directory for decoded f%%05d.png frames")
    p.add_argument("--orig", type=str, default=None,
                   help="dir of original *.png frames to PSNR against")
    p.add_argument("--variant", choices=["base", "fast", "fast2", "fast3", "fast4", "fast5", "fast6"], default="base",
                   help="dmc topology (must match the checkpoint's)")
    p.add_argument("--unet-width", type=int, default=None,
                   help="recon UNet base width (must match the "
                        "checkpoint's; default 32)")
    p.add_argument("--gop-parallel", type=int, default=1,
                   help="decode GOPs concurrently on N codec replicas, "
                        "one per local device (cycling); identical "
                        "frames, in order — GOPs are closed coding units")
    args = p.parse_args(argv)
    if (args.intra_checkpoint and "{q}" in args.intra_checkpoint
            and args.quality is None):
        p.error("--intra-checkpoint contains {q}: pass -q/--quality")
    return args


def main(argv=None):
    args = parse_args(argv)

    import jax
    import numpy as np

    from ..models import DMC, DVC, DCVC, CheckerboardImageCodec, fast_init
    from ..eval.codec import DmcCodec, DvcCodec, DcvcCodec, IntraCodec
    from ..eval.evaluator import decode_video, load_png_frames, psnr
    from ..utils import setup_logger, restore_any_params

    bits_path = Path(args.bits)
    if not bits_path.is_file():
        raise FileNotFoundError(bits_path)
    setup_logger(None)

    rng = jax.random.PRNGKey(0)
    model_cls, codec_cls = {
        "dmc": (DMC, DmcCodec),
        "dvc": (DVC, DvcCodec),
        "dcvc": (DCVC, DcvcCodec),
    }[args.model]
    from ..models import build_inter_model

    try:
        model = build_inter_model(args.model, args.variant,
                                  args.unet_width)
    except ValueError as e:
        raise SystemExit(str(e)) from None
    params = fast_init(model, rng)
    if args.checkpoint:
        params = restore_any_params(args.checkpoint, params)
        logging.info("loaded inter params from %s", args.checkpoint)

    # The I-frame codec's (n, m) topology must match what the stream was
    # encoded with: -q selects the ladder point (evaluate's -q mapping);
    # without it, the default geometry (= the q4-6 points) is assumed.
    if args.quality is not None:
        from ..models import intra_model_for_quality

        intra_model, _ = intra_model_for_quality(args.quality)
    else:
        intra_model = CheckerboardImageCodec()
    intra_params = fast_init(intra_model, rng)
    if args.intra_checkpoint:
        path = args.intra_checkpoint.format(q=args.quality)
        intra_params = restore_any_params(path, intra_params)
        logging.info("loaded intra params from %s", path)

    if args.gop_parallel > 1:
        from ..eval.gop_parallel import (
            replicate_codecs, decode_video_gop_parallel)

        devs = jax.local_devices()
        uniq = replicate_codecs(
            model, params, intra_model, intra_params,
            devs[:min(args.gop_parallel, len(devs))], inter_cls=codec_cls)
        replicas = [uniq[i % len(uniq)]
                    for i in range(args.gop_parallel)]
        logging.info("GOP-parallel decode over %d replicas on %d "
                     "device(s)", len(replicas), len(uniq))

        def frames_iter(size):
            return decode_video_gop_parallel(
                replicas, bits_path, gop=args.gop, size=size)
    else:
        inter_codec = codec_cls(model, params)
        intra_codec = IntraCodec(intra_model, intra_params)

        def frames_iter(size):
            return decode_video(inter_codec, intra_codec, bits_path,
                                gop=args.gop, size=size)

    out_dir = Path(args.out) if args.out else None
    if out_dir:
        out_dir.mkdir(parents=True, exist_ok=True)
    originals = load_png_frames(args.orig) if args.orig else None

    size = tuple(args.size) if args.size else None
    psnrs = []
    n = 0
    for fi, rec in enumerate(frames_iter(size)):
        if out_dir:
            from PIL import Image
            img = (np.clip(rec, 0, 1) * 255.0).round().astype(np.uint8)
            Image.fromarray(img).save(out_dir / f"f{fi:05d}.png")
        if originals is not None:
            try:
                orig = next(originals)[0]
            except StopIteration:
                originals = None
            else:
                if orig.shape == rec.shape:
                    psnrs.append(psnr(orig, rec))
        n += 1
    logging.info("decoded %d frames from %s", n, bits_path)
    if psnrs:
        logging.info("decode PSNR vs originals: %.3f dB over %d frames",
                     float(np.mean(psnrs)), len(psnrs))


if __name__ == "__main__":
    main(sys.argv[1:])
