"""Evaluation CLI — real-bitstream GOP coding over PNG sequences.

The TPU counterpart of the reference's test.py driver
(/root/reference/dmc/test.py:244-285): loops qualities x sequences, codes
the first --frames frames with GOP --gop, writes .bits files under cache/,
appends per-sequence {video, quality, bpp, psnr} to results/q{q}.json and
logs the dataset average.

    python -m deepvideocodec_tpu.cli.evaluate \
        --frames-root /data/uvg_frames --checkpoint ckpts/dmc/2048.0 \
        --intra-checkpoint ckpts/intra/q6 -q 6 --gop 32 --frames 96
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate a TPU video codec")
    p.add_argument("-m", "--model", default="dmc",
                   choices=["dmc", "dvc", "dcvc", "intra"],
                   help="video codec family (reference -m flag); 'intra' "
                        "codes every frame with the image codec alone "
                        "(all-I evaluation, BASELINE config #2)")
    p.add_argument("--pipelined", action="store_true",
                   help="overlap host coding with device compute "
                        "(byte-identical bitstreams)")
    p.add_argument("--per-frame", action="store_true",
                   help="record the per-frame PSNR trajectory in the "
                        "results JSON (serial path; drift visibility)")
    p.add_argument("--msssim", action="store_true",
                   help="also record MS-SSIM per sequence (serial path)")
    p.add_argument("--streams", type=int, default=1,
                   help="evaluate N sequences concurrently (same "
                        "bitstreams/metrics; overlaps host coding with "
                        "device compute across sequences)")
    p.add_argument("--gop-parallel", type=int, default=1,
                   help="code each sequence's GOPs concurrently on N "
                        "codec replicas, one per local device (cycling "
                        "when N exceeds the device count); byte-identical "
                        "bitstreams — GOPs are closed coding units")
    p.add_argument("--frames-root", required=True,
                   help="dir of sequence dirs, each holding *.png frames")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="inter-codec checkpoint dir (random init if absent)")
    p.add_argument("--intra-checkpoint", type=str, default=None)
    p.add_argument("-q", "--qualities", type=int, nargs="+", default=[6])
    p.add_argument("-g", "--gop", type=int, default=32)
    p.add_argument("-f", "--frames", type=int, default=96)
    p.add_argument("--results-dir", type=str, default="results")
    p.add_argument("--cache-dir", type=str, default="cache")
    p.add_argument("--dataset-name", type=str, default="uvg")
    p.add_argument("--variant", choices=["base", "fast", "fast2", "fast3", "fast4", "fast5", "fast6"], default="base",
                   help="dmc topology (must match the checkpoint's)")
    p.add_argument("--unet-width", type=int, default=None,
                   help="recon UNet base width (must match the "
                        "checkpoint's; default 32)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.model == "intra" and args.gop != 1:
        # -m intra has no inter codec: every frame is an I-frame, so any
        # --gop other than 1 is meaningless. Coerce (the loop below only
        # ever runs the intra path) rather than die — the strict check
        # killed an unattended campaign chain in round 3.
        print(f"--model intra codes every frame as an I-frame; "
              f"coercing --gop {args.gop} -> 1", file=sys.stderr)
        args.gop = 1

    import jax
    import numpy as np

    from ..models import DMC, DVC, DCVC, CheckerboardImageCodec, fast_init
    from ..eval.codec import DmcCodec, DvcCodec, DcvcCodec, IntraCodec
    from ..eval.evaluator import evaluate_video, load_png_frames
    from ..eval.pipeline import code_sequence_pipelined
    from ..eval.multi import evaluate_sequences_parallel
    from ..utils import setup_logger, restore_any_params

    # Validate inputs before model construction (init + CDF tables cost
    # minutes cold; a bad --frames-root should fail in milliseconds).
    seq_dirs = sorted(
        p for p in Path(args.frames_root).iterdir() if p.is_dir())
    if not seq_dirs:
        raise FileNotFoundError(
            f"no sequence dirs under {args.frames_root}")

    results_dir = Path(args.results_dir)
    results_dir.mkdir(parents=True, exist_ok=True)
    setup_logger(results_dir / "eval.log")

    rng = jax.random.PRNGKey(0)
    if args.model == "intra":
        # all-intra: no inter model; every frame is an I-frame (gop=1)
        model_cls = codec_cls = None
        args.gop = 1
    else:
        model_cls, codec_cls = {
            "dmc": (DMC, DmcCodec),
            "dvc": (DVC, DvcCodec),
            "dcvc": (DCVC, DcvcCodec),
        }[args.model]
    if args.model == "intra":
        model = params = None
    else:
        from ..models import build_inter_model

        try:
            model = build_inter_model(args.model, args.variant,
                                      args.unet_width)
        except ValueError as e:
            raise SystemExit(str(e)) from None
        params = fast_init(model, rng)
    if args.model != "intra" and args.checkpoint:
        # params-only restore: the training optimizer's pytree shape
        # depends on train-time settings (LR schedule etc.), so a full
        # TrainState template built here would mismatch — and eval never
        # needs the optimizer state anyway. Accepts a committed .npz
        # export, a params_export dir, or an Orbax checkpoint dir.
        params = restore_any_params(args.checkpoint, params)
        logging.info("loaded inter params from %s", args.checkpoint)

    def build_intra(q: int):
        """Per-quality intra model+params: -q maps to a (n, m, lambda)
        operating point (models.intra.INTRA_QUALITIES — the reference's
        cheng2020_anchor(q) slot). --intra-checkpoint may contain a {q}
        placeholder (e.g. ckpts/intra_q{q}) resolved per quality."""
        from ..models import INTRA_QUALITIES, intra_model_for_quality

        if q in INTRA_QUALITIES:
            intra_model, _ = intra_model_for_quality(q)
        else:
            intra_model = CheckerboardImageCodec()
        intra_params = fast_init(intra_model, rng)
        if args.intra_checkpoint:
            path = args.intra_checkpoint.format(q=q)
            intra_params = restore_any_params(path, intra_params)
            logging.info("q=%d: loaded intra params from %s", q, path)
        return intra_model, intra_params

    def build_intra_codec(q: int) -> IntraCodec:
        return IntraCodec(*build_intra(q))

    untrained = []
    if args.model != "intra" and not args.checkpoint:
        untrained.append(args.model)
    if not args.intra_checkpoint:
        untrained.append("intra")
    if untrained:
        logging.warning(
            "\x1b[91mUNTRAINED RANDOM-INIT WEIGHTS for %s — results are "
            "smoke-test only, NOT reportable RD numbers (pass "
            "--checkpoint/--intra-checkpoint)\x1b[0m",
            ", ".join(untrained))

    gp_devs = gp_inter = None
    if args.gop_parallel > 1:
        if args.pipelined or args.streams > 1:
            raise SystemExit(
                "--gop-parallel is exclusive with --pipelined/--streams")
        # Inter-codec replicas are quality-independent: build them ONCE
        # (each DmcCodec re-jits ~13 stage programs; per-quality rebuild
        # would recompile every one of them per q).
        devs = jax.local_devices()
        gp_devs = devs[:min(args.gop_parallel, len(devs))]
        gp_inter = [None if model is None
                    else codec_cls(model, jax.device_put(params, d))
                    for d in gp_devs]
        inter_codec = None
    else:
        if args.model == "intra":
            inter_codec = None
        else:
            # constructor builds the entropy CDF tables and the jitted
            # stage-program wrappers; log its cost — construction has
            # been observed anywhere from ~1 to ~10 min on this link
            # (docs/PERFORMANCE.md GOP-32 anomaly note) and needs to be
            # attributable separately from coding warm-up
            tic = time.time()
            inter_codec = codec_cls(model, params)
            logging.info("inter codec constructed in %.1fs", time.time() - tic)

    from ..eval.evaluator import append_result

    for q in args.qualities:
        if untrained:
            # loud marker inside the results file itself so the numbers
            # can't be mistaken for trained RD points downstream
            append_result(results_dir / f"q{q}.json",
                          {"warning": "untrained_random_init",
                           "models": list(untrained), "quality": q})
        agg_bpp, agg_psnr = [], []
        if args.gop_parallel > 1:
            from ..eval.gop_parallel import evaluate_video_gop_parallel

            intra_model_q, intra_params_q = build_intra(q)
            uniq = [
                (ic, IntraCodec(intra_model_q,
                                jax.device_put(intra_params_q, d)), d)
                for ic, d in zip(gp_inter, gp_devs)
            ]
            replicas = [uniq[i % len(uniq)]
                        for i in range(args.gop_parallel)]
            logging.info("q=%d: GOP-parallel over %d replicas on %d "
                         "device(s)", q, len(replicas), len(uniq))
            for seq in seq_dirs:
                tag = (f"{args.dataset_name}-{args.model}-q{q}"
                       f"-gop{args.gop}-num{args.frames}")
                stats = evaluate_video_gop_parallel(
                    replicas, load_png_frames(seq, args.frames),
                    bits_path=Path(args.cache_dir) / tag
                    / f"{seq.stem}.bits",
                    gop=args.gop,
                    results_path=results_dir / f"q{q}.json",
                    video_name=str(seq), quality=q,
                    compute_msssim=args.msssim,
                    per_frame=args.per_frame)
                agg_bpp.append(stats["bpp"])
                agg_psnr.append(stats["psnr"])
                logging.info(
                    "q=%d %s: bpp=%.4f psnr=%.2f (%.1fs, %d frames)",
                    q, seq.stem, stats["bpp"], stats["psnr"],
                    stats["seconds"], stats["frames"])
            logging.info(
                "\x1b[92mq=%d dataset avg: bpp=%.4f psnr=%.2f over %d "
                "seqs\x1b[0m", q, float(np.mean(agg_bpp)),
                float(np.mean(agg_psnr)), len(seq_dirs))
            continue
        tic = time.time()
        intra_codec = build_intra_codec(q)
        logging.info("q=%d: intra codec constructed in %.1fs",
                     q, time.time() - tic)
        if args.streams > 1:
            if args.msssim or args.pipelined:
                raise SystemExit(
                    "--streams is exclusive with --msssim/--pipelined")
            tag = (f"{args.dataset_name}-{args.model}-q{q}-gop{args.gop}"
                   f"-num{args.frames}")
            seqs = [
                (str(seq), load_png_frames(seq, args.frames),
                 Path(args.cache_dir) / tag / f"{seq.stem}.bits")
                for seq in seq_dirs
            ]
            all_stats = evaluate_sequences_parallel(
                inter_codec, intra_codec, seqs, gop=args.gop,
                streams=args.streams,
                results_path=results_dir / f"q{q}.json", quality=q,
                per_frame=args.per_frame)
            for stats in all_stats:
                agg_bpp.append(stats["bpp"])
                agg_psnr.append(stats["psnr"])
                logging.info(
                    "q=%d %s: bpp=%.4f psnr=%.2f (%.1fs, %d frames)",
                    q, Path(stats["video"]).stem, stats["bpp"],
                    stats["psnr"], stats["seconds"], stats["frames"])
            logging.info(
                "\x1b[92mq=%d dataset avg: bpp=%.4f psnr=%.2f over %d "
                "seqs\x1b[0m", q, float(np.mean(agg_bpp)),
                float(np.mean(agg_psnr)), len(seq_dirs))
            continue
        for seq in seq_dirs:
            tag = (f"{args.dataset_name}-{args.model}-q{q}-gop{args.gop}"
                   f"-num{args.frames}")
            bits_path = Path(args.cache_dir) / tag / f"{seq.stem}.bits"
            if args.pipelined and args.msssim:
                raise SystemExit("--msssim requires the serial path "
                                 "(drop --pipelined)")
            if args.pipelined:
                stats = code_sequence_pipelined(
                    inter_codec, intra_codec,
                    load_png_frames(seq, args.frames),
                    bits_path=bits_path, gop=args.gop,
                    results_path=results_dir / f"q{q}.json",
                    video_name=str(seq), quality=q)
            else:
                stats = evaluate_video(
                    inter_codec, intra_codec,
                    load_png_frames(seq, args.frames),
                    bits_path=bits_path,
                    gop=args.gop,
                    results_path=results_dir / f"q{q}.json",
                    video_name=str(seq), quality=q,
                    compute_msssim=args.msssim,
                    per_frame=args.per_frame,
                )
            agg_bpp.append(stats["bpp"])
            agg_psnr.append(stats["psnr"])
            logging.info(
                "q=%d %s: bpp=%.4f psnr=%.2f (%.1fs, %d frames)",
                q, seq.stem, stats["bpp"], stats["psnr"],
                stats["seconds"], stats["frames"])
        logging.info(
            "\x1b[92mq=%d dataset avg: bpp=%.4f psnr=%.2f over %d seqs"
            "\x1b[0m",
            q, float(np.mean(agg_bpp)), float(np.mean(agg_psnr)),
            len(seq_dirs))


if __name__ == "__main__":
    main(sys.argv[1:])
