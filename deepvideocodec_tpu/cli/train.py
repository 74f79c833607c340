"""Training CLI — the TPU counterpart of the reference's train.py driver.

Flag surface mirrors /root/reference/dmc/train.py:406-500 (model, dataset,
epochs, lr, lambda, batch sizes, max-frames, patch size, seed, clip norm,
checkpointing) with TPU-native execution: jitted per-stage train steps,
data-parallel mesh when multiple devices are visible, Orbax checkpoints
keyed by run directory `checkpoints/{model}/{lambda}/`.

Example (the reference's canonical operating point, train.sh):
    python -m deepvideocodec_tpu.cli.train -d /data/vimeo90k \
        --lambda 2048 --batch-size 8 --max-frames 3 -e 200
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train a TPU video codec")
    p.add_argument("-m", "--model", default="dmc",
                   choices=["dmc", "dvc", "dcvc"])
    p.add_argument("-d", "--dataset", required=True,
                   help="Vimeo-90K root (sep_trainlist.txt + sequences/)")
    p.add_argument("-e", "--epochs", type=int, default=100)
    p.add_argument("-lr", "--learning-rate", type=float, default=1e-4)
    p.add_argument("-n", "--num-workers", type=int, default=8)
    p.add_argument("--lambda", dest="lmbda", type=float, default=1e-2)
    p.add_argument("-q", "--quality", type=int, default=6,
                   help="intra codec quality tag (names the intra ckpt)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--test-batch-size", type=int, default=64)
    p.add_argument("--max-frames", type=int, default=2)
    p.add_argument("--scan-frames", action="store_true",
                   help="fold the steady-state P-frames into one nn.scan "
                        "(DMC only): identical math, O(1)-in-frames host "
                        "trace time — use for long-cascade fine-tunes "
                        "(--max-frames >= 7), where the unrolled Python "
                        "trace on a slow host dominates compile time")
    p.add_argument("--aux-learning-rate", type=float, default=1e-3)
    p.add_argument("--patch-size", type=int, nargs=2, default=(256, 256))
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--clip_max_norm", type=float, default=1.0)
    p.add_argument("--name", type=str, default="")
    p.add_argument("--save", action="store_true", default=True)
    p.add_argument("--checkpoint", type=str,
                   help="checkpoint directory: resume from its latest "
                        "step if one exists, and save epoch checkpoints "
                        "+ the final params export into it (default "
                        "checkpoints/<model>/<lambda>)")
    p.add_argument("--lr-milestones", type=int, nargs="*", default=[300])
    p.add_argument("--log-every", type=int, default=100,
                   help="log train metrics every N steps")
    p.add_argument("--steps-per-epoch", type=int, default=None,
                   help="cap train steps per epoch (a random subset of "
                        "the shuffled epoch order). For hosts where a "
                        "full epoch is infeasible (the 1-core CPU "
                        "campaign fallback); epoch/stage accounting and "
                        "resume math use the capped length, so pass the "
                        "SAME cap on every resume of a run")
    p.add_argument("--intra-checkpoint", type=str, default=None,
                   help="trained intra codec ckpt for the epoch>=50 stage")
    p.add_argument("--init-from", type=str, default=None,
                   help="warm-start params from another run's checkpoint "
                        "dir (params-only; fresh optimizer). Used for "
                        "lambda-adaptation fine-tunes: train one lambda "
                        "through the full curriculum, then adapt other "
                        "operating points from it in a few late-stage "
                        "epochs (pair with --start-epoch).")
    p.add_argument("--init-partial", action="store_true",
                   help="with --init-from: shape-tolerant warm start — "
                        "take every donor leaf whose path+shape matches, "
                        "keep fresh init elsewhere. For topology-changing "
                        "fine-tunes (e.g. --unet-width trades).")
    p.add_argument("--start-epoch", type=int, default=None,
                   help="force the starting epoch (selects the curriculum "
                        "stage) for --init-from fine-tunes; also applied "
                        "on resume of such a run")
    p.add_argument("--variant", choices=["base", "fast", "fast2", "fast3", "fast4", "fast5", "fast6"], default="base",
                   help="dmc topology: 'fast' enables warp_ctx_half + "
                        "flow_half (models/dmc.py) — the speed variant "
                        "whose RD the campaign validates")
    p.add_argument("--unet-width", type=int, default=None,
                   help="recon UNet base width (default 32 = reference "
                        "ladder; 24 is the next speed/RD trade on the "
                        "docs/PERFORMANCE.md roadmap). Changes the param "
                        "tree — warm-start with --init-partial.")
    p.add_argument("--debug-nan", action="store_true",
                   help="enable jax NaN/Inf checking: a non-finite value "
                        "raises FloatingPointError at the producing op "
                        "instead of corrupting the loss (slow; debug only)")
    return p.parse_args(argv)


def build_model(name: str, variant: str = "base",
                unet_width: int | None = None):
    from ..models import build_inter_model

    try:
        return build_inter_model(name, variant, unet_width)
    except ValueError as e:
        raise SystemExit(str(e)) from None


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..utils.debug import enable_debug_checks, maybe_enable_from_env

    if args.debug_nan:
        enable_debug_checks()
    else:
        maybe_enable_from_env()

    from ..data import VideoFolderDataset, Loader
    from ..models import CheckerboardImageCodec
    from ..parallel import make_mesh, make_parallel_train_step, \
        device_put_batch, replicate
    from ..train import (
        create_train_state,
        make_eval_step,
        stage_for_epoch,
    )
    from ..train.optimizers import multistep_lr
    from ..utils import setup_logger, AverageMeter, save_checkpoint, \
        restore_checkpoint, latest_step

    if args.scan_frames and args.model != "dmc":
        raise SystemExit("--scan-frames is a DMC __call__ knob "
                         "(models/dmc.py); other families unroll")

    model_tag = (args.model if args.variant == "base"
                 else f"{args.model}_{args.variant}")
    # --checkpoint names the run's checkpoint home: resume source AND
    # save target. Before this was resume-only, so fine-tune runs
    # pointed at a fresh dir silently saved into the default tree,
    # clobbering the donor run's export (observed with campaign3.sh).
    base_dir = (Path(args.checkpoint) if args.checkpoint
                else Path("checkpoints") / model_tag / f"{args.lmbda}")
    base_dir.mkdir(parents=True, exist_ok=True)
    setup_logger(base_dir / f"train_{args.name}.log")

    seed = args.seed if args.seed is not None else 0
    rng = jax.random.PRNGKey(seed)

    train_ds = VideoFolderDataset(
        args.dataset, split="train", max_frames=args.max_frames,
        crop_size=tuple(args.patch_size), rnd_interval=True,
        rnd_temp_order=True, random_crop=True, seed=seed)
    test_ds = VideoFolderDataset(
        args.dataset, split="test", max_frames=args.max_frames,
        crop_size=tuple(args.patch_size), rnd_interval=False,
        rnd_temp_order=False, random_crop=False, seed=seed)
    # Multi-host: each process loads only its deterministic slice of the
    # global batch (the shuffle is a pure function of (seed, epoch) so all
    # hosts derive one global order); device_put_batch assembles the
    # global sharded array from the per-process locals.
    train_loader = Loader(train_ds, args.batch_size, shuffle=True,
                          num_workers=args.num_workers, seed=seed,
                          num_shards=jax.process_count(),
                          shard_index=jax.process_index())
    test_loader = Loader(test_ds, args.test_batch_size, shuffle=False,
                         num_workers=args.num_workers, drop_last=False)

    model = build_model(args.model, args.variant, args.unet_width)
    example = jnp.zeros(
        (1, args.max_frames, *args.patch_size, 3), jnp.float32)
    steps_per_epoch = max(len(train_loader), 1)
    if args.steps_per_epoch is not None:
        steps_per_epoch = max(min(steps_per_epoch, args.steps_per_epoch), 1)
    schedule = multistep_lr(
        args.learning_rate,
        [m * steps_per_epoch for m in args.lr_milestones])
    state = create_train_state(
        model, rng, example, learning_rate=schedule,
        aux_learning_rate=args.aux_learning_rate,
        clip_max_norm=args.clip_max_norm)

    start_epoch = 0
    resumed = False
    if args.checkpoint:
        step = latest_step(args.checkpoint)
        if step is not None:
            state = restore_checkpoint(args.checkpoint, step, state)
            start_epoch = int(step // steps_per_epoch)
            resumed = True
            logging.info("resumed step %d (epoch %d)", step, start_epoch)
    if args.init_from and not resumed:
        from ..utils import (restore_any_params,
                             restore_params_export_partial)

        if args.init_partial:
            out = restore_params_export_partial(args.init_from,
                                                state.params)
            if out is None:
                raise FileNotFoundError(
                    f"--init-partial needs a params_export under "
                    f"{args.init_from}")
            restored, hit, skipped = out
            logging.info(
                "partial warm start from %s: %d leaves restored, "
                "%d kept fresh%s", args.init_from, len(hit),
                len(skipped),
                (" (" + "; ".join(skipped[:6]) + ")") if skipped else "")
        else:
            restored = restore_any_params(args.init_from, state.params)
        state = state.replace(params=restored)
        logging.info("warm-started params from %s", args.init_from)
    if args.start_epoch is not None:
        # Fine-tune runs own their epoch window: the forced start epoch
        # selects the curriculum stage regardless of the (fresh or
        # resumed) step counter.
        # fresh: start at the forced epoch; resumed: the step counter
        # counts epochs *since* the forced start, so offset it.
        start_epoch = args.start_epoch + (start_epoch if resumed else 0)
        logging.info("starting at epoch %d (stage %s)", start_epoch,
                     stage_for_epoch(start_epoch).name)

    intra_model = intra_params = None
    if args.intra_checkpoint:
        # -q selects the intra operating point (reference
        # cheng2020_anchor(q) slot — train.py:564-569)
        from ..models import INTRA_QUALITIES, intra_model_for_quality

        if args.quality in INTRA_QUALITIES:
            intra_model, _ = intra_model_for_quality(args.quality)
        else:
            intra_model = CheckerboardImageCodec()
        from ..models import fast_init
        from ..utils import restore_any_params
        intra_params = fast_init(intra_model, rng)
        # raises when nothing restorable is found — a silently
        # random-init frozen intra codec would poison the e2e_intra
        # stage without any error signal
        intra_params = restore_any_params(
            args.intra_checkpoint, intra_params)

    mesh = make_mesh()
    logging.info("devices: %s", jax.devices())
    state = jax.device_put(state, replicate(mesh))

    best_loss = float("inf")
    step_fns = {}
    for epoch in range(start_epoch, args.epochs):
        stage = stage_for_epoch(epoch)
        if stage.use_intra_iframe and intra_model is None:
            logging.warning(
                "epoch %d wants the intra stage but no intra checkpoint "
                "was given; continuing with clean I-frames", epoch)
            stage = stage_for_epoch(40)
        if stage.name not in step_fns:
            from ..utils import retry_flaky_compile

            step_fns[stage.name] = (
                retry_flaky_compile(make_parallel_train_step(
                    model, stage, args.lmbda, mesh,
                    intra_model=intra_model, intra_params=intra_params,
                    scan_frames=args.scan_frames)),
                retry_flaky_compile(
                    make_eval_step(model, stage, args.lmbda,
                                   intra_model=intra_model,
                                   intra_params=intra_params,
                                   scan_frames=args.scan_frames)),
            )
        train_step, eval_step = step_fns[stage.name]

        # Pin the shuffle epoch explicitly: after a resume the Loader's
        # internal counter restarts at 0, which would replay the epoch-0
        # data order instead of continuing the uninterrupted run's.
        train_loader.set_epoch(epoch)

        tic = time.time()
        seen = 0
        for i, batch in enumerate(train_loader):
            if i >= steps_per_epoch:
                break
            batch = device_put_batch(jnp.asarray(batch), mesh)
            state, metrics = train_step(state, batch, rng)
            seen += batch.shape[0]
            if i % args.log_every == 0:
                lr = float(schedule(int(state.step) - 1))
                logging.info(
                    "epoch %d [%d/%d] stage=%s loss=%.4f mse=%.6f "
                    "bpp=%.4f aux=%.1f gnorm=%.3g lr=%.2e",
                    epoch, seen, len(train_ds), stage.name,
                    float(metrics["loss"]), float(metrics["mse_loss"]),
                    float(metrics["bpp_loss"]),
                    float(metrics["aux_loss"]),
                    float(metrics["grad_norm"]), lr)

        meters = {k: AverageMeter()
                  for k in ("loss", "mse_loss", "bpp_loss", "aux_loss")}
        for batch in test_loader:
            m = eval_step(state.params, jnp.asarray(batch))
            for k in meters:
                meters[k].update(float(m[k]), batch.shape[0])
        test_loss = meters["loss"].avg
        logging.info(
            "epoch %d done in %.1fs | test loss=%.4f mse=%.6f bpp=%.4f",
            epoch, time.time() - tic, test_loss,
            meters["mse_loss"].avg, meters["bpp_loss"].avg)

        if args.save:
            is_best = test_loss < best_loss
            best_loss = min(best_loss, test_loss)
            save_checkpoint(
                base_dir, int(state.step), state,
                metrics={"epoch": epoch, "loss": test_loss},
                is_best=is_best)

    if args.save:
        # Params-only export for inference consumers (evaluate/decode/
        # bench restore it without reconstructing the optimizer) and the
        # campaign's completion marker.
        from ..utils import save_params_export

        save_params_export(base_dir, state.params)
        logging.info("saved params export to %s", base_dir)


if __name__ == "__main__":
    main(sys.argv[1:])
