"""Intra (I-frame) image-codec training CLI.

The reference delegates I-frames to a frozen *pretrained* CompressAI
cheng2020_anchor (/root/reference/dmc/train.py:564-569, test.py:108-110).
This framework has no external zoo, so the I-frame codec is trained here:
the checkerboard (cheng-class) codec by default, or the factorized /
hyperprior variants. The resulting checkpoint is what `cli.train`'s
--intra-checkpoint and `cli.evaluate`'s --intra-checkpoint consume.

    python -m deepvideocodec_tpu.cli.train_intra -d /data/images \
        --model checkerboard --lambda 2048 --batch-size 16 -e 200

Loss: lambda * MSE + bpp (same 255^2-scaled lambda convention as the
video trainer) + the factorized bottleneck's quantile aux loss through
the dual-Adam partition.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train an intra image codec")
    p.add_argument("-d", "--dataset", required=True,
                   help="root with {train,test}/*.png")
    p.add_argument("-m", "--model", default="checkerboard",
                   choices=["checkerboard", "hyperprior", "factorized",
                            "cheng2020"],
                   help="cheng2020 = compressai cheng2020_anchor transform "
                        "topology + checkerboard head; its transforms can "
                        "warm-start from an imported reference checkpoint "
                        "(tools.import_cheng2020_transforms + --init-from "
                        "--init-partial)")
    p.add_argument("--n-channels", type=int, default=192,
                   help="cheng2020 N (128 for compressai q1-3, 192 for "
                        "q4-6); ignored by the other models")
    p.add_argument("--init-from", type=str, default=None,
                   help="warm-start params from an .npz export or "
                        "checkpoint dir before training")
    p.add_argument("--init-partial", action="store_true",
                   help="with --init-from: load every param whose "
                        "path+shape matches, keep the rest at init (the "
                        "imported-transforms + fresh-head fine-tune path)")
    p.add_argument("-q", "--quality", type=int, default=None,
                   help="quality operating point: sets (n, m, lambda) from "
                        "models.intra.INTRA_QUALITIES (the reference's "
                        "cheng2020_anchor(q) slot) and names the run dir "
                        "intra_q{q}; overrides --lambda")
    p.add_argument("-e", "--epochs", type=int, default=100)
    p.add_argument("-lr", "--learning-rate", type=float, default=1e-4)
    p.add_argument("--aux-learning-rate", type=float, default=1e-3)
    p.add_argument("--lambda", dest="lmbda", type=float, default=2048.0)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--test-batch-size", type=int, default=16)
    p.add_argument("--patch-size", type=int, nargs=2, default=(256, 256))
    p.add_argument("-n", "--num-workers", type=int, default=4)
    p.add_argument("--clip_max_norm", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint", type=str, default=None,
                   help="resume directory")
    p.add_argument("--name", type=str, default="")
    p.add_argument("--debug-nan", action="store_true",
                   help="enable jax NaN/Inf checking: a non-finite value "
                        "raises FloatingPointError at the producing op "
                        "instead of corrupting the loss (slow; debug only)")
    return p.parse_args(argv)


def build_model(name: str, n: int = 192):
    from ..models import (
        CheckerboardImageCodec, HyperpriorImageCodec, FactorizedImageCodec,
        Cheng2020CheckerboardCodec)

    if name == "cheng2020":
        return Cheng2020CheckerboardCodec(n=n)
    return {
        "checkerboard": CheckerboardImageCodec,
        "hyperprior": HyperpriorImageCodec,
        "factorized": FactorizedImageCodec,
    }[name]()


def make_intra_train_step(model, tx, lmbda: float):
    import jax
    import jax.numpy as jnp

    def loss_fn(params, batch, noise_rng):
        out = model.apply(params, batch, training=True,
                          rngs={"noise": noise_rng})
        num_pixels = batch.shape[1] * batch.shape[2]
        bpp = sum(
            jnp.sum(jnp.log(lk.astype(jnp.float32))) / (-jnp.log(2.0))
            for lk in out["likelihoods"].values()
        ) / (batch.shape[0] * num_pixels)
        mse = jnp.mean(jnp.square(
            out["x_hat"].astype(jnp.float32) - batch.astype(jnp.float32)))
        aux = model.apply(params, method=model.aux_loss)
        loss = lmbda * mse + bpp
        return loss + aux, {"loss": loss, "mse": mse, "bpp": bpp,
                            "aux": aux}

    @jax.jit
    def step(state, batch, rng):
        noise_rng = jax.random.fold_in(rng, state["step"])
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state["params"], batch, noise_rng)
        import optax
        updates, opt_state = tx.update(
            grads, state["opt_state"], state["params"])
        return {
            "step": state["step"] + 1,
            "params": optax.apply_updates(state["params"], updates),
            "opt_state": opt_state,
        }, metrics

    @jax.jit
    def eval_step(params, batch):
        out = model.apply(params, batch, training=False)
        num_pixels = batch.shape[1] * batch.shape[2]
        bpp = sum(
            jnp.sum(jnp.log(lk.astype(jnp.float32))) / (-jnp.log(2.0))
            for lk in out["likelihoods"].values()
        ) / (batch.shape[0] * num_pixels)
        mse = jnp.mean(jnp.square(out["x_hat"] - batch))
        return {"loss": lmbda * mse + bpp, "mse": mse, "bpp": bpp}

    return step, eval_step


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..utils.debug import enable_debug_checks, maybe_enable_from_env

    if args.debug_nan:
        enable_debug_checks()
    else:
        maybe_enable_from_env()

    from ..data import ImageFolderDataset, Loader
    from ..models import fast_init
    from ..train.optimizers import make_optimizer
    from ..utils import (setup_logger, AverageMeter, save_checkpoint,
                         restore_checkpoint, latest_step,
                         save_params_export)

    if args.quality is not None:
        from ..models.intra import INTRA_QUALITIES

        if args.model != "checkerboard":
            raise SystemExit("-q ladder is defined for the checkerboard "
                             "(cheng-class) intra codec")
        _, _, args.lmbda = INTRA_QUALITIES[args.quality]
        base_dir = Path("checkpoints") / f"intra_q{args.quality}"
    else:
        base_dir = (Path("checkpoints") / f"intra_{args.model}"
                    / f"{args.lmbda}")
    base_dir.mkdir(parents=True, exist_ok=True)
    setup_logger(base_dir / f"train_{args.name}.log")

    rng = jax.random.PRNGKey(args.seed)
    train_ds = ImageFolderDataset(
        args.dataset, "train", tuple(args.patch_size), random_crop=True,
        seed=args.seed)
    test_ds = ImageFolderDataset(
        args.dataset, "test", tuple(args.patch_size), random_crop=False)
    train_loader = Loader(train_ds, args.batch_size, shuffle=True,
                          num_workers=args.num_workers, seed=args.seed)
    test_loader = Loader(test_ds, args.test_batch_size, shuffle=False,
                         num_workers=args.num_workers, drop_last=False)

    if args.quality is not None:
        from ..models import intra_model_for_quality

        model, _ = intra_model_for_quality(args.quality)
    else:
        model = build_model(args.model, args.n_channels)
    params = fast_init(model, rng)
    if args.init_from:
        if args.init_partial:
            from ..utils import restore_params_export_partial

            out = restore_params_export_partial(args.init_from, params)
            if out is None:
                raise SystemExit(
                    f"--init-partial needs a params_export or .npz at "
                    f"{args.init_from}")
            params, hit, miss = out
            if not hit:
                raise SystemExit(
                    f"--init-partial matched nothing in {args.init_from}")
            logging.info(
                "partial warm start from %s: %d leaves loaded, %d kept "
                "fresh%s", args.init_from, len(hit), len(miss),
                f" (e.g. {miss[0]})" if miss else "")
        else:
            from ..utils import restore_any_params

            params = restore_any_params(args.init_from, params)
            logging.info("warm-started params from %s", args.init_from)
    tx = make_optimizer(args.learning_rate, args.aux_learning_rate,
                        args.clip_max_norm)
    state = {"step": jnp.zeros((), jnp.int32), "params": params,
             "opt_state": tx.init(params)}

    start_epoch = 0
    if args.checkpoint:
        s = latest_step(args.checkpoint)
        if s is not None:
            state = restore_checkpoint(args.checkpoint, s, state)
            start_epoch = int(s) // max(len(train_loader), 1)
            logging.info("resumed step %d (epoch %d)", s, start_epoch)

    from ..utils import retry_flaky_compile

    step_fn, eval_fn = make_intra_train_step(model, tx, args.lmbda)
    step_fn, eval_fn = retry_flaky_compile(step_fn), retry_flaky_compile(eval_fn)

    best = float("inf")
    for epoch in range(start_epoch, args.epochs):
        for bi, batch in enumerate(train_loader):
            state, m = step_fn(state, jnp.asarray(batch), rng)
            if bi % 100 == 0:
                logging.info(
                    "epoch %d [%d/%d] loss=%.4f mse=%.6f bpp=%.4f aux=%.1f",
                    epoch, bi + 1, len(train_loader), float(m["loss"]),
                    float(m["mse"]), float(m["bpp"]), float(m["aux"]))
        meters = {k: AverageMeter() for k in ("loss", "mse", "bpp")}
        for batch in test_loader:
            em = eval_fn(state["params"], jnp.asarray(batch))
            for k in meters:
                meters[k].update(float(em[k]), batch.shape[0])
        test_loss = meters["loss"].avg
        logging.info("epoch %d done | test loss=%.4f mse=%.6f bpp=%.4f",
                     epoch, test_loss, meters["mse"].avg, meters["bpp"].avg)
        step_no = int(state["step"])
        is_best = test_loss < best
        save_checkpoint(base_dir, step_no, state,
                        metrics={"loss": test_loss, "epoch": epoch},
                        is_best=is_best)
        if is_best:
            # what cli.evaluate / cli.train --intra-checkpoint consume
            save_params_export(base_dir, state["params"])
        best = min(best, test_loss)


if __name__ == "__main__":
    main()
