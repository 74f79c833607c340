"""Synthetic dataset generator for self-contained training/eval campaigns.

The reference trains on Vimeo-90K septuplets and evaluates on UVG PNG
frames — neither ships with this environment. This CLI materializes
synthetic-but-nontrivial video on disk in exactly those layouts so the real
training and evaluation CLIs run unmodified end to end:

  out/vimeo/   sep_trainlist.txt + sep_testlist.txt + sequences/00001/NNNN/
               im1..im7.png       (cli.train -d out/vimeo)
  out/images/  {train,test}/*.png (cli.train_intra -d out/images)
  out/eval/    seqNN/fNNNN.png    (cli.evaluate --frames-root out/eval)

Content: multi-scale smoothed random textures translated by per-clip
constant subpixel velocities (true rigid motion a motion-compensation codec
can exploit), plus a slow global brightness drift — codable, learnable,
with a meaningful rate/distortion trade-off.

    python -m deepvideocodec_tpu.cli.synth_data --out /tmp/synth \
        --clips 256 --clip-size 192 --eval-seqs 4 --eval-frames 96
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def _box_blur(img: np.ndarray, radius: int, passes: int = 3) -> np.ndarray:
    """Separable repeated box blur (≈ gaussian) via cumsum, edge-padded."""
    out = img.astype(np.float32)
    k = 2 * radius + 1
    for _ in range(passes):
        for axis in (0, 1):
            pad = [(0, 0)] * out.ndim
            pad[axis] = (radius + 1, radius)
            p = np.pad(out, pad, mode="edge")
            c = np.cumsum(p, axis=axis)
            out = (np.take(c, range(k, k + out.shape[axis]), axis=axis)
                   - np.take(c, range(0, out.shape[axis]), axis=axis)) / k
    return out


def synthetic_texture_video(
    n_frames: int, h: int, w: int, seed: int = 0, max_speed: float = 1.5
) -> np.ndarray:
    """(T, H, W, 3) float32 in [0,1]: a smoothed random texture drifting
    with constant subpixel velocity, sampled bilinearly per frame."""
    rng = np.random.default_rng(seed)
    vel = rng.uniform(-max_speed, max_speed, size=2)
    margin = int(np.ceil(max_speed * n_frames)) + 2
    H, W = h + 2 * margin, w + 2 * margin
    # two texture scales: coarse structure + fine detail
    tex = (0.7 * _box_blur(rng.random((H, W, 3)), 9)
           + 0.3 * _box_blur(rng.random((H, W, 3)), 2))
    lo, hi = tex.min(), tex.max()
    tex = (tex - lo) / max(hi - lo, 1e-6)

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = []
    for t in range(n_frames):
        oy = margin + vel[0] * t
        ox = margin + vel[1] * t
        y0 = np.floor(yy + oy).astype(np.int32)
        x0 = np.floor(xx + ox).astype(np.int32)
        fy = (yy + oy - y0)[..., None]
        fx = (xx + ox - x0)[..., None]
        img = ((1 - fy) * (1 - fx) * tex[y0, x0]
               + (1 - fy) * fx * tex[y0, x0 + 1]
               + fy * (1 - fx) * tex[y0 + 1, x0]
               + fy * fx * tex[y0 + 1, x0 + 1])
        img = img * (1.0 + 0.02 * np.sin(2 * np.pi * t / 24.0))
        frames.append(np.clip(img, 0.0, 1.0))
    return np.stack(frames).astype(np.float32)


def _save_png(path: Path, img: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(
        (img * 255.0 + 0.5).astype(np.uint8)).save(path)


def write_vimeo_tree(root: Path, clips: int, size: int,
                     test_frac: float = 0.1, seed: int = 0,
                     frames: int = 7) -> None:
    seq_root = root / "sequences" / "00001"
    seq_root.mkdir(parents=True, exist_ok=True)
    # vimeo parity keeps im1..im7 for 7-frame clips (byte-identical
    # seed-0 corpus); longer clips zero-pad so the loader's
    # lexicographic frame sort stays temporal (im01 < im10)
    name = ("im{:d}.png" if frames <= 9 else
            "im{:0" + str(len(str(frames))) + "d}.png").format
    names = []
    for i in range(clips):
        d = seq_root / f"{i + 1:04d}"
        d.mkdir(exist_ok=True)
        video = synthetic_texture_video(frames, size, size, seed=seed + i)
        for f in range(frames):
            _save_png(d / name(f + 1), video[f])
        names.append(f"00001/{i + 1:04d}")
    n_test = max(1, int(len(names) * test_frac))
    (root / "sep_trainlist.txt").write_text(
        "\n".join(names[:-n_test]) + "\n")
    (root / "sep_testlist.txt").write_text(
        "\n".join(names[-n_test:]) + "\n")


def write_image_tree(root: Path, n_train: int, n_test: int, size: int,
                     seed: int = 0) -> None:
    for split, n, off in (("train", n_train, 0), ("test", n_test, 10_000)):
        d = root / split
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = synthetic_texture_video(1, size, size,
                                          seed=seed + off + i)[0]
            _save_png(d / f"img{i:04d}.png", img)


def write_eval_sequences(root: Path, n_seqs: int, n_frames: int, h: int,
                         w: int, seed: int = 0) -> None:
    for s in range(n_seqs):
        d = root / f"seq{s:02d}"
        d.mkdir(parents=True, exist_ok=True)
        video = synthetic_texture_video(n_frames, h, w,
                                        seed=seed + 20_000 + s)
        for f in range(n_frames):
            _save_png(d / f"f{f:04d}.png", video[f])


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Generate synthetic train/eval datasets")
    p.add_argument("--out", required=True)
    p.add_argument("--clips", type=int, default=256)
    p.add_argument("--clip-frames", type=int, default=7,
                   help="frames per training clip (7 = vimeo parity; "
                        "longer clips enable --max-frames > 7 "
                        "drift-cascade fine-tunes)")
    p.add_argument("--clip-size", type=int, default=192)
    p.add_argument("--images", type=int, default=400)
    p.add_argument("--test-images", type=int, default=32)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--eval-seqs", type=int, default=4)
    p.add_argument("--eval-frames", type=int, default=96)
    p.add_argument("--eval-size", type=int, nargs=2, default=(256, 256))
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    out = Path(args.out)
    write_vimeo_tree(out / "vimeo", args.clips, args.clip_size,
                     seed=args.seed, frames=args.clip_frames)
    write_image_tree(out / "images", args.images, args.test_images,
                     args.image_size, seed=args.seed)
    write_eval_sequences(out / "eval", args.eval_seqs, args.eval_frames,
                         *args.eval_size, seed=args.seed)
    print(f"synthetic datasets written under {out}")


if __name__ == "__main__":
    main()
