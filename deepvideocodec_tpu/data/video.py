"""Vimeo-90K-style septuplet clip dataset (host-side numpy pipeline).

Sampling semantics match the reference's VideoFolder exactly
(/root/reference/dmc/datasets/video.py:42-127):
  * index file `sep_{split}list.txt` + `sequences/` tree;
  * per sample: sorted frame files, random temporal stride
    `interval ~ U{1, (len+2)//max_frames}` when rnd_interval, take the first
    max_frames of the strided list;
  * ONE random crop applied identically to every frame of the clip;
  * the whole clip is temporally reversed with p=0.5 when rnd_temp_order.

Output is a float32 (T, H, W, 3) array in [0, 1] (NHWC, device-ready).
"""

from __future__ import annotations

import random
from pathlib import Path
from typing import Optional, Tuple

import numpy as np


class VideoFolderDataset:
    def __init__(
        self,
        root,
        split: str = "train",
        max_frames: int = 2,
        crop_size: Optional[Tuple[int, int]] = (256, 256),
        rnd_interval: bool = False,
        rnd_temp_order: bool = False,
        random_crop: bool = True,
        seed: Optional[int] = None,
    ):
        root = Path(root)
        splitfile = root / f"sep_{split}list.txt"
        splitdir = root / "sequences"
        if not splitfile.is_file():
            raise FileNotFoundError(f"missing index file {splitfile}")
        if not splitdir.is_dir():
            raise FileNotFoundError(f"missing sequences dir {splitdir}")
        with splitfile.open() as f:
            self.sample_folders = [
                splitdir / line.strip() for line in f if line.strip()
            ]
        self.max_frames = max_frames
        self.crop_size = crop_size
        self.rnd_interval = rnd_interval
        self.rnd_temp_order = rnd_temp_order
        self.random_crop = random_crop
        self._rng = random.Random(seed)

    def __len__(self) -> int:
        return len(self.sample_folders)

    def _load_frame(self, path: Path) -> np.ndarray:
        from PIL import Image

        img = Image.open(path).convert("RGB")
        return np.asarray(img, np.float32) / 255.0

    def __getitem__(self, index: int) -> np.ndarray:
        folder = self.sample_folders[index]
        samples = sorted(p for p in folder.iterdir() if p.is_file())
        max_interval = (len(samples) + 2) // self.max_frames
        interval = (
            self._rng.randint(1, max_interval) if self.rnd_interval else 1
        )
        frame_paths = samples[::interval][: self.max_frames]
        frames = np.stack([self._load_frame(p) for p in frame_paths])

        if self.crop_size is not None:
            th, tw = self.crop_size
            _, h, w, _ = frames.shape
            if self.random_crop:
                top = self._rng.randint(0, max(h - th, 0))
                left = self._rng.randint(0, max(w - tw, 0))
            else:  # center crop (the reference's test transform)
                top = (h - th) // 2
                left = (w - tw) // 2
            frames = frames[:, top:top + th, left:left + tw, :]

        if self.rnd_temp_order and self._rng.random() < 0.5:
            frames = frames[::-1]
        return np.ascontiguousarray(frames)
