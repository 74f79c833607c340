"""Flat image-folder dataset (root/{train,test}/*.png), for intra training.

Mirrors the reference's ImageFolder
(/root/reference/dmc/datasets/image.py:36-77) with NHWC float output.
"""

from __future__ import annotations

import random
from pathlib import Path
from typing import Optional, Tuple

import numpy as np


class ImageFolderDataset:
    def __init__(
        self,
        root,
        split: str = "train",
        crop_size: Optional[Tuple[int, int]] = (256, 256),
        random_crop: bool = True,
        seed: Optional[int] = None,
    ):
        splitdir = Path(root) / split
        if not splitdir.is_dir():
            raise FileNotFoundError(f"missing split dir {splitdir}")
        self.samples = sorted(p for p in splitdir.iterdir() if p.is_file())
        self.crop_size = crop_size
        self.random_crop = random_crop
        self._rng = random.Random(seed)

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int) -> np.ndarray:
        from PIL import Image

        img = Image.open(self.samples[index]).convert("RGB")
        x = np.asarray(img, np.float32) / 255.0
        if self.crop_size is not None:
            th, tw = self.crop_size
            h, w, _ = x.shape
            if self.random_crop:
                top = self._rng.randint(0, max(h - th, 0))
                left = self._rng.randint(0, max(w - tw, 0))
            else:
                top = (h - th) // 2
                left = (w - tw) // 2
            x = x[top:top + th, left:left + tw, :]
        return np.ascontiguousarray(x)
