"""Host-side data pipelines feeding device batches."""

from .video import VideoFolderDataset
from .image import ImageFolderDataset
from .loader import Loader
from .synthetic import synthetic_clip_batch, synthetic_video_frames

__all__ = [
    "VideoFolderDataset",
    "ImageFolderDataset",
    "Loader",
    "synthetic_clip_batch",
    "synthetic_video_frames",
]
