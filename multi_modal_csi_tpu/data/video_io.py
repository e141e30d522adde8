"""Video decode, model-specific preprocessing, and cached-clip loading.

Reference: benchmark/video/preprocess.py:17-71 decodes each .mp4 (90 frames
expected), applies the pretrained-weights transform of the chosen backbone,
and caches a normalized float tensor per clip; benchmark/video/load_data.py:
20-61 lazily loads cached clips with frame striding.

Here: cv2-based decode (PyAV/torchvision are not in the image), the published
torchvision Kinetics-400 transform parameters per model (resize -> center
crop -> rescale -> normalize), channels-LAST cache layout (T, H, W, 3) — the
layout TPU conv3d wants — and a threaded batch loader.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np


@dataclass(frozen=True)
class VideoTransform:
    """Published torchvision VideoClassification transform parameters."""
    resize: Tuple[int, int]       # (H, W) target before crop; (s, -1) = short side
    crop: Tuple[int, int]
    mean: Tuple[float, float, float]
    std: Tuple[float, float, float]


KINETICS_MEAN = (0.43216, 0.394666, 0.37645)
KINETICS_STD = (0.22803, 0.22145, 0.216989)

# Per-model transforms (torchvision weights enums' published configs;
# reference selects them in video/preprocess.py:32-48)
VIDEO_TRANSFORMS = {
    "ResNet": VideoTransform((128, 171), (112, 112), KINETICS_MEAN, KINETICS_STD),
    "S3D": VideoTransform((256, 256), (224, 224), KINETICS_MEAN, KINETICS_STD),
    "MViT-v1": VideoTransform((256, -1), (224, 224),
                              (0.45, 0.45, 0.45), (0.225, 0.225, 0.225)),
    "MViT-v2": VideoTransform((256, -1), (224, 224),
                              (0.45, 0.45, 0.45), (0.225, 0.225, 0.225)),
    "Swin-T": VideoTransform((256, -1), (224, 224),
                             (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    "Swin-S": VideoTransform((256, -1), (224, 224),
                             (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
}


def decode_video(path: str) -> np.ndarray:
    """Decode an .mp4 to (T, H, W, 3) uint8 RGB frames (cv2-backed)."""
    import cv2
    cap = cv2.VideoCapture(path)
    frames: List[np.ndarray] = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        raise IOError(f"could not decode any frames from {path}")
    return np.stack(frames)


def _resize_dims(h: int, w: int, resize) -> Tuple[int, int]:
    """Target dims, matching torchvision F.resize exactly: short-side mode
    computes the long side as int(size * long / short) (truncation, not
    rounding — torchvision _compute_resized_output_size)."""
    if resize[1] != -1:
        return resize
    size = resize[0]
    short, long = (h, w) if h <= w else (w, h)
    new_short, new_long = size, int(size * long / short)
    return (new_short, new_long) if h <= w else (new_long, new_short)


def _resize_torch(frames: np.ndarray, new_h: int, new_w: int) -> np.ndarray:
    """torchvision's uint8 tensor resize: cast to float, bilinear
    (antialias=False, half-pixel centers), round, clamp back to uint8 —
    the exact path the reference's VideoClassification preset runs
    (video/preprocess.py:32-48 with torchvision 0.15 / torch 2.0)."""
    import torch
    t = torch.from_numpy(frames).permute(0, 3, 1, 2).float()
    r = torch.nn.functional.interpolate(t, size=(new_h, new_w),
                                        mode="bilinear",
                                        align_corners=False, antialias=False)
    return r.round_().clamp_(0, 255).to(torch.uint8) \
        .permute(0, 2, 3, 1).numpy()


def _resize_cv2(frames: np.ndarray, new_h: int, new_w: int) -> np.ndarray:
    import cv2
    return np.stack([cv2.resize(f, (new_w, new_h),
                                interpolation=cv2.INTER_LINEAR)
                     for f in frames])


def apply_transform(frames: np.ndarray, tf: VideoTransform,
                    backend: Optional[str] = None) -> np.ndarray:
    """uint8 (T, H, W, 3) -> normalized float32 (T, cropH, cropW, 3).

    backend "torch" (default when torch is importable) reproduces the
    reference's torchvision preset bit-for-bit at the uint8 stage; "cv2"
    is a dependency-light fallback whose fixed-point bilinear differs by
    at most 1 LSB per pixel (measured divergence recorded in BASELINE.md;
    golden fixtures in tests/test_video_pipeline.py).
    """
    if backend is None:
        try:
            import torch  # noqa: F401
            backend = "torch"
        except ImportError:
            backend = "cv2"
    t, h, w, _ = frames.shape
    new_h, new_w = _resize_dims(h, w, tf.resize)
    resize = _resize_torch if backend == "torch" else _resize_cv2
    resized = resize(frames, new_h, new_w)
    ch, cw = tf.crop
    # torchvision center_crop rounds the offsets (crop top-left =
    # round((H - ch) / 2)); // 2 would shift odd sizes by one pixel
    top = int(round((new_h - ch) / 2.0))
    left = int(round((new_w - cw) / 2.0))
    cropped = resized[:, top:top + ch, left:left + cw]
    out = cropped.astype(np.float32) / 255.0
    out = (out - np.asarray(tf.mean, np.float32)) / np.asarray(tf.std, np.float32)
    return out


def preprocess_video_dir(video_dir: str, labels: Sequence[str], model: str,
                         cache_dir: str, expected_frames: int = 90,
                         num_threads: int = 4,
                         backend: Optional[str] = None) -> List[str]:
    """Decode+transform every labeled clip into `cache_dir` (.npy, THWC).

    Returns the labels whose frame count differed from `expected_frames`
    (the reference's integrity warning, preprocess.py:63).

    `backend`: "torch" (default when importable) is the torchvision-exact
    resize; "cv2" is 2.8x faster per clip AND releases the GIL (so
    num_threads actually scales), at a measured <=1-LSB-per-pixel resize
    divergence — numbers in BASELINE.md "Video preprocessing throughput".
    """
    os.makedirs(cache_dir, exist_ok=True)
    tf = VIDEO_TRANSFORMS[model]
    bad: List[str] = []

    def work(label: str) -> None:
        frames = decode_video(os.path.join(video_dir, f"{label}.mp4"))
        if frames.shape[0] != expected_frames:
            bad.append(label)
        np.save(os.path.join(cache_dir, f"{label}.npy"),
                apply_transform(frames, tf, backend=backend))

    with ThreadPoolExecutor(max_workers=num_threads) as pool:
        list(pool.map(work, labels))
    return bad


def check_video_integrity(video_dir: str, labels: Sequence[str],
                          expected_frames: int = 90) -> List[str]:
    """Reference's load_data_x sweep (video/load_data.py:93-117): report
    clips whose frame count differs from `expected_frames`."""
    bad = []
    for label in labels:
        try:
            frames = decode_video(os.path.join(video_dir, f"{label}.mp4"))
            if frames.shape[0] != expected_frames:
                bad.append(label)
        except IOError:
            bad.append(label)
    return bad


def load_clips(cache_dir: str, labels: Sequence[str],
               frame_stride: int = 1, num_threads: int = 8) -> np.ndarray:
    """Load cached clips -> (N, T//stride, H, W, 3) float32."""
    paths = [os.path.join(cache_dir, f"{label}.npy") for label in labels]
    probe = np.load(paths[0])[::frame_stride]
    out = np.zeros((len(paths), *probe.shape), dtype=np.float32)
    out[0] = probe

    def fill(i):
        out[i] = np.load(paths[i])[::frame_stride]

    with ThreadPoolExecutor(max_workers=num_threads) as pool:
        list(pool.map(fill, range(1, len(paths))))
    return out


class ClipDataset:
    """Lazy cached-clip access (reference VideoDataset, video/load_data.py:20-61).

    Host memory stays O(1) per lookup — the training/eval loops stream
    through `prefetch_batches`, never materializing the clip set
    (the reference trains the same way: lazy dataset + DataLoader workers,
    video/train.py:47,134)."""

    def __init__(self, cache_dir: str, labels: Sequence[str], y: np.ndarray,
                 frame_stride: int = 1):
        self.cache_dir = cache_dir
        self.labels = list(labels)
        self.y = y
        self.stride = frame_stride

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, i: int):
        x = np.load(os.path.join(self.cache_dir,
                                 f"{self.labels[i]}.npy"))[::self.stride]
        return x, self.y[i]

    def example(self) -> np.ndarray:
        """(1, T, H, W, 3) shape/dtype probe for model init."""
        return self[0][0][None]

    def batch(self, idx: Sequence[int]) -> Tuple[np.ndarray, np.ndarray]:
        xs = np.stack([self[i][0] for i in idx])
        return xs, self.y[np.asarray(idx)]


class ArrayClips:
    """In-memory dataset with the ClipDataset interface — used when callers
    already hold (x, y) arrays (tests, small sweeps)."""

    def __init__(self, x: np.ndarray, y: np.ndarray):
        self.x = x
        self.y = y

    def __len__(self):
        return self.x.shape[0]

    def example(self) -> np.ndarray:
        return self.x[:1]

    def batch(self, idx: Sequence[int]) -> Tuple[np.ndarray, np.ndarray]:
        idx = np.asarray(idx)
        return self.x[idx], self.y[idx]


def prefetch_batches(dataset, index_matrix, num_workers: int = 4,
                     prefetch: int = 2):
    """Background-threaded ORDERED batch iterator with bounded memory.

    The host-side equivalent of the reference's DataLoader(num_workers=4)
    (video/train.py:47): workers assemble upcoming batches while the device
    computes on the current one. At most `prefetch` finished batches wait in
    the queue and at most `prefetch + num_workers` loads are in flight, so
    host memory is O((prefetch + num_workers) * batch) regardless of
    dataset size.
    """
    import queue
    import threading
    from collections import deque

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = object()

    def producer():
        try:
            pending: deque = deque()
            with ThreadPoolExecutor(max_workers=num_workers) as pool:
                for row in index_matrix:
                    pending.append(pool.submit(dataset.batch, row))
                    if len(pending) > prefetch + num_workers:
                        q.put(pending.popleft().result())  # backpressure
                while pending:
                    q.put(pending.popleft().result())
        except BaseException as exc:  # a worker failure must NOT silently
            q.put(exc)                # truncate the epoch — re-raised below
        finally:
            q.put(stop)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
