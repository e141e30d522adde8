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


def apply_transform(frames: np.ndarray, tf: VideoTransform) -> np.ndarray:
    """uint8 (T, H, W, 3) -> normalized float32 (T, cropH, cropW, 3)."""
    import cv2
    t, h, w, _ = frames.shape
    if tf.resize[1] == -1:      # short-side resize
        scale = tf.resize[0] / min(h, w)
        new_h, new_w = int(round(h * scale)), int(round(w * scale))
    else:
        new_h, new_w = tf.resize
    resized = np.stack([cv2.resize(f, (new_w, new_h),
                                   interpolation=cv2.INTER_LINEAR)
                        for f in frames])
    ch, cw = tf.crop
    top = (new_h - ch) // 2
    left = (new_w - cw) // 2
    cropped = resized[:, top:top + ch, left:left + cw]
    out = cropped.astype(np.float32) / 255.0
    out = (out - np.asarray(tf.mean, np.float32)) / np.asarray(tf.std, np.float32)
    return out


def preprocess_video_dir(video_dir: str, labels: Sequence[str], model: str,
                         cache_dir: str, expected_frames: int = 90,
                         num_threads: int = 4) -> List[str]:
    """Decode+transform every labeled clip into `cache_dir` (.npy, THWC).

    Returns the labels whose frame count differed from `expected_frames`
    (the reference's integrity warning, preprocess.py:63).
    """
    os.makedirs(cache_dir, exist_ok=True)
    tf = VIDEO_TRANSFORMS[model]
    bad: List[str] = []

    def work(label: str) -> None:
        frames = decode_video(os.path.join(video_dir, f"{label}.mp4"))
        if frames.shape[0] != expected_frames:
            bad.append(label)
        np.save(os.path.join(cache_dir, f"{label}.npy"),
                apply_transform(frames, tf))

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
