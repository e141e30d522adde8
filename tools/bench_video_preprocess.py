"""Video PREPROCESSING throughput (VERDICT r3 next #5): decode + transform
clips/s through the production preprocess_video_dir, with the honest
bottleneck decomposition — the video half of the "preprocessing+inference"
north star (the CSI half is tools/bench_preprocess.py).

Reference pipeline being measured against
(/root/reference/benchmark/video/preprocess.py:17-71): a SINGLE-THREADED
python loop of torchvision.io.read_video -> published-weights transform ->
np.save per clip. torchvision is absent in this environment, so its
read_video (pyav/ffmpeg) cannot be timed directly; the comparable
composition is our own pipeline at --threads 1 (same serial
decode->transform->save structure), with the transform itself the
torchvision-exact torch reconstruction the golden fixtures pin
(data/video_io.py::apply_transform, tests/test_video_pipeline.py). The
decode backends differ (cv2/ffmpeg vs torchvision/pyav — both ffmpeg
underneath) and that caveat is recorded with the numbers in BASELINE.md.

Synthetic clips: 90 frames of 480x640 BGR noise+gradient, written with
cv2's mp4v encoder (falls back to timing decode/transform on raw frames if
the codec is unavailable).

Run: python tools/bench_video_preprocess.py [n_clips]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAMES, H, W = 90, 480, 640


def synth_mp4s(video_dir: str, n: int) -> bool:
    """Write n synthetic 90-frame clips; False if no usable encoder."""
    import cv2
    rng = np.random.default_rng(0)
    grad = np.linspace(0, 60, W, dtype=np.float32)[None, :, None]
    for i in range(n):
        path = os.path.join(video_dir, f"clip_{i}.mp4")
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                             30.0, (W, H))
        if not vw.isOpened():
            return False
        base = rng.integers(0, 195, size=(H, W, 3)).astype(np.float32)
        for t in range(FRAMES):
            frame = np.clip(base + grad * (t / FRAMES), 0, 255)
            vw.write(frame.astype(np.uint8))
        vw.release()
        if os.path.getsize(path) == 0:
            return False
    return True


def main(n_clips: int = 16):
    from multi_modal_csi_tpu.data.video_io import (VIDEO_TRANSFORMS,
                                                   apply_transform,
                                                   decode_video,
                                                   preprocess_video_dir)

    d = tempfile.mkdtemp()
    video_dir = os.path.join(d, "video")
    os.makedirs(video_dir)
    results = {"n_clips": n_clips, "frames": FRAMES, "res": f"{H}x{W}"}
    try:
        if not synth_mp4s(video_dir, n_clips):
            results["error"] = "no mp4 encoder available"
            print(json.dumps(results))
            return
        labels = [f"clip_{i}" for i in range(n_clips)]

        # warm every stage once (torch import + thread-pool spinup would
        # otherwise land inside the first timed transform)
        warm = decode_video(os.path.join(video_dir, "clip_0.mp4"))
        apply_transform(warm, VIDEO_TRANSFORMS["S3D"])

        # decomposition on one clip set: decode / transform / save
        t0 = time.perf_counter()
        decoded = [decode_video(os.path.join(video_dir, f"{l}.mp4"))
                   for l in labels]
        t_decode = time.perf_counter() - t0
        tf = VIDEO_TRANSFORMS["S3D"]
        t0 = time.perf_counter()
        transformed = [apply_transform(fr, tf) for fr in decoded]
        t_transform = time.perf_counter() - t0
        save_dir = os.path.join(d, "save_probe")
        os.makedirs(save_dir)
        t0 = time.perf_counter()
        for l, arr in zip(labels, transformed):
            np.save(os.path.join(save_dir, f"{l}.npy"), arr)
        t_save = time.perf_counter() - t0
        results["decomposition_s_per_clip"] = {
            "decode": round(t_decode / n_clips, 4),
            "transform_s3d": round(t_transform / n_clips, 4),
            "save": round(t_save / n_clips, 4)}

        # end-to-end clips/s: backend x threads matrix. threads=1 torch is
        # the reference's composition (serial decode->exact-transform->save)
        for backend in ("torch", "cv2"):
            for threads in (1, 4):
                cache = os.path.join(d, f"cache_{backend}_{threads}")
                t0 = time.perf_counter()
                preprocess_video_dir(video_dir, labels, "S3D", cache,
                                     num_threads=threads, backend=backend)
                dt = time.perf_counter() - t0
                results[f"clips_per_s_{backend}_t{threads}"] = \
                    round(n_clips / dt, 3)

        # per-model transform cost (resize target dominates); median of 3
        per_model = {}
        for model in VIDEO_TRANSFORMS:
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                apply_transform(decoded[0], VIDEO_TRANSFORMS[model])
                ts.append(time.perf_counter() - t0)
            per_model[model] = round(sorted(ts)[1], 4)
        results["transform_s_per_clip_by_model"] = per_model
        print(json.dumps(results))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
