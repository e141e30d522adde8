"""Video preprocessing CLI (reference: benchmark/video/preprocess.py:79-105).

Decodes every annotated clip, applies the chosen backbone's published
transform, caches normalized float32 (T, H, W, 3) arrays, and reports clips
whose frame count differs from 90 (the reference's integrity warning).

Usage:
  python -m multi_modal_csi_tpu.cli.preprocess_video --model Swin-T \
      --path_data_x dataset/video --path_data_y dataset/annotation.csv \
      --path_data_pre_x dataset/cache
"""

from __future__ import annotations

import argparse
import time

from ..data.annotation import label_list, load_annotation
from ..data.video_io import preprocess_video_dir


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--path_data_x", default="dataset/video")
    p.add_argument("--path_data_y", default="dataset/annotation.csv")
    p.add_argument("--model", default="Swin-T")
    p.add_argument("--path_data_pre_x", default="dataset/cache")
    p.add_argument("--threads", default=4, type=int)
    p.add_argument("--backend", default=None, choices=["torch", "cv2"],
                   help="resize backend: torch = torchvision-exact "
                        "(default); cv2 = 2.8x faster + scales with "
                        "--threads, <=1-LSB resize divergence (BASELINE.md)")
    p.add_argument("--check", action="store_true",
                   help="integrity sweep only (video/load_data.py:93-117): "
                        "report clips whose frame count != 90")
    args = p.parse_args()

    labels = label_list(load_annotation(args.path_data_y))
    print(len(labels))
    t0 = time.time()
    if args.check:
        from ..data.video_io import check_video_integrity
        bad = check_video_integrity(args.path_data_x, labels)
    else:
        bad = preprocess_video_dir(args.path_data_x, labels, args.model,
                                   args.path_data_pre_x,
                                   num_threads=args.threads,
                                   backend=args.backend)
    for label in bad:
        print(label, "Warning!")
    print("Preprocess Time:", time.time() - t0)


if __name__ == "__main__":
    main()
