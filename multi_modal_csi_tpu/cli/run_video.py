"""Video experiment CLI (the reference's benchmark/video/run.py surface).

Usage:
  python -m multi_modal_csi_tpu.cli.run_video --model Swin-T --task identity
"""

from __future__ import annotations

import argparse
import json
import os

from ..core.config import load_config
from ..utils.results import NumpyJSONEncoder


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="Swin-T")
    p.add_argument("--task", default="identity")
    p.add_argument("--repeat", default=None, type=int)
    p.add_argument("--config", default=None)
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    p.add_argument("--mesh", action="store_true",
                   help="shard batches over the device mesh (data parallel; "
                        "cfg.mesh.fsdp adds ZeRO-3 state sharding)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize() with "
                        "cloud auto-detection BEFORE backend init "
                        "(parallel/mesh.py::initialize_distributed)")
    args = p.parse_args()
    if args.distributed:
        from ..parallel.mesh import initialize_distributed
        initialize_distributed()    # env/metadata auto-detection
    overrides = {"model": args.model, "task": args.task,
                 "nn.lr": 1e-4, "nn.epoch": 20, "nn.batch_size": 8,
                 "repeat": args.repeat if args.repeat is not None else 10}
    for kv in args.set:
        key, _, value = kv.partition("=")
        overrides[key] = value
    cfg = load_config(args.config, overrides)

    from ..runners.video import run_video_model
    result = run_video_model(cfg, use_mesh=args.mesh)
    result["model"] = cfg.model
    result["task"] = cfg.task
    if cfg.path.save:
        os.makedirs(os.path.dirname(cfg.path.save) or ".", exist_ok=True)
        with open(cfg.path.save, "w") as f:
            json.dump(result, f, indent=4, cls=NumpyJSONEncoder)
    print(result)


if __name__ == "__main__":
    main()
