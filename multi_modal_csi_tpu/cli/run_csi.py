"""CSI experiment CLI (the reference's run_main.py:70-84 surface).

Usage:
  python -m multi_modal_csi_tpu.cli.run_csi --model DETR --task activity \
      --repeat 8 --users "0,1,2,3,4,5" [--set nn.lr=1e-4 --set data.wifi_band=5]

Env-var overlays (LEARNING_RATE, BATCH_SIZE, ... — config_modifier.py's knob
set) apply automatically; --set provides arbitrary dotted-path overrides.
"""

from __future__ import annotations

import argparse

from ..core.config import load_config


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None)
    p.add_argument("--task", default=None)
    p.add_argument("--repeat", default=None, type=int)
    p.add_argument("--users", default=None,
                   help="comma-separated user counts, e.g. '0,1,2,3,4,5'")
    p.add_argument("--config", default=None, help="JSON config file")
    p.add_argument("--set", action="append", default=[],
                   metavar="KEY=VALUE", help="dotted-path override")
    p.add_argument("--mesh", action="store_true",
                   help="shard batches over the device mesh (data parallel)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize() with "
                        "cloud auto-detection BEFORE backend init "
                        "(parallel/mesh.py::initialize_distributed)")
    return p.parse_args()


def main() -> None:
    args = parse_args()
    if args.distributed:
        from ..parallel.mesh import initialize_distributed
        initialize_distributed()    # env/metadata auto-detection
    overrides = {}
    for kv in args.set:
        key, _, value = kv.partition("=")
        overrides[key] = value
    if args.model:
        overrides["model"] = args.model
    if args.task:
        overrides["task"] = args.task
    if args.repeat is not None:
        overrides["repeat"] = args.repeat
    if args.users:
        overrides["data.num_users"] = [u.strip() for u in args.users.split(",")]
    cfg = load_config(args.config, overrides)

    from ..runners.csi import run_csi_model, run_experiment
    if args.mesh:
        import dataclasses
        import json
        import os
        from ..utils.results import NumpyJSONEncoder
        result = run_csi_model(cfg, use_mesh=True)
        result.update(model=cfg.model, task=cfg.task,
                      data=dataclasses.asdict(cfg.data),
                      nn=dataclasses.asdict(cfg.nn))
        if cfg.path.save:
            os.makedirs(os.path.dirname(cfg.path.save) or ".", exist_ok=True)
            with open(cfg.path.save, "w") as f:
                json.dump(result, f, indent=4, cls=NumpyJSONEncoder)
    else:
        result = run_experiment(cfg)
    print(result)


if __name__ == "__main__":
    main()
