"""Checkpointing: component save/restore + sharding-aware run checkpoints.

Covers the reference's three checkpoint behaviors (SURVEY.md §5.4):
  - persistent component save `results/model_0/PT_<envs>_<model>` of the full
    weight tree (utils.py:89-101);
  - transfer-learning restore with scenarios full / feature_extractor /
    feature_encoder including per-component learning rates and freezing
    (utils.py:16-86) — the optimizer side lives in train/transfer.py;
  - run checkpoints (params + opt state + rng + step) for preemption-safe
    resume, which the reference lacks entirely (best weights lived only in
    process memory, train.py:164). Implemented with orbax so sharded arrays
    restore with their shardings.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import flax.serialization as serialization
import jax
import numpy as np


def component_path(saving_path: str, environments, model_name: str) -> str:
    env = "_".join(environments)
    return os.path.join(saving_path, "model_0", f"PT_{env}_{model_name}.msgpack")


def save_components(path: str, params: Any, batch_stats: Any = None) -> None:
    """Serialize the full weight tree (reference: save_model_components)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {"params": jax.device_get(params),
               "batch_stats": jax.device_get(batch_stats or {})}
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))


def load_components(path: str, like: Optional[Dict] = None) -> Dict:
    """Deserialize a weight tree; `like` provides the target structure."""
    with open(path, "rb") as f:
        data = f.read()
    if like is not None:
        return serialization.from_bytes(like, data)
    return serialization.msgpack_restore(data)


def _load_torch_checkpoint(path: str, model_key: Optional[str],
                           params: Any, batch_stats: Any) -> Dict:
    """A reference torch `.pt`/`.pth` checkpoint, imported strictly into the
    flax tree structure (core/torch_import.py). Accepts both a bare
    state_dict and the reference's `{'model_state_dict': ...}` wrapper
    (inference_only.py:13-15). Routing is by extension, but the bytes win:
    a native msgpack tree saved under a `.pt` name falls back to the
    msgpack loader instead of dying in torch unpickling (ADVICE r3)."""
    like = {"params": jax.device_get(params),
            "batch_stats": jax.device_get(batch_stats or {})}
    try:
        # torch import INSIDE the try: on a torch-less deployment (the
        # production runtime is pure JAX) a msgpack tree under a .pt name
        # must still reach the fallback below, not die on ModuleNotFoundError
        import torch
        try:
            ckpt = torch.load(path, map_location="cpu", weights_only=True)
        except TypeError:         # older torch without weights_only
            ckpt = torch.load(path, map_location="cpu")
    except Exception as e:
        try:
            with open(path, "rb") as f:
                data = f.read()
            return serialization.from_bytes(like, data)
        except Exception:
            raise ValueError(
                f"{path} ends in .pt/.pth (the torch-checkpoint extension "
                f"contract) but torch.load failed "
                f"({type(e).__name__}: {e}), and the bytes are not a "
                "native msgpack tree either") from e
    if model_key is None:
        raise ValueError(
            f"{path} is a torch checkpoint; pass model_key (the model name, "
            "e.g. 'DETR') so the importer knows the layout")
    from .torch_import import import_state_dict
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        ckpt = ckpt["model_state_dict"]
    return import_state_dict(model_key, ckpt, like)


def restore_scenario(params: Any, batch_stats: Any, path: str,
                     scenario: str = "full",
                     model_key: Optional[str] = None) -> Tuple[Any, Any]:
    """Selective component restore (reference: load_model_components).

    full             -> entire tree restored;
    feature_extractor-> only params['feature_extractor'] (+ its batch stats);
    feature_encoder  -> feature_extractor AND encoder restored.
    Learning-rate groups / freezing are applied by
    train.transfer.transfer_optimizer using the same scenario string.
    A `.pt`/`.pth` path is treated as a REFERENCE torch checkpoint and
    imported via core/torch_import.py (model_key required).
    """
    if path.endswith((".pt", ".pth")):
        saved = _load_torch_checkpoint(path, model_key, params, batch_stats)
        saved.setdefault("batch_stats", {})
    else:
        saved = load_components(path, like={"params": jax.device_get(params),
                                            "batch_stats": jax.device_get(batch_stats or {})})
    if scenario == "full":
        return saved["params"], saved["batch_stats"]

    if scenario == "feature_extractor":
        keep = ("feature_extractor",)
    elif scenario == "feature_encoder":
        keep = ("feature_extractor", "encoder")
    else:
        raise ValueError(f"unknown scenario: {scenario}")

    new_params = dict(params)
    new_stats = dict(batch_stats or {})
    for key in keep:
        if key in saved["params"]:
            new_params[key] = saved["params"][key]
        if saved["batch_stats"] and key in saved["batch_stats"]:
            new_stats[key] = saved["batch_stats"][key]
    return new_params, new_stats


class RunCheckpointer:
    """Periodic run checkpoints with latest-restore (orbax-backed)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir, options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True))

    def save(self, step: int, state: Dict[str, Any]) -> None:
        import orbax.checkpoint as ocp
        self._mgr.save(step, args=ocp.args.StandardSave(jax.device_get(state)))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, like: Dict[str, Any], step: Optional[int] = None) -> Dict[str, Any]:
        import orbax.checkpoint as ocp
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self._dir}")
        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(jax.device_get(like)))
