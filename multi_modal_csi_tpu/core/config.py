"""Typed configuration tree.

Replaces the reference's three stacked config mechanisms (module-level ``preset``
dicts, argparse overrides, and the env-var overlay that rewrites preset.py on
disk — reference: benchmark/wifi_csi/preset.py:8-96, run_main.py:70-84,
config_modifier.py:14-46) with one dataclass tree supporting dotted-path
overrides from CLI, environment variables, and JSON files.

Default values reproduce the reference presets exactly so experiment configs
are directly comparable.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

# Encoding tables are config data in the reference (wifi_csi/preset.py:69-90).
ACTIVITY_ENCODING: Dict[str, List[int]] = {
    "nan":      [0, 0, 0, 0, 0, 0, 0, 0, 0],
    "nothing":  [1, 0, 0, 0, 0, 0, 0, 0, 0],
    "walk":     [0, 1, 0, 0, 0, 0, 0, 0, 0],
    "rotation": [0, 0, 1, 0, 0, 0, 0, 0, 0],
    "jump":     [0, 0, 0, 1, 0, 0, 0, 0, 0],
    "wave":     [0, 0, 0, 0, 1, 0, 0, 0, 0],
    "lie_down": [0, 0, 0, 0, 0, 1, 0, 0, 0],
    "pick_up":  [0, 0, 0, 0, 0, 0, 1, 0, 0],
    "sit_down": [0, 0, 0, 0, 0, 0, 0, 1, 0],
    "stand_up": [0, 0, 0, 0, 0, 0, 0, 0, 1],
}

LOCATION_ENCODING: Dict[str, List[int]] = {
    "nan": [0, 0, 0, 0, 0],
    "a":   [1, 0, 0, 0, 0],
    "b":   [0, 1, 0, 0, 0],
    "c":   [0, 0, 1, 0, 0],
    "d":   [0, 0, 0, 1, 0],
    "e":   [0, 0, 0, 0, 1],
}


@dataclass
class PathConfig:
    """Dataset/result locations (reference: wifi_csi/preset.py:20-24)."""
    data_x: str = "dataset/wifi_csi/amp"
    data_y: str = "dataset/annotation.csv"
    save: str = "results/result.json"
    # video-specific (video/preset.py:19-25)
    video_x: str = "dataset/video"
    video_pre_x: str = "dataset/cache"
    save_model: Optional[str] = None


@dataclass
class DataConfig:
    """Data selection (reference: wifi_csi/preset.py:27-32)."""
    num_users: List[str] = field(default_factory=lambda: ["0", "1", "2", "3", "4", "5"])
    wifi_band: List[str] = field(default_factory=lambda: ["5"])
    environment: List[str] = field(default_factory=lambda: ["empty_room"])
    length: int = 3000          # CSI time steps after left-pad
    frame_stride: int = 1       # video frame downsampling (video/preset.py:40)


@dataclass
class SchedulerConfig:
    """Cosine-warmup schedule knobs (reference: wifi_csi/preset.py:47-51)."""
    type: str = "cosine_warmup"
    num_warmup_epochs: int = 10
    min_lr_ratio: float = 0.05


@dataclass
class LossConfig:
    """Set-matching loss knobs (reference: wifi_csi/preset.py:52-59)."""
    type: str = "HungarianMatchingLoss"
    cost_class_weight: float = 1.0
    aux_loss_weight: float = 0.25
    label_smoothing: float = 0.3
    class_imbalance_weight: float = 0.25


@dataclass
class NNConfig:
    """Model/optimizer hyperparameters (reference: wifi_csi/preset.py:42-66)."""
    lr: float = 5e-4
    epoch: int = 300
    batch_size: int = 16
    threshold: float = 0.5
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    cross_attention_temp: float = 2.0
    weight_decay: float = 2e-4
    num_obj_queries: int = 5
    num_decoder_layers: int = 6
    dim_ffn: int = 512
    token_length: int = 10
    patience: int = 150


@dataclass
class MeshConfig:
    """Device mesh axes for SPMD execution. No reference counterpart — the
    reference is single-device (SURVEY.md §2.5); this is the TPU-native
    execution model: data/fsdp/model named axes over ICI."""
    data: int = -1   # -1: all remaining devices
    model: int = 1   # tensor-parallel degree (attention heads / FFN shards)
    fsdp: bool = False  # ZeRO-3-style param + optimizer-state sharding over
                        # the data axis (parallel/partition.py::fsdp_spec)

    def resolved(self, n_devices: int) -> Dict[str, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else max(1, n_devices // model)
        return {"data": data, "model": model}


@dataclass
class Config:
    """Root experiment config (superset of both reference presets)."""
    model: str = "DETR"
    task: str = "activity"        # identity | activity | location
    repeat: int = 8
    path: PathConfig = field(default_factory=PathConfig)
    data: DataConfig = field(default_factory=DataConfig)
    data_band2: DataConfig = field(default_factory=DataConfig)
    nn: NNConfig = field(default_factory=NNConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    encoding_activity: Dict[str, List[int]] = field(default_factory=lambda: dict(ACTIVITY_ENCODING))
    encoding_location: Dict[str, List[int]] = field(default_factory=lambda: dict(LOCATION_ENCODING))
    # transfer learning (reference: wifi_csi/preset.py:91-95)
    pretrained_path: Optional[str] = None
    transfer_scenario: str = "full"   # full | feature_extractor | feature_encoder
    save_model: bool = False
    saving_path: str = "results/"
    # observability
    wandb_project: Optional[str] = None   # None => stdout/JSONL only
    log_jsonl: Optional[str] = None
    profile_dir: Optional[str] = None
    # numerics for the FINAL test-set inference (the serving path):
    # "float32" reproduces the reference's numerics (default — training is
    # always f32 like the reference); "bfloat16" FORCES bf16 serving;
    # "auto" picks the per-model measured best from the BASELINE.md r2
    # sweep (bf16 for every CSI model and the conv video backbones, f32
    # for Swin/MViT whose attention gains nothing from bf16 at serving
    # batch sizes) — see resolve_serving_dtype.
    compute_dtype: str = "float32"
    # numerics for TRAINING: "float32" (default) is the reference's exact
    # configuration and what every parity proof runs; "bfloat16" is the
    # measured throughput configuration (BASELINE.md r3 training tables:
    # wins or ties every CSI family after the mixed-precision fixes —
    # params + Adam moments in bf16, f32 MXU accumulation, f32 BN running
    # stats). Orthogonal to compute_dtype (the serving knob).
    train_dtype: str = "float32"

    # ------------------------------------------------------------------ #
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def override(self, dotted: Dict[str, Any]) -> "Config":
        """Return a new Config with dotted-path overrides applied.

        e.g. override({"nn.lr": 1e-3, "data.environment": ["classroom"]}).
        """
        cfg = dataclasses.replace(self)
        for key, value in dotted.items():
            node: Any = cfg
            parts = key.split(".")
            for part in parts[:-1]:
                node = getattr(node, part)
            leaf = parts[-1]
            if not hasattr(node, leaf):
                raise KeyError(f"unknown config key: {key}")
            current = getattr(node, leaf)
            if current is not None and not isinstance(current, type(value)) \
                    and not (isinstance(current, float) and isinstance(value, int)):
                # best-effort coercion for CLI string inputs
                if isinstance(current, bool):
                    value = str(value).lower() in ("1", "true", "yes")
                elif isinstance(current, int):
                    value = int(value)
                elif isinstance(current, float):
                    value = float(value)
                elif isinstance(current, list) and isinstance(value, str):
                    value = [v.strip() for v in value.split(",")]
            setattr(node, leaf, value)
        return cfg


# Environment-variable overlay: same knob set as the reference's
# config_modifier.py:14-46, mapped onto the typed tree instead of rewriting
# preset.py on disk.
_ENV_MAP = {
    "LEARNING_RATE": ("nn.lr", float),
    "BATCH_SIZE": ("nn.batch_size", int),
    "NUM_EPOCHS": ("nn.epoch", int),
    "NUM_DECODER_LAYERS": ("nn.num_decoder_layers", int),
    "DIM_FFN": ("nn.dim_ffn", int),
    "NUM_QUERIES": ("nn.num_obj_queries", int),
    "AUX_LOSS": ("nn.loss.aux_loss_weight", float),
    "CLASS_IMBALANCE_WEIGHT": ("nn.loss.class_imbalance_weight", float),
    "LABEL_SMOOTHING": ("nn.loss.label_smoothing", float),
    "MODEL_TYPE": ("model", str),
}


def apply_env_overrides(cfg: Config, environ: Optional[Dict[str, str]] = None) -> Config:
    """Overlay environment variables onto cfg (reference: config_modifier.py)."""
    env = dict(os.environ) if environ is None else environ
    overrides: Dict[str, Any] = {}
    for var, (key, cast) in _ENV_MAP.items():
        if var in env:
            overrides[key] = cast(env[var])
    if "DATA_PATH" in env:
        overrides["path.data_x"] = env["DATA_PATH"] + "/wifi_csi/amp"
        overrides["path.data_y"] = env["DATA_PATH"] + "/annotation.csv"
    if "ENVIRONMENTS_EXP" in env:
        overrides["data.environment"] = [e.strip() for e in env["ENVIRONMENTS_EXP"].split(",")]
    return cfg.override(overrides) if overrides else cfg


def load_config(path: Optional[str] = None,
                cli_overrides: Optional[Dict[str, Any]] = None,
                use_env: bool = True) -> Config:
    """Config resolution order: defaults < JSON file < env vars < CLI."""
    cfg = Config()
    if path:
        with open(path) as f:
            cfg = cfg.override(_flatten(json.load(f)))
    if use_env:
        cfg = apply_env_overrides(cfg)
    if cli_overrides:
        cfg = cfg.override(cli_overrides)
    return cfg


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    flat: Dict[str, Any] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict) and not key.endswith(("encoding_activity", "encoding_location")):
            flat.update(_flatten(v, key + "."))
        else:
            flat[key] = v
    return flat


# ---------------------------------------------------------------------- #
# serving dtype resolution (BASELINE.md r2 bf16 sweep; VERDICT r2 next #8)
# ---------------------------------------------------------------------- #

# Measured per-model serving winners at the BASELINE.md batch sizes:
# bf16 speeds up every CSI model (1.2-2.9x) and the conv video backbones
# (ResNet3D +2%, S3D +16%), but SLOWS Swin3D-T (63.0 -> 56.8 clips/s) —
# its f32-accumulated attention einsums gain nothing from bf16 inputs while
# LayerNorm/residual convert traffic grows. MViT flipped to bf16 in r3:
# with the tiled flash-attention serving path the attention matrices live
# in VMEM, so bf16 halves the kernel's q/k/v/out traffic instead of adding
# convert passes (v1 75.9 vs 50.5 f32; v2 68.4 vs 46.8 — BASELINE.md r3).
SERVING_DTYPE_DEFAULTS: Dict[str, str] = {
    # video
    "ResNet": "bfloat16",
    "S3D": "bfloat16",
    "Swin-T": "float32",
    "Swin-S": "float32",
    "MViT-v1": "bfloat16",
    "MViT-v2": "bfloat16",
}
_SERVING_DEFAULT_OTHER = "bfloat16"     # every CSI model measured faster


def resolve_serving_dtype(compute_dtype: str, model_name: str) -> str:
    """Map cfg.compute_dtype x model -> concrete serving dtype string.

    "auto" consults the measured table (unknown models fall back to bf16 —
    the CSI-wide winner); explicit "float32"/"bfloat16" always win.
    """
    if compute_dtype != "auto":
        return compute_dtype
    return SERVING_DTYPE_DEFAULTS.get(model_name, _SERVING_DEFAULT_OTHER)


# Measured int8-serving winners (tools/exp_quant_serving.py on the real
# chip, two runs, BASELINE.md int8 section — defaults set only where both
# runs agree on the direction): compute-bound transformer models win with
# full int8 MXU ("w8a8": DETR ~+12% pooled with the MHA-projection hooks,
# THAT_ENCODER stable-never-slower); MLP wins with weight-only in its
# production (folded) serving config ("w8", +22% after the BN fold;
# neutral before it — the weight readback only dominates once the BN
# pass is gone; w8a8 always loses, the activation-quantize pass over the
# 810k-wide input costs more than int8 compute saves); the compute-bound
# video conv backbones win big with w8a8 (ResNet3D +52.5%, S3D +14.2% —
# tools/exp_quant_video.py); CNN-2D/THAT and the attention video
# backbones measured noise-level and default to None so "auto" never
# trades accuracy for nothing.
QUANT_DEFAULTS: Dict[str, Optional[str]] = {
    "DETR": "w8a8",          # ~+12% pooled; wins every measured pairing
    "THAT_ENCODER": "w8a8",  # int8 stable 12.0-12.2k vs bf16's 10.5-12.0k
    "MLP": "w8",             # +22% on the folded serving config
    "ResNet": "w8a8",        # +52.5%
    "S3D": "w8a8",           # +14.2%
    # THAT measured +3.9% then -1.4% across runs (tunnel noise): no default.
}


def resolve_quant(quant: Optional[str], model_name: str) -> Optional[str]:
    """Map --quant x model -> concrete mode (None | "w8" | "w8a8").

    "auto" consults the measured table; unknown models stay unquantized.
    "none" (or None) disables; explicit "w8"/"w8a8" always win.
    """
    if quant == "auto":
        return QUANT_DEFAULTS.get(model_name)
    if quant in (None, "none"):
        return None
    return quant


# Measured serving batch-size knees (chained-marginal sweeps, BASELINE.md):
# throughput rises with batch until the knee, then flattens or OOMs. CSI
# models: DETR's bs256/512/1024 probe found bs256 at the knee; the other
# CSI models were measured at bs256 in the bf16 sweep and are HBM- or
# step-overhead-bound well below it, so bs256 is safe fleet-wide. Video:
# the r3 batch-scaling sweep (tools/exp_video_batch.py) — ResNet3D bs64
# (51.3% MFU; flat at 128), S3D bs32 (bs64 RESOURCE_EXHAUSTs the stem
# activations), MViT and Swin measured FLAT in batch (per-clip
# bandwidth-bound) so their default stays at the latency-friendly minimum.
SERVING_BATCH_DEFAULTS: Dict[str, int] = {
    "ResNet": 64,
    "S3D": 32,
    "Swin-T": 2,
    "Swin-S": 2,
    "MViT-v1": 2,
    "MViT-v2": 2,
}
_SERVING_BATCH_OTHER = 256              # CSI-wide measured knee


def resolve_serving_batch(model_name: str,
                          batch: Optional[int] = None) -> int:
    """Throughput-optimal serving batch for a model; explicit wins."""
    if batch is not None and batch > 0:
        return batch
    return SERVING_BATCH_DEFAULTS.get(model_name, _SERVING_BATCH_OTHER)
