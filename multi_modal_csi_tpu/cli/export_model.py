"""Export a CSI or VIDEO model's serving forward as a StableHLO artifact.

Usage:
  python -m multi_modal_csi_tpu.cli.export_model --model DETR --task activity \
      --batch 256 --out detr_serving.mmcsi [--pretrained PATH] [--dtype auto]
  python -m multi_modal_csi_tpu.cli.export_model --model S3D --out s3d.mmcsi

The artifact is self-contained (weights baked in, TPU+CPU lowerings) and is
reloaded with core.export.serve_file — no model code needed at serving time.
The reference's equivalent surface is inference_only.py (rebuild module +
reload .pth); see core/export.py for the design rationale.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from ..core.config import (load_config, resolve_quant,
                           resolve_serving_batch, resolve_serving_dtype)

# task -> (per-user class count, baseline flat out_dim, reduced out_dim)
_TASK_DIMS = {
    "activity": (9, 6 * 9, 10),
    "identity": (6, 6, None),
    "location": (5, 6 * 5, None),
}


def infer_out_dim(model_key: str, task: str) -> int:
    """The out_features the runner would derive from the encoded labels
    (runners/csi.py: raw targets flatten per-user one-hots; reduce targets
    use the 10-class query rows)."""
    from ..runners.csi import CSI_MODELS
    spec = CSI_MODELS[model_key]
    _, flat, reduced = _TASK_DIMS[task]
    if spec.target.startswith("reduce"):
        if reduced is None:
            raise SystemExit(f"{model_key} supports task=activity only")
        return reduced
    return flat


# video serving input geometry: 90-frame WiMANS clips at stride 2, with the
# torchvision backbone resolutions (data/video_io.py transform table)
_VIDEO_SHAPES = {
    "ResNet": (45, 112, 112), "S3D": (45, 224, 224),
    "Swin-T": (45, 224, 224), "Swin-S": (45, 224, 224),
    "MViT-v1": (45, 224, 224), "MViT-v2": (45, 224, 224),
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--task", default="activity", choices=sorted(_TASK_DIMS))
    p.add_argument("--batch", type=int, default=0,
                   help="serving batch (0 = the model's measured "
                        "throughput knee, core.config.SERVING_BATCH_DEFAULTS)")
    p.add_argument("--out", required=True)
    p.add_argument("--pretrained", default=None,
                   help="component checkpoint (core.checkpoint."
                        "save_components), or a reference torch .pt/.pth "
                        "(imported via core.torch_import)")
    p.add_argument("--dtype", default="auto",
                   help="auto | float32 | bfloat16 (auto = per-model default)")
    p.add_argument("--input-dtype", default="float32",
                   help="dtype the artifact accepts (bfloat16 halves, int8 "
                        "quarters H2D and first-layer HBM traffic; caller "
                        "quantizes — int8 needs --input-scale or --calib)")
    p.add_argument("--input-scale", type=float, default=None,
                   help="int8 input dequant scale (host quantizes as "
                        "round(x/scale); derived as amax/127 from --calib "
                        "when omitted)")
    p.add_argument("--no-fold-bn", action="store_true",
                   help="disable the MLP input-BatchNorm fold (folded by "
                        "default at export: exact eval-mode math, +63% "
                        "measured serving throughput — BASELINE.md)")
    p.add_argument("--quant", default="none",
                   choices=["none", "auto", "w8", "w8a8"],
                   help="int8 post-training quantization of the hooked "
                        "matmul/conv kernels (core/quantize.py). auto = "
                        "the model's measured winner (core.config."
                        "QUANT_DEFAULTS). w8a8 additionally needs --calib "
                        "NPY of input batches")
    p.add_argument("--calib", default=None,
                   help="path to a .npy of calibration inputs (N, *input) "
                        "for --quant w8a8; split into batches of --batch")
    p.add_argument("--calib-stat", default="amax", choices=["amax", "p999"],
                   help="w8a8 activation-scale statistic: exact max-abs or "
                        "the outlier-robust 99.9th percentile")
    p.add_argument("--platforms", default="tpu,cpu")
    p.add_argument("--seed", type=int, default=39)
    p.add_argument("--clip-shape", default=None,
                   help="video only: T,H,W override of the serving clip "
                        "geometry (default: the model's full-res config)")
    args = p.parse_args()

    from ..core.export import export_serving, save_artifact
    from ..runners.csi import CSI_MODELS
    from ..runners.video import VIDEO_MODELS

    if args.model not in CSI_MODELS and args.model not in VIDEO_MODELS:
        raise SystemExit(f"unknown model {args.model}; choices: "
                         f"{sorted(CSI_MODELS) + sorted(VIDEO_MODELS)}")
    cfg = load_config(None, {"model": args.model, "task": args.task})
    args.batch = resolve_serving_batch(args.model,
                                       args.batch if args.batch > 0 else None)

    if args.model in VIDEO_MODELS:
        # video: (B, T, H, W, 3) channels-last clips, flat per-user labels
        _, flat, _ = _TASK_DIMS[args.task]
        out_dim = flat
        t, h, w = (tuple(int(v) for v in args.clip_shape.split(","))
                   if args.clip_shape else _VIDEO_SHAPES[args.model])
        shape = (args.batch, t, h, w, 3)
        model = VIDEO_MODELS[args.model](out_dim)
    else:
        spec = CSI_MODELS[args.model]
        out_dim = infer_out_dim(args.model, args.task)
        shape = (args.batch, cfg.data.length * 270) \
            if spec.input_layout == "flat" \
            else (args.batch, cfg.data.length, 270)
        model = spec.build(shape[1:], out_dim, cfg)
    example = jax.ShapeDtypeStruct(shape, np.float32)

    variables = model.init({"params": jax.random.PRNGKey(args.seed)},
                           np.zeros((1,) + shape[1:], np.float32),
                           train=False)
    if args.pretrained:
        if args.model in VIDEO_MODELS:
            # raw torchvision .pth or converted .msgpack, strict either way
            from ..runners.video import load_video_pretrained
            params, batch_stats = load_video_pretrained(
                args.pretrained, args.model, out_dim, variables,
                (1,) + shape[1:])
        else:
            from ..core.checkpoint import restore_scenario
            params, batch_stats = restore_scenario(
                variables["params"], variables.get("batch_stats", {}),
                args.pretrained, "full", model_key=args.model)
        variables = {"params": params, **({"batch_stats": batch_stats}
                                          if batch_stats else {})}

    # Input-BatchNorm folds (exact eval-mode algebra, serving-only):
    # measured +63% for MLP, +12.3% for CNN-2D (BASELINE.md).
    folded = False
    if not args.no_fold_bn:
        if args.model == "MLP":
            from ..models.csi.mlp import MLP, fold_input_norm
            variables = fold_input_norm(variables)
            model = MLP(out_features=out_dim, fold_input_norm=True)
            folded = True
        elif args.model == "CNN-2D":
            from ..models.csi.cnn_2d import CNN2D, fold_input_norm
            variables = fold_input_norm(variables)
            model = CNN2D(out_features=out_dim, fold_input_norm=True)
            folded = True

    dtype = resolve_serving_dtype(args.dtype, args.model)
    quant = resolve_quant(args.quant, args.model)
    calib_x = None
    if args.calib:
        rows = np.load(args.calib)
        calib_x = [rows[i:i + args.batch]
                   for i in range(0, len(rows), args.batch)]
    elif quant == "w8a8":
        raise SystemExit(f"--quant {args.quant} resolved to w8a8 for "
                         f"{args.model}: pass --calib with real input "
                         "batches to calibrate the activation scales")
    input_scale = args.input_scale
    if args.input_dtype == "int8" and input_scale is None:
        if calib_x is None:
            raise SystemExit("--input-dtype int8 needs --input-scale or "
                             "--calib to derive the dequant scale")
        input_scale = max(float(np.max(np.abs(np.concatenate(
            [np.asarray(b).ravel() for b in calib_x])))), 1e-12) / 127.0
    blob = export_serving(model, variables, example, serving_dtype=dtype,
                          input_dtype=args.input_dtype,
                          quant=quant, calib_x=calib_x,
                          calib_stat=args.calib_stat,
                          input_scale=input_scale,
                          platforms=args.platforms.split(","))
    save_artifact(args.out, blob, {
        "model": args.model, "task": args.task, "batch": args.batch,
        "input_shape": list(shape), "serving_dtype": dtype,
        "input_dtype": args.input_dtype, "quant": quant,
        "input_scale": input_scale, "folded_bn": folded,
        "platforms": args.platforms.split(","),
        "pretrained": bool(args.pretrained),
    })
    print(f"wrote {args.out}: {args.model}/{args.task} batch={args.batch} "
          f"dtype={dtype} ({len(blob)/1e6:.2f} MB)")


if __name__ == "__main__":
    main()
