"""Quantization logits drift per QUANT_DEFAULTS model (CPU, random weights).

For each model with an int8 default, compares the quantized forward to the
f32 forward on a fixed random batch and reports
max|dlogits| / std(logits) — the relative-drift statistic the test suite
bounds. Random weights are the only option here (no trained checkpoints in
this environment); real deployments should validate task metrics on their
own split (docs/SERVING.md accuracy note).

Run:  python tools/quant_drift.py        (CPU; a few minutes)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def drift(model, x, mode, stat="amax", variables=None, extra_apply=None):
    from multi_modal_csi_tpu.core.quantize import quantize_for_serving
    v = variables if variables is not None else model.init(
        {"params": jax.random.PRNGKey(0)}, x[:1], train=False)
    apply_fn = extra_apply or (lambda vv, xx: model.apply(vv, xx,
                                                          train=False))
    ref = np.asarray(apply_fn(v, x))
    qv = quantize_for_serving(model, v, [x], mode=mode, stat=stat,
                              train=False)
    got = np.asarray(apply_fn(qv, x))
    return float(np.max(np.abs(got - ref)) / (np.std(ref) + 1e-9))


def main():
    from multi_modal_csi_tpu.models import csi as M
    from multi_modal_csi_tpu.models.csi.mlp import MLP, fold_input_norm
    from multi_modal_csi_tpu.models.video.resnet3d import ResNet3D18
    from multi_modal_csi_tpu.models.video.s3d import S3D

    rng = np.random.default_rng(0)
    out = {}

    x = jnp.asarray(rng.normal(size=(4, 3000, 270)).astype(np.float32))
    out["DETR w8a8"] = drift(
        M.DETRMultiUser(token_length=10, num_decoder_layers=6,
                        temp_cross=2.0, num_queries=5,
                        dim_feedforward=512), x, "w8a8")
    print("DETR", out["DETR w8a8"], flush=True)
    out["THAT_ENCODER w8a8"] = drift(
        M.THATEncoderDETR(temp_cross=2.0, num_queries=5,
                          num_decoder_layers=6), x, "w8a8")
    print("THAT_ENCODER", out["THAT_ENCODER w8a8"], flush=True)

    xm = jnp.asarray(rng.normal(size=(8, 3000 * 270)).astype(np.float32))
    mlp = MLP(out_features=54)
    vm = mlp.init({"params": jax.random.PRNGKey(0)}, xm[:1], train=False)
    vf = fold_input_norm(vm)
    out["MLP fold+w8"] = drift(MLP(out_features=54, fold_input_norm=True),
                               xm, "w8", variables=vf)
    print("MLP", out["MLP fold+w8"], flush=True)

    xv = jnp.asarray(rng.normal(size=(2, 16, 64, 64, 3)).astype(np.float32))
    out["ResNet3D w8a8"] = drift(ResNet3D18(out_features=9), xv, "w8a8")
    print("ResNet3D", out["ResNet3D w8a8"], flush=True)
    out["S3D w8a8"] = drift(S3D(out_features=9), xv, "w8a8")
    print("S3D", out["S3D w8a8"], flush=True)

    print("SUMMARY", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
