"""TPU bench: bf16 serving-path inference for the remaining model families.

BASELINE.md's inference tables record bf16 only for DETR and MLP; this
sweep fills in the other CSI models and the four video backbones (bf16
params+activations, f32 MXU accumulation — the serving configuration).
Chained-marginal methodology identical to bench.py.

Run:  nohup python tools/bench_bf16_sweep.py > /tmp/bench_bf16.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chained_rate(model, shape, bs, label, n_short=2, n_long=12):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(bs,) + shape), jnp.bfloat16)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   x[:2].astype(jnp.float32), train=False)
    v = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v)

    @jax.jit
    def step(v, x):
        out = model.apply(v, x, train=False)
        nxt = x + jnp.asarray(1e-6, x.dtype) * jnp.mean(out).astype(x.dtype)
        return nxt, out

    def run(n):
        xs = x
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            xs, out = step(v, xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return time.perf_counter() - t0

    xs, out = step(v, x)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t_short, t_long = run(n_short), run(n_long)
    rate = bs * (n_long - n_short) / max(t_long - t_short, 1e-9)
    print(f"{label}: {rate:.1f} /s (bf16 bs{bs})", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    from multi_modal_csi_tpu.models import csi as csi_models
    csi_shape = (3000, 270)
    for name, model, bs in (
            ("THAT", csi_models.THAT(out_features=9), 256),
            ("CNN-1D", csi_models.CNN1D(out_features=9), 256),
            ("CNN-2D", csi_models.CNN2D(out_features=9), 256),
            ("LSTM", csi_models.LSTMModel(out_features=9), 256),
            ("ABLSTM", csi_models.ABLSTM(out_features=9), 256),
            ("CLSTM", csi_models.CLSTM(out_features=9), 256),
            ("THAT_ENCODER", csi_models.THATEncoderDETR(
                temp_cross=2.0, num_queries=5, num_decoder_layers=6), 256)):
        chained_rate(model, csi_shape, bs, f"CSI {name}")

    from multi_modal_csi_tpu.models.video.resnet3d import ResNet3D18
    from multi_modal_csi_tpu.models.video.s3d import S3D
    from multi_modal_csi_tpu.models.video.swin3d import Swin3D
    from multi_modal_csi_tpu.models.video.mvit import MViT
    chained_rate(ResNet3D18(out_features=9), (45, 112, 112, 3), 8,
                 "video ResNet3D-18")
    chained_rate(S3D(out_features=9), (45, 224, 224, 3), 4, "video S3D")
    chained_rate(Swin3D(9, depths=(2, 2, 6, 2)), (45, 224, 224, 3), 2,
                 "video Swin3D-T")
    chained_rate(MViT(out_features=9, variant="v1"),
                 (45, 224, 224, 3), 2, "video MViT-v1")


if __name__ == "__main__":
    main()
