"""Serving LATENCY floors: bs1 chained-marginal device time per request.

Every serving row in BASELINE.md is a THROUGHPUT number at the per-model
batch knee. Real deployments also care about the opposite corner: the
device-compute latency of a single request (batch 1). Through this dev
tunnel the *dispatch* latency is an artifact (tens of ms of relay round
trip), so — exactly like the throughput rows — we report the marginal
per-step time of a data-dependency-chained loop: the device-compute
latency floor a production host would add per request, with dispatch
excluded. Reference serving path: inference_only.py:47-90 (reload + one
forward); the reference has no latency story at all.

Methodology hardening (BASELINE.md "MLP measurement post-mortem"): bs1 CSI
steps are sub-millisecond, so windows are sized adaptively — a pilot run
picks N_LONG such that the long window is >=150 ms (min 60 steps), inputs
are provably distinct (bf16-exact (1+1/128) multiplicative bump on a
leading slice, folded with the previous output so nothing is
relay-cacheable), and the median of 3 (short, long) pairs is reported.

Models: the serving headliners at their measured-default dtypes
(SERVING_DTYPE_DEFAULTS — bf16 except Swin f32).

Run:  nohup python tools/bench_latency.py > /tmp/bench_latency.log 2>&1 &
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def chained_latency_ms(apply_fn, variables, x, label):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(vv, xs):
        out = apply_fn(vv, xs)
        bump = (1e-6 * jnp.mean(out).astype(jnp.float32)).astype(xs.dtype)
        k = min(256, x.shape[-1])
        patch = xs[..., :k] * jnp.asarray(1 + 1 / 128, xs.dtype) + bump
        zeros = (0,) * (xs.ndim - 1)
        return jax.lax.dynamic_update_slice(xs, patch, zeros + (0,)), out

    def run(n):
        xs, out = x, None
        t0 = time.perf_counter()
        for _ in range(n):
            xs, out = step(variables, xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return time.perf_counter() - t0

    xs, out = step(variables, x)          # compile
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t_pilot = run(20) / 20
    n_long = max(60, int(math.ceil(0.15 / max(t_pilot, 1e-6))))
    n_long = min(n_long, 2000)
    n_short = max(10, n_long // 6)
    samples = []
    for _ in range(3):
        t_s, t_l = run(n_short), run(n_long)
        samples.append((t_l - t_s) / (n_long - n_short) * 1e3)
    med = statistics.median(samples)
    print(f"{label}: {med:.3f} ms/request (bs1 device floor) "
          f"n_long={n_long} samples={[round(s, 3) for s in samples]}",
          flush=True)
    return med


def main():
    import jax
    import jax.numpy as jnp

    from multi_modal_csi_tpu.models import csi as csi_models
    from multi_modal_csi_tpu.models import video as video_models
    from multi_modal_csi_tpu.models.csi.detr import DETRMultiUser

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    def cast16(t):
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, t)

    results = {}

    # --- CSI models, bf16 (serving default), bs1 ------------------------
    x_seq = jnp.asarray(rng.normal(size=(1, 3000, 270)), jnp.bfloat16)
    for name, model in (
            ("DETR", DETRMultiUser(token_length=10, num_decoder_layers=6,
                                   temp_cross=2.0, num_queries=5,
                                   dim_feedforward=512)),
            ("THAT", csi_models.THAT(out_features=9)),
            ("THAT_ENCODER", csi_models.THATEncoderDETR(
                temp_cross=2.0, num_queries=5, num_decoder_layers=6)),
            ("CNN-1D", csi_models.CNN1D(out_features=9)),
            ("LSTM", csi_models.LSTMModel(out_features=9))):
        v = cast16(model.init({"params": jax.random.PRNGKey(0)},
                              np.zeros((2, 3000, 270), np.float32),
                              train=False))
        results[name] = chained_latency_ms(
            lambda vv, xs, m=model: m.apply(vv, xs, train=False), v, x_seq,
            name)

    # MLP takes the flattened window (runner reshape, mlp.py:101-102)
    mlp = csi_models.MLP(out_features=9)
    x_flat = jnp.asarray(rng.normal(size=(1, 3000 * 270)), jnp.bfloat16)
    v = cast16(mlp.init({"params": jax.random.PRNGKey(0)},
                        np.zeros((2, 3000 * 270), np.float32), train=False))
    results["MLP"] = chained_latency_ms(
        lambda vv, xs: mlp.apply(vv, xs, train=False), v, x_flat, "MLP")

    # --- Video backbones, bs1, serving-default dtypes --------------------
    for name, builder, shape, dt in (
            ("ResNet3D", lambda: video_models.ResNet3D18(out_features=9),
             (45, 112, 112, 3), jnp.bfloat16),
            ("S3D", lambda: video_models.S3D(out_features=9),
             (45, 224, 224, 3), jnp.bfloat16),
            ("Swin3D-T", lambda: video_models.swin3d_t(out_features=9),
             (45, 224, 224, 3), jnp.float32),
            ("MViT-v1", lambda: video_models.mvit_v1_b(out_features=9),
             (45, 224, 224, 3), jnp.bfloat16)):
        model = builder()
        v = model.init({"params": jax.random.PRNGKey(0)},
                       np.zeros((1,) + shape, np.float32), train=False)
        if dt == jnp.bfloat16:
            v = cast16(v)
        xv = jnp.asarray(rng.normal(size=(1,) + shape), dt)
        results[name] = chained_latency_ms(
            lambda vv, xs, m=model: m.apply(vv, xs, train=False), v, xv,
            name)

    print("SUMMARY",
          json.dumps({k: round(val, 3) for k, val in results.items()}),
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
