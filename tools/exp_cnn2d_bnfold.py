"""TPU probe: fold CNN-2D's scalar input BatchNorm into the stage-0 conv.

norm_0 operates on C=1 (the CSI window as a 1-channel image), so eval-mode
BN is a SCALAR affine x*a + c — yet it materializes an ~830 MB/batch copy
of the input before the space-to-depth conv (same mechanism as the MLP
fold, BASELINE.md). Folding: kernel *= a; bias += c * sum(kernel taps) —
exact because stage 0 is VALID-padded and the s2d grid's zero-pad
positions only meet structurally-zero taps (models/csi/cnn_2d.py).

Run:  nohup python tools/exp_cnn2d_bnfold.py > /tmp/exp_cnn2d.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BS = 256
N_SHORT, N_LONG = 2, 12


def measure(apply_fn, v, x, label):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(vv, xs):
        out = apply_fn(vv, xs)
        scale = (jnp.float32(1.0 + 1.0 / 128)
                 + 1e-6 * jnp.mean(out).astype(jnp.float32))
        return xs * scale.astype(xs.dtype), out

    def run(n):
        xs, out = x, None
        t0 = time.perf_counter()
        for _ in range(n):
            xs, out = step(v, xs)
        np.asarray(out)
        return time.perf_counter() - t0

    xs, out = step(v, x)
    np.asarray(out)
    t_s = min(run(N_SHORT), run(N_SHORT))
    t_l = min(run(N_LONG), run(N_LONG))
    rate = BS * (N_LONG - N_SHORT) / max(t_l - t_s, 1e-9)
    print(f"{label}: {rate:.1f} windows/s", flush=True)
    return rate


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from multi_modal_csi_tpu.models.csi import CNN2D
    from multi_modal_csi_tpu.models.csi.cnn_2d import _Stage0Conv
    from multi_modal_csi_tpu.nn.layers import (BatchNorm, Conv2d, Linear,
                                               leaky_relu)

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x32 = rng.normal(size=(BS, 3000, 270)).astype(np.float32)
    x = jnp.asarray(x32, jnp.bfloat16)

    model = CNN2D(out_features=9)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.asarray(x32[:2]), train=False)
    # non-trivial stats for an honest fold
    v = jax.device_get(v)
    bn0 = v["batch_stats"]["norm_0"]["bn"]
    bn0["mean"] = np.float32(0.13) * np.ones_like(bn0["mean"])
    bn0["var"] = np.float32(0.87) * np.ones_like(bn0["var"])

    def cast16(t):
        return jax.tree_util.tree_map(
            lambda a: jnp.asarray(a).astype(jnp.bfloat16)
            if jnp.asarray(a).dtype == jnp.float32 else jnp.asarray(a), t)

    v16 = cast16(v)
    results = {}
    results["baseline"] = measure(
        lambda vv, xs: model.apply(vv, xs, train=False), v16, x,
        "CNN-2D bf16 (BN live)")

    # folded variant: stage-0 BN becomes identity via kernel/bias rewrite;
    # model graph = CNN2D minus norm_0
    class CNN2DFold0(nn.Module):
        out_features: int

        @nn.compact
        def __call__(self, xx, train: bool = False):
            if xx.ndim == 3:
                xx = xx[..., None]
            stages = [(32, (27, 27), (7, 7)), (64, (15, 15), (3, 3)),
                      (128, (7, 7), (1, 1))]
            for i, (feat, k, s) in enumerate(stages):
                if i > 0:
                    xx = BatchNorm(name=f"norm_{i}")(
                        xx, use_running_average=not train)
                if i == 0:
                    xx = _Stage0Conv(feat, name=f"conv_{i}")(xx)
                else:
                    xx = Conv2d(feat, k, stride=s, name=f"conv_{i}")(xx)
                xx = leaky_relu(xx)
                xx = nn.Dropout(0.2, deterministic=not train)(xx)
            xx = BatchNorm(name="norm_3")(xx, use_running_average=not train)
            xx = jnp.mean(xx, axis=(1, 2))
            return Linear(self.out_features, name="head")(xx)

    gamma = float(v["params"]["norm_0"]["bn"]["scale"][0])
    beta = float(v["params"]["norm_0"]["bn"]["bias"][0])
    mean = float(bn0["mean"][0])
    var = float(bn0["var"][0])
    a = gamma / np.sqrt(var + 1e-5)
    c = beta - mean * a
    pf = {k: vv for k, vv in v["params"].items() if k != "norm_0"}
    k0 = np.asarray(pf["conv_0"]["conv"]["kernel"], np.float64)
    b0 = np.asarray(pf["conv_0"]["conv"]["bias"], np.float64)
    pf = dict(pf)
    pf["conv_0"] = {"conv": {
        "kernel": jnp.asarray((k0 * a).astype(np.float32)),
        "bias": jnp.asarray((b0 + c * k0.sum((0, 1, 2))).astype(np.float32)),
    }}
    bsf = {k: vv for k, vv in v["batch_stats"].items() if k != "norm_0"}
    vf = {"params": pf, "batch_stats": bsf}

    folded = CNN2DFold0(out_features=9)
    ref = np.asarray(model.apply(v, jnp.asarray(x32[:4]), train=False))
    got = np.asarray(folded.apply(vf, jnp.asarray(x32[:4]), train=False))
    print("fold oracle max|diff| f32:", float(np.max(np.abs(got - ref))),
          flush=True)

    results["folded"] = measure(
        lambda vv, xs: folded.apply(vv, xs, train=False), cast16(vf), x,
        "CNN-2D bf16 (BN_0 folded)")
    print("SUMMARY", json.dumps(results), flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
