"""r3 roofline-or-recover experiment for the two slowest CSI models
(VERDICT r2 next #6): CNN-2D (294x, ~12% MFU) and THAT_ENCODER (302x,
~10% MFU).

Measures, on the real chip with the chained-marginal methodology:
  - THAT_ENCODER bf16 bs256 full model (with the r3 decoder KV hoist),
    plus encoder-only and decoder-only marginals and compiled-program flops;
  - CNN-2D bf16 bs256 full model, per-stage cumulative marginals (stage 0 /
    0-1 / 0-2), and compiled flops, to locate the bottleneck stage.

Usage: nohup python tools/exp_roofline_r3.py > /tmp/exp_roofline.log 2>&1 &
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

V5E_BF16_PEAK = 197e12


def marginal_rate(step, v, x, batch, n_short=2, n_long=12):
    import jax

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
    t_s, t_l = run(n_short), run(n_long)
    return batch * (n_long - n_short) / max(t_l - t_s, 1e-9)


def flops_of(step, v, x):
    try:
        cost = step.lower(v, x).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception as e:  # noqa: BLE001
        return f"cost_analysis failed: {e!r}"


def bf16_init(model, x, init_x=None, **apply_kw):
    import jax
    import jax.numpy as jnp
    v = model.init({"params": jax.random.PRNGKey(0)},
                   (init_x if init_x is not None else x[:2]).astype(jnp.float32),
                   **apply_kw)
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v)


def chain(out, x):
    import jax.numpy as jnp
    return x + jnp.asarray(1e-6, x.dtype) * jnp.mean(
        out if not isinstance(out, tuple) else out[0]).astype(x.dtype)


def main():
    import jax
    import jax.numpy as jnp

    from multi_modal_csi_tpu.models.csi.cnn_2d import CNN2D
    from multi_modal_csi_tpu.models.csi.that_encoder import (
        THATEncoderDecoder, THATEncoderDETR, THATEncoderMemory)

    batch = 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 3000, 270)), jnp.bfloat16)
    results = {}

    # ---------------- THAT_ENCODER ----------------
    model = THATEncoderDETR(temp_cross=1.0, num_queries=5,
                            num_decoder_layers=6)
    v = bf16_init(model, x, train=False)

    @jax.jit
    def full_step(v, xs):
        out = model.apply(v, xs, train=False)
        return chain(out, xs), out

    results["that_encoder_full_wps"] = marginal_rate(full_step, v, x, batch)
    results["that_encoder_flops_per_window"] = flops_of(full_step, v, x)

    enc = THATEncoderMemory()
    v_enc = {"params": v["params"]["encoder"],
             "batch_stats": v["batch_stats"]["encoder"]}

    @jax.jit
    def enc_step(v, xs):
        out = enc.apply(v, xs, train=False)
        return chain(out, xs), out

    results["that_encoder_encoder_only_wps"] = marginal_rate(
        enc_step, v_enc, x, batch)

    dec = THATEncoderDecoder(d_model=270, nhead=6, num_layers=6,
                             num_queries=5, dim_feedforward=2048,
                             temperature=1.0)
    mem = jnp.asarray(rng.normal(size=(batch, 420, 270)), jnp.bfloat16)
    v_dec = {"params": v["params"]["decoder"]}

    @jax.jit
    def dec_step(v, m):
        out = dec.apply(v, m, train=False)
        return m + jnp.asarray(1e-6, m.dtype) * jnp.mean(out).astype(m.dtype), out

    results["that_encoder_decoder_only_wps"] = marginal_rate(
        dec_step, v_dec, mem, batch)
    print(json.dumps({"that_encoder": results}), flush=True)

    # ---------------- CNN-2D ----------------
    model2 = CNN2D(out_features=54)
    v2 = bf16_init(model2, x, train=False)

    @jax.jit
    def cnn_full(v, xs):
        out = model2.apply(v, xs, train=False)
        return chain(out, xs), out

    results["cnn2d_full_wps"] = marginal_rate(cnn_full, v2, x, batch)
    results["cnn2d_flops_per_window"] = flops_of(cnn_full, v2, x)

    # per-stage cumulative truncations (method="truncate" reuses the same
    # params; output is the stage activation mean so shapes stay chainable)
    import flax.linen as nn

    from multi_modal_csi_tpu.nn.layers import BatchNorm, Conv2d, leaky_relu

    class CNN2DTrunc(nn.Module):
        upto: int

        @nn.compact
        def __call__(self, x, train: bool = False):
            if x.ndim == 3:
                x = x[..., None]
            stages = [(32, (27, 27), (7, 7)), (64, (15, 15), (3, 3)),
                      (128, (7, 7), (1, 1))]
            for i, (feat, k, s) in enumerate(stages[:self.upto]):
                x = BatchNorm(name=f"norm_{i}")(x, use_running_average=not train)
                x = Conv2d(feat, k, stride=s, name=f"conv_{i}")(x)
                x = leaky_relu(x)
            return jnp.mean(x, axis=(1, 2))

    for upto in (1, 2, 3):
        tm = CNN2DTrunc(upto=upto)
        vt = {"params": {k: val for k, val in v2["params"].items()
                         if any(k.startswith(p) for p in
                                [f"norm_{i}" for i in range(upto)]
                                + [f"conv_{i}" for i in range(upto)])},
              "batch_stats": {k: val for k, val in v2["batch_stats"].items()
                              if k in [f"norm_{i}" for i in range(upto)]}}

        @jax.jit
        def tstep(v, xs, tm=tm):
            out = tm.apply(v, xs, train=False)
            return chain(out, xs), out

        results[f"cnn2d_stages_0_{upto - 1}_wps"] = marginal_rate(
            tstep, vt, x, batch)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
