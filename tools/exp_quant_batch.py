"""TPU probe: do the serving batch knees move under int8?

SERVING_BATCH_DEFAULTS (bs256 CSI-wide) was measured on the bf16 path;
int8 halves weight readback and shrinks DETR's temporaries 25%, and the
folded MLP removed its dominant HBM pass — both may amortize further at
larger batches. Measures windows/s at bs 256 / 512 / 1024 for:

  MLP  : fold + w8 + int8 input (the 161k w/s configuration)
  DETR : w8a8, bf16 input (the QUANT_DEFAULTS configuration)

Run:  nohup python tools/exp_quant_batch.py > /tmp/exp_qbatch.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N_SHORT, N_LONG = 2, 12


def measure(apply_fn, v, x, bs, label):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(vv, xs):
        out = apply_fn(vv, xs)
        bump = 1e-6 * jnp.mean(
            jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32)
        if xs.dtype == jnp.int8:
            nxt = xs + jnp.round(bump).astype(jnp.int8)
        else:
            scale = jnp.float32(1.0 + 1.0 / 128) + bump
            nxt = xs * scale.astype(xs.dtype)
        return nxt, out

    def run(n):
        xs, out = x, None
        t0 = time.perf_counter()
        for _ in range(n):
            xs, out = step(v, xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return time.perf_counter() - t0

    xs, out = step(v, x)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t_s = min(run(N_SHORT), run(N_SHORT))
    t_l = min(run(N_LONG), run(N_LONG))
    rate = bs * (N_LONG - N_SHORT) / max(t_l - t_s, 1e-9)
    print(f"{label}: {rate:.1f} windows/s", flush=True)
    return rate


def main():
    import jax
    import jax.numpy as jnp
    from multi_modal_csi_tpu.core.quantize import quantize_for_serving
    from multi_modal_csi_tpu.models import csi as M
    from multi_modal_csi_tpu.models.csi.mlp import MLP, fold_input_norm

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    results = {"MLP": {}, "DETR": {}}

    # ---- MLP: fold + w8 + int8 input --------------------------------
    dim = 3000 * 270
    mlp = MLP(out_features=54)
    v = mlp.init({"params": jax.random.PRNGKey(0)},
                 jnp.zeros((2, dim), jnp.float32), train=False)
    vf = fold_input_norm(v)
    mf = MLP(out_features=54, fold_input_norm=True)
    vf16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        vf)
    calib = jnp.asarray(rng.normal(size=(32, dim)).astype(np.float32))
    v_w8 = quantize_for_serving(mf, vf16, [calib], mode="w8", train=False)
    in_scale = 4.8 / 127.0

    def mlp_apply(vv, xs):
        xd = xs.astype(jnp.bfloat16) * jnp.bfloat16(in_scale)
        return mf.apply(vv, xd, train=False)

    for bs in (256, 512, 1024):
        x8 = jnp.asarray(np.clip(np.round(
            rng.normal(size=(bs, dim)) / in_scale), -127, 127)
            .astype(np.int8))
        try:
            results["MLP"][bs] = measure(mlp_apply, v_w8, x8, bs,
                                         f"MLP fold+w8+int8in bs{bs}")
        except Exception as e:  # noqa: BLE001
            results["MLP"][bs] = f"FAILED: {e!r}"[:150]
            print(results["MLP"][bs], flush=True)

    # ---- DETR: w8a8 --------------------------------------------------
    detr = M.DETRMultiUser(token_length=10, num_decoder_layers=6,
                           temp_cross=2.0, num_queries=5,
                           dim_feedforward=512)
    x32 = rng.normal(size=(32, 3000, 270)).astype(np.float32)
    v = detr.init({"params": jax.random.PRNGKey(0)},
                  jnp.asarray(x32[:2]), train=False)
    v16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v)
    v_q = quantize_for_serving(detr, v16, [jnp.asarray(x32)],
                               mode="w8a8", train=False)
    for bs in (256, 512, 1024):
        x = jnp.asarray(rng.normal(size=(bs, 3000, 270)), jnp.bfloat16)
        try:
            results["DETR"][bs] = measure(
                lambda vv, xs: detr.apply(vv, xs, train=False),
                v_q, x, bs, f"DETR w8a8 bs{bs}")
        except Exception as e:  # noqa: BLE001
            results["DETR"][bs] = f"FAILED: {e!r}"[:150]
            print(results["DETR"][bs], flush=True)

    print("SUMMARY", json.dumps({k: {str(b): r for b, r in d.items()}
                                 for k, d in results.items()}), flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
