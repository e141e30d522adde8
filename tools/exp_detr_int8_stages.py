"""Where does DETR's int8 gain go? Staged marginals, bf16 vs w8a8.

tools/exp_int8_probe.py measured the dominant dilated conv at 1.88x int8;
the full model gained only +13.5% (tools/exp_quant_serving.py). This
experiment runs the feature extractor alone (the conv stem — where every
quantized conv lives), then stem+encoder, then the full model, in both
precisions, to attribute the dilution: Amdahl share vs per-layer
activation-quantize overhead.

Run:  nohup python tools/exp_detr_int8_stages.py > /tmp/exp_detr_i8.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BS = 256
N_SHORT, N_LONG = 2, 12


def marginal_ms(step, v, x):
    """Chained marginal with a NON-ABSORBABLE perturbation.

    The usual additive 1e-6 bump is exactly absorbed by bf16 rounding
    (spacing at |x|~1 is 2^-8), leaving every chained step bit-identical —
    observed to produce non-monotone stage times on this relayed backend
    (first run of this experiment: stem+encoder "slower" than the full
    model). The step instead scales its carry by (1 + 1/128 + tiny*mean),
    exactly representable in bf16, so every element of every chained input
    genuinely differs. min-of-2 per trip count.
    """
    import jax

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
    return (t_l - t_s) / (N_LONG - N_SHORT) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from multi_modal_csi_tpu.core.quantize import quantize_for_serving
    from multi_modal_csi_tpu.models.csi.detr import DETRMultiUser

    print("devices:", jax.devices(), flush=True)
    model = DETRMultiUser(token_length=10, num_decoder_layers=6,
                          temp_cross=2.0, num_queries=5, dim_feedforward=512)
    rng = np.random.default_rng(0)
    x32 = rng.normal(size=(BS, 3000, 270)).astype(np.float32)
    x = jnp.asarray(x32, jnp.bfloat16)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.asarray(x32[:2]), train=False)
    v16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v)
    v_q = quantize_for_serving(model, v16, [jnp.asarray(x32[:32])],
                               mode="w8a8", train=False)

    # DETRMultiUser is @nn.compact — submodules are not attributes; truncated
    # wrappers re-declare the same child names so the full model's param
    # subtrees drop in unchanged (the exp_roofline_r3.py pattern).
    import flax.linen as nn
    from multi_modal_csi_tpu.models.csi.detr import (CNNFeatureExtractor,
                                                     TransformerEncoder)

    class StemOnly(nn.Module):
        token_length: int = 10

        @nn.compact
        def __call__(self, xx, train: bool = False):
            return CNNFeatureExtractor(self.token_length,
                                       name="feature_extractor")(xx, train)

    class StemEncoder(nn.Module):
        token_length: int = 10

        @nn.compact
        def __call__(self, xx, train: bool = False):
            t = CNNFeatureExtractor(self.token_length,
                                    name="feature_extractor")(xx, train)
            return TransformerEncoder(name="encoder")(t, train)

    results = {}

    def chain_step(mdl):
        @jax.jit
        def step(vv, xs):
            out = mdl.apply(vv, xs, train=False)
            leaf = jax.tree_util.tree_leaves(out)[0]
            # multiplicative carry: 1 + 1/128 is exact in bf16, so the
            # next input differs in every element (see marginal_ms)
            scale = (jnp.float32(1.0 + 1.0 / 128)
                     + 1e-6 * jnp.mean(leaf).astype(jnp.float32))
            return xs * scale.astype(xs.dtype), out
        return step

    def subvars(variables, keys):
        return {"params": {k: variables["params"][k] for k in keys},
                **({"batch_stats": {k: variables["batch_stats"][k]
                                    for k in keys
                                    if k in variables["batch_stats"]}}
                   if "batch_stats" in variables else {})}

    for label, variables in (("bf16", v16), ("w8a8", v_q)):
        row = {}
        row["stem_ms"] = marginal_ms(
            chain_step(StemOnly()),
            subvars(variables, ["feature_extractor"]), x)
        row["stem_enc_ms"] = marginal_ms(
            chain_step(StemEncoder()),
            subvars(variables, ["feature_extractor", "encoder"]), x)
        row["full_ms"] = marginal_ms(chain_step(model), variables, x)
        results[label] = row
        print(label, json.dumps(row), flush=True)

    print("SUMMARY", json.dumps(results), flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
