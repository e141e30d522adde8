"""Diagnostic: does the relay result-cache identical-input chained steps?

The chained-marginal methodology assumed the carry made every step's input
distinct; in fact the additive bf16 carry is bit-absorbed and the int8
carry rounds to zero (CLAUDE.md gotcha), so chained inputs have been
bit-identical after step 1. The relay is DOCUMENTED to cache repeated
identical executions (bench.py header) — if that cache hits device-chained
executions, identical-input rates are inflated.

Same process, same model (folded MLP w8, int8 inputs — the config whose
run-to-run spread reached 1.9x), interleaved A/B:
  ident   : carry adds round(1e-6 * mean) == 0 (the old, identical-input chain)
  distinct: carry bumps a 256-column slice by +1 (content provably changes;
            the update costs ~0.3 MB of writes — negligible)

Three reps each, interleaved, to separate caching (systematic A>B) from
tunnel windows (correlated drift).

Run:  nohup python tools/exp_carry_diag.py > /tmp/exp_carry.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BS = 256
N_SHORT, N_LONG = 2, 12


def main():
    import jax
    import jax.numpy as jnp
    from multi_modal_csi_tpu.core.quantize import quantize_for_serving
    from multi_modal_csi_tpu.models.csi.mlp import MLP, fold_input_norm

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    dim = 3000 * 270
    mlp = MLP(out_features=54)
    v = mlp.init({"params": jax.random.PRNGKey(0)},
                 jnp.zeros((2, dim), jnp.float32), train=False)
    mf = MLP(out_features=54, fold_input_norm=True)
    vf16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        fold_input_norm(v))
    calib = jnp.asarray(rng.normal(size=(32, dim)).astype(np.float32))
    v_w8 = quantize_for_serving(mf, vf16, [calib], mode="w8", train=False)
    in_scale = 4.8 / 127.0
    x8 = jnp.asarray(np.clip(np.round(
        rng.normal(size=(BS, dim)) / in_scale), -127, 127).astype(np.int8))

    def apply_fn(vv, xs):
        return mf.apply(vv, xs.astype(jnp.bfloat16) * jnp.bfloat16(in_scale),
                        train=False)

    def make_step(distinct):
        @jax.jit
        def step(vv, xs):
            out = apply_fn(vv, xs)
            bump = 1e-6 * jnp.mean(out).astype(jnp.float32)
            if distinct:
                patch = (xs[:, :256] + 1
                         + jnp.round(bump).astype(jnp.int8))
                nxt = jax.lax.dynamic_update_slice(xs, patch, (0, 0))
            else:
                nxt = xs + jnp.round(bump).astype(jnp.int8)   # == xs
            return nxt, out
        return step

    steps = {"ident": make_step(False), "distinct": make_step(True)}

    def rate(step):
        def run(n):
            xs, out = x8, None
            t0 = time.perf_counter()
            for _ in range(n):
                xs, out = step(v_w8, xs)
            np.asarray(out)
            return time.perf_counter() - t0
        xs, out = step(v_w8, x8)
        np.asarray(out)
        t_s = min(run(N_SHORT), run(N_SHORT))
        t_l = min(run(N_LONG), run(N_LONG))
        return BS * (N_LONG - N_SHORT) / max(t_l - t_s, 1e-9)

    results = {"ident": [], "distinct": []}
    for rep in range(3):
        for name in ("ident", "distinct"):
            r = rate(steps[name])
            results[name].append(round(r, 1))
            print(f"rep{rep} {name}: {r:.1f} windows/s", flush=True)
    print("SUMMARY", json.dumps(results), flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
