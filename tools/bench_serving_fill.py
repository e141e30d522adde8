"""TPU bench: serving rows for the CSI models missing from BASELINE.md.

THAT_MULTI_HEAD / THAT_COUNT / THAT_COUNT_CONSTRAINED (THAT-trunk heads),
SSL inference (CNN-1D backbone + online head), DUAL_BAND (two CNN towers),
each bf16 bs256 like the main inference table, plus the host-side ST-RF
path (device spectrogram + sklearn forest predict).

Methodology: hardened chained-marginal (BASELINE.md "MLP measurement
post-mortem") — every chained input provably differs (a bf16-exact
multiplicative (1 + 1/128) bump on a 256-column slice), marginal taken
between 10- and 60-step chains, median of 3 samples.

Run:  nohup python tools/bench_serving_fill.py > /tmp/bench_fill.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BS = 256
N_SHORT, N_LONG = 10, 60


def chained_rate(apply_fn, variables, x, label):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(vv, xs):
        out = apply_fn(vv, xs)
        bump = (1e-6 * jnp.mean(out).astype(jnp.float32)).astype(xs.dtype)
        patch = xs[..., :256] * jnp.asarray(1 + 1 / 128, xs.dtype) + bump
        zeros = (0,) * (xs.ndim - 1)
        return jax.lax.dynamic_update_slice(xs, patch, zeros + (0,)), out

    def run(n):
        xs, out = x, None
        t0 = time.perf_counter()
        for _ in range(n):
            xs, out = step(variables, xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return time.perf_counter() - t0

    xs, out = step(variables, x)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    samples = []
    for _ in range(3):
        t_s, t_l = run(N_SHORT), run(N_LONG)
        samples.append(BS * (N_LONG - N_SHORT) / max(t_l - t_s, 1e-9))
    med = statistics.median(samples)
    print(f"{label}: {med:.1f} windows/s (bf16 bs{BS}) "
          f"samples={[round(s, 1) for s in samples]}", flush=True)
    return med


def main():
    import jax
    import jax.numpy as jnp
    from multi_modal_csi_tpu.models import csi as csi_models

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    def cast16(t):
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, t)

    x = jnp.asarray(rng.normal(size=(BS, 3000, 270)), jnp.bfloat16)
    results = {}

    for name, model in (
            ("THAT_MULTI_HEAD", csi_models.THATMultiHead(out_features=10)),
            ("THAT_COUNT", csi_models.THATCount(out_features=9)),
            ("THAT_COUNT_CONSTRAINED", csi_models.THATCountConstrained())):
        v = cast16(model.init({"params": jax.random.PRNGKey(0)},
                              x[:2].astype(jnp.float32), train=False))
        results[name] = chained_rate(
            lambda vv, xs, m=model: m.apply(vv, xs, train=False), v, x, name)

    # SSL inference: backbone + online head (ssl.py:59-63)
    ssl = csi_models.SSLModel(out_features=9)
    v = cast16(ssl.init({"params": jax.random.PRNGKey(0)},
                        x[:2].astype(jnp.float32),
                        x[:2].astype(jnp.float32), train=False))
    results["SSL"] = chained_rate(
        lambda vv, xs: ssl.apply(vv, xs, inference=True), v, x, "SSL")

    # DUAL_BAND: (B, 2, T, C) twin-band input
    db = csi_models.DualBandCNN(out_features=9)
    xdb = jnp.asarray(rng.normal(size=(BS, 2, 3000, 270)), jnp.bfloat16)
    v = cast16(db.init({"params": jax.random.PRNGKey(0)},
                       xdb[:2].astype(jnp.float32), train=False))
    results["DUAL_BAND"] = chained_rate(
        lambda vv, xs: db.apply(vv, xs, train=False), v, xdb, "DUAL_BAND")

    # ST-RF: device spectrogram features + host forest predict. The
    # forest is host-bound either way; this measures OUR serving path
    # (kernels/spectrogram.py on chip, predict on host).
    from sklearn.ensemble import RandomForestClassifier
    from multi_modal_csi_tpu.kernels.spectrogram import strf_features
    strf_jit = jax.jit(strf_features)
    bs_strf = 64
    xs_np = rng.normal(size=(bs_strf, 3000, 270)).astype(np.float32)
    feats = np.asarray(strf_jit(jnp.asarray(xs_np)))
    y = rng.integers(0, 2, size=(bs_strf, 54))
    forest = RandomForestClassifier(n_estimators=10, random_state=39,
                                    bootstrap=False)
    forest.fit(feats, y)

    def strf_once(xb):
        f = np.asarray(strf_jit(jnp.asarray(xb)))
        return forest.predict(f)

    strf_once(xs_np)
    t0 = time.perf_counter()
    n = 10
    for i in range(n):
        # fresh input each call (host-perturbed) — nothing cacheable
        strf_once(xs_np + np.float32(i))
    results["ST-RF"] = bs_strf * n / (time.perf_counter() - t0)
    print(f"ST-RF: {results['ST-RF']:.1f} windows/s "
          "(JIT device spectrogram + H2D + host RF predict)", flush=True)

    print("SUMMARY", json.dumps({k: round(v, 1) for k, v in results.items()}),
          flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
