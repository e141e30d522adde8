"""ST-RF serving decomposition: where do the 8.5 s/batch go?

The serving-fill row for ST-RF (tools/bench_serving_fill.py) measured
~7 w/s — wildly off every other CSI row. That run uploads a FRESH
(64, 3000, 270) f32 host batch (207 MB) per call, so unlike every other
serving row (chained device-resident inputs, BASELINE.md methodology) it
times the dev-tunnel H2D, not the framework. This tool separates the
pipeline stages the way the rest of the table is measured:

  1. device spectrogram features, chained-marginal (input derived from the
     previous features so nothing is relay-cacheable) — the framework's
     on-chip cost, reference semantics strf.py:40-67;
  2. host RandomForest predict on the fetched features (sklearn — identical
     in the reference, not a TPU target);
  3. raw H2D bandwidth of one input batch, to quantify the tunnel artifact.

Serving rate on a production host = 1 / (1/feat + 1/predict) with H2D at
PCIe rates folded into (1); here we report each stage.

Run: nohup python tools/exp_strf_decomp.py > /tmp/strf_decomp.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_csi_tpu.kernels.spectrogram import strf_features

BATCH = 64


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(39)
    xs_np = rng.normal(size=(BATCH, 3000, 270)).astype(np.float32)

    # --- stage 3: raw H2D of one batch (tunnel bandwidth context) --------
    xd = jnp.asarray(xs_np)
    xd.block_until_ready()
    t0 = time.perf_counter()
    n_h2d = 3
    for i in range(n_h2d):
        jnp.asarray(xs_np + np.float32(i)).block_until_ready()
    dt = (time.perf_counter() - t0) / n_h2d
    mb = xs_np.nbytes / 1e6
    print(f"H2D: {mb:.0f} MB in {dt:.2f} s = {mb/dt:.0f} MB/s "
          f"({BATCH/dt:.1f} windows/s if H2D-serial)", flush=True)

    # --- stage 1: chained device feature extraction ----------------------
    feat_jit = jax.jit(strf_features)
    f0 = feat_jit(xd)
    f0.block_until_ready()
    d = int(f0.shape[-1])

    @jax.jit
    def chain_step(x, f):
        # fold the previous features back into the input (bf16-exact
        # multiplicative carry is unnecessary in f32; any full-rank
        # dependency kills relay caching)
        bump = jnp.tanh(f.mean()) * jnp.float32(1e-3)
        x = x * (jnp.float32(1.0) + bump)
        return x, strf_features(x)

    x, f = xd, f0

    def run(n):
        nonlocal x, f
        t0 = time.perf_counter()
        for _ in range(n):
            x, f = chain_step(x, f)
        np.asarray(f)          # fetch — forces the whole chain
        return time.perf_counter() - t0

    run(2)                     # warm
    t_short, t_long = run(3), run(43)
    t_feat = (t_long - t_short) / 40
    print(f"device features (chained marginal): {t_feat*1e3:.2f} ms/batch "
          f"= {BATCH/t_feat:.0f} windows/s, feat dim {d}", flush=True)

    # --- stage 2: host RF predict ----------------------------------------
    from sklearn.ensemble import RandomForestClassifier
    feats = np.asarray(f0)
    y = rng.integers(0, 2, size=(BATCH, 54))
    forest = RandomForestClassifier(n_estimators=10, random_state=39,
                                    bootstrap=False)
    forest.fit(feats, y)
    forest.predict(feats)      # warm
    t0 = time.perf_counter()
    n_pred = 20
    for _ in range(n_pred):
        forest.predict(feats)
    t_pred = (time.perf_counter() - t0) / n_pred
    print(f"host RF predict: {t_pred*1e3:.2f} ms/batch "
          f"= {BATCH/t_pred:.0f} windows/s", flush=True)

    pipe = 1.0 / (1.0 / (BATCH / t_feat) + 1.0 / (BATCH / t_pred))
    print(f"compute pipeline (feat+predict, H2D excluded like every other "
          f"serving row): {pipe:.0f} windows/s", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
