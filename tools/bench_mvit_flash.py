"""Full-model MViT serving throughput with the tiled low-rank-bias flash
attention kernel (r3): MViT-v1 and MViT-v2, f32 and bf16, bs2 full-res.

Model-level chained methodology (per-step cost ~50-120 ms >> relay dispatch,
so the cross-call chain from bench.py applies; final output fetched).

Run:  nohup python tools/bench_mvit_flash.py > /tmp/bench_mvit_flash.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chained_rate(model, shape, bs, dtype, label, n_short=2, n_long=12):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(bs,) + shape), dtype)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   x[:2].astype(jnp.float32), train=False)
    if dtype == jnp.bfloat16:
        v = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, v)

    @jax.jit
    def step(v, x):
        out = model.apply(v, x, train=False)
        nxt = x + jnp.asarray(1e-6, x.dtype) * jnp.mean(out).astype(x.dtype)
        return nxt, out

    def run(n):
        xs = x
        out = None
        t0 = time.perf_counter()
        for _ in range(n):
            xs, out = step(v, xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return time.perf_counter() - t0

    xs, out = step(v, x)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t_short, t_long = run(n_short), run(n_long)
    rate = bs * (n_long - n_short) / max(t_long - t_short, 1e-9)
    print(f"{label}: {rate:.1f} clips/s "
          f"({(t_long - t_short) / (n_long - n_short) * 1e3:.1f} ms/step)",
          flush=True)
    return rate


def main():
    from multi_modal_csi_tpu.models.video.mvit import MViT

    print("devices:", jax.devices(), flush=True)
    shape = (45, 224, 224, 3)
    for variant in ("v2", "v1"):
        for dtype, dname in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            chained_rate(MViT(out_features=9, variant=variant), shape, 2,
                         dtype, f"MViT-{variant} {dname} bs2")
    print("DONE")


if __name__ == "__main__":
    main()
