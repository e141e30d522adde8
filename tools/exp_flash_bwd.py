"""Flash BACKWARD experiment (r3): training-mode attention fwd+grad at the
real MViT-v2-S stage shapes — XLA einsum path vs the tiled flash kernel
with the new Pallas backward (kernels/flash_attention.py::
flash_attention_lowrank_bias_trainable).

Methodology: value_and_grad of sum(attn(q,k,v,r,s) * do) chained through q
(q <- q + 1e-3 * dq) INSIDE one jitted fori_loop at two trip counts — the
in-jit chain methodology (memory: cross-call dispatch variance swamps
shape-level marginals).

Usage: nohup python tools/exp_flash_bwd.py > /tmp/exp_flash_bwd.log 2>&1 &
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

# (name, B, H, Nq, Nk, D, M, blocks_at_this_shape) — tools/exp_mvit_attn.py
SHAPES = [
    ("stage1", 2, 1, 72129, 1128, 96, 37, 1),
    ("stage2", 2, 2, 18033, 4509, 96, 51, 2),
    ("stage3", 2, 4, 4509, 1128, 96, 37, 11),
    ("stage4", 2, 8, 1128, 1128, 96, 37, 2),
]

N_SHORT, N_LONG = 3, 43


def marginal_ms(make_loop, make_args, n_short=N_SHORT, n_long=N_LONG):
    """Every call (warmup AND timed) gets DISTINCT inputs — the execution
    relay caches repeated identical executions (BASELINE.md)."""
    f_short = make_loop(n_short)
    f_long = make_loop(n_long)
    outs = [np.asarray(f(*make_args(i)))
            for i, f in enumerate((f_short, f_long))]

    def timed(f, a):
        t0 = time.perf_counter()
        np.asarray(f(*a))
        return time.perf_counter() - t0

    t_s = timed(f_short, make_args(2))
    t_l = timed(f_long, make_args(3))
    t_s2 = timed(f_short, make_args(4))
    t_l2 = timed(f_long, make_args(5))
    ms = (min(t_l, t_l2) - min(t_s, t_s2)) / (n_long - n_short) * 1e3
    return ms, outs


def main():
    import jax
    import jax.numpy as jnp

    from multi_modal_csi_tpu.kernels.flash_attention import (
        flash_attention_lowrank_bias_reference,
        flash_attention_lowrank_bias_trainable)

    print("devices:", jax.devices(), flush=True)
    total = {"xla": 0.0, "flash": 0.0}
    for name, b, h, nq, nk, d, m, blocks in SHAPES:
        rng = np.random.default_rng(0)
        k = jnp.asarray(rng.normal(size=(b, h, nk, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, h, nk, d)), jnp.float32)
        r = jnp.asarray(rng.normal(size=(b, h, nq, m)) * 0.1, jnp.float32)
        s = jnp.asarray(rng.normal(size=(m, nk)) * 0.1, jnp.float32)
        do = jnp.asarray(rng.normal(size=(b, h, nq, d)), jnp.float32)

        def make_args(i, k=k, v=v, r=r, s=s, b=b, h=h, nq=nq, d=d):
            qq = jnp.asarray(
                np.random.default_rng(100 + i).normal(size=(b, h, nq, d)),
                jnp.float32)
            return (qq, k, v, r, s)

        def make(fn, n):
            def loss(qq, kk, vv, rr, ss):
                return jnp.sum(fn(qq, kk, vv, rr, ss) * do)

            g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))

            @jax.jit
            def run(qq, kk, vv, rr, ss):
                def body(_, carry):
                    qq, kk, vv, rr, ss = carry
                    _, (dq, dk, dv, dr, ds) = g(qq, kk, vv, rr, ss)
                    eps = jnp.float32(1e-3)
                    return (qq + eps * dq, kk + eps * dk, vv + eps * dv,
                            rr + eps * dr, ss + eps * ds)
                out = jax.lax.fori_loop(0, n, body, (qq, kk, vv, rr, ss))
                # scalar fetch: qq_final transitively depends on every
                # carry; tiny fetch keeps relay variance out of the margin
                return jnp.sum(out[0])
            return run

        res = {}
        outs = {}
        for tag, fn in (("xla", flash_attention_lowrank_bias_reference),
                        ("flash", flash_attention_lowrank_bias_trainable)):
            try:
                ms, o = marginal_ms(functools.partial(make, fn), make_args)
                res[tag] = ms
                outs[tag] = o[1]
                total[tag] += ms * blocks
            except Exception as e:  # noqa: BLE001
                print(f"{name} {tag} FAILED: {e!r}"[:300], flush=True)
                res[tag] = None
        drift = (float(np.max(np.abs(outs["xla"] - outs["flash"])))
                 if len(outs) == 2 else None)
        print(json.dumps({
            "shape": name, "blocks": blocks,
            "xla_ms": round(res["xla"], 2) if res.get("xla") else None,
            "flash_ms": round(res["flash"], 2) if res.get("flash") else None,
            "chain_drift": drift}), flush=True)
    print(json.dumps({"total_weighted_ms": {
        k2: round(v2, 1) for k2, v2 in total.items()}}), flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
