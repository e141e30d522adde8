"""MViT pooling-attention shape-level experiment (r3): XLA composite vs the
tiled low-rank-bias flash kernel (kernels/flash_attention.py::
flash_attention_lowrank_bias) at the real MViT-v2-S block shapes (bs2,
45x224x224 clip -> patchified (23, 56, 56)).

Methodology: the data-dependency chain (q <- q + 0.01*attn(q, ...)) runs
INSIDE one jitted fori_loop, timed at two trip counts — the per-call relay
dispatch cancels in the difference (a first attempt chained across separate
calls and the ~ms dispatch variance swamped the small stages, measuring
negative marginals).

Usage: nohup python tools/exp_mvit_attn.py > /tmp/exp_mvit_attn.log 2>&1 &
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

# (name, B, H, Nq, Nk, D, M, blocks_at_this_shape)
SHAPES = [
    ("stage1", 2, 1, 72129, 1128, 96, 37, 1),
    ("stage2", 2, 2, 18033, 4509, 96, 51, 2),
    ("stage3", 2, 4, 4509, 1128, 96, 37, 11),
    ("stage4", 2, 8, 1128, 1128, 96, 37, 2),
]

N_SHORT, N_LONG = 4, 44


def marginal_ms(fn, args):
    """fn(q, k, v, r, s, n) applies the chain n times inside one jit.

    Every timed call uses a DISTINCT q: the execution relay caches repeated
    identical executions (BASELINE.md) — min-over-identical-repeats measures
    the cache, not the chip (first version of this script did exactly that
    and read ~0 ms marginals).
    """
    q, rest = args[0], args[1:]
    variants = [q * (1.0 + 1e-4 * i) for i in range(1, 5)]

    def run(n, qq):
        # FETCH to host — the relay resolves block_until_ready before remote
        # compute finishes (BASELINE.md). The chained fn returns a SCALAR
        # (sum of the final carry): fetching the full 55 MB stage-1 carry
        # took ~10 s with multi-second variance, burying the marginal
        t0 = time.perf_counter()
        np.asarray(fn(qq, *rest, n))
        return time.perf_counter() - t0

    run(N_SHORT, q), run(N_LONG, q)          # compile both trip counts
    t_s = min(run(N_SHORT, variants[0]), run(N_SHORT, variants[1]))
    t_l = min(run(N_LONG, variants[2]), run(N_LONG, variants[3]))
    return (t_l - t_s) / (N_LONG - N_SHORT) * 1e3


def chained(fn):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(5,))
    def step(q, k, v, r, s, n):
        def body(_, qq):
            return (qq + 0.01 * fn(qq, k, v, r, s)).astype(qq.dtype)
        return jnp.sum(jax.lax.fori_loop(0, n, body, q))

    return step


def main():
    import jax
    import jax.numpy as jnp

    from multi_modal_csi_tpu.kernels.flash_attention import (
        flash_attention_lowrank_bias, flash_attention_lowrank_bias_reference)

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    results = {}
    for name, b, h, nq, nk, d, m, blocks in SHAPES:
        q = jnp.asarray(rng.normal(size=(b, h, nq, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, nk, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, nk, d)).astype(np.float32))
        r = jnp.asarray(
            (rng.normal(size=(b, h, nq, m)) * 0.05).astype(np.float32))
        s = jnp.asarray(rng.normal(size=(m, nk)).astype(np.float32))

        row = {}
        row["xla_ms"] = marginal_ms(
            chained(flash_attention_lowrank_bias_reference), (q, k, v, r, s))
        for tq in (256, 512):
            try:
                pal = chained(functools.partial(
                    flash_attention_lowrank_bias, q_tile=tq))
                row[f"pallas_tq{tq}_ms"] = marginal_ms(pal, (q, k, v, r, s))
                err = float(jnp.abs(
                    flash_attention_lowrank_bias(q, k, v, r, s, q_tile=tq)
                    - flash_attention_lowrank_bias_reference(q, k, v, r, s)
                ).max())
                row[f"pallas_tq{tq}_maxerr"] = err
            except Exception as e:  # noqa: BLE001
                row[f"pallas_tq{tq}_ms"] = f"FAILED: {e!r}"[:200]
        row["blocks"] = blocks
        results[name] = row
        print(name, json.dumps(row), flush=True)

    for variant in ("xla_ms", "pallas_tq256_ms", "pallas_tq512_ms"):
        vals = [(r.get(variant), r["blocks"]) for r in results.values()]
        if all(isinstance(x, float) for x, _ in vals):
            tot = sum(x * n for x, n in vals)
            print(f"total attention ms/fwd ({variant}): {tot:.2f}")
    print("DONE")


if __name__ == "__main__":
    main()
