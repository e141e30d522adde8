"""Shared chained-marginal measurement core (VERDICT r3 next #9).

One implementation of the methodology BASELINE.md's post-mortems converged
on, so the next fix is a one-file change instead of a hunt across tools/:

  1. every chained input is PROVABLY DISTINCT — a leading slice is scaled
     by the bf16-exact 1 + 1/128 (adds >= 1 ulp to every normal bf16 value,
     so the product never rounds back to the input; exp_carry_diag.py showed
     the old additive `x + 1e-6*mean(out)` is bit-absorbed by bf16 after
     step 1, and the relay can result-cache identical-input chains outright:
     t(60 steps) <= t(10 steps) observed once);
  2. the carry still flows through the model OUTPUT (a rounded 1e-6*mean(out)
     term — numerically zero, but a real data dependency, so steps cannot be
     elided, reordered, or batched by the relay);
  3. the rate is the MARGINAL between a short and a long chain with the
     final output fetched to host (cancels dispatch/fetch round-trip);
  4. median of k repetitions (tunnel noise: distinct-carry rates swung
     99k-245k within one process at sub-3 ms steps — exp_mlp_ladder.py).

Window sizing (CLAUDE.md rule): models with >= 10 ms steps are stable at
(2, 12); sub-3 ms steps need (10, 60) so the timing windows are 30-180 ms.

The historical exp_* scripts keep their own inline copies — they are
records of experiments already run, with their outputs checked into
BASELINE.md; rewriting them would orphan those numbers. Active harnesses
(bench.py, new tools) import from here.
"""

from __future__ import annotations

import statistics
import time
from typing import Callable, List, Tuple

import numpy as np

# bf16-exact: 1.0078125 has an 8-bit significand (1.0000001b), and
# v * (1 + 2^-7) moves every normal bf16 v by at least one ulp
DISTINCT_SCALE = 1.0 + 1.0 / 128.0
CARRY_COLS = 256


def distinct_carry(xs, out):
    """Next chained input: provably differs from `xs` in bf16 (or int8) AND
    depends on `out`. Scales (or +1-bumps, for int8) the leading
    min(256, dim1) slice along axis 1; the rounded 1e-6*mean(out) term is
    numerically zero but keeps the output in the dependency chain."""
    import jax
    import jax.numpy as jnp

    bump = jnp.round(1e-6 * jnp.mean(out).astype(jnp.float32))
    k = min(CARRY_COLS, xs.shape[1])
    sl = jax.lax.slice_in_dim(xs, 0, k, axis=1)
    if xs.dtype == jnp.int8:
        patch = sl + 1 + bump.astype(jnp.int8)
    else:
        patch = sl * jnp.asarray(DISTINCT_SCALE, xs.dtype) \
            + bump.astype(xs.dtype)
        # Multiplication leaves exact zeros unchanged (zero-padded batches,
        # one-hot features), which would re-open the identical-input hole:
        # seed zeros with the bf16-exact 1/128 (bump kept for the out
        # dependency); from step 2 on they are nonzero and scale normally.
        patch = jnp.where(sl == 0,
                          jnp.asarray(1.0 / 128.0, xs.dtype)
                          + bump.astype(xs.dtype), patch)
    return jax.lax.dynamic_update_slice_in_dim(xs, patch, 0, axis=1)


def make_chain_step(apply_fn: Callable):
    """Jitted (variables, xs) -> (next_xs, out) with the distinct carry.
    `apply_fn(variables, xs)` is the inference computation under test."""
    import jax

    @jax.jit
    def step(v, xs):
        out = apply_fn(v, xs)
        return distinct_carry(xs, out), out

    return step


def aot_chain_step(apply_fn: Callable, v, x):
    """AOT-compile the chain step ONCE and return (compiled, flops).

    The single shared fix for the double-compile pattern (VERDICT r4 next
    #8 / weak #1): `jitted(...)` followed by `jitted.lower(...).compile()`
    pays the 30-120 s remote compile twice for the same program. Here the
    executable used for timing IS the one whose cost_analysis() feeds MFU.
    `flops` is None when the backend exposes no cost model. The compiled
    object requires the exact (v, x) shapes/dtypes it was lowered with —
    fine for chained benches, whose carry preserves both."""
    import jax

    @jax.jit
    def step(vv, xs):
        out = apply_fn(vv, xs)
        return distinct_carry(xs, out), out

    compiled = step.lower(v, x).compile()
    flops = None
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        f = float(cost.get("flops", 0.0))
        if f > 0:
            flops = f
    except Exception:
        pass
    return compiled, flops


def chained_rate(step, v, x, batch: int, n_short: int = 2, n_long: int = 12,
                 reps: int = 3) -> Tuple[float, List[float]]:
    """Median marginal items/sec over `reps` (short, long) chain pairs.
    The final output of every chain is fetched to host (forces real
    completion on async/relayed backends).

    ONE chain is threaded through warmup and every rep — restarting each
    run from the same input would replay byte-identical step sequences,
    exactly the repeated-execution pattern the relay is documented to
    result-cache (exp_carry_diag.py). The multiplicative carry compounds
    to ~(1+1/128)^n over the whole chain: negligible magnitude drift for
    any realistic rep count, and timing is shape- not value-dependent."""
    chain = [x]

    def run(n):
        xs, out = chain[0], None
        t0 = time.perf_counter()
        for _ in range(n):
            xs, out = step(v, xs)
        np.asarray(out)
        dt = time.perf_counter() - t0
        chain[0] = xs
        return dt

    xs, out = step(v, chain[0])
    np.asarray(out)                          # compile + warm fetch path
    chain[0] = xs
    samples = []
    for _ in range(reps):
        t_s, t_l = run(n_short), run(n_long)
        samples.append(batch * (n_long - n_short) / max(t_l - t_s, 1e-9))
    return statistics.median(samples), samples


def marginal_step_s(step_once: Callable[[int], object], n_short: int = 3,
                    n_long: int = 43, reps: int = 1, warmup: int = 2) -> float:
    """Median marginal seconds/step for STATE-CHAINED steps (training: step
    t+1's parameters depend on step t's, so the chain is naturally distinct;
    `step_once(i)` must advance its own state and return a fetchable loss)."""

    def run(n):
        t0 = time.perf_counter()
        loss = None
        for i in range(n):
            loss = step_once(i)
        float(loss)
        return time.perf_counter() - t0

    for i in range(warmup):
        float(step_once(i))
    samples = []
    for _ in range(reps):
        t_s, t_l = run(n_short), run(n_long)
        samples.append((t_l - t_s) / (n_long - n_short))
    return statistics.median(samples)
