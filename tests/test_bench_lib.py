"""The shared chained-marginal core (tools/bench_lib.py) — the property the
whole measurement methodology rests on: chained inputs are provably distinct
in bf16 (the r1-r3 additive carry was bit-absorbed after step 1; CLAUDE.md /
BASELINE.md post-mortems)."""

import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_lib import (DISTINCT_SCALE, chained_rate,  # noqa: E402
                             distinct_carry, make_chain_step)


def test_scale_is_bf16_exact():
    assert float(jnp.asarray(DISTINCT_SCALE, jnp.bfloat16)) == DISTINCT_SCALE


def test_bf16_chain_distinct_60_steps():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 300, 27)),
                    jnp.bfloat16)
    v = jnp.asarray(np.random.default_rng(1).normal(size=(27, 8)),
                    jnp.bfloat16)
    step = make_chain_step(lambda vv, xs: jnp.tanh(xs @ vv))
    xs = x
    for i in range(60):
        nxt, _ = step(v, xs)
        assert not np.array_equal(np.asarray(nxt, np.float32),
                                  np.asarray(xs, np.float32)), \
            f"carry absorbed at step {i}"
        xs = nxt
    # values stay normal (no overflow/denormal drift over a long chain)
    assert np.isfinite(np.asarray(xs, np.float32)).all()
    assert float(jnp.max(jnp.abs(xs))) < 1e4


def test_additive_carry_is_absorbed_motivation():
    """The documented failure the multiplicative carry fixes: the old
    +1e-6*mean bump rounds to zero in bf16 (inputs identical after step 1)."""
    x = jnp.asarray(np.random.default_rng(0).normal(size=(64,)), jnp.bfloat16)
    bumped = x + jnp.asarray(1e-6, jnp.bfloat16) * jnp.asarray(0.3, jnp.bfloat16)
    assert np.array_equal(np.asarray(x, np.float32),
                          np.asarray(bumped, np.float32))


def test_int8_chain_distinct():
    x = jnp.asarray(np.random.default_rng(2).integers(-5, 5, size=(4, 300)),
                    jnp.int8)
    step = make_chain_step(
        lambda vv, xs: (xs.astype(jnp.bfloat16) @ vv).sum())
    xs = x
    for _ in range(10):
        nxt, _ = step(jnp.ones((300,), jnp.bfloat16), xs)
        assert not np.array_equal(np.asarray(nxt), np.asarray(xs))
        xs = nxt


def test_carry_depends_on_output():
    """The rounded mean(out) term keeps the model output in the dependency
    chain: a huge output shifts the carry."""
    x = jnp.ones((2, 8), jnp.bfloat16)
    small = distinct_carry(x, jnp.zeros((2, 2)))
    big = distinct_carry(x, jnp.full((2, 2), 2e6))
    assert not np.array_equal(np.asarray(small, np.float32),
                              np.asarray(big, np.float32))


def test_chained_rate_positive():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 64)),
                    jnp.bfloat16)
    v = jnp.asarray(np.random.default_rng(1).normal(size=(64, 8)),
                    jnp.bfloat16)
    step = make_chain_step(lambda vv, xs: xs @ vv)
    med, samples = chained_rate(step, v, x, 4, n_short=2, n_long=6, reps=3)
    assert med > 0 and len(samples) == 3


def test_zero_slice_still_distinct():
    """Multiplication alone leaves exact zeros unchanged (zero-padded
    batches, one-hot features) — the carry must still produce a distinct
    next input when the leading slice is all zeros."""
    x = jnp.zeros((4, 300, 27), jnp.bfloat16)
    step = make_chain_step(lambda vv, xs: jnp.tanh(xs @ vv))
    v = jnp.asarray(np.random.default_rng(1).normal(size=(27, 8)),
                    jnp.bfloat16)
    xs = x
    for i in range(5):
        nxt, _ = step(v, xs)
        assert not np.array_equal(np.asarray(nxt, np.float32),
                                  np.asarray(xs, np.float32)), \
            f"zero slice absorbed the carry at step {i}"
        xs = nxt


def test_chained_rate_never_replays_inputs():
    """chained_rate must thread ONE chain through warmup and all reps:
    restarting from the same input replays byte-identical step sequences,
    the exact pattern the relay result-caches (exp_carry_diag.py)."""
    seen = []

    def apply_fn(vv, xs):
        return xs @ vv

    step = make_chain_step(apply_fn)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 64)),
                    jnp.bfloat16)
    v = jnp.asarray(np.random.default_rng(1).normal(size=(64, 8)),
                    jnp.bfloat16)

    def spy_step(vv, xs):
        seen.append(np.asarray(xs, np.float32).tobytes())
        return step(vv, xs)

    chained_rate(spy_step, v, x, 4, n_short=2, n_long=6, reps=3)
    assert len(seen) == len(set(seen)), \
        "chained_rate re-executed a byte-identical input"


def test_aot_chain_step_single_executable():
    """aot_chain_step (VERDICT r4 next #8): the compiled object both runs
    the chain (distinct carry preserved) and reports flops without a second
    lower/compile."""
    from tools.bench_lib import aot_chain_step

    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 64)),
                    jnp.bfloat16)
    v = jnp.asarray(np.random.default_rng(1).normal(size=(64, 8)),
                    jnp.bfloat16)
    compiled, flops = aot_chain_step(lambda vv, xs: xs @ vv, v, x)
    nxt, out = compiled(v, x)
    assert nxt.shape == x.shape and nxt.dtype == x.dtype
    assert not np.array_equal(np.asarray(nxt, np.float32),
                              np.asarray(x, np.float32))
    # the chained input must be accepted by the same executable
    nxt2, _ = compiled(v, nxt)
    assert not np.array_equal(np.asarray(nxt2, np.float32),
                              np.asarray(nxt, np.float32))
    # CPU backend exposes a cost model; flops of a 4x64 @ 64x8 matmul > 0
    assert flops is None or flops > 0
    # and chained_rate accepts the compiled object directly
    med, samples = chained_rate(compiled, v, x, 4, n_short=2, n_long=6,
                                reps=2)
    assert med > 0 and len(samples) == 2
