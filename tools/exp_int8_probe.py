"""int8 serving feasibility probe (r3): does XLA lower int8 dot/conv to the
v5e int8 MXU path (394 TOPS peak, 2x bf16), and does weight-only int8
dequant-inline actually reduce HBM traffic or does XLA materialize the
dequantized weights?

Shapes probed:
  mm4k      (4096,4096)x(4096,4096)      MXU ceiling sanity
  detr_conv conv1d (256,1000,270) k3 d2  the flagship's dominant compute op
  mlp_l1    (64,810000)x(810000,256)     the bandwidth-bound extreme (830 MB
                                         f32 weights; serving is weight
                                         readback, BASELINE.md)
  s3d_conv3d (4,45,28,28,192) (1,3,3)    separable-conv spatial half

Methodology: chained fori_loop INSIDE one jit, marginal between two trip
counts, distinct inputs per timed call, scalar fetch (see exp_mvit_attn.py
header for why). The chain perturbation pass differs by carry dtype (int8
carries 1 byte/elem vs bf16's 2) — fine for a feasibility probe; production
numbers come from full-model benches later.

Usage: nohup python tools/exp_int8_probe.py > /tmp/exp_int8.log 2>&1 &
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N_SHORT, N_LONG = 4, 24


def marginal_ms(fn, x):
    # Distinct input per timed call (the relay caches identical executions);
    # int8 multipliers wrap — values are irrelevant to timing.
    variants = [x * (i + 2) if x.dtype == np.int8 else x * (1.0 + 1e-4 * i)
                for i in range(1, 5)]

    def run(n, xx):
        t0 = time.perf_counter()
        np.asarray(fn(xx, n))
        return time.perf_counter() - t0

    run(N_SHORT, x), run(N_LONG, x)
    t_s = min(run(N_SHORT, variants[0]), run(N_SHORT, variants[1]))
    t_l = min(run(N_LONG, variants[2]), run(N_LONG, variants[3]))
    return (t_l - t_s) / (N_LONG - N_SHORT) * 1e3


def chained(op):
    """op(x) -> y (any shape). Carry: x <- x + cast(0.01*mean(y))."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(1,))
    def step(x, n):
        def body(_, xx):
            y = op(xx)
            bump = 0.01 * jnp.mean(y.astype(jnp.float32))
            return (xx.astype(jnp.float32) + bump).astype(xx.dtype)
        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

    return step


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    out = {}

    def report(name, row):
        out[name] = row
        print(name, json.dumps(row), flush=True)

    def try_ms(op, x):
        try:
            return marginal_ms(chained(op), x)
        except Exception as e:  # noqa: BLE001
            return f"FAILED: {e!r}"[:200]

    # --- mm4k ---------------------------------------------------------
    k = 4096
    a16 = jnp.asarray(rng.normal(size=(k, k)).astype(np.float32), jnp.bfloat16)
    b16 = jnp.asarray(rng.normal(size=(k, k)).astype(np.float32), jnp.bfloat16)
    a8 = jnp.asarray(rng.integers(-127, 127, size=(k, k), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-127, 127, size=(k, k), dtype=np.int8))
    flop = 2 * k ** 3
    row = {}
    ms = try_ms(lambda x: jnp.dot(x, b16, preferred_element_type=jnp.float32), a16)
    row["bf16_ms"] = ms
    if isinstance(ms, float):
        row["bf16_tflops"] = flop / (ms * 1e-3) / 1e12
    ms = try_ms(lambda x: jnp.dot(x, b8, preferred_element_type=jnp.int32), a8)
    row["int8_ms"] = ms
    if isinstance(ms, float):
        row["int8_tops"] = flop / (ms * 1e-3) / 1e12
    report("mm4k", row)

    # --- detr_conv (conv1d k3 dilation 2, 270->270, NLC) ---------------
    xc16 = jnp.asarray(rng.normal(size=(256, 1000, 270)).astype(np.float32),
                       jnp.bfloat16)
    wc16 = jnp.asarray(rng.normal(size=(3, 270, 270)).astype(np.float32) * 0.05,
                       jnp.bfloat16)
    xc8 = jnp.asarray(rng.integers(-127, 127, size=(256, 1000, 270), dtype=np.int8))
    wc8 = jnp.asarray(rng.integers(-127, 127, size=(3, 270, 270), dtype=np.int8))
    dn = lax.conv_dimension_numbers((256, 1000, 270), (3, 270, 270),
                                    ("NHC", "HIO", "NHC"))

    def conv1d(x, w, pref):
        return lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=((2, 2),),
            rhs_dilation=(2,), dimension_numbers=dn,
            preferred_element_type=pref)

    flop = 2 * 256 * 1000 * 270 * 270 * 3
    row = {}
    ms = try_ms(lambda x: conv1d(x, wc16, jnp.float32), xc16)
    row["bf16_ms"] = ms
    if isinstance(ms, float):
        row["bf16_tflops"] = flop / (ms * 1e-3) / 1e12
    ms = try_ms(lambda x: conv1d(x, wc8, jnp.int32), xc8)
    row["int8_ms"] = ms
    if isinstance(ms, float):
        row["int8_tops"] = flop / (ms * 1e-3) / 1e12
    report("detr_conv", row)

    # --- mlp_l1 (weight readback bound) --------------------------------
    # The question here is HBM traffic, and specifically whether XLA
    # MATERIALIZES dequantized bf16 weights (which would make weight-only
    # int8 *slower* than bf16) or fuses the convert into the dot's operand
    # stream. fori_loop hoists loop-invariant dequants, so the weight is
    # dynamic-sliced from a (kin+16)-row buffer at a carry-dependent offset
    # — the slice defeats hoisting and is applied IDENTICALLY to every
    # variant so its cost cancels in the comparison.
    kin, kout, bs = 810000, 256, 64
    xm16 = jnp.asarray(rng.normal(size=(bs, kin)).astype(np.float32), jnp.bfloat16)
    wbig16 = jnp.asarray((rng.normal(size=(kin + 16, kout)) * 0.01)
                         .astype(np.float32), jnp.bfloat16)
    wbig8 = jnp.asarray(rng.integers(-127, 127, size=(kin + 16, kout),
                                     dtype=np.int8))
    scale = jnp.asarray((rng.random(kout) * 0.01 + 0.005).astype(np.float32))
    xm8 = jnp.asarray(rng.integers(-127, 127, size=(bs, kin), dtype=np.int8))
    flop = 2 * bs * kin * kout

    def sliced_chain(make_y):
        @functools.partial(jax.jit, static_argnums=(1,))
        def step(x, n):
            def body(i, carry):
                xx, acc = carry
                off = jnp.mod(i, 16)
                y = make_y(xx, off)
                bump = 0.01 * jnp.mean(y.astype(jnp.float32))
                return ((xx.astype(jnp.float32) + bump).astype(xx.dtype),
                        acc + bump)
            xx, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
            return jnp.sum(xx.astype(jnp.float32)) + acc
        return step

    def try_sliced(make_y, x):
        try:
            return marginal_ms(sliced_chain(make_y), x)
        except Exception as e:  # noqa: BLE001
            return f"FAILED: {e!r}"[:200]

    def w16_at(off):
        return lax.dynamic_slice(wbig16, (off, 0), (kin, kout))

    def w8_at(off):
        return lax.dynamic_slice(wbig8, (off, 0), (kin, kout))

    row = {}
    row["bf16_ms"] = try_sliced(
        lambda x, off: jnp.dot(x, w16_at(off),
                               preferred_element_type=jnp.float32), xm16)
    row["int8_weightonly_dequant_ms"] = try_sliced(
        lambda x, off: jnp.dot(x, w8_at(off).astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32) * scale,
        xm16)
    # Mixed-dtype dot: bf16 activations x int8 weights in ONE dot_general —
    # if XLA:TPU accepts this it is the native weight-only path.
    row["mixed_bf16xint8_ms"] = try_sliced(
        lambda x, off: lax.dot_general(
            x, w8_at(off), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale, xm16)
    row["int8_full_ms"] = try_sliced(
        lambda x, off: jnp.dot(x, w8_at(off),
                               preferred_element_type=jnp.int32), xm8)
    for key, bytes_per in (("bf16_ms", 2), ("int8_weightonly_dequant_ms", 1),
                           ("mixed_bf16xint8_ms", 1), ("int8_full_ms", 1)):
        ms = row[key]
        if isinstance(ms, float):
            row[key.replace("_ms", "_gbps_weights")] = (
                kin * kout * bytes_per) / (ms * 1e-3) / 1e9
    report("mlp_l1", row)

    # --- s3d_conv3d spatial (1,3,3) 192->192 ---------------------------
    shp = (4, 45, 28, 28, 192)
    xs16 = jnp.asarray(rng.normal(size=shp).astype(np.float32), jnp.bfloat16)
    ws16 = jnp.asarray((rng.normal(size=(1, 3, 3, 192, 192)) * 0.05)
                       .astype(np.float32), jnp.bfloat16)
    xs8 = jnp.asarray(rng.integers(-127, 127, size=shp, dtype=np.int8))
    ws8 = jnp.asarray(rng.integers(-127, 127, size=(1, 3, 3, 192, 192),
                                   dtype=np.int8))
    dn3 = lax.conv_dimension_numbers(shp, (1, 3, 3, 192, 192),
                                     ("NDHWC", "DHWIO", "NDHWC"))

    def conv3d(x, w, pref):
        return lax.conv_general_dilated(
            x, w, window_strides=(1, 1, 1),
            padding=((0, 0), (1, 1), (1, 1)), dimension_numbers=dn3,
            preferred_element_type=pref)

    flop = 2 * np.prod(shp) * 192 * 9
    row = {}
    ms = try_ms(lambda x: conv3d(x, ws16, jnp.float32), xs16)
    row["bf16_ms"] = ms
    if isinstance(ms, float):
        row["bf16_tflops"] = flop / (ms * 1e-3) / 1e12
    ms = try_ms(lambda x: conv3d(x, ws8, jnp.int32), xs8)
    row["int8_ms"] = ms
    if isinstance(ms, float):
        row["int8_tops"] = flop / (ms * 1e-3) / 1e12
    report("s3d_conv3d", row)

    print("SUMMARY", json.dumps(out), flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
