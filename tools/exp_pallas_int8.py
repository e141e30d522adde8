"""Probe: does Mosaic (Pallas TPU) lower int8 x int8 -> int32 MXU dots?

Decides whether an int8 FLASH attention kernel is a viable future lever
for the THAT family (the attention core is the one bf16 block left after
the weight/projection quantization — BASELINE.md int8 section). Three
probes, each compile + correctness + rough marginal:

  p1: single-tile (256, 270) x (270, 420) s8 dot inside one Pallas cell
  p2: same shape in bf16 (the flash kernel's current inner dot)
  p3: XLA (non-Pallas) s8 dot of the same shape, for lowering sanity

Run:  nohup python tools/exp_pallas_int8.py > /tmp/exp_pallas_i8.log 2>&1 &
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N_SHORT, N_LONG = 4, 24


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    M, K, N = 256, 272, 424   # flash-tile-ish, lane-aligned
    a8 = jnp.asarray(rng.integers(-127, 127, (M, K), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8))
    a16 = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    b16 = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)
    out = {}

    def kernel_s8(x_ref, y_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], y_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def kernel_bf16(x_ref, y_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], y_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def chained(callable_, x, y, n_iters):
        @functools.partial(jax.jit, static_argnums=(2,))
        def step(xx, yy, n):
            def body(_, acc):
                o = callable_(acc, yy)
                # fold the output back into the int8/bf16 operand range
                folded = (o.astype(jnp.float32) * 1e-4)
                if xx.dtype == jnp.int8:
                    nxt = jnp.clip(jnp.round(folded), -127, 127
                                   ).astype(jnp.int8)[:, :xx.shape[1]]
                else:
                    nxt = folded.astype(jnp.bfloat16)[:, :xx.shape[1]]
                return nxt
            r = jax.lax.fori_loop(0, n, body, xx)
            return jnp.sum(r.astype(jnp.float32))
        t0 = time.perf_counter()
        np.asarray(step(x, y, n_iters))
        return time.perf_counter() - t0

    def run_case(name, kern, x, y, odtype):
        try:
            call = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((M, N), odtype))
            got = np.asarray(jax.jit(call)(x, y))
            want = np.asarray(jax.jit(
                lambda aa, bb: jax.lax.dot_general(
                    aa, bb, (((1,), (0,)), ((), ())),
                    preferred_element_type=odtype))(x, y))
            exact = bool(np.array_equal(got, want))
            chained(call, x, y, N_SHORT)
            t_s = chained(call, x, y, N_SHORT)
            t_l = chained(call, x, y, N_LONG)
            us = (t_l - t_s) / (N_LONG - N_SHORT) * 1e6
            out[name] = {"exact": exact, "us_per_dot_chain": round(us, 2)}
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": repr(e)[:300]}
        print(name, json.dumps(out[name]), flush=True)

    run_case("pallas_s8", kernel_s8, a8, b8, jnp.int32)
    run_case("pallas_bf16", kernel_bf16, a16, b16, jnp.float32)
    try:
        got = np.asarray(jax.jit(
            lambda aa, bb: jnp.dot(aa, bb,
                                   preferred_element_type=jnp.int32))(a8, b8))
        out["xla_s8"] = {"ok": bool(got.dtype == np.int32)}
    except Exception as e:  # noqa: BLE001
        out["xla_s8"] = {"error": repr(e)[:300]}
    print("xla_s8", json.dumps(out["xla_s8"]), flush=True)
    print("SUMMARY", json.dumps(out), flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
