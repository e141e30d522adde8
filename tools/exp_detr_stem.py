"""DETR stem (depthwise k7 + pointwise 1x1 + maxpool/3) shape-level
experiment (r3): the device trace (BASELINE.md DETR roofline note) shows the
stem is ~3.9 ms of the 9.7 ms bf16 bs256 serving step — the k7 DEPTHWISE
conv is VPU-bound and XLA schedules the grouped conv poorly. Candidates:

  xla_conv        the production path: lax.conv(groups=C) + conv 1x1 + reduce-window max
  xla_rpool       same convs, maxpool as reshape(B,P,3,C)+max (fusible epilogue)
  xla_shift       depthwise as 7 statically-shifted multiply-adds (no grouped conv),
                  pointwise as a matmul, reshape-max pool
  pallas_fused    fused Pallas kernel — BUILT, MEASURED, DELETED (r3):
                  bb8/sc24 = 7.06-7.12 ms vs XLA 3.42-3.50; bb8/sc120
                  VMEM-OOM; bb4/sc120 excluded by cell-overhead arithmetic
                  (BASELINE.md "DETR fused-stem kernel post-mortem")

Methodology: in-jit chained fori_loop at two trip counts, scalar fetch
(tools/exp_mvit_attn.py pattern; [[tpu-microbench-in-jit-chaining]]).
An `empty` variant (chain only) is measured to show the harness floor.

Usage: nohup python tools/exp_detr_stem.py > /tmp/exp_stem.log 2>&1 &
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

B, T, C = 256, 3000, 270
K, POOL = 7, 3
N_SHORT, N_LONG = 4, 24


def marginal_ms(fn, x, args):
    variants = [x * (1.0 + 1e-4 * i) for i in range(1, 5)]

    def run(n, xx):
        t0 = time.perf_counter()
        np.asarray(fn(xx, *args, n))
        return time.perf_counter() - t0

    run(N_SHORT, x), run(N_LONG, x)
    t_s = min(run(N_SHORT, variants[0]), run(N_SHORT, variants[1]))
    t_l = min(run(N_LONG, variants[2]), run(N_LONG, variants[3]))
    return (t_l - t_s) / (N_LONG - N_SHORT) * 1e3


def chained(stem):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(5,))
    def step(x, kd, bd, kp, bp, n):
        def body(_, xx):
            out = stem(xx, kd, bd, kp, bp)
            return (xx + 1e-6 * jnp.sum(out)).astype(xx.dtype)
        return jnp.sum(jax.lax.fori_loop(0, n, body, x))

    return step


def stem_xla_conv(x, kd, bd, kp, bp):
    """The production ops: grouped conv k7 + conv 1x1 + reduce-window max."""
    import jax
    import jax.numpy as jnp
    dn = ("NWC", "WIO", "NWC")
    y = jax.lax.conv_general_dilated(
        x, kd, (1,), [(K // 2, K // 2)], dimension_numbers=dn,
        feature_group_count=C) + bd
    z = jax.lax.conv_general_dilated(y, kp, (1,),
                                     [(0, 0)],
                                     dimension_numbers=dn) + bp
    return jax.lax.reduce_window(z, -jnp.inf, jax.lax.max,
                                 (1, POOL, 1), (1, POOL, 1), "VALID")


def stem_xla_rpool(x, kd, bd, kp, bp):
    import jax
    dn = ("NWC", "WIO", "NWC")
    y = jax.lax.conv_general_dilated(
        x, kd, (1,), [(K // 2, K // 2)], dimension_numbers=dn,
        feature_group_count=C) + bd
    z = jax.lax.conv_general_dilated(y, kp, (1,),
                                     [(0, 0)],
                                     dimension_numbers=dn) + bp
    return z.reshape(z.shape[0], z.shape[1] // POOL, POOL,
                     z.shape[2]).max(axis=2)


def stem_xla_shift(x, kd, bd, kp, bp):
    """Depthwise as 7 shifted multiply-adds on a padded copy; pointwise as a
    plain matmul (f32 accum, cast back); reshape-max pool."""
    import jax.numpy as jnp
    pad = K // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    y = bd.astype(jnp.float32)
    for j in range(K):
        y = y + xp[:, j:j + T, :].astype(jnp.float32) * kd[j, 0].astype(jnp.float32)
    y = y.astype(x.dtype)
    z = (jnp.einsum("btc,cf->btf", y, kp[0],
                    preferred_element_type=jnp.float32)
         + bp).astype(x.dtype)
    return z.reshape(z.shape[0], z.shape[1] // POOL, POOL, z.shape[2]).max(axis=2)


def main():
    import jax
    import jax.numpy as jnp

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, C)), dtype)
    kd = jnp.asarray(rng.normal(size=(K, 1, C)) * 0.1, dtype)
    bd = jnp.asarray(rng.normal(size=(C,)) * 0.1, dtype)
    kp = jnp.asarray(rng.normal(size=(1, C, C)) * 0.06, dtype)
    bp = jnp.asarray(rng.normal(size=(C,)) * 0.1, dtype)
    args = (kd, bd, kp, bp)


    variants = {}
    if "--all" in sys.argv:
        variants.update({
            "empty": chained(lambda xx, *a: jnp.zeros((), xx.dtype)),
            "xla_conv": chained(stem_xla_conv),
            "xla_rpool": chained(stem_xla_rpool),
            "xla_shift": chained(stem_xla_shift),
        })
    try:
        from multi_modal_csi_tpu.kernels.detr_stem import fused_stem
        if "--all" in sys.argv:
            variants["pallas_fused"] = chained(
                lambda xx, kd, bd, kp, bp: fused_stem(xx, kd, bd, kp, bp))
        variants["pallas_sc120_bb4"] = chained(
            lambda xx, kd, bd, kp, bp: fused_stem(xx, kd, bd, kp, bp,
                                                  subchunk=120,
                                                  batch_block=4))
    except ImportError:
        pass

    out = {}
    for name, fn in variants.items():
        out[name] = marginal_ms(fn, x, args)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": out, "shape": [B, T, C]}), flush=True)


if __name__ == "__main__":
    main()
