"""The training engine: one compiled step, scan-free host epoch loop,
full-dataset compiled evaluation, best-weight selection and early stopping.

Reproduces the reference engine's observable behavior (wifi_csi/train.py:36-176):
  - shuffle each epoch, skip the final batch (every step is a full batch);
  - in-graph augmentation on training batches only;
  - cosine-warmup schedule stepped per-step (multi_head runners only);
  - per-epoch metrics on the LAST TRAINED batch (train side) and the FULL
    validation set (test side);
  - best weights kept only when BOTH f1 and perfect-prediction-% strictly
    improve; patience-based early stop (default 150).

TPU-first details: the step is a single jitted function with donated state
(params/opt-state update in place in HBM), batches stream H2D with double
buffering, and evaluation runs in fixed-size chunks so one compiled forward
serves any dataset size.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.pipeline import chunked, device_batches, epoch_batches, pad_to
from ..metrics.performance import performance_metrics
from ..utils.logging import MetricWriter
from .schedules import cosine_warmup


@dataclasses.dataclass
class FitResult:
    best_params: Any
    best_batch_stats: Any
    best_epoch: int
    epochs_ran: int
    history: List[Dict[str, float]]


def adam_like_torch(lr_schedule, weight_decay: float = 0.0,
                    mask: Any = None) -> optax.GradientTransformation:
    """torch.optim.Adam semantics: coupled L2 (grad += wd * param) before the
    Adam moment update, betas (0.9, 0.999), eps 1e-8."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay, mask=mask))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    parts.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*parts)


def _init_variables(model, rng, example_x):
    variables = model.init({"params": rng, "dropout": rng}, example_x, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return params, batch_stats


def _train_step_body(model, tx: optax.GradientTransformation,
                     loss_fn: Callable, augment: bool = True,
                     batch_dtype=None):
    """The (unjitted) train-step body shared by the jit and AOT paths.

    `batch_dtype` casts the uploaded batch in-graph (first op, fuses into
    the augmentation) — the bf16-training path: params arrive already cast
    by `fit(train_dtype=...)`, batches stream f32 from the host pipeline.
    """

    def step(params, batch_stats, opt_state, bx, by, rng):
        if batch_dtype is not None:
            bx = bx.astype(batch_dtype)
        aug_rng, drop_rng = jax.random.split(rng)
        if augment:
            # plain jnp chain: XLA fuses noise+scale+mask into one pass and
            # beats a hand-written Pallas kernel (2.8 vs 3.7 ms at
            # (64, 3000, 270) — the kernel paid ~12 us/grid-cell overhead;
            # deleted per win-or-delete, BASELINE.md augmentation post-mortem)
            from .augment import apply_augmentation
            bx = apply_augmentation(aug_rng, bx)

        def loss_wrap(p):
            out, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats}, bx, train=True,
                rngs={"dropout": drop_rng}, mutable=["batch_stats"])
            return loss_fn(out, by), (out, mutated)

        (loss, (out, mutated)), grads = jax.value_and_grad(
            loss_wrap, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, mutated.get("batch_stats", {}), opt_state, loss, out

    return step


def make_train_step(model, tx: optax.GradientTransformation,
                    loss_fn: Callable, augment: bool = True,
                    batch_dtype=None):
    """Single compiled train step with donated state."""
    return jax.jit(_train_step_body(model, tx, loss_fn, augment=augment,
                                    batch_dtype=batch_dtype),
                   donate_argnums=(0, 1, 2))


def aot_train_step(model, tx: optax.GradientTransformation,
                   loss_fn: Callable, params, batch_stats, opt_state,
                   batch_shapes, rng_example, *, augment: bool = True,
                   sharding=None, fsdp: bool = False, batch_dtype=None):
    """AOT-compile the train step with AUTO layouts; ONE compile total.

    The plain jitted step compiles up to THREE times on TPU: the first call
    sees host-uploaded state in default layouts, while the step's outputs
    (donated back in as the next call's inputs) carry XLA-chosen layouts —
    each mismatch is a fresh cache entry (~39 s each for DETR; measured in
    tools/exp_double_compile.py: 336+39+39 s warmup vs 42+7 s with this path).

    Compiling with Format(Layout.AUTO) on inputs AND outputs lets XLA pick a
    single layout per donated in/out pair; the initial state is device_put
    into exactly those input formats, so no call ever misses the cache.

    Returns (compiled, state, put_batch, put_rng): state is the formatted
    (params, batch_stats, opt_state); put_batch/put_rng place per-step inputs
    into the compiled formats.
    """
    from jax.experimental.layout import Format, Layout

    step = _train_step_body(model, tx, loss_fn, augment=augment,
                            batch_dtype=batch_dtype)
    auto = Format(Layout.AUTO)
    bx_s, by_s = batch_shapes

    from jax.sharding import NamedSharding, PartitionSpec
    if fsdp and sharding is None:
        raise ValueError("fsdp=True requires a batch `sharding` (the mesh "
                         "whose 'data' axis the state shards over)")
    state_shd = None
    if sharding is not None:
        mesh = sharding.mesh
        if fsdp:
            # ZeRO-3-style: params AND optimizer moments sharded over the
            # data axis (partition.fsdp_spec picks the largest divisible
            # dim per leaf); XLA inserts the all-gathers/reduce-scatters.
            from ..parallel.partition import fsdp_spec
            state_shd = lambda x: NamedSharding(  # noqa: E731
                mesh, fsdp_spec(getattr(x, "shape", ()), mesh))
        else:
            # plain data-parallel: state replicated
            rep = NamedSharding(mesh, PartitionSpec())
            state_shd = lambda x: rep  # noqa: E731

    out_shardings = auto
    if fsdp and state_shd is not None:
        # pin the donated state OUTPUTS to the input shardings — with a
        # free AUTO output GSPMD re-shards small (replicated) leaves and
        # the donation loop then feeds back mismatched arrays
        fmt = lambda x: Format(Layout.AUTO, state_shd(x))  # noqa: E731
        out_shardings = (jax.tree_util.tree_map(fmt, params),
                         jax.tree_util.tree_map(fmt, batch_stats),
                         jax.tree_util.tree_map(fmt, opt_state),
                         auto, auto)
    jitted = jax.jit(step, donate_argnums=(0, 1, 2),
                     in_shardings=auto, out_shardings=out_shardings)

    def aval(x, shd=None):
        if shd is not None:
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=shd)
        if state_shd is not None:
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=state_shd(x))
        return jax.ShapeDtypeStruct(x.shape, x.dtype)

    def batch_aval(x):
        return (jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
                if sharding is not None
                else jax.ShapeDtypeStruct(x.shape, x.dtype))

    compiled = jitted.lower(
        jax.tree_util.tree_map(aval, params),
        jax.tree_util.tree_map(aval, batch_stats),
        jax.tree_util.tree_map(aval, opt_state),
        batch_aval(bx_s), batch_aval(by_s),
        (jax.ShapeDtypeStruct(rng_example.shape, rng_example.dtype,
                              sharding=NamedSharding(sharding.mesh,
                                                     PartitionSpec()))
         if sharding is not None else
         jax.ShapeDtypeStruct(rng_example.shape, rng_example.dtype))
        ).compile()
    fmts, _ = compiled.input_formats
    state = (jax.device_put(params, fmts[0]),
             jax.device_put(batch_stats, fmts[1]),
             jax.device_put(opt_state, fmts[2]))

    def put_batch(bx, by):
        return jax.device_put(bx, fmts[3]), jax.device_put(by, fmts[4])

    def put_rng(rng):
        return jax.device_put(rng, fmts[5])

    return compiled, state, put_batch, put_rng


def make_eval_fn(model):
    @jax.jit
    def forward(params, batch_stats, x):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           x, train=False)
    return forward


def eval_dataset(forward, params, batch_stats, x: np.ndarray,
                 chunk: int = 512, batch_axis: int = 0,
                 dtype=None) -> np.ndarray:
    """Chunked full-dataset forward with static shapes.

    `batch_axis` is where the batch lives in the OUTPUT (1 for DETR-style
    [L, B, Q, C] stacks, 0 otherwise). `dtype` (e.g. jnp.bfloat16) casts
    each input chunk for serving-precision inference; pass params already
    cast (see cast_for_serving). Logits always return as float32.
    """
    n = x.shape[0]
    chunk = min(chunk, max(1, n))
    outs = []
    for start, size in chunked(n, chunk):
        bx = pad_to(x[start:start + size], chunk)
        if dtype is not None:
            bx = jnp.asarray(bx, dtype)
        out = forward(params, batch_stats, bx)
        out = host_value(out.astype(jnp.float32) if dtype is not None else out)
        outs.append(np.take(out, np.arange(size), axis=batch_axis))
    return np.concatenate(outs, axis=batch_axis)


def cast_for_serving(tree, dtype):
    """Cast every float32 leaf (weights/stats) to the serving dtype."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if getattr(a, "dtype", None) == jnp.float32 else a, tree)


def host_value(a):
    """np value of a device array that may not be fully addressable
    (multi-host meshes; ZeRO-3/FSDP state sharded over a process-spanning
    'data' axis). jax.device_get alone RAISES on non-addressable arrays —
    which made the engines crash at the first best-weight snapshot under
    fsdp on a multi-host mesh — so those are all-gathered to a full host
    copy on every process instead; everything else fetches directly."""
    if getattr(a, "is_fully_addressable", True):
        return jax.device_get(a)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(a, tiled=True))


def host_snapshot(tree):
    """host_value over a pytree (best-weight capture, checkpoint saves)."""
    return jax.tree_util.tree_map(host_value, tree)


def fit(model,
        x_train: np.ndarray, y_train: np.ndarray,
        x_valid: np.ndarray, y_valid: np.ndarray,
        *,
        loss_fn: Callable,
        mode: str,
        lr: float,
        epochs: int,
        batch_size: int,
        seed: int,
        weight_decay: float = 0.0,
        threshold: float = 0.5,
        patience: int = 150,
        use_cosine_schedule: Optional[bool] = None,
        warmup_epochs: int = 10,
        min_lr_ratio: float = 0.05,
        batch_axis: int = 0,
        augment: bool = True,
        sharding=None,
        fsdp: bool = False,
        writer: Optional[MetricWriter] = None,
        init_variables: Optional[Tuple[Any, Any]] = None,
        tx: Optional[optax.GradientTransformation] = None,
        eval_chunk: int = 512,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 0,
        train_dtype: Optional[str] = None) -> FitResult:
    """Train `model` and return the best weights by the reference's rule.

    `mode` feeds performance_metrics (baseline | multi_head |
    count_classification | count_classification_withConstrain). Target
    transforms (count summing, flattening) are the caller's responsibility —
    they are dataset-level, not step-level.

    `train_dtype="bfloat16"` is the measured throughput configuration
    (BASELINE.md r3 training tables: bf16 wins or ties every CSI family
    after the mixed-precision fixes — MLP +51%, ABLSTM +32%, CLSTM +22%):
    params and optimizer moments live in bf16 (f32 MXU accumulation via
    mp_dot), batches cast in-graph, BatchNorm running stats stay f32, and
    in-loop validation runs the same bf16 weights. Accuracy-parity runs
    keep the default f32 — exactly the reference's numerics. Checkpoints
    written by a bf16 run restore only into a bf16 run (the dtype is part
    of the tree).
    """
    rng = jax.random.PRNGKey(seed)
    np_rng = np.random.default_rng(seed)

    n = x_train.shape[0]
    steps_per_epoch = max(int(np.ceil(n / batch_size)) - 1, 1)
    if use_cosine_schedule is None:
        use_cosine_schedule = (mode == "multi_head")
    if use_cosine_schedule:
        schedule = cosine_warmup(lr, warmup_epochs * steps_per_epoch,
                                 epochs * steps_per_epoch, min_lr_ratio)
    else:
        schedule = lr

    if tx is None:
        tx = adam_like_torch(schedule, weight_decay)

    if init_variables is None:
        init_rng, rng = jax.random.split(rng)
        params, batch_stats = _init_variables(model, init_rng,
                                              x_train[:min(2, n)])
    else:
        params, batch_stats = init_variables
    batch_dtype = None
    if train_dtype in ("bfloat16", jnp.bfloat16):
        batch_dtype = jnp.bfloat16
        # params + moments in bf16 (tx.init below inherits the dtype);
        # BatchNorm running stats are created f32 and stay f32
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if getattr(a, "dtype", None) == jnp.float32 else a, params)
    elif train_dtype not in (None, "float32", jnp.float32):
        raise ValueError(f"unsupported train_dtype {train_dtype!r}")
    opt_state = tx.init(params)

    forward = make_eval_fn(model)

    best_f1 = 0.0
    best_ppp = 0.0
    best_params = host_snapshot(params)
    best_stats = host_snapshot(batch_stats)
    best_epoch = -1
    counter = 0
    history: List[Dict[str, float]] = []

    # preemption-safe resume (SURVEY.md §5.3/§5.4: capability the reference
    # lacks — its best weights lived only in process memory)
    ckpt = None
    start_epoch = 0
    if checkpoint_dir and checkpoint_every > 0:
        from ..core.checkpoint import RunCheckpointer
        ckpt = RunCheckpointer(checkpoint_dir)
        latest = ckpt.latest_step()
        if latest is not None:
            state = ckpt.restore({"params": host_snapshot(params),
                                  "batch_stats": host_snapshot(batch_stats),
                                  "opt_state": host_snapshot(opt_state),
                                  "epoch": np.int64(0)})
            params = state["params"]
            batch_stats = state["batch_stats"]
            opt_state = state["opt_state"]
            start_epoch = int(state["epoch"]) + 1

    # Compile the step ONCE via the AOT layout-pinned path (after any resume,
    # so the restored state is device_put into the compiled input formats).
    # Falls back to plain jit if AOT lowering is unsupported for this config.
    put_batch = put_rng = None
    try:
        rng, probe = jax.random.split(rng)
        bx_s = jax.ShapeDtypeStruct((batch_size,) + x_train.shape[1:],
                                    x_train.dtype)
        by_s = jax.ShapeDtypeStruct((batch_size,) + y_train.shape[1:],
                                    y_train.dtype)
        step_fn, (params, batch_stats, opt_state), put_batch, put_rng = \
            aot_train_step(model, tx, loss_fn, params, batch_stats, opt_state,
                           (bx_s, by_s), probe, augment=augment,
                           sharding=sharding, fsdp=fsdp,
                           batch_dtype=batch_dtype)
    except Exception as e:
        import warnings
        warnings.warn(f"AOT train-step lowering failed ({e!r}); falling back "
                      "to plain jit (expect layout-churn recompiles on TPU)")
        step_fn = make_train_step(model, tx, loss_fn, augment=augment,
                                  batch_dtype=batch_dtype)

    y_valid_np = np.asarray(y_valid)

    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        idx = epoch_batches(n, batch_size, np_rng, skip_last=True)
        last_by = None
        last_out = None
        loss_train = jnp.zeros(())
        for bx, by in device_batches(x_train, y_train, idx, sharding=sharding):
            rng, step_rng = jax.random.split(rng)
            if put_batch is not None:
                bx, by = put_batch(bx, by)
                step_rng = put_rng(step_rng)
            params, batch_stats, opt_state, loss_train, out = step_fn(
                params, batch_stats, opt_state, bx, by, step_rng)
            last_by, last_out = by, out

        # train-side metrics on the last trained batch (train.py:105-108,
        # including the reference's astype(int) truncation of the logits)
        train_metrics = performance_metrics(
            np.asarray(last_by).astype(int),
            np.asarray(last_out).astype(int),
            var_mode=mode, var_threshold=threshold)

        # full-validation-set evaluation (bf16 runs evaluate in bf16 too —
        # the weights ARE bf16; eval_dataset returns f32 logits)
        logits_valid = eval_dataset(forward, params, batch_stats, x_valid,
                                    chunk=eval_chunk, batch_axis=batch_axis,
                                    dtype=batch_dtype)
        loss_valid = float(loss_fn(jnp.asarray(logits_valid),
                                   jnp.asarray(y_valid_np)))
        valid_metrics = performance_metrics(
            y_valid_np, logits_valid, var_mode=mode, var_threshold=threshold)

        record = {
            "epoch": epoch,
            "epoch_time": time.time() - t0,
            "train_loss": float(loss_train),
            "test_loss": loss_valid,
            "total_error_test": valid_metrics["total_error"],
            "perfect_prediction_percentage_test":
                valid_metrics["perfect_prediction_percentage"],
            "perfect_prediction_percentage_train":
                train_metrics["perfect_prediction_percentage"],
            "accuracy_test": valid_metrics["accuracy"],
            "precision": valid_metrics["precision"],
            "recall": valid_metrics["recall"],
            "f1_score": valid_metrics["f1_score"],
        }
        history.append(record)
        if writer:
            writer.log(record, step=epoch)

        # best-weight rule: BOTH f1 and PPP must strictly improve
        # (train.py:159-166)
        if (valid_metrics["f1_score"] > best_f1
                and valid_metrics["perfect_prediction_percentage"] > best_ppp):
            best_f1 = valid_metrics["f1_score"]
            best_ppp = valid_metrics["perfect_prediction_percentage"]
            best_params = host_snapshot(params)
            best_stats = host_snapshot(batch_stats)
            best_epoch = epoch
            counter = 0
        else:
            counter += 1
        if ckpt and (epoch + 1) % checkpoint_every == 0:
            ckpt.save(epoch, {"params": host_snapshot(params),
                              "batch_stats": host_snapshot(batch_stats),
                              "opt_state": host_snapshot(opt_state),
                              "epoch": np.int64(epoch)})
        if counter >= patience:
            break

    if best_epoch < 0:  # never improved: return final weights (SSL engine
        best_params = host_snapshot(params)    # behavior, train_ssl.py:88-91)
        best_stats = host_snapshot(batch_stats)
    return FitResult(best_params, best_stats, best_epoch,
                     len(history), history)
