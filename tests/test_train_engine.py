"""End-to-end training-engine tests on tiny synthetic data (CPU, 8 virtual
devices via conftest)."""

import numpy as np
import pytest

from multi_modal_csi_tpu.data.pipeline import epoch_batches
from multi_modal_csi_tpu.losses.basic import bce_with_logits
from multi_modal_csi_tpu.models.csi.mlp import MLP
from multi_modal_csi_tpu.train.loop import eval_dataset, fit, make_eval_fn
from multi_modal_csi_tpu.train.schedules import cosine_warmup


def _synthetic_baseline(n=96, f=20, users=2, classes=9, seed=0):
    """Linearly separable multi-user activity data in baseline layout."""
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(f, users * classes))
    x = rng.normal(size=(n, f)).astype(np.float32)
    logits = x @ w
    y = np.zeros((n, users, classes), np.int64)
    for i in range(n):
        for u in range(users):
            y[i, u, logits[i, u * classes:(u + 1) * classes].argmax()] = 1
    return x, y.reshape(n, -1)


def test_epoch_batches_skips_last():
    rng = np.random.default_rng(0)
    idx = epoch_batches(50, 16, rng, skip_last=True)
    # ceil(50/16)=4 batches -> 3 trained, all full
    assert idx.shape == (3, 16)
    idx2 = epoch_batches(48, 16, rng, skip_last=True)
    assert idx2.shape == (2, 16)  # divisible: the full last batch is skipped too


def test_cosine_warmup_schedule_values():
    sched = cosine_warmup(1.0, num_warmup_steps=10, num_training_steps=100,
                          min_lr_ratio=0.05)
    assert float(sched(0)) == 0.0
    assert float(sched(5)) == pytest.approx(0.5)
    assert float(sched(10)) == pytest.approx(1.0)
    assert float(sched(55)) == pytest.approx(0.5, abs=1e-2)
    assert float(sched(100)) == pytest.approx(0.05)  # floored


def test_fit_mlp_baseline_learns():
    x, y = _synthetic_baseline()
    model = MLP(out_features=y.shape[-1])
    res = fit(model, x, y, x, y,
              loss_fn=lambda o, t: bce_with_logits(o, t, pos_weight=4.0),
              mode="baseline", lr=5e-3, epochs=30, batch_size=16,
              seed=39, weight_decay=1e-3, patience=150, augment=False)
    assert res.epochs_ran == 30
    final = res.history[-1]
    first = res.history[0]
    assert final["f1_score"] > first["f1_score"]
    assert final["perfect_prediction_percentage_test"] > 50.0
    # best weights reproduce the recorded best metrics
    forward = make_eval_fn(model)
    logits = eval_dataset(forward, res.best_params, res.best_batch_stats, x)
    assert logits.shape == (x.shape[0], y.shape[-1])


def test_fit_early_stopping():
    x, y = _synthetic_baseline(n=48)
    model = MLP(out_features=y.shape[-1])
    res = fit(model, x, y, x, y,
              loss_fn=lambda o, t: bce_with_logits(o, t, pos_weight=4.0),
              mode="baseline", lr=0.0, epochs=50, batch_size=16,
              seed=39, patience=3, augment=False)
    # lr=0: no improvement ever -> stops after patience+1 epochs
    assert res.epochs_ran <= 5


def test_eval_dataset_chunking_matches_single_shot():
    x, y = _synthetic_baseline(n=40)
    model = MLP(out_features=y.shape[-1])
    res = fit(model, x, y, x, y,
              loss_fn=lambda o, t: bce_with_logits(o, t),
              mode="baseline", lr=1e-3, epochs=2, batch_size=8,
              seed=7, augment=False)
    forward = make_eval_fn(model)
    a = eval_dataset(forward, res.best_params, res.best_batch_stats, x, chunk=16)
    b = eval_dataset(forward, res.best_params, res.best_batch_stats, x, chunk=40)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_fit_checkpoint_resume(tmp_path):
    x, y = _synthetic_baseline(n=48)
    model = MLP(out_features=y.shape[-1])
    kwargs = dict(loss_fn=lambda o, t: bce_with_logits(o, t, 4.0),
                  mode="baseline", lr=1e-3, batch_size=16, seed=39,
                  augment=False, patience=100,
                  checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=2)
    # train 4 epochs with checkpoints
    res1 = fit(model, x, y, x, y, epochs=4, **kwargs)
    assert res1.epochs_ran == 4
    # "preempted" restart: resumes from the epoch-3 checkpoint
    res2 = fit(model, x, y, x, y, epochs=6, **kwargs)
    assert res2.epochs_ran == 2  # epochs 4 and 5 only


def test_aot_step_matches_jit_step():
    """The AOT layout-pinned step (fit's default; train/loop.py::aot_train_step)
    produces bit-comparable training numerics to the plain jitted step."""
    import jax
    import jax.numpy as jnp

    from multi_modal_csi_tpu.train.loop import (_init_variables,
                                                adam_like_torch,
                                                aot_train_step,
                                                make_train_step)

    x, y = _synthetic_baseline(n=32)
    model = MLP(out_features=y.shape[-1])
    loss_fn = lambda o, t: bce_with_logits(o, t, pos_weight=4.0)
    tx = adam_like_torch(1e-3)

    def init_state():
        params, batch_stats = _init_variables(model, jax.random.PRNGKey(0),
                                              x[:2])
        return params, batch_stats, tx.init(params)

    bx, by = jnp.asarray(x[:16]), jnp.asarray(y[:16]).astype(jnp.float32)

    params, batch_stats, opt_state = init_state()
    jit_step = make_train_step(model, tx, loss_fn, augment=False)
    for i in range(3):
        params, batch_stats, opt_state, loss_jit, _ = jit_step(
            params, batch_stats, opt_state, bx, by, jax.random.PRNGKey(i))
    jit_params = jax.device_get(params)

    params, batch_stats, opt_state = init_state()
    probe = jax.random.PRNGKey(99)
    compiled, (params, batch_stats, opt_state), put_batch, put_rng = \
        aot_train_step(model, tx, loss_fn, params, batch_stats, opt_state,
                       (jax.ShapeDtypeStruct(bx.shape, bx.dtype),
                        jax.ShapeDtypeStruct(by.shape, by.dtype)),
                       probe, augment=False)
    abx, aby = put_batch(bx, by)
    for i in range(3):
        params, batch_stats, opt_state, loss_aot, _ = compiled(
            params, batch_stats, opt_state, abx, aby,
            put_rng(jax.random.PRNGKey(i)))
    aot_params = jax.device_get(params)

    assert float(loss_aot) == pytest.approx(float(loss_jit), rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(jit_params),
                    jax.tree_util.tree_leaves(aot_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_fit_checkpoint_resume_sharded(tmp_path):
    """Preemption resume composes with DP sharding and the AOT step: the
    restored host state is device_put into the compiled input formats."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    x, y = _synthetic_baseline(n=64)
    model = MLP(out_features=y.shape[-1])
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    sharding = NamedSharding(mesh, PartitionSpec("data"))
    kwargs = dict(loss_fn=lambda o, t: bce_with_logits(o, t, 4.0),
                  mode="baseline", lr=1e-3, batch_size=16, seed=39,
                  augment=False, patience=100, sharding=sharding,
                  checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=2)
    res1 = fit(model, x, y, x, y, epochs=4, **kwargs)
    assert res1.epochs_ran == 4
    res2 = fit(model, x, y, x, y, epochs=6, **kwargs)
    assert res2.epochs_ran == 2   # resumed at epoch 4
    # the resumed run continues improving from the restored state, not from
    # scratch: its first-epoch loss must not regress to res1's first-epoch
    assert res2.history[0]["train_loss"] < res1.history[0]["train_loss"]


def test_fit_checkpoint_resume_fsdp(tmp_path):
    """Preemption resume composes with FSDP: the restored host state is
    device_put back into the compiled (sharded) input formats and training
    continues from the checkpointed epoch."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    x, y = _synthetic_baseline(n=64, f=256)
    model = MLP(out_features=y.shape[-1])
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    sharding = NamedSharding(mesh, PartitionSpec("data"))
    kwargs = dict(loss_fn=lambda o, t: bce_with_logits(o, t, 4.0),
                  mode="baseline", lr=1e-3, batch_size=16, seed=39,
                  augment=False, patience=100, sharding=sharding, fsdp=True,
                  checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=2)
    res1 = fit(model, x, y, x, y, epochs=4, **kwargs)
    assert res1.epochs_ran == 4
    res2 = fit(model, x, y, x, y, epochs=6, **kwargs)
    assert res2.epochs_ran == 2
    assert res2.history[0]["train_loss"] < res1.history[0]["train_loss"]


def test_fit_train_dtype_bf16():
    """fit(train_dtype="bfloat16") — the measured throughput configuration
    (BASELINE.md r3 training tables) — must train end to end: params and
    Adam moments live in bf16, BatchNorm running stats stay f32, batches
    cast in-graph, in-loop eval runs the bf16 weights, and the model still
    LEARNS on separable data. f32 default paths are untouched."""
    import jax
    import jax.numpy as jnp

    x, y = _synthetic_baseline()
    model = MLP(out_features=y.shape[-1])
    res = fit(model, x, y, x, y,
              loss_fn=lambda o, t: bce_with_logits(o, t, pos_weight=4.0),
              mode="baseline", lr=5e-3, epochs=20, batch_size=16,
              seed=39, weight_decay=1e-3, patience=150, augment=False,
              train_dtype="bfloat16")
    assert res.epochs_ran == 20
    leaves = jax.tree_util.tree_leaves(res.best_params)
    assert all(l.dtype == jnp.bfloat16 for l in leaves)
    stats = jax.tree_util.tree_leaves(res.best_batch_stats)
    assert all(l.dtype == jnp.float32 for l in stats)
    assert res.history[-1]["f1_score"] > res.history[0]["f1_score"]
    assert np.isfinite(res.history[-1]["train_loss"])

    with pytest.raises(ValueError, match="train_dtype"):
        fit(model, x, y, x, y,
            loss_fn=lambda o, t: bce_with_logits(o, t),
            mode="baseline", lr=1e-3, epochs=1, batch_size=16,
            seed=0, augment=False, train_dtype="fp8")
