"""Data-parallel training and collective tests on the 8-device CPU mesh
(SURVEY.md §2.5 consequences 1-2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from multi_modal_csi_tpu.core.config import Config
from multi_modal_csi_tpu.losses.basic import bce_with_logits
from multi_modal_csi_tpu.models.csi.mlp import MLP
from multi_modal_csi_tpu.models.csi.ssl import info_nce
from multi_modal_csi_tpu.parallel.mesh import batch_sharding, create_mesh
from multi_modal_csi_tpu.runners.csi import run_csi_model
from multi_modal_csi_tpu.train.loop import fit


def _synth(n=64, f=16, out=18, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, f)).astype(np.float32)
    w = rng.normal(size=(f, out))
    y = (x @ w > 0).astype(np.int64)
    return x, y


def test_fit_with_batch_sharding_matches_unsharded():
    x, y = _synth()
    mesh = create_mesh({"data": 8, "model": 1})
    sharding = batch_sharding(mesh, 1)
    kwargs = dict(loss_fn=lambda o, t: bce_with_logits(o, t, 4.0),
                  mode="baseline", lr=1e-3, epochs=3, batch_size=16,
                  seed=39, augment=False, patience=50)
    model = MLP(out_features=y.shape[-1])
    res_sharded = fit(model, x, y, x, y, sharding=sharding, **kwargs)
    res_plain = fit(model, x, y, x, y, **kwargs)
    # identical rng + data order -> identical training trajectory; GSPMD
    # batch-sharding must not change the numerics (batch stats are global)
    a = res_sharded.history[-1]
    b = res_plain.history[-1]
    assert a["train_loss"] == pytest.approx(b["train_loss"], rel=1e-4)
    assert a["f1_score"] == pytest.approx(b["f1_score"], rel=1e-4)


def test_runner_use_mesh():
    x, y = _synth(n=40, f=12, out=54)
    y3 = y.reshape(40, 6, 9)
    cfg = Config().override({"model": "MLP", "repeat": 1, "nn.epoch": 2,
                             "nn.batch_size": 8, "nn.patience": 5})
    result = run_csi_model(cfg, data=(x[:32], x[32:], y3[:32], y3[32:]),
                           use_mesh=True)
    assert 0.0 <= result["accuracy"]["avg"] <= 1.0


def test_info_nce_cross_chip_gather_matches_global(rng):
    """shard_map InfoNCE with a real all-gather == single-device InfoNCE on
    the full batch (restores SSL_model.py:395-414's disabled intent)."""
    from jax.experimental.shard_map import shard_map
    mesh = create_mesh({"data": 8, "model": 1})
    z1 = rng.normal(size=(16, 8)).astype(np.float32)
    z2 = rng.normal(size=(16, 8)).astype(np.float32)

    global_loss = float(info_nce(z1, z2))

    def local_fn(a, b):
        return info_nce(a, b, gather_axis="data")[None]

    sharded = shard_map(local_fn, mesh=mesh,
                        in_specs=(P("data"), P("data")),
                        out_specs=P("data"))
    per_device = np.asarray(sharded(z1, z2))
    # every device computes the identical global loss
    np.testing.assert_allclose(per_device, global_loss, rtol=1e-5)


def test_psum_pmean_identity_outside_mesh():
    from multi_modal_csi_tpu.parallel.collectives import pmean, psum
    x = jnp.ones((4,))
    np.testing.assert_array_equal(np.asarray(psum(x)), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(pmean(x)), np.asarray(x))


def test_fsdp_fit_matches_unsharded():
    """FSDP (params + optimizer moments sharded over 'data',
    parallel/partition.py::fsdp_spec): numerically identical to replicated
    DP, with each device holding ~1/8 of every large parameter."""
    x, y = _synth(n=64, f=256, out=18)   # first kernel (256, 256): shardable
    mesh = create_mesh({"data": 8, "model": 1})
    sharding = batch_sharding(mesh, 1)
    kwargs = dict(loss_fn=lambda o, t: bce_with_logits(o, t, 4.0),
                  mode="baseline", lr=1e-3, epochs=3, batch_size=16,
                  seed=39, augment=False, patience=50)
    model = MLP(out_features=y.shape[-1])
    res_fsdp = fit(model, x, y, x, y, sharding=sharding, fsdp=True, **kwargs)
    res_plain = fit(model, x, y, x, y, **kwargs)
    a, b = res_fsdp.history[-1], res_plain.history[-1]
    assert a["train_loss"] == pytest.approx(b["train_loss"], rel=1e-4)
    assert a["f1_score"] == pytest.approx(b["f1_score"], rel=1e-4)
    # the memory claim: large leaves are materially sharded
    from multi_modal_csi_tpu.parallel.partition import fsdp_spec
    import jax.tree_util as jtu
    leaves = jtu.tree_leaves_with_path(res_fsdp.best_params)
    checked = 0
    for path, leaf in leaves:
        if fsdp_spec(np.shape(leaf), mesh) == P():
            continue
        if not hasattr(leaf, "addressable_shards"):
            continue   # best_params may be host numpy; skip
        shard = leaf.addressable_shards[0].data
        assert shard.size * 8 == leaf.size, (path, shard.shape, leaf.shape)
        checked += 1
    # best_params are fetched to host by fit; verify the SPEC logic instead
    spec = fsdp_spec((256, 256), mesh)
    assert spec == P("data", None) or spec == P(None, "data")
    small = fsdp_spec((16,), mesh)
    assert small == P()


def test_local_rows_dedupes_replicated_axis():
    """_local_rows must not double-count devices that REPLICATE a row span
    (the 'model' axis under DP+TP): all 8 single-host devices cover [0, 16)
    with each span shared by two model-axis devices."""
    from multi_modal_csi_tpu.data.pipeline import _local_rows
    mesh = create_mesh({"data": 4, "model": 2})
    sharding = batch_sharding(mesh, 2)
    lo, hi = _local_rows(sharding, (16, 4))
    assert (lo, hi) == (0, 16)
