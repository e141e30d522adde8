"""Video experiment driver.

Mirrors benchmark/video/run.py:37-99 + video/train.py:19-176:
  - annotation filter (environment + num_users, no wifi_band), split with
    seed 39 (video/run.py:56-59);
  - template runner per backbone: seed r+39, Adam(lr 1e-4), BCE(pos_weight=1);
  - per-epoch: train over all batches, then FULL evaluation on train AND test
    sets; best weights by test subset-accuracy alone;
  - optional warm-start/save via cfg.path.save_model.

STREAMING: training and eval consume a lazy ClipDataset through
prefetch_batches (data/video_io.py) — the counterpart of the reference's
VideoDataset + DataLoader(num_workers=4) (video/load_data.py:20-61,
video/train.py:47,134). Host memory is bounded by
O((prefetch + workers) x batch), never the clip set (11,286 WiMANS clips
x ~27 MB would be ~300 GB materialized).

Documented divergence: training uses n // batch_size FULL batches per epoch
(static shapes, one compiled step), whereas the reference's DataLoader also
trains on the partial final batch (drop_last=False). Eval covers every
sample in both (the tail eval chunk is zero-padded and the padding sliced
off). At WiMANS scale the dropped tail is < 1 batch per epoch under a
reshuffled permutation each epoch, so every sample still trains with
probability 1 over epochs.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from sklearn.metrics import accuracy_score, classification_report
from sklearn.model_selection import train_test_split

from ..core.checkpoint import load_components, save_components
from ..core.config import Config
from ..data.annotation import filter_annotation, label_list, load_annotation
from ..data.encoders import encode_labels
from ..data.pipeline import epoch_batches, pad_to
from ..data.video_io import ArrayClips, ClipDataset, prefetch_batches
from ..losses.basic import bce_with_logits
from ..models import video as video_models
from ..train.loop import (adam_like_torch, aot_train_step, cast_for_serving,
                          host_snapshot, host_value, make_eval_fn,
                          make_train_step)
from ..utils.complexity import complexity_report

VIDEO_MODELS: Dict[str, Callable[[int], Any]] = {
    "ResNet": lambda out: video_models.ResNet3D18(out_features=out),
    "S3D": lambda out: video_models.S3D(out_features=out),
    "MViT-v1": lambda out: video_models.mvit_v1_b(out),
    "MViT-v2": lambda out: video_models.mvit_v2_s(out),
    "Swin-T": lambda out: video_models.swin3d_t(out),
    "Swin-S": lambda out: video_models.swin3d_s(out),
}


def load_video_data(cfg: Config) -> Tuple[ClipDataset, ClipDataset]:
    """Lazy train/test ClipDatasets over the preprocessed cache dir."""
    df = load_annotation(cfg.path.data_y)
    df = filter_annotation(df, environment=cfg.data.environment,
                           num_users=cfg.data.num_users)
    tr_df, te_df = train_test_split(df, test_size=0.2, shuffle=True,
                                    random_state=39)
    y_tr = encode_labels(tr_df, cfg.task, cfg.encoding_activity,
                         cfg.encoding_location)
    y_te = encode_labels(te_df, cfg.task, cfg.encoding_activity,
                         cfg.encoding_location)
    train = ClipDataset(cfg.path.video_pre_x, label_list(tr_df),
                        y_tr.reshape(y_tr.shape[0], -1),
                        cfg.data.frame_stride)
    test = ClipDataset(cfg.path.video_pre_x, label_list(te_df),
                       y_te.reshape(y_te.shape[0], -1),
                       cfg.data.frame_stride)
    return train, test


def _eval_rows(n: int, chunk: int) -> list:
    return [np.arange(s, min(s + chunk, n)) for s in range(0, n, chunk)]


def _evaluate(forward, params, batch_stats, dataset, threshold, chunk=16,
              num_workers: int = 4, dtype=None, sharding=None):
    """Streaming full-dataset eval: every sample scored (tail chunk padded
    on device input, padding sliced off the logits). `dtype` casts input
    chunks for serving-precision inference (params already cast).
    `sharding` places each chunk batch-sharded over the mesh (single-process
    meshes only; multi-host eval replicates the identical host data, like
    the CSI engine's eval_dataset)."""
    n = len(dataset)
    chunk = min(chunk, max(1, n))
    shard_eval = sharding is not None and jax.process_count() == 1
    if shard_eval:
        # device_put needs the batch dim divisible by the data-axis size;
        # a dataset smaller than batch_size (chunk = min above) would
        # otherwise crash — round the chunk UP and let pad_to fill it
        from ..parallel.mesh import batch_divisor
        div = batch_divisor(sharding)
        chunk = -(-chunk // div) * div
    outs = []
    for bx, _ in prefetch_batches(dataset, _eval_rows(n, chunk),
                                  num_workers=num_workers):
        size = bx.shape[0]
        bx = pad_to(bx, chunk)
        if dtype is not None:
            bx = jnp.asarray(bx, dtype)
        if shard_eval:
            bx = jax.device_put(bx, sharding)
        out = forward(params, batch_stats, bx)
        # host_value, not np.asarray: multi-host FSDP params make the jit
        # output non-addressable (train/loop.py::host_value gathers it)
        out = host_value(out.astype(jnp.float32) if dtype is not None else out)
        outs.append(out[:size])
    logits = np.concatenate(outs, axis=0)
    y_flat = dataset.y
    pred = (1 / (1 + np.exp(-logits)) > threshold).astype(int)
    acc = accuracy_score(y_flat.astype(int),
                         pred.reshape(-1, y_flat.shape[-1]))
    return acc, pred, logits


def fit_video(model, train_ds, test_ds, *, lr: float,
              epochs: int, batch_size: int, seed: int, threshold: float,
              init_variables=None, verbose: bool = True,
              num_workers: int = 4, train_dtype=None,
              sharding=None, fsdp: bool = False, history=None):
    """Video engine (video/train.py:19-103): best weights by test accuracy.

    train_ds/test_ds: ClipDataset (streaming) or ArrayClips (in-memory).
    `train_dtype="bfloat16"` is the measured throughput configuration
    (BASELINE.md video training table: conv backbones +16-24%, MViT +15%
    after the flash backward; Swin ~neutral) — same dtype placement as
    the CSI engine's knob (train/loop.py::fit).

    `sharding` (a batch NamedSharding over a 'data' mesh axis) turns the
    loop data-parallel: batches shard over the mesh, state replicates (or
    ZeRO-3-shards with `fsdp=True`), GSPMD inserts the gradient psum —
    identical numerics to the single-device loop (batch stats are global).
    Multi-host: each process's loader fetches only its host-local rows of
    every global batch (clips never leave their host), assembled via
    make_array_from_process_local_data; eval replicates the identical
    host-side dataset like the CSI engine. batch_size must divide by the
    'data' axis size. Parallelizes the reference's single-GPU video engine
    (video/train.py:19-103) — SURVEY §2.5.1."""
    rng = jax.random.PRNGKey(seed)
    np_rng = np.random.default_rng(seed)
    init_rng, rng = jax.random.split(rng)
    if init_variables is None:
        variables = model.init({"params": init_rng},
                               jnp.asarray(train_ds.example()), train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
    else:
        params, batch_stats = init_variables
    batch_dtype = None
    if train_dtype in ("bfloat16", jnp.bfloat16):
        batch_dtype = jnp.bfloat16
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if getattr(a, "dtype", None) == jnp.float32 else a, params)
    elif train_dtype not in (None, "float32", jnp.float32):
        raise ValueError(f"unsupported train_dtype {train_dtype!r}")
    tx = adam_like_torch(lr)
    opt_state = tx.init(params)

    # AOT layout-pinned donated step (train/loop.py::aot_train_step): one
    # compile, no layout-churn recompiles, opt state updated in place —
    # matters at video-backbone sizes (33-50 M params). No augmentation
    # (the reference's video engine has none, video/train.py:19-103).
    loss_fn = bce_with_logits    # pos_weight=None == reference's pos_weight 1
    ex = train_ds.example()
    bx_s = jax.ShapeDtypeStruct((batch_size,) + ex.shape[1:],
                                np.dtype(ex.dtype))
    by_s = jax.ShapeDtypeStruct((batch_size,) + train_ds.y.shape[1:],
                                np.dtype(train_ds.y.dtype))
    put_batch = put_rng = None
    try:
        rng, probe = jax.random.split(rng)
        step, (params, batch_stats, opt_state), put_batch, put_rng = \
            aot_train_step(model, tx, loss_fn, params, batch_stats,
                           opt_state, (bx_s, by_s), probe, augment=False,
                           sharding=sharding, fsdp=fsdp,
                           batch_dtype=batch_dtype)
    except Exception as e:
        import warnings
        warnings.warn(f"AOT video train-step lowering failed ({e!r}); "
                      "falling back to plain jit")
        step = make_train_step(model, tx, loss_fn, augment=False,
                               batch_dtype=batch_dtype)

    # multi-host: every process sees the same seeded index matrix but loads
    # only ITS rows of each global batch (data/pipeline.py::_local_rows)
    multihost = sharding is not None and jax.process_count() > 1
    if multihost:
        from ..data.pipeline import _local_rows
        gx_shape = (batch_size,) + ex.shape[1:]
        gy_shape = (batch_size,) + train_ds.y.shape[1:]
        row_lo, row_hi = _local_rows(sharding, gx_shape)

    forward = make_eval_fn(model)
    best_acc = 0.0
    # host_snapshot, not device_get: FSDP state on a multi-host mesh is not
    # fully addressable and device_get raises (train/loop.py::host_snapshot)
    best = (host_snapshot(params), host_snapshot(batch_stats))
    n = len(train_ds)
    for epoch in range(epochs):
        t0 = time.time()
        # all-full batches; partial tail dropped for static shapes (see
        # module docstring: documented divergence from DataLoader's
        # drop_last=False)
        idx = epoch_batches(n, batch_size, np_rng, skip_last=False)
        fetch_idx = idx[:, row_lo:row_hi] if multihost else idx
        loss = jnp.zeros(())
        for bx, by in prefetch_batches(train_ds, fetch_idx,
                                       num_workers=num_workers):
            rng, srng = jax.random.split(rng)
            if multihost:
                bx = jax.make_array_from_process_local_data(
                    sharding, bx, gx_shape)
                by = jax.make_array_from_process_local_data(
                    sharding, by, gy_shape)
            elif sharding is not None:
                bx = jax.device_put(bx, sharding)
                by = jax.device_put(by, sharding)
            if put_batch is not None:
                # ONE host->device transfer straight into the compiled
                # formats (jnp.asarray first would upload a second copy)
                bx, by = put_batch(bx, by)
                srng = put_rng(srng)
            elif sharding is None:
                bx, by = jnp.asarray(bx), jnp.asarray(by)
            params, batch_stats, opt_state, loss, _ = step(
                params, batch_stats, opt_state, bx, by, srng)
        train_acc, _, _ = _evaluate(forward, params, batch_stats, train_ds,
                                    threshold, chunk=batch_size,
                                    num_workers=num_workers,
                                    dtype=batch_dtype, sharding=sharding)
        test_acc, _, test_logits = _evaluate(forward, params, batch_stats,
                                             test_ds, threshold,
                                             chunk=batch_size,
                                             num_workers=num_workers,
                                             dtype=batch_dtype,
                                             sharding=sharding)
        if verbose:
            print(f"Epoch {epoch}/{epochs} - {time.time() - t0:.3f}s "
                  f"- Loss {float(loss):.6f} - Accuracy {train_acc:.6f} "
                  f"- Test Accuracy {test_acc:.6f}")
        if history is not None:
            # per-epoch record mirroring the reference loop's printed line
            # (video/train.py:88-94): last-batch train loss, full train-set
            # accuracy, full test-set accuracy
            history.append({"epoch": epoch, "train_loss": float(loss),
                            "train_acc": float(train_acc),
                            "test_acc": float(test_acc)})
        if test_acc > best_acc:
            best_acc = test_acc
            best = (host_snapshot(params), host_snapshot(batch_stats))
    return best, best_acc


_TORCHVISION_ARCH = {
    "ResNet": "r3d_18", "S3D": "s3d", "Swin-T": "swin3d_t",
    "Swin-S": "swin3d_s", "MViT-v1": "mvit_v1_b", "MViT-v2": "mvit_v2_s",
}


def load_video_pretrained(path: str, model_key: str, out_dim: int, v0,
                          clip_shape):
    """cfg.pretrained_path for the video runner: a converted `.msgpack`
    (tools/convert_torchvision.py output) loads directly; a raw torchvision
    `.pt`/`.pth` state_dict is converted in-process through the same strict
    converter (reference init sites: video/model/resnet.py:33, s3d.py:33,
    swin_t.py:34, mvit_v1.py:33-45). MViT pos/rel tables are resized to the
    configured clip size. The result is shape-checked against the live
    model's init tree before use."""
    if path.endswith((".pt", ".pth")):
        import torch
        try:
            ckpt = torch.load(path, map_location="cpu", weights_only=True)
        except TypeError:            # older torch without weights_only
            ckpt = torch.load(path, map_location="cpu")
        if hasattr(ckpt, "state_dict"):
            ckpt = ckpt.state_dict()
        if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
            ckpt = ckpt["model_state_dict"]
        try:
            from tools.convert_torchvision import (CONVERTERS,
                                                   resize_mvit_tables)
        except ImportError as e:
            raise ImportError(
                "converting a raw torchvision checkpoint requires "
                "tools/convert_torchvision.py (run from a repo checkout, "
                "or convert offline to .msgpack first)") from e
        arch = _TORCHVISION_ARCH[model_key]
        params, stats = CONVERTERS[arch](ckpt, out_dim)
        if arch.startswith("mvit"):
            # clip_shape is the (1, T, H, W, 3) example probe
            params = resize_mvit_tables(params, arch[5:7],
                                        tuple(clip_shape[1:4]))
    else:
        saved = load_components(path, like={
            "params": v0["params"],
            "batch_stats": v0.get("batch_stats", {})})
        params, stats = saved["params"], saved["batch_stats"]
    shape = lambda t: jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), t)
    if shape(params) != shape(v0["params"]):
        raise ValueError(
            f"pretrained tree for {model_key} does not match the model's "
            "init tree (wrong arch, head width, or clip size?)")
    # batch_stats too (ADVICE r3): an unchecked stats mismatch would only
    # surface later as an opaque flax-apply/jit error
    if shape(stats) != shape(v0.get("batch_stats", {})):
        raise ValueError(
            f"pretrained batch_stats for {model_key} do not match the "
            "model's init tree (wrong arch, head width, or clip size?)")
    return params, stats


def run_video_model(cfg: Config,
                    data: Optional[Tuple[np.ndarray, ...]] = None,
                    use_mesh: bool = False) -> Dict[str, Any]:
    """Run cfg.repeat seeded video experiments. With use_mesh, batches shard
    over the 'data' axis of the config mesh (cfg.mesh; fsdp via
    cfg.mesh.fsdp) — the multi-chip execution mode for the framework's
    heaviest training workload."""
    if cfg.model not in VIDEO_MODELS:
        raise ValueError(f"unknown video model: {cfg.model}")
    sharding = None
    if use_mesh:
        from ..parallel.mesh import config_batch_sharding
        sharding = config_batch_sharding(cfg)
    if data is None:
        train_ds, test_ds = load_video_data(cfg)
    else:  # in-memory arrays (tests/sweeps): (x_tr, x_te, y_tr, y_te)
        x_tr, x_te, y_tr, y_te = data
        train_ds = ArrayClips(x_tr, y_tr.reshape(y_tr.shape[0], -1))
        test_ds = ArrayClips(x_te, y_te.reshape(y_te.shape[0], -1))
    y_te_flat = test_ds.y
    out_dim = train_ds.y.shape[-1]

    result: Dict[str, Any] = {}
    accuracies, times_train, times_test = [], [], []

    model0 = VIDEO_MODELS[cfg.model](out_dim)
    ex = jnp.asarray(train_ds.example())
    v0 = model0.init({"params": jax.random.PRNGKey(0)}, ex, train=False)
    result["complexity"] = complexity_report(model0, v0, ex)

    pretrained = None
    if cfg.pretrained_path:
        pretrained = load_video_pretrained(cfg.pretrained_path, cfg.model,
                                           out_dim, v0, np.shape(ex))

    for r in range(cfg.repeat):
        model = VIDEO_MODELS[cfg.model](out_dim)
        init_variables = pretrained
        if init_variables is None and cfg.path.save_model:
            try:  # warm start (video/model/resnet.py:106)
                saved = load_components(cfg.path.save_model,
                                        like={"params": v0["params"],
                                              "batch_stats": v0.get("batch_stats", {})})
                init_variables = (saved["params"], saved["batch_stats"])
            except FileNotFoundError:
                pass
        t0 = time.time()
        best, _ = fit_video(model, train_ds, test_ds,
                            lr=cfg.nn.lr, epochs=cfg.nn.epoch,
                            batch_size=cfg.nn.batch_size, seed=r + 39,
                            threshold=cfg.nn.threshold,
                            init_variables=init_variables,
                            train_dtype=cfg.train_dtype,
                            sharding=sharding, fsdp=cfg.mesh.fsdp)
        t1 = time.time()
        forward = make_eval_fn(model)
        # final inference — serving path. compute_dtype "auto" consults the
        # per-model measured table (core/config.py::SERVING_DTYPE_DEFAULTS —
        # bf16 HURTS Swin/MViT at serving batches); "bfloat16" forces.
        from ..core.config import resolve_serving_dtype
        ep, es = best
        dtype = None
        if resolve_serving_dtype(cfg.compute_dtype, cfg.model) == "bfloat16":
            dtype = jnp.bfloat16
            ep = cast_for_serving(ep, dtype)
            es = cast_for_serving(es, dtype)
        acc, pred, _ = _evaluate(forward, ep, es, test_ds,
                                 cfg.nn.threshold, chunk=cfg.nn.batch_size,
                                 dtype=dtype)
        result[f"repeat_{r}"] = classification_report(
            y_te_flat.astype(int), pred, digits=6, zero_division=0,
            output_dict=True)
        accuracies.append(acc)
        times_train.append(t1 - t0)
        times_test.append(time.time() - t1)
        if cfg.path.save_model:
            save_components(cfg.path.save_model, best[0], best[1])

    result["accuracy"] = {"avg": float(np.mean(accuracies)),
                          "std": float(np.std(accuracies))}
    result["time_train"] = {"avg": float(np.mean(times_train)),
                            "std": float(np.std(times_train))}
    result["time_test"] = {"avg": float(np.mean(times_test)),
                           "std": float(np.std(times_test))}
    return result
