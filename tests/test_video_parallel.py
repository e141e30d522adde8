"""Data-parallel video training on the 8-device CPU mesh (VERDICT r3 next
#1: the video engine gets the mesh — SURVEY §2.5.1; reference engine being
parallelized: benchmark/video/train.py:19-103).

Numerics note: the trajectory comparisons run at lr=1e-6. Adam's first
steps are ~lr*sign(grad), so any f32 reduction-order noise on a near-zero
gradient flips a whole ±lr of update — at production lr that amplifies
through a 18-layer BN'd conv net within an epoch (measured: single-step
loss parity 5e-7, params already ±2lr). Tiny lr bounds the sign-noise to
the tolerance scale, making "GSPMD sharding does not change the numerics"
a stable, meaningful assertion (the CSI mirror at test_data_parallel.py:27
gets away with production lr only because MLP is shallow and separable).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_csi_tpu.core.config import Config
from multi_modal_csi_tpu.data.video_io import ArrayClips
from multi_modal_csi_tpu.models import video as V
from multi_modal_csi_tpu.parallel.mesh import batch_sharding, create_mesh
from multi_modal_csi_tpu.runners.video import fit_video, run_video_model


def _synth_clips(n=16, t=4, hw=16, out=6, seed=0):
    """Separable labels (per-channel spatial means -> linear -> sign) so
    gradients are well away from zero."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, t, hw, hw, 3)).astype(np.float32)
    w = rng.normal(size=(3, out))
    y = (x.mean(axis=(1, 2, 3)) @ w > 0).astype(np.int64)
    return ArrayClips(x, y), ArrayClips(x[:8], y[:8])


def _tree_close(a, b, rtol=1e-4, atol=1e-5):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(b))
    for path, la in flat_a:
        np.testing.assert_allclose(np.asarray(la), np.asarray(flat_b[path]),
                                   rtol=rtol, atol=atol, err_msg=str(path))


_KW = dict(lr=1e-6, epochs=2, batch_size=8, seed=39, threshold=0.5,
           verbose=False)


@functools.lru_cache(maxsize=1)
def _plain_run():
    train, test = _synth_clips()
    model = V.ResNet3D18(out_features=6)
    best, acc = fit_video(model, train, test, **_KW)
    return best, acc


def test_fit_video_sharded_matches_unsharded():
    """Batch-sharded fit_video == single-device numerics: identical rng and
    data order, GSPMD gradient psum, GLOBAL batch stats (BN reduces over the
    full sharded batch under jit)."""
    train, test = _synth_clips()
    mesh = create_mesh({"data": 8, "model": 1})
    sharding = batch_sharding(mesh, 1)
    model = V.ResNet3D18(out_features=6)
    best_s, acc_s = fit_video(model, train, test, sharding=sharding, **_KW)
    best_p, acc_p = _plain_run()
    assert acc_s == pytest.approx(acc_p, abs=1e-6)
    _tree_close(best_s[0], best_p[0], atol=1e-6)
    _tree_close(best_s[1], best_p[1], atol=1e-6)


def test_fit_video_fsdp_matches_unsharded():
    """fit_video(fsdp=True): ZeRO-3-style param + moment sharding over the
    'data' axis through the production AOT step — numerics == replicated."""
    train, test = _synth_clips()
    mesh = create_mesh({"data": 8, "model": 1})
    sharding = batch_sharding(mesh, 1)
    model = V.ResNet3D18(out_features=6)
    best_f, acc_f = fit_video(model, train, test, sharding=sharding,
                              fsdp=True, **_KW)
    best_p, acc_p = _plain_run()
    assert acc_f == pytest.approx(acc_p, abs=1e-6)
    _tree_close(best_f[0], best_p[0], atol=1e-6)


def test_fit_video_sharded_small_dataset():
    """A test set SMALLER than batch_size and not divisible by the data-axis
    size must not crash the sharded evaluator: the eval chunk pads up to a
    device-count multiple (parallel/mesh.py::batch_divisor)."""
    train, _ = _synth_clips(n=16)
    rng = np.random.default_rng(7)
    xs = rng.normal(size=(5, 4, 16, 16, 3)).astype(np.float32)
    ys = (rng.normal(size=(5, 6)) > 0).astype(np.int64)
    test = ArrayClips(xs, ys)
    mesh = create_mesh({"data": 8, "model": 1})
    sharding = batch_sharding(mesh, 1)
    model = V.ResNet3D18(out_features=6)
    _, acc = fit_video(model, train, test, sharding=sharding, **_KW)
    assert 0.0 <= acc <= 1.0


def test_run_video_model_use_mesh():
    """The runner's use_mesh path (cli/run_video.py --mesh): config-resolved
    mesh, end-to-end through eval + classification report."""
    train, test = _synth_clips(n=16)
    cfg = Config().override({"model": "ResNet", "repeat": 1, "nn.epoch": 1,
                             "nn.batch_size": 8})
    result = run_video_model(
        cfg, data=(train.x, test.x, train.y, test.y), use_mesh=True)
    assert 0.0 <= result["accuracy"]["avg"] <= 1.0


def test_fit_video_bf16_sharded():
    """The measured video throughput configuration (bf16) composes with the
    mesh: bf16 params/moments, sharded batches, finite accuracy."""
    train, test = _synth_clips(n=16)
    mesh = create_mesh({"data": 8, "model": 1})
    sharding = batch_sharding(mesh, 1)
    model = V.ResNet3D18(out_features=6)
    best, acc = fit_video(model, train, test, lr=1e-3, epochs=1,
                          batch_size=8, seed=39, threshold=0.5,
                          verbose=False, train_dtype="bfloat16",
                          sharding=sharding)
    assert 0.0 <= acc <= 1.0
    assert all(l.dtype == jnp.bfloat16
               for l in jax.tree_util.tree_leaves(best[0]))
