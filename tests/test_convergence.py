"""Synthetic-data learnability for the HARD training families (VERDICT r3
next #6): the set-prediction family (Hungarian loss, zero-init queries) and
a video backbone. The shallow-MLP case lives in test_train_engine.py;
these prove the difficult dynamics actually learn — the hermetic equivalent
of the reference's statistical-repetition correctness check (SURVEY §4.2).

Calibration (CPU, measured while writing the tests): DETR-tiny reaches
100% test PPP by epoch ~18 at lr 2e-3 / 3 warmup epochs; ResNet3D18 drops
train loss 10x in 6 epochs with subset accuracy 8x above the 2^-6 chance
floor (eval-mode accuracy lags the train loss because BN running stats
need steps to converge at momentum 0.9)."""

import numpy as np

from multi_modal_csi_tpu.data.video_io import ArrayClips
from multi_modal_csi_tpu.losses.matching import HungarianMatchingLoss
from multi_modal_csi_tpu.models.csi.detr import DETRMultiUser
from multi_modal_csi_tpu.models.video.resnet3d import ResNet3D18
from multi_modal_csi_tpu.runners.video import fit_video
from multi_modal_csi_tpu.train.loop import fit


def test_detr_tiny_learns_set_prediction():
    """Two prototype clusters with distinct 5-user label sets: the loss must
    fall AND perfect-prediction-% must beat chance decisively — i.e. the
    Hungarian matching is genuinely assigning queries to users, not
    collapsing (chance PPP for 5 users x 10 classes is ~1e-3 %)."""
    rng = np.random.default_rng(0)
    n, T, F, U, C = 64, 60, 30, 5, 10
    protos = rng.normal(size=(2, T, F)).astype(np.float32) * 2
    labels = np.zeros((2, U, C), np.float32)
    labels[0, np.arange(U), [1, 2, 3, 4, 5]] = 1
    labels[1, np.arange(U), [5, 4, 3, 2, 1]] = 1
    which = rng.integers(0, 2, size=n)
    x = protos[which] + rng.normal(size=(n, T, F)).astype(np.float32) * 0.1
    y = labels[which]

    model = DETRMultiUser(token_length=10, num_decoder_layers=2,
                          temp_cross=2.0, num_queries=U, dim_feedforward=64)
    res = fit(model, x, y, x, y, loss_fn=HungarianMatchingLoss(),
              mode="multi_head", lr=2e-3, epochs=25, batch_size=16, seed=39,
              weight_decay=1e-4, augment=False, patience=150, batch_axis=1,
              warmup_epochs=3)
    first, last = res.history[0], res.history[-1]
    assert last["train_loss"] < first["train_loss"] - 0.5, (first, last)
    assert last["perfect_prediction_percentage_test"] >= 50.0, last
    assert res.best_epoch >= 0   # the strict F1+PPP rule fired


def test_resnet3d_learns():
    """ResNet3D18 on separable synthetic clips through the production
    fit_video: train loss must fall ~10x and subset accuracy must beat the
    2^-6 all-bits chance floor by >= 5x."""
    rng = np.random.default_rng(0)
    n, t, hw, out = 24, 4, 16, 6
    x = rng.normal(size=(n, t, hw, hw, 3)).astype(np.float32)
    w = rng.normal(size=(3, out))
    y = (x.mean(axis=(1, 2, 3)) @ w > 0).astype(np.int64)
    ds = ArrayClips(x, y)

    hist = []
    best, acc = fit_video(ResNet3D18(out_features=out), ds, ds,
                          lr=2e-3, epochs=6, batch_size=8, seed=39,
                          threshold=0.5, verbose=False, history=hist)
    assert hist[-1]["train_loss"] < hist[0]["train_loss"] * 0.2, hist
    assert acc >= 5 * 2 ** -6, (acc, hist)


def test_that_encoder_tiny_learns_per_layer_matching():
    """THAT_ENCODER is the chaos-limited family (train-step parity window is
    2 steps — PARITY.md); this proves its distinctive dynamics — per-LAYER
    Hungarian matching over weight-shared decoder layers with per-layer aux
    heads (reference that_encoder.py:314-382, 677-856) — genuinely train:
    loss falls and final-layer PPP beats the ~1e-3 % chance floor decisively
    (VERDICT r4 next #5)."""
    from multi_modal_csi_tpu.models.csi.that_encoder import THATEncoderDETR

    rng = np.random.default_rng(0)
    n, T, F, U = 64, 60, 30, 5
    protos = rng.normal(size=(2, T, F)).astype(np.float32) * 2
    labels = np.zeros((2, U, 10), np.float32)
    labels[0, np.arange(U), [1, 2, 3, 4, 5]] = 1
    labels[1, np.arange(U), [5, 4, 3, 2, 1]] = 1
    which = rng.integers(0, 2, size=n)
    x = protos[which] + rng.normal(size=(n, T, F)).astype(np.float32) * 0.1
    y = labels[which]

    model = THATEncoderDETR(temp_cross=2.0, num_queries=U,
                            num_decoder_layers=2)
    res = fit(model, x, y, x, y,
              loss_fn=HungarianMatchingLoss(per_layer_matching=True),
              mode="multi_head", lr=2e-3, epochs=25, batch_size=16, seed=39,
              weight_decay=2e-4, augment=False, patience=150, batch_axis=1,
              warmup_epochs=3)
    first, last = res.history[0], res.history[-1]
    assert last["train_loss"] < first["train_loss"] - 0.5, (first, last)
    assert last["perfect_prediction_percentage_test"] >= 50.0, last
    assert res.best_epoch >= 0


def test_ssl_tiny_learns_representation():
    """SSL (SimCLR) through the production run_ssl loop: the composite
    InfoNCE + online-head BCE loss must fall AND the final full-test-set
    online-head accuracy must decisively beat the majority-pattern baseline
    (~0.5 on two balanced clusters) — i.e. the stop-gradient online probe
    linearly separates the learned representation (reference
    train_ssl.py:16-91, inference_only.py:47-90; VERDICT r4 next #5)."""
    from multi_modal_csi_tpu.core.config import Config
    from multi_modal_csi_tpu.runners.ssl import run_ssl

    rng = np.random.default_rng(0)
    # T >= 393: the CNN_1D trunk (k29/s13 -> k15/s7 -> k3/s1, VALID) needs
    # that much time to keep a non-empty global-mean axis.
    n, T, F, d = 64, 400, 30, 4
    protos = rng.normal(size=(2, T, F)).astype(np.float32) * 2
    labels = np.asarray([[1, 0, 1, 0], [0, 1, 0, 1]], np.float32)
    which = rng.integers(0, 2, size=n)
    x = protos[which] + rng.normal(size=(n, T, F)).astype(np.float32) * 0.1
    y = labels[which]

    cfg = Config().override({"model": "SSL", "repeat": 1, "nn.epoch": 10,
                             "nn.batch_size": 16, "nn.lr": 1e-3})
    hist = []
    result = run_ssl(cfg, data=(x, x, y, y), history=hist)
    assert hist[-1]["train_loss"] < hist[0]["train_loss"] - 0.5, \
        (hist[0], hist[-1])
    assert result["accuracy"]["avg"] >= 0.9, (result["accuracy"], hist)
