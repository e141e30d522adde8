"""multi_modal_csi_tpu — a TPU-native framework for WiMANS-style multi-user
human activity sensing from WiFi CSI and synchronized RGB video.

Re-designed from scratch for TPU (JAX / XLA / pjit / Pallas) with the same
capabilities as the reference PyTorch benchmark `amirhosseinmhd/multi_modal_CSI`:

- offline preprocessing (raw CSI .mat -> amplitude .npy; .mp4 -> normalized clips)
- annotation-driven data selection + label encoding
- ~15 CSI models (MLP .. DETR-style set prediction) + 6 video clip models
- set-matching losses (Hungarian / permutation) vectorized on-device
- multi-user counting metrics (perfect-prediction %, count error, P/R/F1)
- sharded data/tensor-parallel training over a jax.sharding.Mesh
- checkpoint/transfer-learning restore, JSON result dumps, metric writers

Layout:
    core/      config tree, rng, checkpointing, experiment results
    data/      annotation filters, label encoders, splits, host input pipeline
    metrics/   multi-user counting metric suite (4 eval modes)
    nn/        flax modules with reference-matching initialization semantics
    models/    csi/ + video/ model families
    losses/    BCE(pos_weight), set-matching, InfoNCE, count losses
    train/     jit/scan training engine, schedules, in-graph augmentation
    parallel/  mesh construction, sharding rules, collectives
    kernels/   Pallas TPU kernels for hot ops
    runners/   per-family experiment drivers (repeat loop, seeding, results)
    cli/       command line entry points
"""

__version__ = "0.1.0"
