"""Device mesh construction and sharding helpers.

The reference is strictly single-process/single-device (SURVEY.md §2.5); this
module IS the TPU-native execution model it lacks: a named mesh over ICI with
  - 'data'  : batch (data-parallel) axis — gradients all-reduce implicitly
              under jit (GSPMD inserts the psum);
  - 'model' : tensor-parallel axis for attention heads / FFN shards.

Everything trains through plain jax.jit: arrays carry NamedShardings, XLA
inserts the collectives, and the same code runs on 1 chip or a full slice.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host initialization (jax.distributed) — the TPU-native
    equivalent of the communication backend the reference never activates
    (SURVEY.md §5.8). With NO arguments, defers to jax's cloud environment
    auto-detection (GKE JobSet / TPU-VM metadata — jobs/
    tpu-multihost-jobset.yaml); num_processes=1 is an explicit no-op.
    Idempotent."""
    if num_processes == 1:
        return
    if coordinator_address is None and num_processes is None \
            and process_id is None:
        try:
            jax.distributed.initialize()      # cloud auto-detection
        except (RuntimeError, ValueError):
            pass  # already initialized, or single-process environment
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        pass  # already initialized


def create_mesh(axis_sizes: Optional[Dict[str, int]] = None,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a Mesh with named axes ('data', 'model').

    axis_sizes: e.g. {"data": 4, "model": 2}. Defaults to all devices on
    'data'. Sizes must multiply to the device count.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = {DATA_AXIS: n, MODEL_AXIS: 1}
    names = tuple(axis_sizes.keys())
    sizes = tuple(axis_sizes.values())
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh {axis_sizes} does not cover {n} devices")
    mesh_devices = np.array(devices).reshape(sizes)
    return Mesh(mesh_devices, names)


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def config_batch_sharding(cfg) -> Optional[NamedSharding]:
    """Batch sharding over the config's resolved mesh axes (cfg.mesh —
    core/config.py::MeshConfig); None on a single device. Shared by both
    runners' --mesh paths. P('data') with rank 1 shards axis 0 and
    replicates all trailing dims regardless of batch rank."""
    if jax.device_count() <= 1:
        return None
    axes = cfg.mesh.resolved(jax.device_count())
    return batch_sharding(create_mesh(axes), 1)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_divisor(sharding: NamedSharding) -> int:
    """How many ways `sharding` splits the batch (axis 0) — device_put
    requires the batch dim to be a multiple of this, so eval chunks must
    pad up to it (a 5-clip test set on an 8-device 'data' mesh otherwise
    crashes the sharded evaluators)."""
    spec0 = sharding.spec[0] if len(sharding.spec) else None
    if spec0 is None:
        return 1
    axes = spec0 if isinstance(spec0, tuple) else (spec0,)
    return int(np.prod([sharding.mesh.shape[a] for a in axes]))


def shard_batch(mesh: Mesh, *arrays):
    """Place arrays with batch-axis sharding on the mesh."""
    out = tuple(jax.device_put(a, batch_sharding(mesh, np.ndim(a)))
                for a in arrays)
    return out if len(out) > 1 else out[0]
