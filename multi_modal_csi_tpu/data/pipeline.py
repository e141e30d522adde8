"""Host-side input pipeline: shuffled full-batch iteration with device prefetch.

Reproduces the reference engine's batching contract (wifi_csi/train.py:48,80-82):
shuffle each epoch, fixed batch size, and SKIP the final batch of the epoch —
so every training step sees a full, static-shape batch (exactly what XLA
wants: one compiled step, no shape polymorphism).

`device_batches` overlaps H2D transfer with compute by keeping one batch in
flight (double buffering) and places batches with the mesh sharding so data
parallelism shards the batch over the 'data' axis.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional, Sequence, Tuple

import jax
import numpy as np


def epoch_batches(n: int, batch_size: int, rng: np.random.Generator,
                  skip_last: bool = True) -> np.ndarray:
    """Shuffled index matrix (num_batches, batch_size) for one epoch.

    With skip_last (the reference's behavior), num_batches =
    ceil(n / batch_size) - 1 and every batch is full.
    """
    perm = rng.permutation(n)
    if skip_last:
        nb = max(math.ceil(n / batch_size) - 1, 0)
    else:
        nb = n // batch_size
    return perm[:nb * batch_size].reshape(nb, batch_size)


def device_batches(x: np.ndarray, y: np.ndarray, index_matrix: np.ndarray,
                   sharding=None, prefetch: int = 2
                   ) -> Iterator[Tuple[jax.Array, jax.Array]]:
    """Yield device-resident (x_batch, y_batch) with simple prefetching.

    Multi-host (jax.process_count() > 1) with a batch sharding: every
    process sees the SAME index matrix (seeded identically), but each one
    materializes and uploads only ITS host-local rows of every global
    batch — the yielded arrays are globally-sharded jax.Arrays assembled
    via make_array_from_process_local_data, so the same fit() loop is
    multi-host-correct with no caller change (SURVEY §5.8 DCN path).
    """
    if sharding is not None and jax.process_count() > 1:
        yield from _multihost_batches(x, y, index_matrix, sharding, prefetch)
        return

    def put(idx):
        bx, by = x[idx], y[idx]
        if sharding is not None:
            return (jax.device_put(bx, sharding), jax.device_put(by, sharding))
        return jax.device_put((bx, by))

    queue = []
    for i in range(index_matrix.shape[0]):
        queue.append(put(index_matrix[i]))
        if len(queue) > prefetch:
            yield queue.pop(0)
    while queue:
        yield queue.pop(0)


def _local_rows(sharding, global_shape: Tuple[int, ...]) -> Tuple[int, int]:
    """This process's contiguous [lo, hi) row range of a batch sharded on
    axis 0. Raises if the sharding's addressable portion is not contiguous
    (it is for NamedSharding over a 'data' axis in process order)."""
    global_rows = global_shape[0]
    idx_map = sharding.addressable_devices_indices_map(global_shape)
    # dedupe: devices on a replicated mesh axis (e.g. 'model' under DP+TP)
    # share the same row span — counting them twice would fail contiguity
    spans = sorted({(sl[0].start or 0,
                     global_rows if sl[0].stop is None else sl[0].stop)
                    for sl in idx_map.values()})
    lo, hi = spans[0][0], spans[-1][1]
    covered = sum(b - a for a, b in spans)
    if covered != hi - lo:
        raise ValueError(f"non-contiguous host shard: {spans}")
    return lo, hi


def _multihost_batches(x, y, index_matrix, sharding, prefetch):
    nb, gbs = index_matrix.shape
    gx = (gbs,) + x.shape[1:]
    gy = (gbs,) + y.shape[1:]
    lo, hi = _local_rows(sharding, gx)

    def put(idx):
        local = idx[lo:hi]
        return (jax.make_array_from_process_local_data(sharding, x[local], gx),
                jax.make_array_from_process_local_data(sharding, y[local], gy))

    queue = []
    for i in range(nb):
        queue.append(put(index_matrix[i]))
        if len(queue) > prefetch:
            yield queue.pop(0)
    while queue:
        yield queue.pop(0)


def chunked(n: int, chunk: int) -> Sequence[Tuple[int, int]]:
    """[(start, size)] covering range(n) in fixed chunks (last may be short)."""
    return [(s, min(chunk, n - s)) for s in range(0, n, chunk)]


def pad_to(arr: np.ndarray, size: int) -> np.ndarray:
    """Zero-pad axis 0 to `size` (for static-shape eval chunks)."""
    if arr.shape[0] == size:
        return arr
    pad = np.zeros((size - arr.shape[0], *arr.shape[1:]), dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)
