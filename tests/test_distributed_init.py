"""Two-process jax.distributed smoke test for
parallel/mesh.py::initialize_distributed (VERDICT r2 next #7; SURVEY §5.8).

Spawns two fresh CPU processes against a localhost coordinator, initializes
through OUR wrapper, and asserts: global device count = 2 x local, and one
cross-process psum produces the right value on both ranks.

This is the multi-host DCN entry path — everything else in the suite runs
single-process on the 8-device virtual mesh.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    from multi_modal_csi_tpu.parallel.mesh import initialize_distributed
    initialize_distributed(coordinator_address={coord!r},
                           num_processes=2,
                           process_id=int(os.environ["RANK"]))
    assert jax.process_count() == 2, jax.process_count()
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == 2 * n_local, (n_global, n_local)

    # one cross-process collective: psum of (rank+1) over all devices
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    rank = jax.process_index()
    val = multihost_utils.process_allgather(jnp.asarray(float(rank + 1)))
    assert float(val.sum()) == 3.0, val
    print(f"RANK{{os.environ['RANK']}}_OK", flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_init():
    # (own subprocess timeouts below bound the runtime; no pytest-timeout dep)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    script = _WORKER.format(repo=repo, coord=coord)
    env_base = {k: v for k, v in os.environ.items()
                if not k.startswith(("JAX_", "XLA_"))}
    env_base["JAX_PLATFORMS"] = "cpu"
    procs = []
    for rank in range(2):
        env = dict(env_base, RANK=str(rank))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", script], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"rank {rank} timed out")
        outs.append(out)
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank}_OK" in out, out


_WORKER_PIPELINE = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from multi_modal_csi_tpu.parallel.mesh import (batch_sharding,
                                                   create_mesh,
                                                   initialize_distributed)
    from multi_modal_csi_tpu.data.pipeline import device_batches

    initialize_distributed(coordinator_address={coord!r}, num_processes=2,
                           process_id=int(os.environ["RANK"]))
    mesh = create_mesh({{"data": len(jax.devices())}})
    sharding = batch_sharding(mesh, ndim=3)

    # identical dataset + index matrix on both ranks (seeded)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(32, 6, 4)).astype(np.float32)
    y = rng.normal(size=(32, 5)).astype(np.float32)
    idx = rng.permutation(32).reshape(2, 16)

    mean_fn = jax.jit(lambda bx, by: (jnp.mean(bx), jnp.mean(by)))
    got = []
    for bx, by in device_batches(x, y, idx, sharding=batch_sharding(mesh, 3)):
        assert bx.shape == (16, 6, 4) and by.shape[0] == 16, (bx.shape,)
        mx, my = mean_fn(bx, by)
        got.append((float(mx), float(my)))
    want = [(float(x[i].mean()), float(y[i].mean())) for i in idx]
    for (gm, gy), (wm, wy) in zip(got, want):
        assert abs(gm - wm) < 1e-6 and abs(gy - wy) < 1e-6, (gm, wm, gy, wy)
    print(f"RANK{{os.environ['RANK']}}_PIPE_OK", flush=True)
""")


_WORKER_VIDEO_FSDP = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from multi_modal_csi_tpu.parallel.mesh import (batch_sharding,
                                                   create_mesh,
                                                   initialize_distributed)
    initialize_distributed(coordinator_address={coord!r}, num_processes=2,
                           process_id=int(os.environ["RANK"]))
    import flax.linen as nn
    from multi_modal_csi_tpu.data.video_io import ArrayClips
    from multi_modal_csi_tpu.models.video.resnet3d import Conv3D
    from multi_modal_csi_tpu.nn.layers import BatchNorm, Linear
    from multi_modal_csi_tpu.runners.video import fit_video

    class TinyVid(nn.Module):
        # conv+BN+head from the package's own layers: exercises the global
        # batch-stat reduction and FSDP state sharding without R3D-18's
        # multi-minute 2-process CPU compile (the full model's mesh
        # numerics are proven in test_video_parallel.py)
        @nn.compact
        def __call__(self, x, train=False):
            x = Conv3D(8, (1, 3, 3), (1, 2, 2), (0, 1, 1), name="stem")(x)
            x = BatchNorm(name="bn")(x, use_running_average=not train)
            x = nn.relu(x).mean(axis=(1, 2, 3))
            return Linear(4, name="head")(x)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 2, 16, 16, 3)).astype(np.float32)
    y = (rng.normal(size=(8, 4)) > 0).astype(np.int64)
    train = ArrayClips(x, y)
    test = ArrayClips(x[:3], y[:3])   # < batch_size, not divisible by 2
    mesh = create_mesh({{"data": len(jax.devices())}})
    sharding = batch_sharding(mesh, 1)
    best, acc = fit_video(TinyVid(), train, test, lr=1e-4, epochs=1,
                          batch_size=4, seed=39, threshold=0.5,
                          verbose=False, sharding=sharding, fsdp=True)
    assert 0.0 <= acc <= 1.0, acc
    # the snapshot must be FULL host copies on every process (the ZeRO-3
    # state itself is not fully addressable — device_get alone raises)
    leaves = jax.tree_util.tree_leaves(best[0])
    assert leaves and all(isinstance(l, np.ndarray) for l in leaves)
    print(f"RANK{{os.environ['RANK']}}_VFSDP_OK", flush=True)
""")


def test_two_process_video_fsdp_fit():
    """fit_video with ZeRO-3 FSDP on a 2-process mesh: the best-weight
    snapshot and the full-dataset eval must survive non-fully-addressable
    state (train/loop.py::host_snapshot/host_value all-gather it), and the
    odd-sized test set must survive the multi-host eval path."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    script = _WORKER_VIDEO_FSDP.format(repo=repo, coord=coord)
    env_base = {k: v for k, v in os.environ.items()
                if not k.startswith(("JAX_", "XLA_"))}
    env_base["JAX_PLATFORMS"] = "cpu"
    procs = []
    for rank in range(2):
        env = dict(env_base, RANK=str(rank))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", script], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"rank {rank} timed out")
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank}_VFSDP_OK" in out, out


def test_two_process_sharded_input_pipeline():
    """device_batches on 2 hosts: each process uploads only its host-local
    rows; the assembled global array computes the same statistics as the
    full batch (the multi-host DCN input path, SURVEY §5.8)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    script = _WORKER_PIPELINE.format(repo=repo, coord=coord)
    env_base = {k: v for k, v in os.environ.items()
                if not k.startswith(("JAX_", "XLA_"))}
    env_base["JAX_PLATFORMS"] = "cpu"
    procs = []
    for rank in range(2):
        env = dict(env_base, RANK=str(rank))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", script], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"rank {rank} timed out")
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank}_PIPE_OK" in out, out
