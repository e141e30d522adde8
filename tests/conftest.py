"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding must be testable without TPU hardware, so every test run
uses JAX's host-platform device-count override (SURVEY.md §4: 8-device CPU
simulation). Set BEFORE jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"   # the session may pre-set a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU hard-aborts ("Termination timeout ... Exiting to ensure a
# consistent program state", rendezvous.cc) when the 8 per-device collective
# threads can't all get scheduled within 40 s — which HAPPENS on this 1-core
# box whenever another heavy process runs beside the suite. Starvation is
# recoverable (the log's "Thread is unstuck!" proves it), so stretch the
# kill timeout instead of dying; the warn at 20 s still surfaces real hangs.
if "collective_call_terminate_timeout" not in flags:
    flags += " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-selects itself via
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start; tests
# must run on the virtual 8-device CPU mesh, so force it back before any
# backend is initialized.
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def annotation_df():
    """The real annotation.csv shipped with the reference dataset layout."""
    import pandas as pd
    path = "/root/reference/dataset/annotation.csv"
    if not os.path.exists(path):
        pytest.skip("annotation.csv not available")
    return pd.read_csv(path, dtype=str)
