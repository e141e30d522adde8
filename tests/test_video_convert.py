"""Torchvision-checkpoint converter tests for the video backbones.

Structural: a synthetic state-dict with torchvision's exact key names and
shapes (generated from the torch replicas in tools/torch_video_refs.py)
must map into the flax init tree leaf-for-leaf, strictly (no unconsumed
keys, no unfilled leaves). Numerical: weight-transplant parity — flax
forward with converted weights == torch replica forward (VERDICT r1 items
2-3; CSI analogue in tests/test_torch_parity.py).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

torch = pytest.importorskip("torch")

from convert_torchvision import (CONVERTERS, resize_mvit_tables,  # noqa: E402
                                 verify_against_model)
from torch_video_refs import (MViTRef, R3D18Ref, S3DRef,  # noqa: E402
                              Swin3DRef)
from video_parity_check import check, randomize_  # noqa: E402


def _replica(arch):
    return {
        "r3d_18": lambda: R3D18Ref(),
        "s3d": lambda: S3DRef(),
        "swin3d_t": lambda: Swin3DRef(depths=(2, 2, 6, 2)),
        "swin3d_s": lambda: Swin3DRef(depths=(2, 2, 18, 2)),
        "mvit_v1_b": lambda: MViTRef("v1", spatial_size=(64, 64),
                                     temporal_size=8),
        "mvit_v2_s": lambda: MViTRef("v2", spatial_size=(64, 64),
                                     temporal_size=8),
    }[arch]()


@pytest.mark.parametrize("arch", ["r3d_18", "s3d", "swin3d_t", "swin3d_s",
                                  "mvit_v1_b", "mvit_v2_s"])
def test_converter_structural(arch):
    state = _replica(arch).state_dict()
    params, stats = CONVERTERS[arch](state, 54)
    assert verify_against_model(params, stats, arch)


@pytest.mark.parametrize("arch", ["r3d_18", "s3d", "swin3d_t",
                                  "mvit_v2_s"])
def test_converter_numerical_parity(arch):
    # small clip that still exercises stride/pad/shift paths end to end
    rel = check(arch, shape=(1, 3, 8, 64, 64), tol=2e-4)
    assert rel < 2e-4


def test_mvit_table_resize_to_new_clip():
    """A 8x64x64 v2 checkpoint resized for 12x96x96 clips must initialize
    the flax model at the new size (offline analogue of torchvision's
    runtime rel-pos interpolation)."""
    state = _replica("mvit_v2_s").state_dict()
    params, stats = CONVERTERS["mvit_v2_s"](state, 54)
    params = resize_mvit_tables(params, "v2", (12, 96, 96))
    import jax
    import jax.numpy as jnp
    from convert_torchvision import build_model
    model = build_model("mvit_v2_s", 54)
    ref = model.init({"params": jax.random.PRNGKey(0)},
                     jnp.zeros((1, 12, 96, 96, 3)), train=False)
    shapes = jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), params)
    want = jax.tree_util.tree_map(lambda x: tuple(np.shape(x)),
                                  ref["params"])
    assert shapes == want


def test_converter_strict_on_leftover_keys():
    state = _replica("s3d").state_dict()
    state["features.0.0.0.bogus_extra"] = torch.zeros(1)
    with pytest.raises(ValueError, match="not consumed"):
        CONVERTERS["s3d"](state, 54)


def test_converter_strict_on_missing_keys():
    state = _replica("s3d").state_dict()
    del state["features.15.branch2.1.1.0.weight"]
    with pytest.raises(KeyError, match="missing expected key"):
        CONVERTERS["s3d"](state, 54)


def test_video_runner_pretrained_pth(tmp_path):
    """runners/video.py::load_video_pretrained: a raw torchvision .pth
    routes through the strict converter in-process (cfg.pretrained_path —
    docs/MIGRATION.md "Checkpoints"), shape-checked against the live init
    tree, with a fresh task head at the configured width."""
    import jax
    import jax.numpy as jnp
    from multi_modal_csi_tpu.models.video import ResNet3D18
    from multi_modal_csi_tpu.runners.video import load_video_pretrained

    state = _replica("r3d_18").state_dict()
    path = str(tmp_path / "r3d18_kinetics.pth")
    torch.save(state, path)

    model = ResNet3D18(out_features=9)
    ex = jnp.zeros((1, 8, 64, 64, 3), jnp.float32)
    v0 = model.init({"params": jax.random.PRNGKey(0)}, ex, train=False)

    params, stats = load_video_pretrained(path, "ResNet", 9, v0, ex.shape)

    # backbone leaves come from the checkpoint (converted layout) — locate
    # the stem conv by shape+value instead of guessing tree names
    want_stem = np.transpose(state["stem.0.weight"].numpy(), (2, 3, 4, 1, 0))
    leaves = jax.tree_util.tree_leaves(params)
    match = [l for l in leaves if np.shape(l) == want_stem.shape and
             np.allclose(np.asarray(l), want_stem)]
    assert match, "converted stem conv not found in the loaded tree"

    # ...and the tree matches init exactly in structure (incl. 9-wide head)
    shape = lambda t: jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), t)
    assert shape(params) == shape(v0["params"])
    assert shape(stats) == shape(v0.get("batch_stats", {}))
