"""Checkpoint save/restore + transfer-learning scenario tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multi_modal_csi_tpu.core.checkpoint import (RunCheckpointer,
                                                 component_path,
                                                 load_components,
                                                 restore_scenario,
                                                 save_components)
from multi_modal_csi_tpu.models.csi.detr import DETRMultiUser
from multi_modal_csi_tpu.train.transfer import transfer_optimizer


@pytest.fixture(scope="module")
def detr_variables():
    model = DETRMultiUser(token_length=10, num_decoder_layers=2,
                          dim_feedforward=32)
    x = jnp.ones((1, 300, 30))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return v["params"], v.get("batch_stats", {})


def _tree_equal(a, b):
    return all(jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x, y: bool(np.allclose(x, y)), a, b)))


def test_component_roundtrip(tmp_path, detr_variables):
    params, stats = detr_variables
    path = component_path(str(tmp_path), ["empty_room"], "DETR")
    assert path.endswith("model_0/PT_empty_room_DETR.msgpack")
    save_components(path, params, stats)
    loaded = load_components(path, like={"params": jax.device_get(params),
                                         "batch_stats": jax.device_get(stats)})
    assert _tree_equal(loaded["params"], params)


def test_restore_scenarios(tmp_path, detr_variables):
    params, stats = detr_variables
    path = str(tmp_path / "full.msgpack")
    save_components(path, params, stats)

    # perturb, then restore selectively
    zeroed = jax.tree_util.tree_map(lambda x: x * 0, params)

    full_p, _ = restore_scenario(zeroed, stats, path, "full")
    assert _tree_equal(full_p, params)

    fe_p, _ = restore_scenario(zeroed, stats, path, "feature_extractor")
    assert _tree_equal(fe_p["feature_extractor"], params["feature_extractor"])
    # decoder stays zeroed (random in the reference)
    leaf = jax.tree_util.tree_leaves(fe_p["decoder"])[0]
    assert float(np.abs(leaf).sum()) == 0.0

    enc_p, _ = restore_scenario(zeroed, stats, path, "feature_encoder")
    assert _tree_equal(enc_p["feature_extractor"], params["feature_extractor"])
    assert _tree_equal(enc_p["encoder"], params["encoder"])
    leaf = jax.tree_util.tree_leaves(enc_p["decoder"])[0]
    assert float(np.abs(leaf).sum()) == 0.0

    with pytest.raises(ValueError):
        restore_scenario(zeroed, stats, path, "bogus")


def test_transfer_optimizer_freezes_and_scales(detr_variables):
    params, _ = detr_variables
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    # feature_encoder: feature_extractor frozen
    tx = transfer_optimizer(params, lr=1.0, scenario="feature_encoder")
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    fe_update = jax.tree_util.tree_leaves(updates["feature_extractor"])[0]
    dec_update = jax.tree_util.tree_leaves(updates["decoder"])[0]
    assert float(np.abs(fe_update).sum()) == 0.0
    assert float(np.abs(dec_update).sum()) > 0.0

    # feature_extractor scenario: tiny lr on extractor, full elsewhere
    tx2 = transfer_optimizer(params, lr=1.0, scenario="feature_extractor")
    state2 = tx2.init(params)
    up2, _ = tx2.update(grads, state2, params)
    fe = np.abs(np.asarray(jax.tree_util.tree_leaves(up2["feature_extractor"])[0])).max()
    dec = np.abs(np.asarray(jax.tree_util.tree_leaves(up2["decoder"])[0])).max()
    assert fe == pytest.approx(dec * 0.01, rel=1e-3)


def test_run_checkpointer_roundtrip(tmp_path):
    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
             "step": np.int64(7)}
    ckpt = RunCheckpointer(str(tmp_path / "ckpts"))
    ckpt.save(7, state)
    assert ckpt.latest_step() == 7
    like = {"params": {"w": np.zeros((2, 3), np.float32)}, "step": np.int64(0)}
    restored = ckpt.restore(like)
    np.testing.assert_array_equal(restored["params"]["w"], state["params"]["w"])
    assert int(restored["step"]) == 7


def test_restore_scenario_torch_pt(tmp_path):
    """A reference torch `.pt` checkpoint (the `{'model_state_dict': ...}`
    wrapper inference_only.py:13-15 saves) restores through the same
    restore_scenario entry point, routed via core/torch_import.py."""
    import torch
    from multi_modal_csi_tpu.models.csi.mlp import MLP

    F = 64
    model = MLP(out_features=5)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((2, F)), train=False)

    g = torch.Generator().manual_seed(7)
    dims = [(256, F), (128, 256), (5, 128)]
    sd = {"layer_norm.weight": torch.randn(F, generator=g),
          "layer_norm.bias": torch.randn(F, generator=g),
          "layer_norm.running_mean": torch.randn(F, generator=g),
          "layer_norm.running_var": torch.rand(F, generator=g) + 0.5,
          "layer_norm.num_batches_tracked": torch.tensor(3)}
    for i, (o, n) in enumerate(dims):
        sd[f"layer_{i}.weight"] = torch.randn(o, n, generator=g)
        sd[f"layer_{i}.bias"] = torch.randn(o, generator=g)
    path = str(tmp_path / "ref_mlp.pt")
    torch.save({"model_state_dict": sd, "epoch": 12}, path)

    with pytest.raises(ValueError, match="model_key"):
        restore_scenario(v["params"], v["batch_stats"], path, "full")

    params, stats = restore_scenario(v["params"], v["batch_stats"], path,
                                     "full", model_key="MLP")
    np.testing.assert_array_equal(
        np.asarray(params["layer_1"]["kernel"]),
        sd["layer_1.weight"].numpy().T)
    np.testing.assert_array_equal(
        np.asarray(stats["input_norm"]["bn"]["var"]),
        sd["layer_norm.running_var"].numpy())

    # the imported tree must run through the model unchanged in structure
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.ones((2, F)), train=False)
    assert out.shape == (2, 5)


def test_restore_scenario_msgpack_under_pt_name(tmp_path, detr_variables):
    """Extension says torch, bytes say msgpack (ADVICE r3): a native tree
    saved under a .pt name must load via the msgpack fallback, not die in
    torch unpickling; true garbage gets the extension-contract error."""
    params, stats = detr_variables
    path = str(tmp_path / "native_tree.pt")
    save_components(path, params, stats)
    p2, s2 = restore_scenario(params, stats, path, "full", model_key="DETR")
    assert _tree_equal(p2, params)

    bad = str(tmp_path / "garbage.pth")
    with open(bad, "wb") as f:
        f.write(b"\x00not a checkpoint of any kind\xff")
    with pytest.raises(ValueError, match="extension contract"):
        restore_scenario(params, stats, bad, "full", model_key="DETR")


def test_restore_scenario_msgpack_under_pt_torchless(tmp_path, detr_variables,
                                                     monkeypatch):
    """The same fallback on a torch-less deployment (production runtime is
    pure JAX): `import torch` must sit inside the try so ModuleNotFoundError
    routes a msgpack-under-.pt tree to the msgpack loader instead of dying
    before the fallback can run."""
    import sys
    params, stats = detr_variables
    path = str(tmp_path / "native_tree_torchless.pt")
    save_components(path, params, stats)
    monkeypatch.setitem(sys.modules, "torch", None)  # import torch -> raises
    p2, _ = restore_scenario(params, stats, path, "full", model_key="DETR")
    assert _tree_equal(p2, params)


def test_normalize_state_dict_stacked_prefixes():
    """module._orig_mod.* (DataParallel around torch.compile) unwraps fully
    (ADVICE r3: single-pass stripping left the inner prefix)."""
    from multi_modal_csi_tpu.core.torch_import import normalize_state_dict
    sd = {"module._orig_mod.layer_0.weight": np.ones((2, 2)),
          "_orig_mod.module.layer_1.bias": np.zeros((2,)),
          "layer_2.weight": np.ones((2, 2))}
    out = normalize_state_dict(sd)
    assert sorted(out) == ["layer_0.weight", "layer_1.bias", "layer_2.weight"]


def test_load_video_pretrained_checks_batch_stats(tmp_path):
    """A stats-tree mismatch must fail loudly at load time (ADVICE r3), not
    later as an opaque flax apply error."""
    from multi_modal_csi_tpu.models.video.resnet3d import ResNet3D18
    from multi_modal_csi_tpu.runners.video import load_video_pretrained

    model = ResNet3D18(out_features=6)
    x = jnp.zeros((1, 4, 16, 16, 3))
    v0 = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    # corrupt ONE batch-stats leaf shape; params stay correct
    bad_stats = jax.device_get(v0["batch_stats"])
    leaf = bad_stats["stem_bn"]["bn"]
    leaf["mean"] = np.zeros(leaf["mean"].shape[0] + 1, np.float32)
    path = str(tmp_path / "video.msgpack")
    save_components(path, v0["params"], bad_stats)
    with pytest.raises((ValueError, KeyError)):
        load_video_pretrained(path, "ResNet", 6, v0, x.shape)
