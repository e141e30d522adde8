"""Round-trip oracles for the torch checkpoint importer.

The import machinery itself lives in multi_modal_csi_tpu/core/torch_import.py
(wired into core.checkpoint.restore_scenario for `--pretrained ckpt.pt`).
This tool proves it: a randomly initialized reference torch module's
state_dict is imported and forward outputs compared (the same oracle class
as tools/parity_check.py, reversed).

Usage: python tools/import_torch_csi.py [MLP THAT DETR ...]   (default: all)
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from multi_modal_csi_tpu.core.torch_import import (  # noqa: E402,F401
    IMPORTERS, import_state_dict, normalize_state_dict)


# --- round-trip oracle: random reference torch module -> import -> compare -

def _roundtrip(key, make_torch, make_flax, x, *, atol=2e-4, fwd=None):
    import jax
    import jax.numpy as jnp
    import torch
    tm = make_torch()
    tm.eval()
    model = make_flax()
    # SSL: init through the two-view branch so the projector params exist
    init_args = ((jnp.asarray(x), jnp.asarray(x)) if key == "SSL"
                 else (jnp.asarray(x),))
    v = model.init({"params": jax.random.PRNGKey(0)}, *init_args, train=False)
    v2 = import_state_dict(key, tm.state_dict(), v)
    with torch.no_grad():
        if fwd is not None:
            want = fwd(tm, x)
        else:
            want = tm(torch.from_numpy(x)).numpy()
    if key == "SSL":
        got = model.apply(v2, jnp.asarray(x), inference=True)
    else:
        got = model.apply(v2, jnp.asarray(x), train=False)
    err = float(np.abs(np.asarray(got) - want).max())
    print(f"{key} import round-trip: max err {err:.2e}")
    assert err < atol, f"{key} import diverges: {err}"
    return err


def check_import(key):
    """Round-trip `key` against a randomly initialized reference module."""
    import torch
    from tools.measure_baseline import load_ref_module
    rng = np.random.default_rng(17)

    if key == "MLP":
        x = rng.normal(size=(4, 1024)).astype(np.float32)
        ref = load_ref_module("mlp.py")
        from multi_modal_csi_tpu.models.csi.mlp import MLP
        return _roundtrip(key, lambda: ref.MLP((1024,), (54,)),
                          lambda: MLP(out_features=54), x)
    if key == "LSTM":
        x = rng.normal(size=(2, 200, 90)).astype(np.float32)
        ref = load_ref_module("lstm.py")
        from multi_modal_csi_tpu.models.csi.lstm import LSTMModel
        return _roundtrip(key, lambda: ref.LSTMM((200, 90), (54,)),
                          lambda: LSTMModel(out_features=54), x)
    if key == "ABLSTM":
        x = rng.normal(size=(2, 320, 90)).astype(np.float32)
        ref = load_ref_module("ablstm.py")
        from multi_modal_csi_tpu.models.csi.ablstm import ABLSTM
        return _roundtrip(key, lambda: ref.ABLSTM((320, 90), (54,)),
                          lambda: ABLSTM(out_features=54), x)
    if key == "CNN-1D":
        x = rng.normal(size=(2, 600, 270)).astype(np.float32)
        ref = load_ref_module("cnn_1d.py")
        from multi_modal_csi_tpu.models.csi.cnn_1d import CNN1D
        return _roundtrip(key, lambda: ref.CNN_1D((600, 270), (54,)),
                          lambda: CNN1D(out_features=54), x)
    if key == "CNN-2D":
        x = rng.normal(size=(2, 300, 270)).astype(np.float32)
        ref = load_ref_module("cnn_2d.py")
        from multi_modal_csi_tpu.models.csi.cnn_2d import CNN2D
        return _roundtrip(key, lambda: ref.CNN_2D((300, 270), (54,)),
                          lambda: CNN2D(out_features=54), x)
    if key == "CLSTM":
        x = rng.normal(size=(2, 1800, 90)).astype(np.float32)
        ref = load_ref_module("cnn_lstm.py")
        from multi_modal_csi_tpu.models.csi.clstm import CLSTM
        return _roundtrip(key, lambda: ref.CNN_LSTM((1800, 90), (54,)),
                          lambda: CLSTM(out_features=54), x)
    if key == "THAT":
        x = rng.normal(size=(2, 400, 270)).astype(np.float32)
        ref = load_ref_module("that.py")
        from multi_modal_csi_tpu.models.csi.that import THAT
        return _roundtrip(key, lambda: ref.THAT((400, 270), (54,)),
                          lambda: THAT(out_features=54), x)
    if key == "THAT_MULTI_HEAD":
        x = rng.normal(size=(2, 400, 270)).astype(np.float32)
        ref = load_ref_module("that_multi_head.py")
        from multi_modal_csi_tpu.models.csi.that import THATMultiHead
        return _roundtrip(key, lambda: ref.THAT((400, 270), (10,)),
                          lambda: THATMultiHead(out_features=10), x)
    if key == "THAT_COUNT":
        x = rng.normal(size=(2, 400, 270)).astype(np.float32)
        ref = load_ref_module("that_count_pred.py")
        from multi_modal_csi_tpu.models.csi.that import THATCount
        return _roundtrip(key, lambda: ref.THAT_COUNT_PRED((400, 270), (9,)),
                          lambda: THATCount(out_features=9), x)
    if key == "THAT_COUNT_CONSTRAINED":
        x = rng.normal(size=(2, 400, 270)).astype(np.float32)
        ref = load_ref_module("that_count_pred_withSoftMaxConstraint.py")
        from multi_modal_csi_tpu.models.csi.that import THATCountConstrained
        return _roundtrip(
            key, lambda: ref.THAT_COUNT_PRED_with_Constraint((400, 270), (10,)),
            lambda: THATCountConstrained(), x)
    if key == "THAT_ENCODER":
        x = rng.normal(size=(2, 400, 270)).astype(np.float32)
        ref = load_ref_module("that_encoder.py")
        from multi_modal_csi_tpu.models.csi.that_encoder import THATEncoderDETR

        def make():
            tm = ref.DETR_MultiUser((400, 270), (54,), temp_cross=1,
                                    num_queries=5)
            # reference hardcodes 6 decoder layers; 3 keeps the test fast
            tm.decoder = ref.TransformerDecoder(
                d_model=270, nhead=6, num_decoder_layers=3, num_queries=5,
                dim_feedforward=2048, temp_cross_attention=1)
            return tm

        return _roundtrip(key, make,
                          lambda: THATEncoderDETR(temp_cross=1.0,
                                                  num_queries=5,
                                                  num_decoder_layers=3), x)
    if key == "DETR":
        x = rng.normal(size=(2, 3000, 270)).astype(np.float32)
        ref = load_ref_module("detr.py")
        from multi_modal_csi_tpu.models.csi.detr import DETRMultiUser
        return _roundtrip(
            key,
            lambda: ref.DETR_MultiUser((3000, 270), [10],
                                       embedding_time_dim=10,
                                       num_decoder_layers=3, temp_cross=2,
                                       num_queries=5, dim_feedforward=512),
            lambda: DETRMultiUser(token_length=10, num_decoder_layers=3,
                                  temp_cross=2.0, num_queries=5,
                                  dim_feedforward=512), x)
    if key == "dual_band":
        import torch as _torch
        x = rng.normal(size=(2, 2, 600, 90)).astype(np.float32)
        ref = load_ref_module("dual_band.py")
        from multi_modal_csi_tpu.models.csi.dual_band import DualBandCNN
        return _roundtrip(
            key, lambda: ref.DualBandCNN((600, 90), (600, 90), (54,)),
            lambda: DualBandCNN(out_features=54), x,
            fwd=lambda tm, xb: tm(_torch.from_numpy(xb[:, 0]),
                                  _torch.from_numpy(xb[:, 1])).numpy())
    if key == "SSL":
        import torch as _torch
        x = rng.normal(size=(2, 600, 90)).astype(np.float32)
        ref = load_ref_module("SSL_model.py")
        from multi_modal_csi_tpu.models.csi.ssl import SSLModel
        return _roundtrip(
            key, lambda: ref.SS_Model((600, 90), (54,)),
            lambda: SSLModel(out_features=54), x,
            fwd=lambda tm, xb: tm(_torch.from_numpy(xb),
                                  inference=True).numpy())
    raise KeyError(key)


if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")   # numerics check, CPU oracle
    which = sys.argv[1:] or sorted(IMPORTERS)
    for name in which:
        check_import(name)
    print("IMPORT OK")
