"""Full-resolution video smoke tests (opt-in: ``pytest -m fullres``).

One forward at the real WiMANS clip shape (1, 45, 224, 224, 3) per backbone
so program-size / padding / window-mask regressions at production dims are
caught on CPU, not on the TPU tunnel (VERDICT r1 item 9 — e.g. the Swin
program-size overflow fixed in 987263c had no test at real dims).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_csi_tpu.models import video as V

CLIP = (1, 45, 224, 224, 3)


def _forward(model):
    x = jnp.asarray(np.zeros(CLIP, np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert out.shape == (1, 54)
    return out


@pytest.mark.fullres
def test_resnet3d_fullres():
    _forward(V.ResNet3D18(out_features=54))


@pytest.mark.fullres
def test_s3d_fullres():
    _forward(V.S3D(out_features=54))


@pytest.mark.fullres
def test_swin3d_t_fullres():
    _forward(V.swin3d_t(54))


@pytest.mark.fullres
def test_swin3d_s_fullres():
    _forward(V.swin3d_s(54))


@pytest.mark.fullres
def test_mvit_v1_fullres():
    _forward(V.mvit_v1_b(54))


@pytest.mark.fullres
def test_mvit_v2_fullres():
    _forward(V.mvit_v2_s(54))
