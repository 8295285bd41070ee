"""Weight-initialisation parity with the reference's global init pass.

The reference applies ``torch.nn.init.kaiming_normal_`` (fan_in, gain
sqrt(2)) to EVERY Conv2d/Conv1d/Linear weight and zeroes every bias
(/root/reference/src/models/DeepVIO.py:77-122). These tests assert our
flax modules draw from the same distribution: per-kernel empirical std
== sqrt(2 / fan_in) and zero biases, plus a direct empirical cross-check
against torch's kaiming_normal_ on matched shapes.
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ode_vio_tpu.config import ModelConfig
from ode_vio_tpu.models.encoders import ImageEncoder, InertialEncoder
from ode_vio_tpu.models.fusion import FusionModule

CFG = ModelConfig(img_w=64, img_h=32, seq_len=3, v_f_len=64, i_f_len=32,
                  compute_dtype="float32")


def _flatten(params):
    return flax.traverse_util.flatten_dict(params, sep="/")


def _kaiming_std(kernel: np.ndarray) -> float:
    # flax kernels: conv (..spatial.., in, out), dense (in, out);
    # fan_in = prod(all dims except the trailing out dim) — identical to
    # torch's fan for OIHW/OIK/(out,in) layouts.
    fan_in = int(np.prod(kernel.shape[:-1]))
    return float(np.sqrt(2.0 / fan_in))


def _check_tree(params, min_size=512):
    checked = 0
    for path, leaf in _flatten(params).items():
        arr = np.asarray(leaf)
        if path.endswith("kernel"):
            if arr.size < min_size:
                continue  # std estimate too noisy for tiny layers
            expect = _kaiming_std(arr)
            np.testing.assert_allclose(
                arr.std(), expect, rtol=0.12,
                err_msg=f"{path}: std {arr.std():.4g} != kaiming {expect:.4g}",
            )
            checked += 1
        elif path.endswith("bias"):
            assert np.all(arr == 0.0), f"{path}: bias not zero-initialised"
    return checked


class TestKaimingParity:
    def test_image_encoder(self):
        img = jnp.zeros((1, 3, 32, 64, 3), jnp.float32)
        v = ImageEncoder(CFG).init(jax.random.PRNGKey(0), img, train=False)
        assert _check_tree(v["params"]) >= 9  # 9 conv blocks + head

    def test_inertial_encoder(self):
        imu = jnp.zeros((1, 21, 6), jnp.float32)
        v = InertialEncoder(CFG).init(jax.random.PRNGKey(0), imu, train=False)
        assert _check_tree(v["params"]) >= 3

    @pytest.mark.parametrize("method", ["soft", "hard"])
    def test_fusion_gate(self, method):
        fv = jnp.zeros((1, 2, 64), jnp.float32)
        fi = jnp.zeros((1, 2, 32), jnp.float32)
        v = FusionModule(96, method).init(
            {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
            fv, fi,
        )
        assert _check_tree(v["params"]) >= 1

    def test_matches_torch_kaiming_empirically(self):
        """Same-distribution check against torch's kaiming_normal_ on the
        first image-encoder conv shape (7x7x6 -> 64)."""
        torch = pytest.importorskip("torch")
        img = jnp.zeros((1, 3, 32, 64, 3), jnp.float32)
        v = ImageEncoder(CFG).init(jax.random.PRNGKey(0), img, train=False)
        ours = np.asarray(v["params"]["block0"]["conv"]["kernel"])  # HWIO

        w = torch.empty(64, 6, 7, 7)
        torch.manual_seed(0)
        torch.nn.init.kaiming_normal_(w)
        theirs = w.numpy()
        np.testing.assert_allclose(ours.std(), theirs.std(), rtol=0.1)
        np.testing.assert_allclose(ours.mean(), 0.0, atol=3 * ours.std()
                                   / np.sqrt(ours.size))
