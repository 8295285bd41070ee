"""The space-to-depth conv rewrite must be numerically identical to the
direct strided convolution (it is an exact algebraic transform, not an
approximation), for every kernel size the encoder uses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ode_vio_tpu.config import ModelConfig
from ode_vio_tpu.models.encoders import ImageEncoder, _space_to_depth_conv


@pytest.mark.parametrize("k,cin,cout", [(7, 6, 8), (5, 4, 8), (3, 6, 8)])
def test_s2d_equals_direct_conv(k, cin, cout, rng):
    H, W = 16, 24
    x = jnp.asarray(rng.standard_normal((2, H, W, cin)).astype(np.float32))
    kernel = jnp.asarray(
        rng.standard_normal((k, k, cin, cout)).astype(np.float32)
    )
    pad = (k - 1) // 2
    direct = jax.lax.conv_general_dilated(
        x, kernel, (2, 2), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    via_s2d = _space_to_depth_conv(x, kernel, jnp.float32)
    assert via_s2d.shape == direct.shape
    np.testing.assert_allclose(
        np.asarray(via_s2d), np.asarray(direct), atol=1e-4
    )


def test_encoder_outputs_identical_with_and_without_s2d(rng):
    img = jnp.asarray(rng.random((1, 3, 64, 128, 3)).astype(np.float32) - 0.5)
    base = ModelConfig(img_w=128, img_h=64, v_f_len=16,
                       compute_dtype="float32", encoder_s2d=False)
    on = ModelConfig(img_w=128, img_h=64, v_f_len=16,
                     compute_dtype="float32", encoder_s2d=True)
    enc_off = ImageEncoder(base)
    variables = enc_off.init(jax.random.PRNGKey(0), img, train=False)
    out_off = enc_off.apply(variables, img, train=False)
    # identical parameter tree drops into the s2d-enabled encoder
    out_on = ImageEncoder(on).apply(variables, img, train=False)
    np.testing.assert_allclose(
        np.asarray(out_on), np.asarray(out_off), atol=2e-4
    )
