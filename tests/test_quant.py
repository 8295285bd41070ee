"""Quantised int8 encoder inference (models/encoders.py::_int8_conv).

The int8 path is an eval-only TPU serving optimisation: per-output-channel
symmetric int8 weights + per-tensor dynamic int8 activations with int32
MXU accumulation. Parameters stay float — the same checkpoint drives the
float and the quantised path — so these tests assert (a) numerical
closeness to the float path, (b) checkpoint/param-structure invariance,
(c) the training path is untouched.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ode_vio_tpu.config import Config, DataConfig, ModelConfig, SolverConfig
from ode_vio_tpu.models.deepvio import init_model
from ode_vio_tpu.models.encoders import ImageEncoder, _int8_conv
from ode_vio_tpu.models.fold import fold_batchnorm

RNGS = {"gumbel": jax.random.PRNGKey(3)}


def cfg_pair(**kw):
    base = dict(
        model_type="ode-rnn", img_w=64, img_h=32, seq_len=3,
        v_f_len=32, i_f_len=16, ode_hidden_dim=32, rnn_num_layers=1,
        compute_dtype="float32",
    )
    base.update(kw)
    mk = lambda int8: Config(
        model=ModelConfig(encoder_int8=int8, **base),
        solver=SolverConfig(max_steps=8, dt0=1e-2),
        data=DataConfig(seq_len=3),
    )
    return mk(False), mk(True)


def batch(seed=0, B=2, S=3, H=32, W=64):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.random((B, S, H, W, 3), np.float32) - 0.5)
    imu = jnp.asarray(rng.standard_normal((B, 10 * (S - 1) + 1, 6)), jnp.float32)
    ts = jnp.asarray(np.cumsum(rng.random((B, S)).astype(np.float32) * 0.1, 1))
    return img, imu, ts


class TestInt8Conv:
    def test_close_to_float_conv(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 16, 32, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.1, jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, k, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = _int8_conv(x, k, 2, 1, jnp.float32)
        # int8 quantisation error: relative to the activation scale
        err = np.abs(np.asarray(got - ref))
        scale = float(jnp.std(ref))
        assert err.mean() < 0.05 * scale, (err.mean(), scale)

    def test_zero_input_safe(self):
        x = jnp.zeros((1, 8, 8, 4), jnp.float32)
        k = jnp.zeros((3, 3, 4, 8), jnp.float32)
        out = _int8_conv(x, k, 1, 1, jnp.float32)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_batch_independence(self):
        """The dynamic activation scale is per batch element, so a sample's
        quantised output must not depend on what shares the batch — the
        session-independence contract of StreamingEngine/eval_batched
        (ADVICE r2: a whole-batch amax let a large co-batched lane coarsen
        another session's quantisation)."""
        rng = np.random.default_rng(1)
        x0 = jnp.asarray(rng.standard_normal((1, 16, 16, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.1, jnp.float32)
        alone = _int8_conv(x0, k, 1, 1, jnp.float32)
        # co-batch with a 100x-magnitude lane and with a zero lane
        big = jnp.concatenate([x0, 100.0 * jnp.ones_like(x0)], 0)
        zero = jnp.concatenate([x0, jnp.zeros_like(x0)], 0)
        out_big = _int8_conv(big, k, 1, 1, jnp.float32)[:1]
        out_zero = _int8_conv(zero, k, 1, 1, jnp.float32)[:1]
        np.testing.assert_array_equal(np.asarray(alone), np.asarray(out_big))
        np.testing.assert_array_equal(np.asarray(alone), np.asarray(out_zero))


class TestInt8Encoder:
    def test_same_param_structure(self):
        """One float checkpoint drives both paths."""
        cfg_f, cfg_q = cfg_pair()
        _, v_f = init_model(cfg_f, jax.random.PRNGKey(0))
        _, v_q = init_model(cfg_q, jax.random.PRNGKey(0))
        assert (jax.tree_util.tree_structure(v_f)
                == jax.tree_util.tree_structure(v_q))

    def test_features_close_and_poses_bounded(self):
        cfg_f, cfg_q = cfg_pair()
        model_f, variables = init_model(cfg_f, jax.random.PRNGKey(0))
        model_q, _ = init_model(cfg_q, jax.random.PRNGKey(0))
        variables = fold_batchnorm(variables)

        img, imu, ts = batch()
        fv_f = model_f.apply(variables, img, imu, train=False,
                             method="encode", rngs=RNGS)[0]
        fv_q = model_q.apply(variables, img, imu, train=False,
                             method="encode", rngs=RNGS)[0]
        f, q = np.asarray(fv_f).ravel(), np.asarray(fv_q).ravel()
        corr = np.corrcoef(f, q)[0, 1]
        assert corr > 0.99, corr

        p_f, _ = model_f.apply(variables, img, imu, ts, train=False, rngs=RNGS)
        p_q, _ = model_q.apply(variables, img, imu, ts, train=False, rngs=RNGS)
        # end-to-end pose deviation stays small relative to pose magnitude
        dev = float(np.abs(np.asarray(p_q - p_f)).mean())
        mag = float(np.abs(np.asarray(p_f)).mean()) + 1e-9
        assert dev < 0.15 * mag, (dev, mag)

    def test_train_mode_uses_float_path(self):
        """int8 must never touch training: train=True outputs are identical
        between the float and int8 configurations."""
        cfg_f, cfg_q = cfg_pair()
        model_f, variables = init_model(cfg_f, jax.random.PRNGKey(0))
        model_q, _ = init_model(cfg_q, jax.random.PRNGKey(0))
        img, imu, _ = batch()
        rngs = {**RNGS, "dropout": jax.random.PRNGKey(7)}
        out_f = model_f.apply(variables, img, imu, train=True,
                              method="encode", rngs=rngs,
                              mutable=["batch_stats"])[0][0]
        out_q = model_q.apply(variables, img, imu, train=True,
                              method="encode", rngs=rngs,
                              mutable=["batch_stats"])[0][0]
        np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_q))


def test_int8_encoder_module_direct():
    """ImageEncoder int8 vs float at the module level, bf16 compute dtype
    (the shipping configuration)."""
    m_f = ImageEncoder(ModelConfig(img_w=64, img_h=32, seq_len=3, v_f_len=32,
                                   compute_dtype="float32"))
    m_q = ImageEncoder(ModelConfig(img_w=64, img_h=32, seq_len=3, v_f_len=32,
                                   compute_dtype="float32", encoder_int8=True))
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((2, 3, 32, 64, 3), np.float32) - 0.5)
    v = m_f.init({"params": jax.random.PRNGKey(0)}, img, train=False)
    f = m_f.apply(v, img, train=False)
    q = m_q.apply(v, img, train=False)
    corr = np.corrcoef(np.asarray(f).ravel(), np.asarray(q).ravel())[0, 1]
    assert corr > 0.99, corr
