"""Adjoint-mode training paths: gradients through the continuous adjoint
must match the bounded-scan (discretize-then-optimize) gradients for both
continuous-time model families that support --adjoint."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ode_vio_tpu.config import Config, DataConfig, ModelConfig, SolverConfig
from ode_vio_tpu.models.deepvio import init_model


def tiny(model_type, adjoint):
    return Config(
        model=ModelConfig(model_type=model_type, img_w=64, img_h=32,
                          seq_len=3, v_f_len=16, i_f_len=8,
                          ode_hidden_dim=12, rnn_num_layers=2,
                          cde_hidden_dim=6, adjoint=adjoint,
                          compute_dtype="float32"),
        solver=SolverConfig(rtol=1e-5, atol=1e-8, max_steps=64,
                            max_steps_train=64, dt0=1e-2,
                            unroll_mode="adjoint" if adjoint else "bounded"),
        cde_solver_cfg=SolverConfig(rtol=1e-5, atol=1e-8, max_steps=64,
                                    max_steps_train=64, dt0=1e-2),
        data=DataConfig(seq_len=3),
    )


def batch():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 3, 32, 64, 3), np.float32) - 0.5)
    imu = jnp.asarray(rng.standard_normal((2, 21, 6)), jnp.float32)
    ts = jnp.asarray(np.cumsum(rng.random((2, 3)).astype(np.float32) * 0.2, 1))
    return img, imu, ts


@pytest.mark.parametrize("model_type,subtree",
                         [("ode-rnn", "ode_func"), ("cde", "cde_func")])
def test_adjoint_grads_match_bounded(model_type, subtree):
    img, imu, ts = batch()
    cfg_b = tiny(model_type, adjoint=False)
    model_b, variables = init_model(cfg_b, jax.random.PRNGKey(0))
    cfg_a = tiny(model_type, adjoint=True)
    model_a, _ = init_model(cfg_a, jax.random.PRNGKey(0))

    def loss(model):
        def f(params):
            (poses, _), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                img, imu, ts, train=True,
                rngs={"dropout": jax.random.PRNGKey(1),
                      "gumbel": jax.random.PRNGKey(2)},
                mutable=["batch_stats"],
            )
            return jnp.sum(poses ** 2)

        return f

    g_b = jax.grad(loss(model_b))(variables["params"])
    g_a = jax.grad(loss(model_a))(variables["params"])

    leaves_b = jax.tree_util.tree_leaves(g_b["pose_net"][subtree])
    leaves_a = jax.tree_util.tree_leaves(g_a["pose_net"][subtree])
    for a, b in zip(leaves_a, leaves_b):
        # adjoint integrates the backward ODE; near-zero entries of the
        # discretize-then-optimize gradient (|g| ~ 1e-3 in a +-26 range)
        # can differ by ~100% relatively, so the absolute floor must
        # cover them (2/252 elements at atol 1e-5 under some mask draws)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-3)
    # encoder gradients flow through both modes too
    enc_norm = sum(
        float(jnp.sum(x ** 2))
        for x in jax.tree_util.tree_leaves(g_a["image_encoder"])
    )
    assert enc_norm > 0
