"""Model-layer tests: every pose-core family forwards, carries state, and
is deterministic; fusion gate semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ode_vio_tpu.config import Config, DataConfig, ModelConfig, SolverConfig
from ode_vio_tpu.models.deepvio import count_parameters, init_model
from ode_vio_tpu.models.fusion import gumbel_softmax

TINY = dict(img_w=64, img_h=32, seq_len=3, v_f_len=32, i_f_len=16,
            ode_hidden_dim=16, rnn_num_layers=2, cde_hidden_dim=8,
            rnn_hidden_dim=16, rde_reduced_dim=4, compute_dtype="float32")


def tiny_config(model_type: str, **kw) -> Config:
    return Config(
        model=ModelConfig(model_type=model_type, **{**TINY, **kw}),
        solver=SolverConfig(max_steps=8, dt0=1e-2),
        cde_solver_cfg=SolverConfig(max_steps=8, dt0=1e-2, rtol=1e-3),
        data=DataConfig(seq_len=3),
    )


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    B, S = 2, 3
    img = jnp.asarray(rng.random((B, S, 32, 64, 3), np.float32) - 0.5)
    imu = jnp.asarray(rng.standard_normal((B, 10 * (S - 1) + 1, 6)), jnp.float32)
    ts = jnp.asarray(np.cumsum(rng.random((B, S)).astype(np.float32) * 0.1, 1))
    return img, imu, ts


@pytest.mark.parametrize("model_type",
                         ["ode-rnn", "rnn", "cde", "rde", "cfc", "ltc"])
def test_family_forward_and_carry(model_type, batch):
    img, imu, ts = batch
    cfg = tiny_config(model_type)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), batch_size=1)
    rngs = {"gumbel": jax.random.PRNGKey(1)}
    poses, carry = model.apply(variables, img, imu, ts, train=False, rngs=rngs)
    assert poses.shape == (2, 2, 6)
    assert bool(jnp.isfinite(poses).all())
    poses2, carry2 = model.apply(
        variables, img, imu, ts + 1.0, hc=carry, train=False, rngs=rngs
    )
    assert poses2.shape == (2, 2, 6)
    # the carried state must influence the output
    poses3, _ = model.apply(
        variables, img, imu, ts + 1.0,
        hc=jax.tree_util.tree_map(jnp.zeros_like, carry),
        train=False, rngs=rngs,
    )
    if model_type != "rnn":  # rnn with zero carry == no carry by design
        assert not np.allclose(np.asarray(poses2), np.asarray(poses3), atol=1e-7)


@pytest.mark.parametrize("model_type,solver_key", [
    ("cde", "cde_solver"), ("rde", "cde_solver"), ("ode-rnn", "method"),
])
def test_fixed_grid_adams_solver_strings(model_type, solver_key, batch):
    """The torchdiffeq fixed-grid method strings (explicit_adams /
    implicit_adams — run by the reference's experiment diary through
    --cde_solver, /root/reference/results/log.txt) work end-to-end in
    every solver-backed family, in train and eval mode."""
    img, imu, ts = batch
    cfg = tiny_config(model_type)
    import dataclasses
    if solver_key == "cde_solver":
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           cde_solver="implicit_adams"),
            cde_solver_cfg=dataclasses.replace(
                cfg.cde_solver_cfg, method="implicit_adams", fixed_steps=4),
        )
    else:
        cfg = dataclasses.replace(
            cfg, solver=dataclasses.replace(
                cfg.solver, method="implicit_adams", fixed_steps=4),
        )
    model, variables = init_model(cfg, jax.random.PRNGKey(0), batch_size=1)
    rngs = {"gumbel": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    poses, carry = model.apply(variables, img, imu, ts, train=False, rngs=rngs)
    assert poses.shape == (2, 2, 6)
    assert bool(jnp.isfinite(poses).all())
    # train mode (reverse-differentiable path)
    from jax.flatten_util import ravel_pytree

    def loss(v):
        (p, _), _ = model.apply(v, img, imu, ts, train=True, rngs=rngs,
                                mutable=["batch_stats"])
        return jnp.sum(p ** 2)

    g = jax.grad(loss)(variables)
    assert bool(jnp.isfinite(ravel_pytree(g["params"])[0]).all())


def test_determinism(batch):
    img, imu, ts = batch
    cfg = tiny_config("ode-rnn")
    model, variables = init_model(cfg, jax.random.PRNGKey(0), batch_size=1)
    rngs = {"gumbel": jax.random.PRNGKey(1)}
    p1, _ = model.apply(variables, img, imu, ts, train=False, rngs=rngs)
    p2, _ = model.apply(variables, img, imu, ts, train=False, rngs=rngs)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_timestamp_rebasing(batch):
    """Without a carry, shifting all timestamps must not change output
    (they are re-based to 0, PoseODERNN.py:100)."""
    img, imu, ts = batch
    cfg = tiny_config("ode-rnn")
    model, variables = init_model(cfg, jax.random.PRNGKey(0), batch_size=1)
    rngs = {"gumbel": jax.random.PRNGKey(1)}
    p1, _ = model.apply(variables, img, imu, ts, train=False, rngs=rngs)
    p2, _ = model.apply(variables, img, imu, ts + 100.0, train=False, rngs=rngs)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)


def test_irregular_timestamps_matter(batch):
    """The ODE-RNN must be sensitive to the time gaps (the continuous-time
    capability), unlike the discrete RNN."""
    img, imu, ts = batch
    for model_type, expect_sensitive in (("ode-rnn", True), ("rnn", False)):
        cfg = tiny_config(model_type)
        model, variables = init_model(cfg, jax.random.PRNGKey(0), batch_size=1)
        rngs = {"gumbel": jax.random.PRNGKey(1)}
        p1, _ = model.apply(variables, img, imu, ts, train=False, rngs=rngs)
        p2, _ = model.apply(variables, img, imu, ts * 3.0, train=False, rngs=rngs)
        same = np.allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)
        assert same != expect_sensitive


@pytest.mark.parametrize("fuse", ["cat", "soft", "hard"])
def test_fusion_modes(fuse, batch):
    img, imu, ts = batch
    cfg = tiny_config("rnn", fuse_method=fuse)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), batch_size=1)
    poses, _ = model.apply(
        variables, img, imu, ts, train=False,
        rngs={"gumbel": jax.random.PRNGKey(2)},
    )
    assert bool(jnp.isfinite(poses).all())


def test_gumbel_softmax_hard_is_onehot():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(5, 7, 2)))
    y = gumbel_softmax(jax.random.PRNGKey(0), logits, hard=True)
    vals = np.asarray(y)
    np.testing.assert_allclose(vals.sum(-1), 1.0, atol=1e-6)
    assert set(np.round(vals.reshape(-1), 6).tolist()) <= {0.0, 1.0}


def test_gumbel_straight_through_gradient():
    logits = jnp.ones((3, 2))

    def loss(l):
        y = gumbel_softmax(jax.random.PRNGKey(0), l, hard=True)
        return jnp.sum(y[..., 0] ** 2)

    g = jax.grad(loss)(logits)
    assert bool(jnp.any(g != 0))


def test_param_count_positive():
    cfg = tiny_config("ode-rnn")
    _, variables = init_model(cfg, jax.random.PRNGKey(0), batch_size=1)
    assert count_parameters(variables) > 10_000
