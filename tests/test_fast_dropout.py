"""fast_dropout (models/encoders.py): the rbg-backed trunk dropout.

Semantics must match nn.Dropout exactly — Bernoulli(1-rate) keep mask and
1/(1-rate) scaling — with only the random bit stream differing (hardware
rng-bit-generator instead of threefry; measured 2x cheaper mask
generation at flagship dims, BENCH.md round 3).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ode_vio_tpu.config import Config, ModelConfig
from ode_vio_tpu.models.encoders import ImageEncoder, fast_dropout


def test_values_are_zero_or_scaled():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((500, 32), np.float32) + 0.1)
    y = np.asarray(fast_dropout(x, 0.5, jax.random.PRNGKey(1), 0))
    kept = y != 0
    np.testing.assert_allclose(y[kept], (np.asarray(x) * 2.0)[kept],
                               rtol=1e-6)
    # keep fraction ~ Bernoulli(0.5) over 16k draws
    assert abs(kept.mean() - 0.5) < 0.02


@pytest.mark.parametrize("rate", [0.2, 0.5])
def test_keep_probability_exact(rate):
    x = jnp.ones((400, 100))
    y = np.asarray(fast_dropout(x, rate, jax.random.PRNGKey(7), 3))
    assert abs((y != 0).mean() - (1.0 - rate)) < 0.015
    # expectation preserved: E[y] == x
    assert abs(y.mean() - 1.0) < 0.02


def test_deterministic_and_salt_decorrelates():
    x = jnp.ones((64, 64))
    key = jax.random.PRNGKey(3)
    a = np.asarray(fast_dropout(x, 0.5, key, 0))
    b = np.asarray(fast_dropout(x, 0.5, key, 0))
    c = np.asarray(fast_dropout(x, 0.5, key, 1))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_zero_rate_is_identity():
    x = jnp.asarray(np.random.default_rng(0).random((8, 8), np.float32))
    assert fast_dropout(x, 0.0, jax.random.PRNGKey(0), 0) is x


def test_typed_key_accepted():
    x = jnp.ones((16, 16))
    y = fast_dropout(x, 0.5, jax.random.key(3), 0)
    assert y.shape == x.shape


@pytest.mark.parametrize("fast", [True, False])
def test_encoder_train_forward_runs(fast):
    """The trunk runs (and differs between mask impls only in which
    elements drop) under both dropout paths; eval is identical."""
    cfg = ModelConfig(img_h=32, img_w=64, seq_len=3, v_f_len=16,
                      compute_dtype="float32", fast_dropout=fast)
    enc = ImageEncoder(cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 3, 32, 64, 3), np.float32) - 0.5)
    variables = enc.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        img, train=False,
    )
    out, _ = enc.apply(variables, img, train=True,
                       rngs={"dropout": jax.random.PRNGKey(2)},
                       mutable=["batch_stats"])
    assert np.isfinite(np.asarray(out)).all()
    ev = enc.apply(variables, img, train=False)
    assert np.isfinite(np.asarray(ev)).all()


def test_eval_path_unaffected_by_flag():
    """fast_dropout is train-only: eval outputs are bitwise identical
    with the flag on or off."""
    base = dict(img_h=32, img_w=64, seq_len=3, v_f_len=16,
                compute_dtype="float32")
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 3, 32, 64, 3), np.float32) - 0.5)
    outs = []
    for fast in (True, False):
        enc = ImageEncoder(ModelConfig(fast_dropout=fast, **base))
        variables = enc.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            img, train=False,
        )
        outs.append(np.asarray(enc.apply(variables, img, train=False)))
    np.testing.assert_array_equal(outs[0], outs[1])
