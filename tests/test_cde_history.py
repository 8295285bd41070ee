"""Streaming-CDE history mode: the reference's re-integrated history path
(PoseCDE.py:87-103) realised as a fixed-capacity ring buffer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ode_vio_tpu.config import Config, DataConfig, ModelConfig, SolverConfig
from ode_vio_tpu.models.deepvio import init_model


def make(history_cap=16, mode="history"):
    cfg = Config(
        model=ModelConfig(model_type="cde", img_w=64, img_h=32, seq_len=4,
                          v_f_len=16, i_f_len=8, cde_hidden_dim=6,
                          cde_streaming_mode=mode, cde_history_cap=history_cap,
                          compute_dtype="float32"),
        cde_solver_cfg=SolverConfig(rtol=1e-3, atol=1e-6, max_steps=16,
                                    dt0=1e-2),
        data=DataConfig(seq_len=4),
    )
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    return model, variables


def window(seed, t_offset):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.random((2, 4, 32, 64, 3), np.float32) - 0.5)
    imu = jnp.asarray(rng.standard_normal((2, 31, 6)), jnp.float32)
    ts = jnp.asarray(
        t_offset + np.cumsum(rng.random((2, 4)).astype(np.float32) * 0.1, 1)
    )
    return img, imu, ts


RNGS = {"gumbel": jax.random.PRNGKey(9)}


class TestHistoryMode:
    def test_streams_and_saturates(self):
        model, variables = make(history_cap=8)  # cap < 2 windows of 3 obs
        carry = None
        t = 0.0
        for k in range(3):
            img, imu, ts = window(k, t)
            poses, carry = model.apply(variables, img, imu, ts,
                                       hc=carry, train=False, rngs=RNGS)
            t = float(ts[0, -1]) + 0.1
            assert poses.shape == (2, 3, 6)
            assert bool(jnp.isfinite(poses).all())
        assert carry["buf"].shape == (2, 8, 7)  # cap x (cde_hidden + 1)
        np.testing.assert_array_equal(np.asarray(carry["cnt"]), [8, 8])

    def test_history_influences_output(self):
        model, variables = make(history_cap=16)
        img1, imu1, ts1 = window(0, 0.0)
        img2, imu2, ts2 = window(1, 1.0)
        _, carry = model.apply(variables, img1, imu1, ts1, train=False,
                               rngs=RNGS)
        with_hist, _ = model.apply(variables, img2, imu2, ts2, hc=carry,
                                   train=False, rngs=RNGS)
        fresh, _ = model.apply(variables, img2, imu2, ts2, train=False,
                               rngs=RNGS)
        assert not np.allclose(np.asarray(with_hist), np.asarray(fresh),
                               atol=1e-6)

    def test_z0_pinned_to_first_window(self):
        """The carried z0 must be the first window's initial state forever
        (PoseCDE.py:103 semantics)."""
        model, variables = make(history_cap=16)
        img1, imu1, ts1 = window(0, 0.0)
        img2, imu2, ts2 = window(1, 1.0)
        _, c1 = model.apply(variables, img1, imu1, ts1, train=False, rngs=RNGS)
        _, c2 = model.apply(variables, img2, imu2, ts2, hc=c1, train=False,
                            rngs=RNGS)
        np.testing.assert_array_equal(np.asarray(c1["z0"]),
                                      np.asarray(c2["z0"]))

    def test_train_mode_ignores_history(self):
        """Training stays window-local (the reference resets history in
        train mode, PoseCDE.py:91-92)."""
        model, variables = make(history_cap=16)
        img, imu, ts = window(0, 0.0)
        (poses, carry), _ = model.apply(
            variables, img, imu, ts, train=True,
            rngs={**RNGS, "dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        assert poses.shape == (2, 3, 6)
        assert not isinstance(carry, dict)  # plain z carry in train mode

    def test_cap_must_cover_window(self):
        # the violation surfaces already at init (trace time)
        with pytest.raises(ValueError, match="cde_history_cap"):
            make(history_cap=2)
