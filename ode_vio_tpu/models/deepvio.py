"""DeepVIO — the top-level visual-inertial odometry model.

Composes the image/inertial encoders with one of the pose cores and
dispatches on ``model_type`` (/root/reference/src/models/DeepVIO.py:12-68).
Model families: ``ode-rnn`` (flagship), ``rnn``, ``cde``, ``rde``, ``cfc``,
``ltc`` (the reference raises NotImplementedError for ltc,
DeepVIO.py:58-59; here it is live).

Shape contract (DeepVIO.py:61-68, SURVEY.md section 3.3), NHWC layout:
    img (B, S, H, W, 3), imu (B, 10*(S-1)+1, 6), ts (B, S)
    -> poses (B, S-1, 6) relative [rx,ry,rz,tx,ty,tz] per frame pair,
       carry  (pose-core hidden state for streaming eval)

Weight init parity (DeepVIO.py:77-122): conv/linear kaiming-normal with
zero bias, BatchNorm scale 1 / bias 0, stacked RNN/GRU at torch default
uniform — see models/common.py and ops/rnn_cells.py.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ode_vio_tpu.config import Config, ModelConfig, SolverConfig
from ode_vio_tpu.models.encoders import ImageEncoder, InertialEncoder
from ode_vio_tpu.models.pose_cde import PoseCDE
from ode_vio_tpu.models.pose_ncp import PoseNCP
from ode_vio_tpu.models.pose_odernn import PoseODERNN
from ode_vio_tpu.models.pose_rde import PoseRDE
from ode_vio_tpu.models.pose_rnn import PoseRNN

POSE_CORES = ("ode-rnn", "rnn", "cde", "rde", "cfc", "ltc")


class DeepVIO(nn.Module):
    cfg: ModelConfig
    solver: SolverConfig = SolverConfig()
    cde_solver: SolverConfig = SolverConfig(rtol=1e-4, atol=1e-6)

    def setup(self):
        self.image_net = ImageEncoder(self.cfg, name="image_encoder")
        self.inertial_net = InertialEncoder(self.cfg, name="inertial_encoder")
        mt = self.cfg.model_type
        if mt == "ode-rnn":
            self.pose_net = PoseODERNN(self.cfg, self.solver, name="pose_net")
        elif mt == "rnn":
            self.pose_net = PoseRNN(self.cfg, name="pose_net")
        elif mt == "cde":
            self.pose_net = PoseCDE(self.cfg, self.cde_solver, name="pose_net")
        elif mt == "rde":
            self.pose_net = PoseRDE(self.cfg, self.cde_solver, name="pose_net")
        elif mt in ("cfc", "ltc"):
            self.pose_net = PoseNCP(self.cfg, cell_type=mt, name="pose_net")
        else:
            raise ValueError(
                f"model_type '{mt}' not supported; choose from {POSE_CORES}"
            )

    def __call__(
        self,
        img: jnp.ndarray,
        imu: jnp.ndarray,
        ts: jnp.ndarray,
        hc: Optional[Any] = None,
        train: bool = False,
    ):
        fv = self.image_net(img, train=train)
        fi = self.inertial_net(imu, train=train)
        poses, h_T = self.pose_net(fv, fi, ts, prev=hc, train=train)
        return poses, h_T

    def encode(self, img, imu, train: bool = False):
        """Encoder-only entry (useful for feature caching / profiling)."""
        return self.image_net(img, train=train), self.inertial_net(imu, train=train)

    def pose_from_visual(
        self,
        fv: jnp.ndarray,
        imu: jnp.ndarray,
        ts: jnp.ndarray,
        hc: Optional[Any] = None,
        train: bool = False,
    ):
        """Forward from precomputed visual features: inertial encoder +
        pose core only. Used by the ``frozen_encoder_eval`` train step,
        which computes ``fv`` through the BN-folded inference graph of the
        frozen image encoder (training/loop.py) — the image encoder
        submodule is untouched here."""
        fi = self.inertial_net(imu, train=train)
        return self.pose_net(fv, fi, ts, prev=hc, train=train)


def create_model(config: Config) -> DeepVIO:
    return DeepVIO(
        cfg=config.model,
        solver=config.solver,
        cde_solver=config.cde_solver_cfg,
    )


def init_model(config: Config, rng: jax.Array, batch_size: int = 1):
    """Initialise model variables on a miniature dummy batch.

    Returns (model, variables) where variables = {'params', 'batch_stats'}.
    """
    model = create_model(config)
    m = config.model
    S = m.seq_len
    img = jnp.zeros((batch_size, S, m.img_h, m.img_w, 3), jnp.float32)
    imu = jnp.zeros((batch_size, 10 * (S - 1) + 1, 6), jnp.float32)
    ts = jnp.arange(S, dtype=jnp.float32)[None, :].repeat(batch_size, 0) * 0.1
    rngs = {"params": rng, "dropout": rng, "gumbel": rng}
    # jit the init: unjitted linen init dispatches op-by-op (minutes over a
    # tunneled TPU); as one compiled computation it is seconds.
    init_fn = jax.jit(
        lambda rngs, img, imu, ts: model.init(rngs, img, imu, ts, train=False)
    )
    variables = init_fn(rngs, img, imu, ts)
    return model, variables


def count_parameters(variables) -> int:
    """Total parameter count (utils/profiler.py:23-27 parity)."""
    return sum(
        x.size for x in jax.tree_util.tree_leaves(variables.get("params", variables))
    )


def analyse_flops(config: Config, batch_size: int = 1) -> dict:
    """FLOP / memory-traffic accounting of the jitted forward via XLA's
    compiled cost analysis (fvcore FlopCountAnalysis parity,
    DeepVIO.py:70-74)."""
    from ode_vio_tpu.utils.profiling import flops_analysis

    model, variables = init_model(config, jax.random.PRNGKey(0), batch_size)
    m = config.model
    S = m.seq_len
    img = jnp.zeros((batch_size, S, m.img_h, m.img_w, 3), jnp.float32)
    imu = jnp.zeros((batch_size, 10 * (S - 1) + 1, 6), jnp.float32)
    ts = jnp.arange(S, dtype=jnp.float32)[None].repeat(batch_size, 0) * 0.1

    def fwd(img, imu, ts):
        poses, _ = model.apply(
            variables, img, imu, ts, train=False,
            rngs={"gumbel": jax.random.PRNGKey(0)},
        )
        return poses

    return flops_analysis(fwd, img, imu, ts)
