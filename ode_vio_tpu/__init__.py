"""ODE-VIO-TPU: a TPU-native continuous-time visual-inertial odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
PyTorch reference `mc1017/ODE-VIO` (see /root/reference):

- a batched, differentiable adaptive ODE/CDE solver core built on
  ``lax.scan`` / ``lax.while_loop`` (replacing torchode / torchcde /
  torchdiffeq),
- visual/inertial encoders, fusion gates and five continuous-time pose
  regressor families (ODE-RNN, RNN, CDE, RDE, NCP) as pure-functional
  flax modules,
- KITTI odometry data + irregular-sampling (frame-dropout) pipeline,
  official KITTI evaluation metrics,
- an SPMD training stack (`jax.sharding.Mesh` + pjit) with Orbax
  checkpointing.

Layer map mirrors SURVEY.md section 1; component docstrings cite the
reference `file:line` they provide parity with.
"""

__version__ = "0.1.0"

from ode_vio_tpu.config import Config  # noqa: F401
