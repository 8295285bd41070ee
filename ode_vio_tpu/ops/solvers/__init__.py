"""Batched differentiable ODE/CDE solver core (TPU-native torchode/torchcde
replacement).

Public API:
  * :func:`ode_vio_tpu.ops.solvers.odeint.solve_ivp`   — one interval
  * :func:`ode_vio_tpu.ops.solvers.odeint.solve_at`    — dense output at knots
  * :func:`ode_vio_tpu.ops.solvers.odeint.solve_ivp_adjoint` — O(1)-memory vjp
  * :data:`ode_vio_tpu.ops.solvers.tableaus.TABLEAUS`  — RK method registry
"""

from ode_vio_tpu.ops.solvers.tableaus import TABLEAUS, ButcherTableau  # noqa: F401
from ode_vio_tpu.ops.solvers.odeint import (  # noqa: F401
    SolverOptions,
    solve_at,
    solve_ivp,
    solve_ivp_adjoint,
    solve_ivp_batched_dt,
    solve_ivp_dt,
)
