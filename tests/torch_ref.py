"""Compatibility shim: the torch reference dopri5 now lives in the package
(ode_vio_tpu/reference/torch_odeint.py) so the parity CLI can use it; tests
keep importing it from here."""

from ode_vio_tpu.reference.torch_odeint import (  # noqa: F401
    ORDER,
    odeint_dopri5,
    odeint_dopri5_at,
)
