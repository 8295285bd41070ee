"""Serving layer: multi-session streaming inference on one executable."""

from ode_vio_tpu.serving.engine import StreamingEngine  # noqa: F401
