"""Model layer: encoders, fusion, and the five continuous-time pose
regressor families, composed by :class:`DeepVIO`."""

from ode_vio_tpu.models.deepvio import DeepVIO, create_model  # noqa: F401
