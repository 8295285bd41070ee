"""Device mesh and sharding rules.

Replaces the reference's (vestigial, single-device) ``nn.DataParallel``
wrapper (/root/reference/scripts/train_model.py:200-201) with an explicit
``jax.sharding.Mesh``:

  * axis ``data``  — batch/data parallelism; gradient all-reduce rides ICI
    automatically once inputs are batch-sharded under ``jit``.
  * axis ``model`` — reserved model-parallel axis: the widest weights (the
    32768 x 512 visual head, the ODE-func MLP, the RNN gate matrices) shard
    over it so larger encoders scale without redesign (SURVEY.md section
    5.8).

The model at reference scale fits one chip, so the default mesh is
(n_devices, 1); tests and ``__graft_entry__.dryrun_multichip`` exercise a
2-D (dp x tp) mesh on virtual CPU devices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    data: int = -1,
    model: int = 1,
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data == -1:
        data = len(devices) // model
    if data * model != len(devices):
        raise ValueError(
            f"mesh {data}x{model} does not match {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=tuple(axis_names))


def auto_data_axis(batch_size: int, model: int = 1,
                   devices: Optional[Sequence] = None) -> int:
    """Largest data-parallel axis that evenly divides both the batch and
    the device count (a 4-sample debug batch on an 8-device host should
    use 4 devices, not crash)."""
    n = len(devices if devices is not None else jax.devices()) // model
    d = max(k for k in range(1, n + 1) if batch_size % k == 0 and n % k == 0)
    return d


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with the batch axis sharded over
    ``data`` (remaining axes replicated)."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def param_sharding_rules(params, mesh: Mesh, min_size: int = 2 ** 16):
    """Heuristic tensor-parallel layout: shard the trailing axis of large
    2-D kernels over ``model``; replicate everything else. Returns a pytree
    of NamedShardings matching ``params``."""
    tp = mesh.shape["model"]

    def rule(x):
        if (
            tp > 1
            and hasattr(x, "ndim")
            and x.ndim == 2
            and x.size >= min_size
            and x.shape[-1] % tp == 0
        ):
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)
