"""Checkpoint export entry point: ``python -m ode_vio_tpu.cli.export``.

Converts a trained checkpoint (Orbax TrainState directory) into a
reference-layout state_dict (models/convert.py::export_deepvio) so the
model can be loaded by the reference's torch tooling
(/root/reference/scripts/test_model.py:106-108 ``load_state_dict``).

Output formats (chosen by the ``--out`` suffix):
  * ``.npz``  — numpy archive, torch-free; load in torch with
    ``{k: torch.from_numpy(v) for k, v in np.load(path).items()}``.
  * ``.pth``  — torch pickle (requires the torch CPU build), directly
    ``torch.load``-able; keys match the reference modules
    (``Image_net.* / Inertial_net.* / Pose_net.*``).
"""

from __future__ import annotations

import numpy as np
import jax

from ode_vio_tpu.cli.flags import build_parser, config_from_args
from ode_vio_tpu.models.convert import export_deepvio, trunk_out_hw
from ode_vio_tpu.models.deepvio import init_model


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--out", type=str, required=True,
                        help="output path (.npz torch-free, or .pth)")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    if not cfg.pretrain:
        parser.error("--pretrain (checkpoint directory) is required")

    from ode_vio_tpu.training.checkpoint import CheckpointManager
    from ode_vio_tpu.training.loop import create_train_state, make_optimizer

    model, variables = init_model(cfg, jax.random.PRNGKey(cfg.train.seed))
    ckpt = CheckpointManager(cfg.pretrain)
    latest = ckpt.latest_epoch()
    name = ckpt.epoch_name(latest) if latest is not None else "best"
    tx = make_optimizer(cfg)
    target = jax.device_get(
        create_train_state(cfg, variables, tx,
                           jax.random.PRNGKey(cfg.train.seed + 1))
    )
    state = ckpt.restore(name, target)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    sd = export_deepvio(
        variables, cfg.model.model_type,
        conv_out_hw=trunk_out_hw(cfg.model.img_h, cfg.model.img_w),
    )

    if str(args.out).endswith(".pth"):
        import torch

        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()}, args.out)
    else:
        np.savez(args.out, **sd)
    print(f"exported {len(sd)} tensors ({cfg.model.model_type}) "
          f"from {cfg.pretrain}/{name} -> {args.out}")
    return sd


if __name__ == "__main__":
    main()
