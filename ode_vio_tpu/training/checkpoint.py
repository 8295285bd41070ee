"""Checkpoint / resume via Orbax (SURVEY.md section 5.4).

Replaces the reference's ``torch.save(state_dict)``-every-2-epochs +
best-by-t_rel scheme (/root/reference/scripts/train_model.py:113-115,
223-224) and fixes its gaps: optimiser state, epoch, and PRNG key are
checkpointed too (the reference recovers the epoch by parsing the filename
and silently drops Adam moments, train_model.py:175-177).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> Path:
        return self.directory / name

    def save(self, name: str, state: Any, metadata: Optional[dict] = None):
        """Save a pytree (e.g. {'params', 'batch_stats', 'opt_state',
        'step'}) under ``directory/name``."""
        path = self._path(name)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        if metadata is not None:
            (self.directory / f"{name}.meta.json").write_text(
                json.dumps(metadata, default=str)
            )

    def restore(self, name: str, target: Any) -> Any:
        """Restore into the structure/shardings of ``target``."""
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, target
        )
        return self._ckptr.restore(self._path(name), abstract)

    def restore_raw(self, name: str) -> Any:
        """Restore as saved, without a target structure (inspection /
        cross-run comparison)."""
        return self._ckptr.restore(self._path(name))

    def metadata(self, name: str) -> Optional[dict]:
        p = self.directory / f"{name}.meta.json"
        return json.loads(p.read_text()) if p.exists() else None

    def latest_epoch(self) -> Optional[int]:
        eps = [
            int(p.name.split("_")[1])
            for p in self.directory.glob("epoch_*")
            if p.is_dir() and p.name.split("_")[1].isdigit()
        ]
        return max(eps) if eps else None

    def epoch_name(self, epoch: int) -> str:
        return f"epoch_{epoch:03d}"
