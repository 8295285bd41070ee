"""Multi-session streaming inference engine.

Serves several live odometry streams from ONE compiled executable by
multiplexing sessions onto the lanes of a fixed-size batch — the serving
counterpart of the batched evaluator
(data/evaluation.py::KittiEvaluator.eval_batched). The reference has no
serving surface at all (SURVEY.md §0); its tester streams one sequence at
batch 1 (/root/reference/src/data/KITTI_eval.py:124-160).

TPU-native design:

* The executable is compiled once for ``max_sessions`` lanes; sessions
  open/close without recompilation (static shapes).
* Each session's hidden state lives in its lane of the carried pytree on
  device; idle lanes replay their previous window and their carry is
  restored afterwards, so an idle session's state never advances.
* Fresh sessions get a zeroed lane carry and a per-session time offset
  (the engine re-bases each session's clock to 0, matching the model's
  cold-start semantics, models/pose_odernn.py ``ts_eff``).

Carry lane axis convention: 3-D carry leaves are ``(L, B, F)`` (lane
axis 1: ODE-RNN / RNN layer-stacked hidden); 2-D leaves are ``(B, H)``
(lane axis 0: CDE/RDE/NCP latent).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ode_vio_tpu.training.loop import make_infer_fn

Window = Tuple[np.ndarray, np.ndarray, np.ndarray]  # (imgs, imus, ts)


def _lane_axis(leaf: jnp.ndarray) -> int:
    return 1 if leaf.ndim >= 3 else 0


def _zero_lane(carry, lane: int):
    def z(leaf):
        idx = (slice(None), lane) if _lane_axis(leaf) == 1 else (lane,)
        return leaf.at[idx].set(0)

    return jax.tree_util.tree_map(z, carry)


def _select_lanes(mask: np.ndarray, new, old):
    """Per-lane select: lanes with mask=True take ``new``, others ``old``."""
    m = jnp.asarray(mask)

    def sel(a, b):
        shape = [1] * a.ndim
        shape[_lane_axis(a)] = m.shape[0]
        return jnp.where(m.reshape(shape), a, b)

    return jax.tree_util.tree_map(sel, new, old)


class StreamingEngine:
    """Sessions are integer handles onto batch lanes.

    ``step({sid: (imgs, imus, ts)}) -> {sid: poses}`` advances every
    submitted session by one window (shapes: imgs ``(S, H, W, 3)``
    centred float32, imus ``(10*(S-1)+1, 6)``, ts ``(S,)`` strictly
    ascending on the session's own clock). Sessions not in the dict are
    untouched. All windows in one call ride a single device step.
    """

    def __init__(self, model, variables, max_sessions: int = 8,
                 fold_bn: bool = True, sharding=None):
        """``sharding``: an optional ``jax.sharding.NamedSharding`` over a
        1-D data mesh axis; session lanes (batch axis 0 of the stacked
        windows, and the carried hidden states through jit propagation)
        then shard across devices — multi-chip serving from the same
        engine. ``max_sessions`` must be a multiple of the mesh size."""
        self.N = int(max_sessions)
        self._sharding = sharding
        self._infer = make_infer_fn(model, variables, fold_bn=fold_bn)
        self._free = list(range(self.N - 1, -1, -1))
        self._open: set = set()
        self._fresh: set = set()
        self._t_off = np.zeros(self.N, np.float64)
        self._carry = None
        self._last: Dict[int, Window] = {}
        self._proto: Optional[Window] = None

    # -- session lifecycle -------------------------------------------------
    def open_session(self) -> int:
        if not self._free:
            raise RuntimeError(f"all {self.N} lanes in use")
        lane = self._free.pop()
        self._open.add(lane)
        self._fresh.add(lane)
        if self._carry is not None:
            self._carry = _zero_lane(self._carry, lane)
        return lane

    def close_session(self, sid: int) -> None:
        self._open.discard(sid)
        self._fresh.discard(sid)
        self._last.pop(sid, None)
        self._free.append(sid)

    # -- serving -----------------------------------------------------------
    def step(self, windows: Dict[int, Window]) -> Dict[int, np.ndarray]:
        if not windows:
            return {}
        for sid in windows:
            if sid not in self._open:
                raise KeyError(f"session {sid} is not open")
        if self._proto is None:
            imgs0, imus0, ts0 = next(iter(windows.values()))
            self._proto = (
                np.zeros_like(np.asarray(imgs0, np.float32)),
                np.zeros_like(np.asarray(imus0, np.float32)),
                np.arange(len(ts0), dtype=np.float32) * 0.1,
            )

        stacked = []
        for lane in range(self.N):
            if lane in windows:
                imgs, imus, ts = windows[lane]
                ts = np.asarray(ts, np.float64)
                if lane in self._fresh:
                    # re-base this session's clock to 0 (cold-start
                    # semantics of the pose cores)
                    self._t_off[lane] = ts[0]
                    self._fresh.discard(lane)
                w = (
                    np.asarray(imgs, np.float32),
                    np.asarray(imus, np.float32),
                    (ts - self._t_off[lane]).astype(np.float32),
                )
                self._last[lane] = w
            else:
                # idle lane: replay (outputs discarded, carry restored)
                w = self._last.get(lane, self._proto)
            stacked.append(w)

        put = (
            jnp.asarray
            if self._sharding is None
            else (lambda x: jax.device_put(x, self._sharding))
        )
        imgs = put(np.stack([w[0] for w in stacked], 0))
        imus = put(np.stack([w[1] for w in stacked], 0))
        ts = put(np.stack([w[2] for w in stacked], 0))

        # truncated-solve counters only accumulate for lanes serving a real
        # window this step — idle lanes replaying stale/proto windows must
        # not inflate solver_incomplete (their outputs are discarded)
        active = np.array([ln in windows for ln in range(self.N)])
        if self._carry is None:
            poses, carry = self._infer(imgs, imus, ts, None, active=active)
            # lanes that did not really start yet must stay zeroed
            zeroed = jax.tree_util.tree_map(jnp.zeros_like, carry)
            self._carry = _select_lanes(active, carry, zeroed)
        else:
            poses, carry = self._infer(imgs, imus, ts, self._carry,
                                       active=active)
            self._carry = _select_lanes(active, carry, self._carry)

        poses = np.asarray(poses)
        return {sid: poses[sid] for sid in windows}

    def warmup(self, proto: Window) -> None:
        """Compile both executables (cold-start and carried) on synthetic
        lanes shaped like ``proto`` so the first served step pays no jit
        latency. Leaves no trace: the carry stays unset and the
        truncated-solve counters are reset afterwards."""
        imgs, imus, ts = proto
        self._proto = (
            np.zeros_like(np.asarray(imgs, np.float32)),
            np.zeros_like(np.asarray(imus, np.float32)),
            np.arange(len(ts), dtype=np.float32) * 0.1,
        )
        imgs = jnp.asarray(np.broadcast_to(
            self._proto[0][None], (self.N,) + self._proto[0].shape))
        imus = jnp.asarray(np.broadcast_to(
            self._proto[1][None], (self.N,) + self._proto[1].shape))
        tss = jnp.asarray(np.broadcast_to(
            self._proto[2][None], (self.N,) + self._proto[2].shape))
        inactive = np.zeros(self.N, bool)
        p0, carry = self._infer(imgs, imus, tss, None, active=inactive)
        # value fetches, not block_until_ready: on relayed backends the
        # latter can return while the remote compile is still in flight,
        # leaving the first served window to absorb it (cli/serve.py has
        # the same guard)
        np.asarray(p0)
        np.asarray(self._infer(imgs, imus, tss, carry, active=inactive)[0])
        self._infer.reset_incomplete()

    def incomplete(self) -> int:
        """Running total of ODE solves truncated by the step budget,
        counting only steps that served an active session."""
        return int(self._infer.incomplete())

    def incomplete_by_lane(self):
        """Per-lane truncated-solve totals (None before the first step)."""
        return self._infer.incomplete_by_lane()
