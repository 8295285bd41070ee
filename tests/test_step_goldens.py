"""Adaptive dopri5 step-count parity at the reference operating point.

The reference integrates with torchode/torchdiffeq dopri5 at rtol 1e-2 /
atol 1e-6 / dt0 1e-4 (/root/reference/src/models/PoseODERNN.py:57,72).
torchdiffeq/torchode are not installed in this image, so the independent
check is tests/torch_ref.py — a torch re-implementation of the published
torchdiffeq algorithm. Each problem asserts:

  * solutions agree,
  * accepted/rejected step counts agree within +-1 step of the torch run,
  * accepted counts match the PINNED golden constants recorded from the
    torch reference run (so any silent controller drift fails loudly).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from ode_vio_tpu.ops.solvers import SolverOptions, solve_ivp  # noqa: E402
from torch_ref import odeint_dopri5  # noqa: E402

# the reference training operating point (PoseODERNN.py:57,72)
REF = dict(rtol=1e-2, atol=1e-6, dt0=1e-4, max_steps=256)


def mlp_field(seed, dims):
    """A small tanh MLP vector field like the reference ODEFunc
    (ODEFunc.py:5-39: Linear stacks with N(0, 0.1) weights, final tanh)."""
    rng = np.random.default_rng(seed)
    ws = [0.1 * rng.standard_normal((dims[i + 1], dims[i])).astype(np.float32)
          for i in range(len(dims) - 1)]

    def f_np(y, mod):
        h = y
        for w in ws[:-1]:
            h = mod.tanh(h @ mod.asarray(w.T) if mod is jnp else
                         h @ torch.from_numpy(w.T))
        last = ws[-1]
        h = h @ (mod.asarray(last.T) if mod is jnp else torch.from_numpy(last.T))
        return mod.tanh(h) if mod is jnp else torch.tanh(h)

    return f_np


# (name, jax field, torch field, y0, t0, t1, golden accepted steps)
def problems():
    f1 = lambda t, y: -0.7 * y
    f1t = lambda t, y: -0.7 * y

    mk = mlp_field(0, (8, 16, 8))
    f2 = lambda t, y: mk(y, jnp)
    f2t = lambda t, y: mk(y, torch)

    def f3(t, y):
        return jnp.stack([y[1], -y[0]])

    def f3t(t, y):
        return torch.stack([y[1], -y[0]])

    y1 = np.full((4,), 1.5, np.float32)
    y2 = np.linspace(-1.0, 1.0, 8).astype(np.float32)
    y3 = np.array([1.0, 0.0], np.float32)
    return [
        # KITTI frame-interval solves (0.1 s), the reference's actual load
        ("decay_frame", f1, f1t, y1, 0.0, 0.1, 4),
        ("mlp_frame", f2, f2t, y2, 0.0, 0.1, 4),
        # a long interval exercising the controller ramp
        ("oscillator_2s", f3, f3t, y3, 0.0, 2.0, 6),
    ]


@pytest.mark.parametrize("name,fj,ft,y0,t0,t1,golden",
                         problems(), ids=lambda p: str(p)[:16])
def test_step_count_parity(name, fj, ft, y0, t0, t1, golden):
    if not isinstance(name, str):
        pytest.skip("param unpack artifact")
    opts = SolverOptions(method="dopri5", unroll_mode="while", **REF)
    yj, stats = solve_ivp(fj, jnp.asarray(y0), t0, t1, opts)

    yt, _, acc_t, rej_t = odeint_dopri5(ft, torch.from_numpy(y0), t0, t1,
                                        **REF)

    np.testing.assert_allclose(np.asarray(yj), yt.numpy(), rtol=1e-4,
                               atol=1e-6)
    assert abs(int(stats.accepted) - acc_t) <= 1, (
        f"{name}: accepted {int(stats.accepted)} vs torch {acc_t}"
    )
    assert abs(int(stats.rejected) - rej_t) <= 1, (
        f"{name}: rejected {int(stats.rejected)} vs torch {rej_t}"
    )
    # pinned golden from the torch reference run — controller drift guard
    assert abs(acc_t - golden) <= 1, (
        f"{name}: torch reference itself drifted: {acc_t} vs golden {golden}"
    )
