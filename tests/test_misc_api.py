"""Coverage for the remaining public APIs: automatic initial step size,
XLA FLOP analysis of the full model, and tensor-parallel sharding rules."""

import jax
import jax.numpy as jnp
import numpy as np

from ode_vio_tpu.config import Config, DataConfig, ModelConfig, SolverConfig
from ode_vio_tpu.models.deepvio import analyse_flops
from ode_vio_tpu.ops.solvers import SolverOptions, solve_ivp
from ode_vio_tpu.ops.solvers.odeint import initial_step_size
from ode_vio_tpu.parallel import create_mesh
from ode_vio_tpu.parallel.mesh import auto_data_axis, param_sharding_rules


class TestInitialStepSize:
    def test_reasonable_for_decay(self):
        f = lambda t, y: -0.7 * y
        h = float(initial_step_size(f, jnp.ones(3), 0.0, order=5,
                                    rtol=1e-3, atol=1e-6))
        assert 1e-5 < h < 1.0

    def test_usable_as_dt0(self):
        f = lambda t, y: -0.7 * y
        h = initial_step_size(f, jnp.ones(3), 0.0, order=5,
                              rtol=1e-4, atol=1e-7)
        opts = SolverOptions(rtol=1e-4, atol=1e-7, max_steps=64)
        y1, stats = solve_ivp(f, jnp.ones(3), 0.0, 1.0, opts, dt0=h)
        np.testing.assert_allclose(np.asarray(y1), np.exp(-0.7), rtol=1e-3)
        # auto dt0 should not need the controller ramp from 1e-4
        assert int(stats.accepted) <= 12


class TestFlopsAnalysis:
    def test_full_model_flops(self):
        cfg = Config(
            model=ModelConfig(model_type="rnn", img_w=64, img_h=32,
                              seq_len=3, v_f_len=16, i_f_len=8,
                              rnn_num_layers=1, compute_dtype="float32"),
            data=DataConfig(seq_len=3),
        )
        analysis = analyse_flops(cfg)
        # conv trunk alone is hundreds of MFLOPs even at this tiny size
        assert analysis.get("flops", 0) > 1e7


class TestShardingRules:
    def test_large_kernels_shard_over_model_axis(self):
        mesh = create_mesh(4, 2)
        params = {
            "big": jnp.zeros((512, 1024)),   # sharded (size, divisible)
            "small": jnp.zeros((16, 16)),     # replicated (too small)
            "vec": jnp.zeros((2048,)),        # replicated (1-D)
        }
        rules = param_sharding_rules(params, mesh)
        assert rules["big"].spec == jax.sharding.PartitionSpec(None, "model")
        assert rules["small"].spec == jax.sharding.PartitionSpec()
        assert rules["vec"].spec == jax.sharding.PartitionSpec()

    def test_auto_data_axis(self):
        assert auto_data_axis(4, 1) == 4   # 8 devices, batch 4 -> dp 4
        assert auto_data_axis(16, 1) == 8  # batch 16 -> all 8
        assert auto_data_axis(6, 1) == 2   # gcd-style fallback
        assert auto_data_axis(7, 1) == 1


def test_dryrun_multichip_still_green():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(4)


class TestUsePallasAuto:
    """Tri-state --use_pallas: explicit wins; auto enables the fused
    solve only for cde/rde on a TPU backend (BENCH.md round-3 A/B)."""

    def test_explicit_overrides_auto(self):
        for fam in ("ode-rnn", "cde"):
            on = ModelConfig(model_type=fam, use_pallas=True)
            off = ModelConfig(model_type=fam, use_pallas=False)
            assert on.resolved_use_pallas() is True
            assert off.resolved_use_pallas() is False

    def test_auto_off_on_cpu(self):
        # the test mesh is the CPU backend: auto must resolve off
        assert jax.default_backend() == "cpu"
        for fam in ("ode-rnn", "rnn", "cde", "rde", "cfc"):
            assert ModelConfig(model_type=fam).resolved_use_pallas() is False

    def test_auto_on_tpu_only_for_cde_families(self, monkeypatch):
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert ModelConfig(model_type="cde").resolved_use_pallas() is True
        assert ModelConfig(model_type="rde").resolved_use_pallas() is True
        assert ModelConfig(model_type="ode-rnn").resolved_use_pallas() is False
        assert ModelConfig(model_type="rnn").resolved_use_pallas() is False

    def test_flag_tri_state(self):
        from ode_vio_tpu.cli.flags import build_parser

        p = build_parser()
        base = ["--data_dir", "/tmp/x"]
        assert p.parse_args(base).use_pallas is None
        assert p.parse_args(base + ["--use_pallas"]).use_pallas is True
        assert p.parse_args(base + ["--no-use_pallas"]).use_pallas is False
