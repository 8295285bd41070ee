"""Utils-layer tests: experiment dirs, loggers, tensor diagnostics,
profiling helpers (FLOP analysis, step timer, memory stats)."""

import logging

import jax.numpy as jnp
import numpy as np

from ode_vio_tpu.utils.logging_utils import (
    log_tensor_stats,
    setup_experiment_directories,
    setup_logger,
)
from ode_vio_tpu.utils.profiling import (
    StepTimer,
    annotate,
    device_memory_stats,
    flops_analysis,
)


class TestLogging:
    def test_experiment_directories(self, tmp_path):
        dirs = setup_experiment_directories(tmp_path, "exp1")
        for k in ("checkpoints", "logs", "graphs", "poses", "base"):
            assert dirs[k].exists()

    def test_logger_writes_file(self, tmp_path):
        lg = setup_logger("utest_logger", tmp_path, console=False)
        lg.info("hello %d", 42)
        for h in lg.handlers:
            h.flush()
        assert "hello 42" in (tmp_path / "utest_logger.log").read_text()

    def test_tensor_stats_flags_nan(self, tmp_path, caplog):
        lg = setup_logger("utest_debug", tmp_path, logging.DEBUG,
                          console=False)
        x = np.array([1.0, np.nan, 3.0])
        with caplog.at_level(logging.DEBUG, logger="utest_debug"):
            log_tensor_stats(x, "x", lg)
        assert "nan=True" in caplog.text


class TestProfiling:
    def test_flops_analysis_counts_matmul(self):
        def f(a, b):
            return a @ b

        a = jnp.ones((64, 64))
        analysis = flops_analysis(f, a, a)
        # XLA reports ~2*N^3 flops for an N x N matmul
        if "flops" in analysis:
            assert analysis["flops"] >= 2 * 64 ** 3 * 0.5

    def test_step_timer(self):
        t = StepTimer()
        x = jnp.ones((8, 8))
        with t.measure(lambda: x):
            y = x * 2
        assert len(t.times) == 1 and t.mean >= 0.0

    def test_annotate_scope(self):
        with annotate("test_scope"):
            r = jnp.sum(jnp.ones(4))
        assert float(r) == 4.0

    def test_device_memory_stats_dict(self):
        assert isinstance(device_memory_stats(), dict)
