"""StreamingEngine: multi-session serving on one compiled executable.

Correctness contract: each session's pose stream must be independent of
which other sessions share the batch — identical (to float tolerance) to
running that session alone, including across idle steps and lane reuse.
"""

import jax
import numpy as np
import pytest

from ode_vio_tpu.config import Config, DataConfig, ModelConfig, SolverConfig
from ode_vio_tpu.models.deepvio import init_model
from ode_vio_tpu.serving import StreamingEngine

S, H, W = 3, 32, 64


def make_model():
    cfg = Config(
        model=ModelConfig(
            model_type="ode-rnn", img_w=W, img_h=H, seq_len=S,
            v_f_len=32, i_f_len=16, ode_hidden_dim=32, rnn_num_layers=2,
            compute_dtype="float32",
        ),
        solver=SolverConfig(max_steps=16, dt0=1e-2),
        data=DataConfig(seq_len=S),
    )
    return init_model(cfg, jax.random.PRNGKey(0))


def window(seed, t0=0.0):
    rng = np.random.default_rng(seed)
    imgs = rng.random((S, H, W, 3), np.float32) - 0.5
    imus = rng.standard_normal((10 * (S - 1) + 1, 6)).astype(np.float32)
    ts = t0 + np.cumsum(rng.random(S).astype(np.float32) * 0.05 + 0.08)
    return imgs, imus, ts


@pytest.fixture(scope="module")
def model_and_vars():
    return make_model()


def solo_run(model_and_vars, windows):
    """Reference: one engine serving exactly one session."""
    model, variables = model_and_vars
    eng = StreamingEngine(model, variables, max_sessions=4)
    sid = eng.open_session()
    return [eng.step({sid: w})[sid] for w in windows]


class TestStreamingEngine:
    def test_two_sessions_match_solo(self, model_and_vars):
        model, variables = model_and_vars
        a_wins = [window(1, 0.0), window(2, 0.5)]
        b_wins = [window(11, 3.0), window(12, 3.5)]
        ref_a = solo_run(model_and_vars, a_wins)
        ref_b = solo_run(model_and_vars, b_wins)

        eng = StreamingEngine(model, variables, max_sessions=4)
        a, b = eng.open_session(), eng.open_session()
        for k in range(2):
            out = eng.step({a: a_wins[k], b: b_wins[k]})
            np.testing.assert_allclose(out[a], ref_a[k], rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(out[b], ref_b[k], rtol=1e-5, atol=1e-6)

    def test_mesh_sharded_matches_unsharded(self, model_and_vars):
        """Lanes sharded over the 8-device data mesh must serve byte-for-
        byte the same session semantics as the single-device engine."""
        from ode_vio_tpu.parallel.mesh import batch_sharding, create_mesh

        model, variables = model_and_vars
        assert len(jax.devices()) == 8
        mesh = create_mesh(data=8, model=1)
        a_wins = [window(71, 0.0), window(72, 0.6)]
        b_wins = [window(81, 2.0), window(82, 2.7)]

        plain = StreamingEngine(model, variables, max_sessions=8)
        shard = StreamingEngine(model, variables, max_sessions=8,
                                sharding=batch_sharding(mesh))
        pa, pb = plain.open_session(), plain.open_session()
        sa, sb = shard.open_session(), shard.open_session()
        for k in range(2):
            out_p = plain.step({pa: a_wins[k], pb: b_wins[k]})
            out_s = shard.step({sa: a_wins[k], sb: b_wins[k]})
            np.testing.assert_allclose(out_s[sa], out_p[pa],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(out_s[sb], out_p[pb],
                                       rtol=1e-5, atol=1e-6)

    def test_idle_session_state_preserved(self, model_and_vars):
        model, variables = model_and_vars
        b_wins = [window(21, 0.0), window(22, 0.4)]
        ref_b = solo_run(model_and_vars, b_wins)

        eng = StreamingEngine(model, variables, max_sessions=4)
        a, b = eng.open_session(), eng.open_session()
        p0 = eng.step({a: window(31, 0.0), b: b_wins[0]})
        np.testing.assert_allclose(p0[b], ref_b[0], rtol=1e-5, atol=1e-6)
        eng.step({a: window(32, 0.4)})          # b idle — must not advance
        p1 = eng.step({b: b_wins[1]})
        np.testing.assert_allclose(p1[b], ref_b[1], rtol=1e-5, atol=1e-6)

    def test_lane_reuse_resets_state(self, model_and_vars):
        model, variables = model_and_vars
        wins = [window(41, 0.0), window(42, 0.4)]
        ref = solo_run(model_and_vars, wins)

        eng = StreamingEngine(model, variables, max_sessions=2)
        a = eng.open_session()
        eng.step({a: window(51, 7.0)})
        eng.step({a: window(52, 7.4)})
        eng.close_session(a)
        a2 = eng.open_session()
        assert a2 == a  # lane recycled
        out = [eng.step({a2: w})[a2] for w in wins]
        np.testing.assert_allclose(out[0], ref[0], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out[1], ref[1], rtol=1e-5, atol=1e-6)

    def test_clock_rebased_per_session(self, model_and_vars):
        """A session whose wall clock starts late must behave like one
        starting at t=0 (per-session re-basing). Tolerance note: the
        re-based timestamps of the shifted stream can differ from the
        base stream by 1 float32 ulp ((t+1000)-(t0+1000) rounding), and a
        1-ulp dt perturbation may flip an accept/reject decision in the
        adaptive controller — shifting the step sequence slightly. The
        integral itself stays within solver tolerance, so compare at the
        solver's accuracy, not bitwise."""
        model, variables = model_and_vars
        base = [window(61, 0.0), window(62, 0.4)]
        shifted = [(i, u, t + 1000.0) for (i, u, t) in base]
        ref = solo_run(model_and_vars, base)
        out = solo_run(model_and_vars, shifted)
        np.testing.assert_allclose(out[0], ref[0], rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(out[1], ref[1], rtol=2e-3, atol=2e-4)

    def test_overflow_raises(self, model_and_vars):
        model, variables = model_and_vars
        eng = StreamingEngine(model, variables, max_sessions=1)
        eng.open_session()
        with pytest.raises(RuntimeError):
            eng.open_session()

    def test_unknown_session_raises(self, model_and_vars):
        model, variables = model_and_vars
        eng = StreamingEngine(model, variables, max_sessions=1)
        with pytest.raises(KeyError):
            eng.step({0: window(71)})

    def test_warmup_compiles_without_trace(self, model_and_vars):
        """warmup() must not advance any session state or leak truncated-
        solve counts; a warmed engine serves identically to a cold one."""
        model, variables = model_and_vars
        wins = [window(81, 0.0), window(82, 0.5)]
        ref = solo_run(model_and_vars, wins)
        eng = StreamingEngine(model, variables, max_sessions=4)
        sid = eng.open_session()
        eng.warmup(wins[0])
        assert eng.incomplete() == 0
        out = [eng.step({sid: w})[sid] for w in wins]
        np.testing.assert_allclose(out[0], ref[0], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out[1], ref[1], rtol=1e-5, atol=1e-6)


class TestIncompleteMasking:
    def test_idle_lanes_do_not_count(self):
        """With a starved step budget every solve truncates; the engine's
        counter must only reflect lanes that served a real window — not
        idle-lane replays or warm-up protos (ADVICE r2)."""
        cfg = Config(
            model=ModelConfig(
                model_type="ode-rnn", img_w=W, img_h=H, seq_len=S,
                v_f_len=32, i_f_len=16, ode_hidden_dim=32, rnn_num_layers=2,
                compute_dtype="float32",
            ),
            # max_steps=1 cannot integrate a ~0.1 s interval at dt0=1e-4:
            # every (layer, interval) solve truncates
            solver=SolverConfig(max_steps=1, dt0=1e-4),
            data=DataConfig(seq_len=S),
        )
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        L, intervals = 2, S - 1
        per_window = L * intervals  # truncated solves per active lane step

        eng = StreamingEngine(model, variables, max_sessions=4)
        a = eng.open_session()
        b = eng.open_session()
        eng.warmup(window(90))
        assert eng.incomplete() == 0

        eng.step({a: window(91, 0.0), b: window(95, 0.0)})
        assert eng.incomplete() == 2 * per_window
        # b idles: its lane replays but must not accumulate
        eng.step({a: window(92, 0.5)})
        assert eng.incomplete() == 3 * per_window
        lanes = eng.incomplete_by_lane()
        assert lanes[a] == 2 * per_window
        assert lanes[b] == 1 * per_window
        assert lanes[2] == 0 and lanes[3] == 0
