"""Training-stack tests: loss decreases, schedule, freezing, accumulation,
checkpoint roundtrip, and multi-device data parallelism."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ode_vio_tpu.config import Config, DataConfig, ModelConfig, SolverConfig, TrainConfig
from ode_vio_tpu.models.deepvio import init_model
from ode_vio_tpu.parallel import create_mesh, shard_batch
from ode_vio_tpu.training.checkpoint import CheckpointManager
from ode_vio_tpu.training.loop import (
    create_train_state,
    lr_for_epoch,
    make_infer_fn,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)


def tiny_config(**train_kw) -> Config:
    return Config(
        model=ModelConfig(model_type="ode-rnn", img_w=64, img_h=32, seq_len=3,
                          v_f_len=32, i_f_len=16, ode_hidden_dim=16,
                          rnn_num_layers=2, compute_dtype="float32"),
        solver=SolverConfig(max_steps=8, dt0=1e-2),
        train=TrainConfig(batch_size=4, **train_kw),
        data=DataConfig(seq_len=3),
    )


def tiny_batch(B=4, seed=0):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.random((B, 3, 32, 64, 3), np.float32) - 0.5)
    imu = jnp.asarray(rng.standard_normal((B, 21, 6)), jnp.float32)
    gts = jnp.asarray(rng.standard_normal((B, 2, 6)) * 0.1, jnp.float32)
    ts = jnp.asarray(np.cumsum(rng.random((B, 3)).astype(np.float32) * 0.1, 1))
    return img, imu, gts, ts


def setup(cfg, donate=True):
    model, variables = init_model(cfg, jax.random.PRNGKey(0), batch_size=1)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, variables, tx, jax.random.PRNGKey(1))
    return model, tx, state


class TestSchedule:
    def test_three_phases(self):
        cfg = tiny_config(epochs_warmup=2, epochs_joint=3, epochs_fine=4)
        lrs = [lr_for_epoch(cfg, e) for e in range(9)]
        assert lrs == [1e-4] * 2 + [1e-5] * 3 + [1e-6] * 4

    def test_set_learning_rate_through_wrappers(self):
        cfg = tiny_config(freeze_encoder=True, grad_accumulation_steps=2)
        _, tx, state = setup(cfg)
        new = set_learning_rate(state.opt_state, 3e-5)

        found = []

        def find_lr(s):
            if hasattr(s, "hyperparams"):
                found.append(float(s.hyperparams["learning_rate"]))
            for attr in ("inner_opt_state", "inner_state"):
                if hasattr(s, attr):
                    find_lr(getattr(s, attr))
            if hasattr(s, "inner_states"):
                for v in s.inner_states.values():
                    find_lr(v)

        find_lr(new)
        assert found and found[0] == pytest.approx(3e-5)

    def test_regressor_group_keeps_own_lr(self):
        """Reference parity: the epoch schedule writes param group 0 only
        (train_model.py:214-216); the regressor group's LR is untouched."""
        cfg = tiny_config(lr_regressor=5e-4, freeze_encoder=True)
        _, tx, state = setup(cfg)
        new = set_learning_rate(state.opt_state, 1e-5)  # 'train' group

        def group_lr(s, g):
            if hasattr(s, "inner_opt_state"):
                return group_lr(s.inner_opt_state, g)
            return float(s.inner_states[g].inner_state.hyperparams[
                "learning_rate"])

        assert group_lr(new, "train") == pytest.approx(1e-5)
        assert group_lr(new, "regressor") == pytest.approx(5e-4)

        new2 = set_learning_rate(new, 7e-4, group="regressor")
        assert group_lr(new2, "train") == pytest.approx(1e-5)
        assert group_lr(new2, "regressor") == pytest.approx(7e-4)

        with pytest.raises(KeyError):
            set_learning_rate(new, 1e-3, group="nonexistent")

    def test_regressor_group_updates_at_own_rate(self):
        """Functionally: with the regressor LR zeroed, the regressor params
        must not move while the rest of the pose net does."""
        cfg = tiny_config(lr_regressor=0.0)
        model, tx, state = setup(cfg)
        step = make_train_step(model, tx, cfg)

        def regressor_leaves(params):
            flat = jax.tree_util.tree_flatten_with_path(params)[0]
            reg, rest = [], []
            for path, leaf in flat:
                keys = [getattr(p, "key", None) for p in path]
                (reg if "regressor" in keys else rest).append(np.asarray(leaf))
            return reg, rest

        reg0, rest0 = regressor_leaves(state.params["pose_net"])
        state, _ = step(state, *tiny_batch())
        reg1, rest1 = regressor_leaves(state.params["pose_net"])
        assert reg0 and all((a == b).all() for a, b in zip(reg0, reg1))
        assert any((a != b).any() for a, b in zip(rest0, rest1))


class TestTrainStep:
    def test_loss_decreases(self):
        cfg = tiny_config()
        model, tx, state = setup(cfg)
        step = make_train_step(model, tx, cfg)
        batch = tiny_batch()
        losses = []
        for _ in range(6):
            state, m = step(state, *batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        assert all(np.isfinite(losses))

    def test_freeze_encoder(self):
        cfg = tiny_config(freeze_encoder=True)
        model, tx, state = setup(cfg)
        before = jax.tree_util.tree_map(
            np.asarray, state.params["image_encoder"]
        )
        # the epoch schedule must not unfreeze anything
        state = state.replace(
            opt_state=set_learning_rate(state.opt_state, 3e-5))
        step = make_train_step(model, tx, cfg)
        state, _ = step(state, *tiny_batch())
        after = state.params["image_encoder"]
        assert jax.tree_util.tree_all(
            jax.tree_util.tree_map(
                lambda a, b: bool((np.asarray(b) == a).all()), before, after
            )
        )
        # pose net must still train
        assert float(
            optax.global_norm(
                jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.float32), state.params["pose_net"]
                )
            )
        ) > 0

    def test_freeze_split_matches_full_grad(self):
        """freeze_encoder skips building the encoder backward (the params
        leave the differentiated arguments, mirroring torch
        requires_grad=False). The resulting update must equal the naive
        path: full grad over all params with the encoder slots zeroed."""
        cfg = tiny_config(freeze_encoder=True)
        model, tx, state = setup(cfg)
        batch = tiny_batch()
        img, imu, gts, ts = batch
        w = cfg.train.angle_loss_weight

        # manual reference: differentiate w.r.t. ALL params, zero encoder
        params0 = jax.tree_util.tree_map(np.asarray, state.params)
        bs0 = jax.tree_util.tree_map(np.asarray, state.batch_stats)
        opt0 = jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x,
            state.opt_state)
        rng0 = np.asarray(state.rng)
        _, r_drop, r_gumbel = jax.random.split(state.rng, 3)
        rngs = {"dropout": r_drop, "gumbel": r_gumbel}

        def full_loss(params):
            (poses, _), _ = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                img, imu, ts, train=True, rngs=rngs,
                mutable=["batch_stats", "intermediates"],
            )
            angle = jnp.mean((poses[..., :3] - gts[..., :3]) ** 2)
            trans = jnp.mean((poses[..., 3:] - gts[..., 3:]) ** 2)
            return w * angle + trans

        grads = jax.jit(jax.grad(full_loss))(state.params)
        # params whose true gradient is zero (e.g. a conv bias directly
        # before BatchNorm — the mean subtraction kills it exactly) carry
        # only float noise, which differs between compilations and which
        # Adam amplifies to +-lr; exclude them from the update comparison
        noisy = {
            path for path, g in jax.tree_util.tree_leaves_with_path(grads)
            if float(jnp.max(jnp.abs(g))) < 1e-7
        }
        grads = {**grads, "image_encoder": jax.tree_util.tree_map(
            jnp.zeros_like, grads["image_encoder"])}
        updates, _ = tx.update(grads, state.opt_state, state.params)
        params_ref = optax.apply_updates(state.params, updates)
        params_ref = jax.tree_util.tree_map(np.asarray, params_ref)

        # the real (donating) step on an identical reconstructed state
        from ode_vio_tpu.training.loop import TrainState
        state2 = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=jax.tree_util.tree_map(jnp.asarray, params0),
            batch_stats=jax.tree_util.tree_map(jnp.asarray, bs0),
            opt_state=jax.tree_util.tree_map(
                lambda x: jnp.asarray(x) if hasattr(x, "shape") else x, opt0),
            rng=jnp.asarray(rng0),
        )
        step = make_train_step(model, tx, cfg)
        state2, _ = step(state2, *batch)

        flat_ref = jax.tree_util.tree_leaves_with_path(params_ref)
        flat_got = dict(jax.tree_util.tree_leaves_with_path(
            jax.tree_util.tree_map(np.asarray, state2.params)))
        compared = 0
        for path, ref in flat_ref:
            if path in noisy:
                continue
            np.testing.assert_allclose(
                flat_got[path], ref, rtol=1e-5, atol=1e-7,
                err_msg=str(path))
            compared += 1
        assert compared >= 10  # the skip must not hollow out the test

    def test_freeze_updates_encoder_batch_stats(self):
        """torch parity: requires_grad=False does not stop BatchNorm
        running-statistics updates in train mode — neither must we."""
        cfg = tiny_config(freeze_encoder=True)
        model, tx, state = setup(cfg)
        before = jax.tree_util.tree_map(
            np.asarray, state.batch_stats["image_encoder"])
        step = make_train_step(model, tx, cfg)
        state, _ = step(state, *tiny_batch())
        after = state.batch_stats["image_encoder"]
        changed = jax.tree_util.tree_map(
            lambda a, b: bool((np.asarray(b) != a).any()), before, after)
        assert any(jax.tree_util.tree_leaves(changed))

    def test_frozen_eval_step_semantics(self):
        """frozen_encoder_eval: the frozen image encoder runs its
        inference graph inside the train step — image params AND running
        statistics stay bitwise constant (unlike torch train mode, whose
        stats keep drifting: test_freeze_updates_encoder_batch_stats),
        the inertial encoder still updates its statistics, and the pose
        net still trains."""
        cfg = tiny_config(freeze_encoder=True, frozen_encoder_eval=True)
        model, tx, state = setup(cfg)
        p0 = jax.tree_util.tree_map(np.asarray, state.params["image_encoder"])
        bs0 = jax.tree_util.tree_map(
            np.asarray, state.batch_stats["image_encoder"])
        ibs0 = jax.tree_util.tree_map(
            np.asarray, state.batch_stats["inertial_encoder"])
        step = make_train_step(model, tx, cfg)
        batch = tiny_batch()
        losses = []
        for _ in range(5):
            state, m = step(state, *batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] and all(np.isfinite(losses))
        for before, after in ((p0, state.params["image_encoder"]),
                              (bs0, state.batch_stats["image_encoder"])):
            assert jax.tree_util.tree_all(jax.tree_util.tree_map(
                lambda a, b: bool((np.asarray(b) == a).all()), before, after))
        assert any(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda a, b: bool((np.asarray(b) != a).any()),
            ibs0, state.batch_stats["inertial_encoder"])))

    def test_frozen_eval_matches_explicit_composition(self):
        """The frozen-eval step's loss must equal composing the public
        pieces by hand: visual features from the UNFOLDED eval-mode
        encoder forward, then pose_from_visual in train mode with the
        step's own PRNG split (validates both the BN bias-fold exactness
        and the wiring)."""
        cfg = tiny_config(freeze_encoder=True, frozen_encoder_eval=True)
        model, tx, state = setup(cfg)
        batch = tiny_batch()
        img, imu, gts, ts = batch
        w = cfg.train.angle_loss_weight

        _, r_drop, r_gumbel = jax.random.split(state.rng, 3)
        rngs = {"dropout": r_drop, "gumbel": r_gumbel}
        variables = {"params": jax.tree_util.tree_map(np.asarray,
                                                      state.params),
                     "batch_stats": jax.tree_util.tree_map(
                         np.asarray, state.batch_stats)}
        fv = model.apply(
            variables, img,
            method=lambda m, x: m.image_net(x, train=False),
        )
        (poses, _), _ = model.apply(
            variables, fv, imu, ts, train=True, rngs=rngs,
            mutable=["batch_stats", "intermediates"],
            method="pose_from_visual",
        )
        angle = jnp.mean((poses[..., :3] - gts[..., :3]) ** 2)
        trans = jnp.mean((poses[..., 3:] - gts[..., 3:]) ** 2)
        loss_manual = float(w * angle + trans)

        step = make_train_step(model, tx, cfg)
        _, m = step(state, *batch)
        np.testing.assert_allclose(float(m["loss"]), loss_manual,
                                   rtol=1e-5, atol=1e-7)

    def test_grad_accumulation_defers_update(self):
        cfg = tiny_config(grad_accumulation_steps=2)
        model, tx, state = setup(cfg)
        p0 = jax.tree_util.tree_map(np.asarray, state.params["pose_net"])
        step = make_train_step(model, tx, cfg)
        state, _ = step(state, *tiny_batch())
        unchanged = jax.tree_util.tree_all(
            jax.tree_util.tree_map(
                lambda a, b: bool((np.asarray(b) == a).all()),
                p0, state.params["pose_net"],
            )
        )
        assert unchanged  # first micro-step only accumulates
        state, _ = step(state, *tiny_batch(seed=1))
        changed = not jax.tree_util.tree_all(
            jax.tree_util.tree_map(
                lambda a, b: bool((np.asarray(b) == a).all()),
                p0, state.params["pose_net"],
            )
        )
        assert changed

    def test_starved_solver_budget_visible_in_metrics(self):
        """A starved max_steps_train must surface as a nonzero
        solver_incomplete metric instead of silently truncating."""
        cfg = tiny_config()
        starved = Config(
            model=cfg.model,
            solver=SolverConfig(max_steps=64, max_steps_train=2, dt0=1e-7,
                                factor_max=1.1),
            train=cfg.train, data=cfg.data,
        )
        model, tx, state = setup(starved)
        step = make_train_step(model, tx, starved)
        _, metrics = step(state, *tiny_batch())
        assert int(metrics["solver_incomplete"]) > 0

        cfg_ok = tiny_config()
        model, tx, state = setup(cfg_ok)
        step = make_train_step(model, tx, cfg_ok)
        _, metrics = step(state, *tiny_batch())
        assert int(metrics["solver_incomplete"]) == 0

    def test_batch_stats_update_in_train(self):
        cfg = tiny_config()
        model, tx, state = setup(cfg)
        bs0 = jax.tree_util.tree_map(np.asarray, state.batch_stats)
        step = make_train_step(model, tx, cfg)
        state, _ = step(state, *tiny_batch())
        same = jax.tree_util.tree_all(
            jax.tree_util.tree_map(
                lambda a, b: bool(np.allclose(np.asarray(b), a)),
                bs0, state.batch_stats,
            )
        )
        assert not same


class TestCarryExposure:
    """Carried-state exposure training (TrainConfig.carry_exposure): the
    TBPTT-split step that trains the pose core on the carried-state
    distribution streaming eval feeds it. The reference has no
    counterpart — it always trains fresh windows (PoseCDE.py:81,
    PoseODERNN.py:100) yet evaluates stateful (KITTI_eval.py:141); the
    resulting distribution shift is the measured streaming-accuracy gap
    of the CDE families (BENCH.md round 4)."""

    @pytest.mark.parametrize("model_type", ["ode-rnn", "cde"])
    def test_carried_step_trains(self, model_type):
        import dataclasses

        # cde needs >= 2 pose steps per segment (a 1-knot path has zero
        # interpolation segments) -> seq_len 5; ode-rnn runs the suite's
        # tiny seq_len 3
        S = 5 if model_type == "cde" else 3
        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, model_type=model_type, cde_hidden_dim=8,
                seq_len=S),
            data=dataclasses.replace(cfg.data, seq_len=S),
        )
        model, tx, state = setup(cfg)
        p0 = jax.tree_util.tree_map(np.asarray, state.params["pose_net"])
        step = make_train_step(model, tx, cfg, carry=True)
        rng = np.random.default_rng(0)
        batch = (
            jnp.asarray(rng.random((4, S, 32, 64, 3), np.float32) - 0.5),
            jnp.asarray(rng.standard_normal((4, 10 * (S - 1) + 1, 6)),
                        jnp.float32),
            jnp.asarray(rng.standard_normal((4, S - 1, 6)) * 0.1,
                        jnp.float32),
            jnp.asarray(np.cumsum(
                rng.random((4, S)).astype(np.float32) * 0.1, 1)),
        )
        losses = []
        for _ in range(5):
            state, m = step(state, *batch)
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        changed = not jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: bool((np.asarray(b) == a).all()),
            p0, state.params["pose_net"]))
        assert changed
        if model_type == "ode-rnn":
            # the CDE field at random init is stiff/chaotic (BENCH.md
            # round 3) — loss monotonicity is only a fair ask of ode-rnn
            assert losses[-1] < losses[0]

    def test_carried_matches_explicit_composition(self):
        """The carried step's loss must equal composing the public model
        pieces by hand with the step's own PRNG splits: full-window
        visual features, fresh segment 1, stop-gradiented carry into
        segment 2 on the sequence clock, loss over both segments."""
        cfg = tiny_config()
        model, tx, state = setup(cfg)
        batch = tiny_batch()
        img, imu, gts, ts = batch
        w = cfg.train.angle_loss_weight
        k = (cfg.model.seq_len - 1) // 2  # = 1 at seq_len 3

        _, r_drop, r_gumbel = jax.random.split(state.rng, 3)
        r_img, r_p1, r_p2 = jax.random.split(r_drop, 3)
        g1, g2 = jax.random.split(r_gumbel)
        variables = {
            "params": jax.tree_util.tree_map(np.asarray, state.params),
            "batch_stats": jax.tree_util.tree_map(
                np.asarray, state.batch_stats),
        }
        fv, upd = model.apply(
            variables, img, train=True, rngs={"dropout": r_img},
            mutable=["batch_stats"],
            method=lambda m, x, train: m.image_net(x, train=train),
        )
        bs = {**dict(variables["batch_stats"]), **dict(upd["batch_stats"])}
        (p1, hc), upd1 = model.apply(
            {"params": variables["params"], "batch_stats": bs},
            fv[:, :k], imu[:, : 10 * k + 1], ts[:, : k + 1],
            train=True, rngs={"dropout": r_p1, "gumbel": g1},
            mutable=["batch_stats", "intermediates"],
            method="pose_from_visual",
        )
        bs = {**bs, **dict(upd1["batch_stats"])}
        (p2, _), _ = model.apply(
            {"params": variables["params"], "batch_stats": bs},
            fv[:, k:], imu[:, 10 * k:], ts[:, k:], hc=hc,
            train=True, rngs={"dropout": r_p2, "gumbel": g2},
            mutable=["batch_stats", "intermediates"],
            method="pose_from_visual",
        )
        poses = jnp.concatenate([p1, p2], axis=1)
        angle = jnp.mean((poses[..., :3] - gts[..., :3]) ** 2)
        trans = jnp.mean((poses[..., 3:] - gts[..., 3:]) ** 2)
        loss_manual = float(w * angle + trans)

        step = make_train_step(model, tx, cfg, carry=True)
        _, m = step(state, *batch)
        np.testing.assert_allclose(float(m["loss"]), loss_manual,
                                   rtol=1e-5, atol=1e-7)

    def test_carried_step_differs_from_fresh(self):
        """The carried step must differ from the SAME two-segment
        composition with the carry dropped (hc=None) under IDENTICAL
        per-segment PRNG splits. (Comparing against the plain fresh step
        would prove nothing: the carried step consumes the dropout/gumbel
        keys differently, so the losses would differ even if hc were
        ignored entirely.)"""
        cfg = tiny_config()
        model, tx, state = setup(cfg)
        batch = tiny_batch()
        img, imu, gts, ts = batch
        w = cfg.train.angle_loss_weight
        k = (cfg.model.seq_len - 1) // 2  # = 1 at seq_len 3

        # the carried step's own PRNG splits (loop.py carried_loss_fn)
        _, r_drop, r_gumbel = jax.random.split(state.rng, 3)
        r_img, r_p1, r_p2 = jax.random.split(r_drop, 3)
        g1, g2 = jax.random.split(r_gumbel)
        variables = {
            "params": jax.tree_util.tree_map(np.asarray, state.params),
            "batch_stats": jax.tree_util.tree_map(
                np.asarray, state.batch_stats),
        }
        fv, upd = model.apply(
            variables, img, train=True, rngs={"dropout": r_img},
            mutable=["batch_stats"],
            method=lambda m, x, train: m.image_net(x, train=train),
        )
        bs = {**dict(variables["batch_stats"]), **dict(upd["batch_stats"])}
        (p1, _hc), upd1 = model.apply(
            {"params": variables["params"], "batch_stats": bs},
            fv[:, :k], imu[:, : 10 * k + 1], ts[:, : k + 1],
            train=True, rngs={"dropout": r_p1, "gumbel": g1},
            mutable=["batch_stats", "intermediates"],
            method="pose_from_visual",
        )
        bs = {**bs, **dict(upd1["batch_stats"])}
        (p2, _), _ = model.apply(
            {"params": variables["params"], "batch_stats": bs},
            fv[:, k:], imu[:, 10 * k:], ts[:, k:], hc=None,  # carry DROPPED
            train=True, rngs={"dropout": r_p2, "gumbel": g2},
            mutable=["batch_stats", "intermediates"],
            method="pose_from_visual",
        )
        poses = jnp.concatenate([p1, p2], axis=1)
        angle = jnp.mean((poses[..., :3] - gts[..., :3]) ** 2)
        trans = jnp.mean((poses[..., 3:] - gts[..., 3:]) ** 2)
        loss_no_carry = float(w * angle + trans)

        _, mc = make_train_step(model, tx, cfg, carry=True)(state, *batch)
        assert float(mc["loss"]) != pytest.approx(loss_no_carry)

    def test_bad_split_rejected(self):
        cfg = tiny_config(carry_split=2)  # seq_len 3 -> only k=1 is legal
        model, tx, _ = setup(cfg)
        with pytest.raises(ValueError, match="carry_split"):
            make_train_step(model, tx, cfg, carry=True)

    def test_carry_exposure_range_validated(self):
        """carry_exposure is a probability; out-of-range values must be
        rejected at config build, not silently saturate."""
        with pytest.raises(ValueError, match="carry_exposure"):
            tiny_config(carry_exposure=1.5)
        with pytest.raises(ValueError, match="carry_exposure"):
            tiny_config(carry_exposure=-0.1)

    def test_exposure_dispatch_resumable(self):
        """The fresh-vs-carried Bernoulli dispatch is reseeded per epoch
        from (seed, epoch): a run resumed at epoch E replays exactly the
        draws the uninterrupted run makes at epoch E (the round-4 advisor
        finding: a run-lifetime rng would restart the sequence)."""
        from ode_vio_tpu.cli.train import _exposure_step

        cfg = tiny_config(carry_exposure=0.5)
        fresh = lambda s, *b: (s, "fresh")      # noqa: E731
        carried = lambda s, *b: (s, "carried")  # noqa: E731

        def epoch_seq(epoch, n=16):
            step = _exposure_step(fresh, carried, cfg, epoch)
            return [step(None)[1] for _ in range(n)]

        full_run = {e: epoch_seq(e) for e in range(3)}
        resumed = {e: epoch_seq(e) for e in (1, 2)}  # resume at epoch 1
        assert resumed == {e: full_run[e] for e in (1, 2)}
        # and the dispatch actually mixes both regimes at p=0.5
        flat = [x for seq in full_run.values() for x in seq]
        assert {"fresh", "carried"} == set(flat)


class TestStreamingTBPTT:
    """Full-sequence TBPTT training (loop.py::make_streaming_train_step +
    kitti.py::StreamingChainSampler): the round-5 answer to the measured
    nonstationary carried-state distribution (BENCH.md round 5)."""

    def test_cold_stream_step_matches_fresh_step(self):
        """hc=None must reproduce the standard fresh step exactly (same
        PRNG splits, same forward) — a chain start IS a fresh window."""
        from ode_vio_tpu.training.loop import make_streaming_train_step

        cfg = tiny_config()
        model, tx, s1 = setup(cfg)
        _, _, s2 = setup(cfg)
        batch = tiny_batch()
        _, mf = make_train_step(model, tx, cfg)(s1, *batch)
        _, ms, hc = make_streaming_train_step(model, tx, cfg)(s2, *batch)
        assert float(ms["loss"]) == pytest.approx(float(mf["loss"]),
                                                  rel=1e-6)
        assert hc is not None

    @pytest.mark.parametrize("model_type", ["ode-rnn", "rnn", "cde"])
    def test_carried_stream_matches_manual_composition(self, model_type):
        """Step B fed step A's hc_out must equal composing the model by
        hand with the step's own PRNG splits — and differ from the same
        step with the carry dropped. For cde only the mechanism is
        asserted (carried != cold, state threads): its random-init field
        is stiff (every solve truncates at the train budget, BENCH.md
        round 3), so the integral amplifies the plain-forward vs
        VJP-forward compilation difference past any honest tolerance —
        the measured spread across three compilations of the same
        composition is ~1.6 %."""
        from ode_vio_tpu.training.loop import make_streaming_train_step

        import dataclasses

        # cde solves over an interpolated path: give it the same S=5
        # window the carried-split tests use (>= 2 interp segments)
        S = 5 if model_type == "cde" else 3
        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, model_type=model_type, cde_hidden_dim=8,
                seq_len=S),
            data=dataclasses.replace(cfg.data, seq_len=S),
        )

        def batch_S(seed):
            rng = np.random.default_rng(seed)
            return (
                jnp.asarray(rng.random((4, S, 32, 64, 3), np.float32) - 0.5),
                jnp.asarray(rng.standard_normal((4, 10 * (S - 1) + 1, 6)),
                            jnp.float32),
                jnp.asarray(rng.standard_normal((4, S - 1, 6)) * 0.1,
                            jnp.float32),
                jnp.asarray(np.cumsum(
                    rng.random((4, S)).astype(np.float32) * 0.1, 1)),
            )

        model, tx, state = setup(cfg)
        step = make_streaming_train_step(model, tx, cfg)
        bA, bB = batch_S(0), batch_S(1)
        state, _, hc = step(state, *bA)

        host = jax.device_get(state)

        def fresh_copy():
            return jax.tree_util.tree_map(jnp.asarray, host)

        # manual composition with the step's PRNG discipline (jitted, so
        # both sides run compiled numerics)
        sh = fresh_copy()
        _, r_drop, r_gumbel = jax.random.split(sh.rng, 3)
        img, imu, gts, ts = bB

        @jax.jit
        def manual_loss(params, batch_stats, hc):
            (poses, _), _ = model.apply(
                {"params": params, "batch_stats": batch_stats},
                img, imu, ts, hc=hc, train=True,
                rngs={"dropout": r_drop, "gumbel": r_gumbel},
                mutable=["batch_stats", "intermediates"],
            )
            w = cfg.train.angle_loss_weight
            angle = jnp.mean((poses[..., :3] - gts[..., :3]) ** 2)
            trans = jnp.mean((poses[..., 3:] - gts[..., 3:]) ** 2)
            return w * angle + trans

        loss_manual = float(manual_loss(sh.params, sh.batch_stats, hc))

        _, m_carried, hc2 = step(fresh_copy(), *bB, hc)
        _, m_cold, _ = step(fresh_copy(), *bB)
        if model_type != "cde":  # see docstring
            assert float(m_carried["loss"]) == pytest.approx(loss_manual,
                                                             rel=1e-5)
        assert float(m_carried["loss"]) != pytest.approx(
            float(m_cold["loss"]))
        assert hc2 is not None

    def test_tbptt_flags_validated(self):
        with pytest.raises(ValueError, match="mutually exclusive"):
            tiny_config(tbptt_chain=4, carry_exposure=0.2)
        with pytest.raises(ValueError, match="tbptt_chain=1"):
            tiny_config(tbptt_chain=1)


class TestStreamingChainSampler:
    def test_chain_layout(self):
        from ode_vio_tpu.data.kitti import StreamingChainSampler

        seq_windows, B, L, stride = [45, 33], 4, 3, 10
        s = StreamingChainSampler(seq_windows, B, L, stride, seed=0)
        batches = list(s)
        assert len(batches) == len(s) > 0
        assert len(batches) % L == 0
        ranges, first = [], 0
        for n in seq_windows:
            ranges.append((first, first + n))
            first += n
        for g in range(0, len(batches), L):
            for b in range(B):
                # lane b follows one chain: consecutive batches advance by
                # exactly the eval-partition stride
                for k in range(1, L):
                    assert batches[g + k][b] == batches[g + k - 1][b] + stride
                # and the whole chain stays inside one sequence's windows
                lo, hi = batches[g][b], batches[g + L - 1][b]
                assert any(a <= lo and hi < z for a, z in ranges)

    def test_epoch_reshuffles_but_keeps_chains(self):
        from ode_vio_tpu.data.kitti import StreamingChainSampler

        s = StreamingChainSampler([45, 33], 4, 3, 10, seed=0)
        e1, e2 = list(s), list(s)
        assert e1 != e2  # epoch reshuffle of chunks
        # chain invariant holds in both epochs
        for ep in (e1, e2):
            for g in range(0, len(ep), 3):
                for b in range(4):
                    assert ep[g + 1][b] == ep[g][b] + 10

    def test_validation(self):
        from ode_vio_tpu.data.kitti import StreamingChainSampler

        with pytest.raises(ValueError, match="chain_len"):
            StreamingChainSampler([30], 4, 1, 10)
        with pytest.raises(ValueError, match="chunks"):
            StreamingChainSampler([12], 64, 2, 10)


class TestDataParallel:
    def test_sharded_streaming_step_matches_single_device(self):
        """TBPTT under data parallelism: the carried hidden state stays
        lane-aligned when batches are sharded over the mesh — a chain's
        lane b is the same window stream on every step, so hc shards
        along the batch axis exactly like the inputs."""
        from ode_vio_tpu.training.loop import make_streaming_train_step

        cfg = tiny_config()
        bA, bB = tiny_batch(B=8, seed=0), tiny_batch(B=8, seed=1)

        model, tx, s1 = setup(cfg)
        step1 = make_streaming_train_step(model, tx, cfg)
        s1, _, hc1 = step1(s1, *bA)
        _, m1, _ = step1(s1, *bB, hc1)

        model2, tx2, s2 = setup(cfg)
        mesh = create_mesh(8, 1)
        step2 = make_streaming_train_step(model2, tx2, cfg)
        s2, _, hc2 = step2(s2, *shard_batch(mesh, bA))
        _, m2, _ = step2(s2, *shard_batch(mesh, bB), hc2)

        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]),
                                                  rel=1e-5)

    def test_sharded_step_matches_single_device(self):
        cfg = tiny_config()
        batch = tiny_batch(B=8)

        model, tx, state1 = setup(cfg)
        step1 = make_train_step(model, tx, cfg)
        s1, m1 = step1(state1, *batch)

        model2, tx2, state2 = setup(cfg)
        mesh = create_mesh(8, 1)
        sharded = shard_batch(mesh, batch)
        step2 = make_train_step(model2, tx2, cfg)
        s2, m2 = step2(state2, *sharded)

        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
        a = np.asarray(s1.params["pose_net"]["regressor"]["fc1"]["kernel"])
        b = np.asarray(s2.params["pose_net"]["regressor"]["fc1"]["kernel"])
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_sharded_eval_matches_single_device(self):
        """Streaming eval data-parallelism (SURVEY §5.8): the jitted infer
        fn accepts lane-sharded inputs on a device mesh and produces the
        same poses; the carried hidden state stays sharded across windows."""
        cfg = tiny_config()
        model, tx, state = setup(cfg)
        infer = make_infer_fn(
            model, {"params": state.params, "batch_stats": state.batch_stats}
        )
        img, imu, _, ts = tiny_batch(B=8)
        p1, c1 = infer(img, imu, ts, None)
        p1b, _ = infer(img, imu, ts + 1.0, c1)

        mesh = create_mesh(8, 1)
        simg, simu, sts = shard_batch(mesh, (img, imu, ts))
        p2, c2 = infer(simg, simu, sts, None)
        p2b, _ = infer(simg, simu, sts + 1.0, c2)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(p1b), np.asarray(p2b), atol=1e-5)

    def test_dryrun_multichip(self):
        import sys

        sys.path.insert(0, "/root/repo")
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)


class TestCheckpoint:
    def test_roundtrip_full_state(self, tmp_path):
        cfg = tiny_config()
        model, tx, state = setup(cfg)
        cm = CheckpointManager(tmp_path)
        host_state = jax.device_get(state)
        cm.save("epoch_004", host_state, {"epoch": 4})
        restored = cm.restore("epoch_004", host_state)
        assert jax.tree_util.tree_all(
            jax.tree_util.tree_map(
                lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
                restored.params, host_state.params,
            )
        )
        assert cm.latest_epoch() == 4
        assert cm.metadata("epoch_004")["epoch"] == 4

    def test_infer_fn_streams(self):
        cfg = tiny_config()
        model, tx, state = setup(cfg)
        infer = make_infer_fn(
            model, {"params": state.params, "batch_stats": state.batch_stats}
        )
        img, imu, _, ts = tiny_batch(B=1)
        poses, carry = infer(img, imu, ts, None)
        poses2, carry2 = infer(img, imu, ts + 1.0, carry)
        assert poses.shape == (1, 2, 6) and poses2.shape == (1, 2, 6)
        assert carry2 is not None
