"""Jitted, mesh-sharded training step and the optimisation schedule.

Re-designs the reference training driver's hot path
(/root/reference/scripts/train_model.py:48-95) TPU-first:

  * loss = 100 * MSE(angles) + MSE(translation) (train_model.py:72-77),
  * one fused ``jit`` step: forward + backward + clip + Adam update, with
    the donated TrainState resident on device — no per-step host sync,
  * gradient accumulation via ``optax.MultiSteps``
    (train_model.py:82-87; note the reference only steps the optimiser
    when gradient_clip is set — a bug we do not reproduce),
  * 3-phase step-function LR schedule warmup/joint/fine
    (train_model.py:25-35),
  * optional encoder freezing via ``optax.multi_transform``
    (train_model.py:191-194),
  * data parallelism: batch sharded over the mesh's ``data`` axis; XLA
    inserts the gradient all-reduce (ICI) automatically.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ode_vio_tpu.config import Config


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array


def lr_for_epoch(cfg: Config, epoch: int) -> float:
    """Step-function schedule: warmup / joint / fine
    (train_model.py:25-35; scripts/config.py:36-41)."""
    t = cfg.train
    if epoch < t.epochs_warmup:
        return t.lr_warmup
    if epoch < t.epochs_warmup + t.epochs_joint:
        return t.lr_joint
    return t.lr_fine


def _param_group(path, freeze_encoder: bool, split_regressor: bool) -> str:
    """Param-group label for one param path. Mirrors the reference's
    optimizer param groups (utils/utils.py:116-119: pose-net 'other' params
    vs the pose regressor) plus its encoder freeze (train_model.py:191)."""
    keys = [getattr(p, "key", None) for p in path]
    if freeze_encoder and keys[0] == "image_encoder":
        return "frozen"
    if split_regressor and "regressor" in keys:
        return "regressor"
    return "train"


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """clip-by-global-norm -> decoupled-into-grads weight decay (torch Adam
    semantics: wd*param added to the gradient before the moment update) ->
    Adam/SGD, with injectable learning rate, optional encoder freeze,
    optional separate regressor learning rate and gradient accumulation
    (utils/utils.py:115-130 parity).

    Per-param-group learning rates: the reference builds two groups —
    pose-net 'other' params and the regressor — and the epoch schedule is
    written to group 0 only (train_model.py:214-216), so the regressor's
    LR is independently controllable. With ``cfg.train.lr_regressor`` set,
    the regressor params get their own injected LR (update it with
    ``set_learning_rate(opt_state, lr, group='regressor')``); the epoch
    schedule drives only the 'train' group, exactly like the reference.
    """
    t = cfg.train

    def base(lr0: float):
        @optax.inject_hyperparams
        def make(learning_rate):
            chain = [optax.clip_by_global_norm(t.gradient_clip)]
            if t.weight_decay:
                chain.append(optax.add_decayed_weights(t.weight_decay))
            if t.optimizer.lower() == "sgd":
                chain.append(optax.trace(decay=0.9))  # momentum 0.9
            else:
                chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
            chain.append(optax.scale_by_learning_rate(learning_rate))
            return optax.chain(*chain)

        return make(learning_rate=lr0)

    split_regressor = t.lr_regressor is not None
    if t.freeze_encoder or split_regressor:
        transforms = {"train": base(t.lr_warmup)}
        if t.freeze_encoder:
            transforms["frozen"] = optax.set_to_zero()
        if split_regressor:
            transforms["regressor"] = base(t.lr_regressor)

        def labels(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: _param_group(
                    path, t.freeze_encoder, split_regressor
                ),
                params,
            )

        tx = optax.multi_transform(transforms, param_labels=labels)
    else:
        tx = base(t.lr_warmup)

    if t.grad_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=t.grad_accumulation_steps)
    return tx


def set_learning_rate(opt_state, lr: float, group: str = "train"):
    """Override one param group's injected learning rate (the per-epoch
    schedule writes the 'train' group only, matching the reference's
    ``optimizer.param_groups[0]['lr'] = lr``, train_model.py:214-216),
    walking through MultiSteps / multi_transform wrappers."""

    def walk(s):
        if isinstance(s, optax.MultiStepsState):
            return s._replace(inner_opt_state=walk(s.inner_opt_state))
        if hasattr(s, "inner_states"):  # multi_transform Partition state
            inner = dict(s.inner_states)
            if group not in inner:
                raise KeyError(
                    f"param group '{group}' not in optimizer "
                    f"(have {sorted(inner)})"
                )
            inner[group] = walk(inner[group])
            return type(s)(inner_states=inner)
        if hasattr(s, "hyperparams"):  # InjectHyperparams / stateful variant
            hp = dict(s.hyperparams)
            hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
            return s._replace(hyperparams=hp)
        if isinstance(s, optax.MaskedState):
            return s._replace(inner_state=walk(s.inner_state))
        return s

    return walk(opt_state)


def create_train_state(cfg: Config, variables, tx, rng) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        rng=rng,
    )


def _sum_sown(inter, substr: str) -> jnp.ndarray:
    """Sum every sown 'intermediates' leaf whose path mentions ``substr``
    (e.g. 'incomplete' -> total truncated solves this call)."""
    total = jnp.zeros((), jnp.int32)
    for path, leaf in jax.tree_util.tree_flatten_with_path(inter)[0]:
        if any(substr in str(getattr(p, "key", "")) for p in path):
            total = total + jnp.asarray(leaf, jnp.int32).sum()
    return total


def _sown_per_lane(inter, substr: str, batch: int) -> jnp.ndarray:
    """Per-batch-lane version of :func:`_sum_sown`: every matching leaf is
    reduced onto its leading ``batch`` axis, so the result attributes the
    counts to batch lanes (the pose cores sow 'incomplete' as ``(B,)``).
    Leaves without a lane axis (legacy scalar sows) are spread onto lane 0
    so no count is ever lost."""
    total = jnp.zeros((batch,), jnp.int32)
    for path, leaf in jax.tree_util.tree_flatten_with_path(inter)[0]:
        if any(substr in str(getattr(p, "key", "")) for p in path):
            leaf = jnp.asarray(leaf, jnp.int32)
            if leaf.ndim >= 1 and leaf.shape[-1] == batch:
                # sown leaves may gain leading axes (e.g. flax sow tuples
                # stacked by scan); reduce everything but the lane axis
                total = total + leaf.reshape(-1, batch).sum(0)
            else:
                total = total.at[0].add(leaf.sum())
    return total


def make_train_step(model, tx, cfg: Config, carry: bool = False) -> Callable:
    """Build the jitted train step: (state, img, imu, gts, ts) ->
    (state, metrics). Donates the state for in-place device updates.

    With ``carry=True`` the step trains the CARRIED regime (carried-state
    exposure, cfg.train.carry_exposure): the window is split at boundary
    frame ``k = cfg.train.carry_split or (S-1)//2``; segment 1 (pose steps
    0..k-1) runs fresh exactly like a standard training window, its final
    hidden state is stop-gradiented and seeds segment 2 (pose steps
    k..S-2) as the streaming-eval carry would (KITTI_eval.py:141), and the
    loss covers BOTH segments' poses against the full ground truth — a
    TBPTT step truncated at the splice. The visual features are computed
    once over the whole window (the pair-stacked trunk features of the two
    segments are exactly slices of the full window's), so the extra cost
    over the standard step is only the second pose-core launch. This
    trains the pose core and regressor on the carried-z distribution that
    stateful eval feeds them — the distribution shift measured in round 4
    to be ~the entire streaming-accuracy gap of the CDE/RDE families
    (BENCH.md); the reference has no counterpart (it always trains fresh
    windows, PoseCDE.py:81, and pays for it at stateful eval). NB the
    exposed distribution matches ``cde/rde_streaming_mode='carry'`` eval
    (segment 2 seeded with the previous segment's final latent, the carry
    of KITTI_eval.py:141): under 'history' eval the carried state is a
    pinned/advanced z0 plus path re-integration, and under 'reset' eval
    every window is fresh, so the exposure's benefit targets 'carry' mode
    specifically (cli/train.py warns on a mismatched combination).
    Measured effect (BENCH.md round 5): mild rates (cde ~0.2, rde ~0.5)
    cut carry-mode streaming t_rmse 10-25 % with stateless accuracy
    unchanged; higher rates degrade both modes, and no rate closes the
    carry-vs-reset gap — the carried latent of the open-loop integral
    families drifts with window index beyond what a single splice can
    expose (scripts/probe_carry_drift.py).

    With ``freeze_encoder`` the image-encoder params are split out of the
    differentiated arguments, so XLA never builds the encoder backward at
    all — the same cost shape as the reference, where
    ``requires_grad=False`` stops torch autograd from recording the
    encoder graph (train_model.py:191-194). The frozen subtree's gradient
    slots are filled with zeros for the optimizer (whose 'frozen' group is
    ``set_to_zero`` anyway), and BatchNorm statistics still update in the
    forward pass, exactly like torch train mode under requires_grad=False.

    With ``frozen_encoder_eval`` on top, the frozen image encoder runs its
    INFERENCE graph inside the train step: the (constant) BatchNorm
    statistics are folded into the conv bias at trace time
    (models/fold.py::fold_batchnorm_into_bias — a one-off elementwise pass
    over the ~15M frozen weights, negligible next to the 1.5e9-element
    activations it de-drops), trunk dropout is off, and the visual
    features flow into ``DeepVIO.pose_from_visual``. Frozen features
    become deterministic, image-encoder running statistics stop updating,
    and the step sheds the trunk's train-mode dropout-mask cost
    (cfg.train.frozen_encoder_eval docstring; BENCH.md round 4).
    """
    w = cfg.train.angle_loss_weight
    frozen_keys = ("image_encoder",) if cfg.train.freeze_encoder else ()
    frozen_eval = (
        cfg.train.freeze_encoder
        and cfg.train.frozen_encoder_eval
        # the fold targets the plain conv path; the variant encoders carry
        # their own graphs (and all ship off by default)
        and not (cfg.model.encoder_int8 or cfg.model.encoder_s2d
                 or cfg.model.skip_bn)
    )
    if frozen_eval:
        import dataclasses as _dc

        from ode_vio_tpu.models.encoders import ImageEncoder
        from ode_vio_tpu.models.fold import fold_batchnorm_into_bias

        eval_image_net = ImageEncoder(_dc.replace(model.cfg, skip_bn=True))

    def loss_fn(trainable, frozen, batch_stats, img, imu, gts, ts, rngs):
        params = {**trainable, **frozen}
        if frozen_eval:
            folded = fold_batchnorm_into_bias({
                "params": frozen["image_encoder"],
                "batch_stats": dict(batch_stats).get("image_encoder", {}),
            })
            fv = eval_image_net.apply(
                {"params": folded["params"]}, img, train=False
            )
            (poses, _), updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                fv, imu, ts,
                train=True,
                rngs=rngs,
                mutable=["batch_stats", "intermediates"],
                method="pose_from_visual",
            )
            # the image encoder's statistics were never touched (that is
            # the point) — carry them through unchanged
            new_bs = {**dict(batch_stats),
                      **dict(updates.get("batch_stats", {}))}
        else:
            (poses, _), updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                img, imu, ts,
                train=True,
                rngs=rngs,
                mutable=["batch_stats", "intermediates"],
            )
            new_bs = updates["batch_stats"]
        angle = jnp.mean((poses[..., :3] - gts[..., :3]) ** 2)
        trans = jnp.mean((poses[..., 3:] - gts[..., 3:]) ** 2)
        loss = w * angle + trans
        incomplete = _sum_sown(updates.get("intermediates", {}), "incomplete")
        return loss, (new_bs, angle, trans, incomplete)

    if carry:
        S = cfg.model.seq_len
        k = cfg.train.carry_split or (S - 1) // 2
        # the path-based cores interpolate over a segment's observations:
        # a 1-knot path has zero interpolation segments, so cde/rde need
        # >= 2 pose steps on each side of the splice
        min_seg = 2 if cfg.model.model_type in ("cde", "rde") else 1
        if not min_seg <= k <= S - 1 - min_seg:
            raise ValueError(
                f"carry_split={k} out of range [{min_seg}, "
                f"{S - 1 - min_seg}] for model_type="
                f"{cfg.model.model_type} at seq_len={S} (each segment "
                f"needs >= {min_seg} pose steps)"
            )

        def carried_loss_fn(trainable, frozen, batch_stats, img, imu, gts,
                            ts, rngs):
            params = {**trainable, **frozen}
            bs = dict(batch_stats)
            r_img, r_p1, r_p2 = jax.random.split(rngs["dropout"], 3)
            g1, g2 = jax.random.split(rngs["gumbel"])
            # visual features once over the full window: consecutive-pair
            # trunk features of the segments are slices of the window's
            if frozen_eval:
                folded = fold_batchnorm_into_bias({
                    "params": frozen["image_encoder"],
                    "batch_stats": bs.get("image_encoder", {}),
                })
                fv = eval_image_net.apply(
                    {"params": folded["params"]}, img, train=False
                )
            else:
                fv, upd = model.apply(
                    {"params": params, "batch_stats": batch_stats}, img,
                    train=True, rngs={"dropout": r_img},
                    mutable=["batch_stats"],
                    method=lambda m, x, train: m.image_net(x, train=train),
                )
                bs = {**bs, **dict(upd["batch_stats"])}
            # segment 1 (pose steps 0..k-1): the fresh regime, exactly a
            # standard (shorter) training window
            (p1, hc), upd1 = model.apply(
                {"params": params, "batch_stats": bs},
                fv[:, :k], imu[:, : 10 * k + 1], ts[:, : k + 1],
                train=True, rngs={"dropout": r_p1, "gumbel": g1},
                mutable=["batch_stats", "intermediates"],
                method="pose_from_visual",
            )
            bs = {**bs, **dict(upd1["batch_stats"])}
            # splice: the carry crosses as data, not gradient (TBPTT)
            hc = jax.tree_util.tree_map(jax.lax.stop_gradient, hc)
            # segment 2 (pose steps k..S-2): the carried regime streaming
            # eval runs (sequence clock, seeded hidden state)
            (p2, _), upd2 = model.apply(
                {"params": params, "batch_stats": bs},
                fv[:, k:], imu[:, 10 * k:], ts[:, k:], hc=hc,
                train=True, rngs={"dropout": r_p2, "gumbel": g2},
                mutable=["batch_stats", "intermediates"],
                method="pose_from_visual",
            )
            bs = {**bs, **dict(upd2["batch_stats"])}
            poses = jnp.concatenate([p1, p2], axis=1)
            angle = jnp.mean((poses[..., :3] - gts[..., :3]) ** 2)
            trans = jnp.mean((poses[..., 3:] - gts[..., 3:]) ** 2)
            loss = w * angle + trans
            incomplete = (
                _sum_sown(upd1.get("intermediates", {}), "incomplete")
                + _sum_sown(upd2.get("intermediates", {}), "incomplete")
            )
            return loss, (bs, angle, trans, incomplete)

        loss_fn = carried_loss_fn

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, img, imu, gts, ts):
        rng, r_drop, r_gumbel = jax.random.split(state.rng, 3)
        rngs = {"dropout": r_drop, "gumbel": r_gumbel}
        trainable = {k: v for k, v in state.params.items()
                     if k not in frozen_keys}
        frozen = {k: v for k, v in state.params.items() if k in frozen_keys}
        (loss, (new_bs, angle, trans, incomplete)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(trainable, frozen, state.batch_stats, img, imu, gts, ts, rngs)
        grads = {
            **grads,
            **jax.tree_util.tree_map(jnp.zeros_like, frozen),
        }
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "angle_loss": angle,
            "trans_loss": trans,
            "grad_norm": optax.global_norm(grads),
            # solves that hit the step budget before t1 (gradients of a
            # truncated integral quietly change meaning — log loudly)
            "solver_incomplete": incomplete,
        }
        return (
            TrainState(
                step=state.step + 1,
                params=params,
                batch_stats=new_bs,
                opt_state=opt_state,
                rng=rng,
            ),
            metrics,
        )

    return train_step


def make_streaming_train_step(model, tx, cfg: Config) -> Callable:
    """Build the full-sequence TBPTT train step:
    ``step(state, img, imu, gts, ts, hc) -> (state, metrics, hc_out)``.

    The round-5 drift measurement (BENCH.md, scripts/probe_carry_drift.py)
    showed why single-splice carried-state exposure cannot close the
    CDE/RDE streaming gap: the carried latent at eval is NONSTATIONARY in
    the window index (an open-loop integral grows ~linearly across the
    sequence), so its distribution cannot be covered from inside one
    window. This step trains the true regime instead: windows arrive in
    sequence order (data/kitti.py::StreamingChainSampler — the eval
    partition layout, consecutive windows sharing one boundary frame,
    KITTI_eval.py:78-91), and the hidden state flows forward across
    train steps exactly as streaming eval carries it (KITTI_eval.py:141).
    Gradients truncate at window boundaries — ``hc`` enters as a plain
    jit argument of the NEXT step, so no gradient flows into previous
    windows (TBPTT with a window-length truncation horizon) — while the
    STATE horizon is the chain length, arbitrarily long. The reference
    has no counterpart (it always trains fresh shuffled windows).

    ``hc=None`` starts a chain cold (identical semantics to the standard
    fresh step, tested); otherwise pass the previous step's ``hc_out``.
    The driver resets the carry every ``cfg.train.tbptt_chain`` steps,
    where the sampler guarantees synchronized chain boundaries.

    ``freeze_encoder`` / ``frozen_encoder_eval`` behave exactly as in
    :func:`make_train_step` (split-out frozen subtree; optional BN-folded
    inference-mode trunk).
    """
    w = cfg.train.angle_loss_weight
    frozen_keys = ("image_encoder",) if cfg.train.freeze_encoder else ()
    frozen_eval = (
        cfg.train.freeze_encoder
        and cfg.train.frozen_encoder_eval
        and not (cfg.model.encoder_int8 or cfg.model.encoder_s2d
                 or cfg.model.skip_bn)
    )
    if frozen_eval:
        import dataclasses as _dc

        from ode_vio_tpu.models.encoders import ImageEncoder
        from ode_vio_tpu.models.fold import fold_batchnorm_into_bias

        eval_image_net = ImageEncoder(_dc.replace(model.cfg, skip_bn=True))

    def loss_fn(trainable, frozen, batch_stats, img, imu, gts, ts, rngs, hc):
        params = {**trainable, **frozen}
        if frozen_eval:
            folded = fold_batchnorm_into_bias({
                "params": frozen["image_encoder"],
                "batch_stats": dict(batch_stats).get("image_encoder", {}),
            })
            fv = eval_image_net.apply(
                {"params": folded["params"]}, img, train=False
            )
            (poses, h_T), updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                fv, imu, ts, hc=hc,
                train=True,
                rngs=rngs,
                mutable=["batch_stats", "intermediates"],
                method="pose_from_visual",
            )
            new_bs = {**dict(batch_stats),
                      **dict(updates.get("batch_stats", {}))}
        else:
            (poses, h_T), updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                img, imu, ts, hc=hc,
                train=True,
                rngs=rngs,
                mutable=["batch_stats", "intermediates"],
            )
            new_bs = updates["batch_stats"]
        angle = jnp.mean((poses[..., :3] - gts[..., :3]) ** 2)
        trans = jnp.mean((poses[..., 3:] - gts[..., 3:]) ** 2)
        loss = w * angle + trans
        incomplete = _sum_sown(updates.get("intermediates", {}), "incomplete")
        return loss, (new_bs, angle, trans, incomplete, h_T)

    def _step(state: TrainState, img, imu, gts, ts, hc):
        rng, r_drop, r_gumbel = jax.random.split(state.rng, 3)
        rngs = {"dropout": r_drop, "gumbel": r_gumbel}
        trainable = {k: v for k, v in state.params.items()
                     if k not in frozen_keys}
        frozen = {k: v for k, v in state.params.items() if k in frozen_keys}
        (loss, (new_bs, angle, trans, incomplete, h_T)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, frozen, state.batch_stats, img, imu, gts, ts,
                rngs, hc,
            )
        )
        grads = {
            **grads,
            **jax.tree_util.tree_map(jnp.zeros_like, frozen),
        }
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "angle_loss": angle,
            "trans_loss": trans,
            "grad_norm": optax.global_norm(grads),
            "solver_incomplete": incomplete,
        }
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            batch_stats=new_bs,
            opt_state=opt_state,
            rng=rng,
        )
        return new_state, metrics, h_T

    step_cold = partial(jax.jit, donate_argnums=(0,))(
        lambda state, img, imu, gts, ts: _step(state, img, imu, gts, ts, None)
    )
    step_carried = partial(jax.jit, donate_argnums=(0,))(_step)

    def step(state, img, imu, gts, ts, hc=None):
        if hc is None:
            return step_cold(state, img, imu, gts, ts)
        return step_carried(state, img, imu, gts, ts, hc)

    return step


def make_infer_fn(model, variables, fold_bn: bool = False) -> Callable:
    """Build the streaming-eval callable
    ``infer(imgs, imus, ts, carry) -> (poses, carry)`` with both the
    cold-start (no carry) and carried variants jit-compiled once.

    ``fold_bn=True`` bakes the frozen BatchNorm statistics into the conv
    weights AND bias ahead of time and rebuilds the model with
    ``skip_bn=True`` so the BatchNorm ops leave the graph entirely
    (models/fold.py::fold_batchnorm_into_bias) — exact at eval; the
    identity affine that value-level folding leaves behind measured
    ~16 ms/step at flagship dims (BENCH.md round 3). Falls back to the
    value-level fold when the encoder runs a non-plain conv path
    (int8 / s2d), which the BN-free ConvBlock deliberately doesn't carry.

    ``infer.set_variables(new_variables)`` swaps the weights without
    re-jitting (params are jit arguments, not constants), so a per-epoch
    evaluator can reuse one compiled executable for the whole run.

    Solver observability: truncated solves accumulate device-side (no
    per-call host sync) PER BATCH LANE; read the running total with
    ``infer.incomplete()`` or the per-lane vector with
    ``infer.incomplete_by_lane()``. Callers multiplexing independent
    sessions onto lanes (serving/engine.py) pass ``active`` — a boolean
    lane mask — so replayed idle-lane and warm-up-proto solves do not
    pollute the counters."""
    import dataclasses as _dc

    strip_bn = fold_bn and not (
        model.cfg.encoder_int8 or model.cfg.encoder_s2d
        or model.cfg.skip_bn
    )
    if strip_bn:
        model = type(model)(
            cfg=_dc.replace(model.cfg, skip_bn=True),
            solver=model.solver, cde_solver=model.cde_solver,
        )

    @jax.jit
    def infer_first(params, batch_stats, img, imu, ts):
        out, inter = model.apply(
            {"params": params, "batch_stats": batch_stats},
            img, imu, ts, train=False,
            rngs={"gumbel": jax.random.PRNGKey(0)},
            mutable=["intermediates"],
        )
        return out, _sown_per_lane(inter, "incomplete", img.shape[0])

    @jax.jit
    def infer_carry(params, batch_stats, img, imu, ts, hc):
        out, inter = model.apply(
            {"params": params, "batch_stats": batch_stats},
            img, imu, ts, hc=hc, train=False,
            rngs={"gumbel": jax.random.PRNGKey(0)},
            mutable=["intermediates"],
        )
        return out, _sown_per_lane(inter, "incomplete", img.shape[0])

    held = {}

    def set_variables(v):
        if strip_bn:
            from ode_vio_tpu.models.fold import fold_batchnorm_into_bias

            v = fold_batchnorm_into_bias(v)
        elif fold_bn:
            from ode_vio_tpu.models.fold import fold_batchnorm

            v = fold_batchnorm(v)
        held["params"] = v["params"]
        held["batch_stats"] = v.get("batch_stats", {})

    set_variables(variables)

    def infer(img, imu, ts, carry=None, active=None):
        if carry is None:
            out, inc = infer_first(held["params"], held["batch_stats"],
                                   img, imu, ts)
        else:
            out, inc = infer_carry(held["params"], held["batch_stats"],
                                   img, imu, ts, carry)
        if active is not None:
            inc = inc * jnp.asarray(active, jnp.int32)
        infer._inc_total = infer._inc_total + inc.sum()  # lazy device-side
        if infer._inc_lanes is None or infer._inc_lanes.shape != inc.shape:
            infer._inc_lanes = inc  # lane layout changed: restart vector
        else:
            infer._inc_lanes = infer._inc_lanes + inc
        return out

    infer._inc_total = jnp.zeros((), jnp.int32)
    infer._inc_lanes = None
    infer.incomplete = lambda: int(infer._inc_total)
    infer.incomplete_by_lane = lambda: (
        None if infer._inc_lanes is None else jax.device_get(infer._inc_lanes)
    )

    def reset_incomplete():
        infer._inc_total = jnp.zeros((), jnp.int32)
        infer._inc_lanes = None

    infer.reset_incomplete = reset_incomplete
    infer.set_variables = set_variables
    return infer
