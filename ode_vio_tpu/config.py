"""Typed configuration — the single source of truth for train and eval.

Re-designs the reference's flat argparse flag system
(/root/reference/scripts/config.py:5-82, duplicated with drifted defaults in
scripts/test_model.py:11-74) as one frozen dataclass shared by every entry
point. Every knob of the reference is preserved; TPU-specific knobs
(mesh shape, dtypes, solver unroll mode) are additive.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Sequence


@dataclass(frozen=True)
class SolverConfig:
    """Continuous-time solver operating point.

    Reference operating points: ODE-RNN trains with dopri5, atol 1e-6,
    rtol 1e-2, dt0 1e-4 (PoseODERNN.py:57,72); CDE with dopri5, atol 1e-6,
    rtol 1e-4 (PoseCDE.py:101).
    """

    # euler | heun | adaptive_heun | midpoint | bosh3 | fehlberg2 | rk4 |
    # tsit5 | dopri5, plus the fixed-grid multistep strings
    # explicit_adams | implicit_adams (torchdiffeq parity; these ignore
    # rtol/atol and force fixed-step semantics)
    method: str = "dopri5"
    rtol: float = 1e-2
    atol: float = 1e-6
    dt0: float = 1e-4
    max_steps: int = 64          # inference while-loop safety bound
    # Bound for the differentiable bounded-scan (training) mode. Unlike the
    # while loop — which exits as soon as every lane finishes — the masked
    # scan always pays for exactly this many iterations, so it is set to a
    # tight budget: with the warm-started controller a 0.1 s KITTI frame
    # interval takes ~3-8 dopri5 steps at the reference tolerances.
    max_steps_train: int = 16
    adaptive: bool = True        # False -> fixed-step with `fixed_steps` per interval
    fixed_steps: int = 4
    # 'bounded' = reverse-differentiable masked lax.scan (training);
    # 'while'   = lax.while_loop, fastest, forward-only (inference);
    # 'adjoint' = continuous adjoint via jax.custom_vjp (O(1) memory training).
    unroll_mode: str = "bounded"
    safety: float = 0.9          # step controller safety factor
    factor_min: float = 0.2      # max step shrink per step (torchdiffeq dfactor)
    factor_max: float = 10.0     # max step growth per step (torchdiffeq ifactor)
    # Early-exit chunk for the batched bounded (training) solve: the masked
    # scan is grouped into chunks of this many iterations and a whole chunk
    # is skipped (scalar lax.cond) once every lane of the batch converged.
    # Keeps the safety of a generous max_steps_train while paying only the
    # actual step count most of the time.
    exit_chunk: int = 4


@dataclass(frozen=True)
class ModelConfig:
    """Model family and architecture hyperparameters.

    Mirrors the reference's model flags (scripts/config.py:29,50-81) and the
    module shapes in src/models/ (Encoder.py, PoseODERNN.py, PoseCDE.py).
    """

    model_type: str = "ode-rnn"  # ode-rnn | rnn | cde | rde | ltc | cfc
    img_w: int = 512
    img_h: int = 256
    v_f_len: int = 512           # visual feature length
    i_f_len: int = 256           # inertial feature length
    imu_dropout: float = 0.0
    seq_len: int = 11            # images per window
    fuse_method: str = "cat"     # cat | soft | hard

    # ODE core (scripts/config.py:62-66)
    ode_hidden_dim: int = 512
    ode_fn_num_layers: int = 3
    ode_activation_fn: str = "tanh"  # tanh | relu | leaky_relu | softplus

    # RNN core (scripts/config.py:68-72)
    ode_rnn_type: str = "rnn"    # rnn | gru
    rnn_num_layers: int = 2
    rnn_hidden_dim: int = 1024   # used by NCP wiring
    rnn_dropout_out: float = 0.0

    # CDE core (scripts/config.py:74-81)
    cde_hidden_dim: int = 128
    cde_fn_num_layers: int = 3
    cde_num_layers: int = 3
    cde_activation_fn: str = "tanh"
    cde_solver: str = "dopri5"
    adjoint: bool = False
    cde_interpolation: str = "linear"   # linear | cubic  (cubic-Hermite control path)
    # Streaming-eval statefulness:
    #   'carry'   (default) — the carried state is the last evaluated z;
    #             integration continues from it (O(T), static shapes).
    #   'history' — reference semantics (PoseCDE.py:87-92): keep a ring
    #             buffer of the last `cde_history_cap` observations, fix z0
    #             to the FIRST window's initial state, and re-integrate the
    #             whole buffered path every window (the reference grows it
    #             unboundedly; the cap keeps shapes static).
    #   'reset'   — stateless streaming: every window starts fresh (z0 from
    #             its first observation, window-local clock) — exactly the
    #             regime training optimises. Measured to dominate both
    #             stateful modes on eval accuracy for this family (~17x
    #             lower t_rmse on the odometric fixture; BENCH.md round 4):
    #             the carried-z distribution at eval is one training never
    #             sees.
    cde_streaming_mode: str = "carry"
    cde_history_cap: int = 64

    # RDE (PoseRDE.py:69-70)
    logsig_depth: int = 2
    logsig_window: int = 20
    # Streaming-eval statefulness for RDE (mirrors cde_streaming_mode):
    #   'carry'   (default) — the carried state is the last evaluated z;
    #             each window integrates its own compressed path from it.
    #   'history' — reference semantics (PoseRDE.py:90-95): accumulate the
    #             per-window log-signature paths and re-integrate the
    #             growing compressed path from the carried initial state —
    #             realised as a fixed-capacity ring buffer of
    #             `rde_history_cap` compressed-path knots with the carried
    #             z0 advanced exactly over evicted segments.
    #   'reset'   — stateless streaming: every window starts fresh, the
    #             training regime (see cde_streaming_mode).
    rde_streaming_mode: str = "carry"
    # Capacity in COMPRESSED knots: each knot summarises up to
    # `logsig_window` raw observations, so the default covers
    # 32*20 = 640 raw frames of path history.
    rde_history_cap: int = 32
    # Channel count of the reduced path fed to the log-signature. The
    # reference's dims are internally inconsistent (its CDE field expects
    # cde_hidden+1 channels, PoseRDE.py:48, but the logsig of a 769-channel
    # path has ~296k channels, PoseRDE.py:88); a small reduced dim keeps
    # logsig_dim = d + d(d-1)/2 tractable.
    rde_reduced_dim: int = 8

    # TPU numerics: encoders run in `compute_dtype`, solver state in float32.
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # Train-time dropout in the FlowNet trunk draws its mask bits from the
    # XLA hardware rng-bit-generator ('rbg') instead of the threefry
    # software hash. The trunk's ~1.5e9 mask elements per flagship step
    # make mask generation the single largest train-mode cost (measured
    # +49 ms of the 131 ms step with threefry, +27 ms with rbg; BENCH.md
    # round 3). Keep probability and scaling are exact — only the bit
    # stream differs. Disable for bit-exact threefry reproducibility.
    fast_dropout: bool = True
    # INTERNAL (set by the bias-folding eval path, models/fold.py): drop
    # the BatchNorm ops from the graph entirely; the conv layers carry the
    # folded bias instead. The identity-valued BN that plain folding
    # leaves behind still costs a measured ~16 ms/step of unfused
    # elementwise traffic at flagship dims — removing the ops is the only
    # way XLA stops scheduling them.
    skip_bn: bool = False
    # Exact space-to-depth rewrite of the narrow-channel stride-2 encoder
    # convs (identical math and parameters). Measured on v5e: XLA's native
    # strided conv already beats the explicit rewrite (14.1 vs 20.9 ms on
    # the 7x7 input conv at 320 pairs), so this stays off by default;
    # kept as an option for other XLA versions/topologies.
    encoder_s2d: bool = False
    # Quantised int8 encoder inference (eval-only): per-output-channel
    # symmetric int8 weights + per-tensor dynamic int8 activations, int32
    # MXU accumulation. The v5e MXU runs int8 at 2x the bf16 rate and the
    # int8 activations halve inter-layer HBM traffic; parameters stay
    # float (checkpoints unchanged), training always uses the float path.
    encoder_int8: bool = False
    # Inference-path kernel fusion: run each timestep's entire adaptive ODE
    # integration as one Pallas kernel with the MLP weights resident in
    # VMEM (ops/pallas_kernels.py). Training always uses the
    # reverse-differentiable XLA path. None = auto: ON for the cde/rde
    # families on a TPU backend (measured 2.05x / 1.19x eval speedup —
    # the XLA while-loop re-streams the 8.4 MB CDE field from HBM every
    # RK stage; BENCH.md round 3), OFF elsewhere (for ode-rnn the XLA
    # path measured faster at eval batch sizes; opt in explicitly for
    # single-session serving where it wins ~9 %).
    use_pallas: bool | None = None

    @property
    def f_len(self) -> int:
        return self.v_f_len + self.i_f_len

    def resolved_use_pallas(self) -> bool:
        """Resolve the tri-state at trace time: an explicit flag wins;
        auto enables the fused solve only where it measured faster."""
        if self.use_pallas is not None:
            return self.use_pallas
        import jax

        return (jax.default_backend() == "tpu"
                and self.model_type in ("cde", "rde"))


@dataclass(frozen=True)
class DataConfig:
    """Dataset paths, windowing and irregularity injection.

    Mirrors KITTI_dataset.py:20-138 and the augmentation flags
    (scripts/config.py:45-58).
    """

    data_dir: str = "./dataset"
    train_seq: Sequence[str] = ("00", "01", "02", "04", "08", "09")
    val_seq: Sequence[str] = ("05", "07", "10")
    seq_len: int = 11
    imu_freq: int = 10           # IMU rows per image interval (IMU_FREQ)
    data_dropout: float = 0.0    # train-time random frame-drop probability
    data_dropout_std: float = 0.0
    eval_data_dropout: float = 0.0
    hflip: bool = False
    color: bool = False
    normalize: bool = False
    workers: int = 8
    shuffle: bool = True


@dataclass(frozen=True)
class TrainConfig:
    """Optimisation schedule (scripts/config.py:30-43, train_model.py:25-35)."""

    optimizer: str = "adam"      # adam | sgd
    batch_size: int = 16
    grad_accumulation_steps: int = 1
    weight_decay: float = 5e-5
    epochs_warmup: int = 20
    epochs_joint: int = 40
    epochs_fine: int = 40
    lr_warmup: float = 1e-4
    lr_joint: float = 1e-5
    lr_fine: float = 1e-6
    # Separate learning rate for the pose-regressor param group. The
    # reference keeps the regressor in its own optimizer group whose LR the
    # epoch schedule never touches (utils/utils.py:116-119,
    # train_model.py:214-216). None = single group (regressor follows the
    # global schedule).
    lr_regressor: float | None = None
    gradient_clip: float = 5.0
    freeze_encoder: bool = False
    # With freeze_encoder: run the frozen image encoder in INFERENCE mode
    # inside the train step — BatchNorm statistics folded into the conv
    # bias (BN ops leave the graph, models/fold.py) and trunk dropout off.
    # The reference keeps the frozen FlowNet in torch train mode as a side
    # effect of model.train() (train_model.py:191-194: requires_grad=False
    # stops gradients but not dropout/BN-stat updates); freezing a
    # backbone in eval mode is the standard fine-tuning practice (frozen
    # features become deterministic and running statistics stop drifting
    # toward the fine-tuning batches). It is also the fast path: the
    # trunk's train-mode dropout masks are ~27 ms of the 77 ms flagship
    # step (BENCH.md round 3). Off by default for exact reference
    # semantics; has no effect unless freeze_encoder is set.
    frozen_encoder_eval: bool = False
    # Carried-state exposure (TBPTT-within-the-window). The reference
    # always trains on fresh windows (ts re-based, z0/h0 from scratch:
    # PoseCDE.py:81, PoseODERNN.py:100) yet evaluates STATEFULLY, carrying
    # hidden state across windows (KITTI_eval.py:141) — so the carried-z
    # distribution at eval is one the regressor never saw during training.
    # Round-4 measurement (BENCH.md): that distribution shift is ~the
    # entire streaming-accuracy gap for the CDE/RDE families. With
    # probability ``carry_exposure`` a train step splits the window at
    # boundary frame k (``carry_split``; 0 = midpoint): segment 1 trains
    # the fresh regime, its final hidden state is stop-gradiented and
    # seeds segment 2, which trains the carried regime — every ground
    # truth still supervised, gradients truncated at the splice (TBPTT).
    # 0.0 (default) = exact reference training semantics. Measured
    # (BENCH.md round 5): mild rates (cde ~0.2, rde ~0.5) cut carry-mode
    # streaming t_rmse 10-25 % at zero stateless cost; higher rates
    # degrade both modes; no rate closes the carry-vs-reset gap (the
    # carried open-loop-integral latent drifts with window index beyond
    # any splice-exposable distribution — probe_carry_drift.py).
    carry_exposure: float = 0.0
    carry_split: int = 0         # boundary frame index k; 0 = (seq_len-1)//2
    # Full-sequence TBPTT streaming training: windows arrive in sequence
    # order (eval-partition layout) and the hidden state is carried
    # across train steps for chains of ``tbptt_chain`` windows, then
    # reset — training the ACTUAL nonstationary carried-state
    # distribution streaming eval feeds the core, which single-splice
    # carry_exposure measurably cannot (BENCH.md round 5;
    # probe_carry_drift.py). Gradients still truncate at window
    # boundaries (state crosses steps as data). 0 (default) = off.
    # Measured: closes the cde/rde carry-mode streaming gap (t_rmse
    # 6.54 -> 0.20 / 4.42 -> 0.83 at chain 8, now tracking stateless
    # eval); counterproductive for the recurrent-cell families
    # (ode-rnn 0.071 -> 0.225), whose carried state is already
    # stationary — chained windows only cost shuffle diversity.
    tbptt_chain: int = 0
    seed: int = 0
    print_frequency: int = 10
    ckpt_every: int = 2          # save every N epochs (train_model.py:223)
    angle_loss_weight: float = 100.0  # loss = 100*MSE(rot)+MSE(trans)

    def __post_init__(self):
        # carry_exposure is a probability: >1 would silently make every
        # step carried and <0 would silently disable the feature
        if not 0.0 <= self.carry_exposure <= 1.0:
            raise ValueError(
                f"carry_exposure={self.carry_exposure} must be a "
                "probability in [0, 1]"
            )
        if self.tbptt_chain and self.carry_exposure > 0.0:
            raise ValueError(
                "tbptt_chain and carry_exposure are mutually exclusive: "
                "full-sequence TBPTT trains the real carried-state "
                "distribution; the single-splice exposure is its "
                "within-window approximation"
            )
        if self.tbptt_chain == 1:
            raise ValueError(
                "tbptt_chain=1 never carries state (every step would be "
                "a chain start); use 0 to disable or >= 2"
            )

    @property
    def total_epochs(self) -> int:
        return self.epochs_warmup + self.epochs_joint + self.epochs_fine


@dataclass(frozen=True)
class MeshConfig:
    """SPMD device mesh. Replaces the reference's vestigial
    nn.DataParallel wrapper (train_model.py:200-201) with an explicit
    jax.sharding.Mesh; the batch axis shards over `data`, weights may shard
    over `model` (unused by default for this model scale, but structured so
    larger encoders can add model parallelism without redesign)."""

    data_axis: int = -1          # -1 = all available devices
    model_axis: int = 1
    axis_names: Sequence[str] = ("data", "model")


@dataclass(frozen=True)
class Config:
    experiment_name: str = "experiment"
    save_dir: str = "./results"
    pretrain: str | None = None          # checkpoint to resume/eval from
    pretrain_flownet: str | None = None  # torch FlowNet-S weights to convert
    run_times: int = 1                   # eval repetitions (test_model.py:101)
    wandb: bool = False

    model: ModelConfig = field(default_factory=ModelConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)
    # CDE/RDE solver: reference tolerances (PoseCDE.py:101, rtol 1e-4 —
    # 100x tighter than the ODE-RNN's 1e-2) with a wider EVAL step budget:
    # torchdiffeq runs effectively uncapped at eval, and at rtol 1e-4 a
    # stiff path can legitimately need >64 steps per segment; eval uses
    # the while-loop solver, which only pays for steps actually taken, so
    # the higher cap costs nothing when dynamics are tame (truncations at
    # the cap are surfaced by the cde_solves_incomplete counter either
    # way). Training keeps the bounded max_steps_train budget.
    cde_solver_cfg: SolverConfig = field(
        default_factory=lambda: SolverConfig(rtol=1e-4, atol=1e-6,
                                             max_steps=256)
    )
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def flagship_config() -> Config:
    """The canonical ODE-VIO training configuration
    (scripts/run_training.sh: softplus activation, 2 ODE-fn layers,
    3 RNN layers, ode_hidden 1024, soft fusion, frozen encoder)."""
    return Config(
        model=ModelConfig(
            model_type="ode-rnn",
            ode_activation_fn="softplus",
            ode_fn_num_layers=2,
            ode_hidden_dim=1024,
            rnn_num_layers=3,
            fuse_method="soft",
        ),
        train=TrainConfig(freeze_encoder=True),
        data=DataConfig(data_dropout=0.3, data_dropout_std=0.1,
                        eval_data_dropout=0.3),
    )
