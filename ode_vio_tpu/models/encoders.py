"""Visual and inertial feature encoders (flax linen, NHWC, bf16-friendly).

Re-designs the reference encoders (/root/reference/src/models/Encoder.py):

* :class:`ImageEncoder` — FlowNet-S-style conv trunk over stacked
  consecutive frame pairs (Encoder.py:77-122). TPU-native choices: NHWC
  layout (native conv layout on TPU), bfloat16 compute with float32
  params/BN statistics, all (B*(S-1)) frame pairs batched into one conv
  call so the MXU sees one large convolution instead of a sequence loop.
* :class:`InertialEncoder` — 1-D conv stack over 11-sample IMU windows
  (Encoder.py:39-74); window extraction is a single strided gather.

Weight-layout notes for the torch converter live in models/convert.py.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ode_vio_tpu.config import ModelConfig
from ode_vio_tpu.models.common import KAIMING


def _space_to_depth_conv(x, kernel, dtype):
    """Exact rewrite of a stride-2 odd-kernel conv as space-to-depth +
    stride-1 conv. For the 6-channel 7x7 input conv the MXU contraction
    grows from 6 channels to 24, lifting utilisation ~4x (measured: the
    naive form runs at ~16 TF/s = 8% of v5e peak and dominates the whole
    encoder). Weights stay in the original (k, k, C, O) layout, so torch
    checkpoint conversion is untouched; the rearrangement happens at trace
    time.

    Derivation: with y[i,j] = sum_{dy,dx,c} W[dy,dx,c] x[2i+dy-P, 2j+dx-P]
    (P = (k-1)//2), substituting x[2p+r] = s2d(x)[p, r] gives a stride-1
    conv over the (ry, rx, c) channels with taps a = P' + (dy-P-ry)/2,
    P' = ceil(P/2) + ... verified element-wise in tests/test_encoder_s2d.py.
    """
    k = kernel.shape[0]
    C = kernel.shape[2]
    O = kernel.shape[3]
    P = (k - 1) // 2
    kh = (k + 2) // 2  # taps per phase: 4 for k=7, 3 for k=5, 2 for k=3
    A = (P + 1) // 2   # anchor tap of the zero-offset phase
    B, H, W, _ = x.shape
    x2 = (
        x.reshape(B, H // 2, 2, W // 2, 2, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, H // 2, W // 2, 4 * C)
    )
    Wn = jnp.zeros((kh, kh, 4 * C, O), kernel.dtype)
    for a in range(kh):
        for ry in range(2):
            dy = 2 * (a - A) + ry + P
            if not 0 <= dy < k:
                continue
            for b in range(kh):
                for rx in range(2):
                    dx = 2 * (b - A) + rx + P
                    if not 0 <= dx < k:
                        continue
                    ch = ry * 2 * C + rx * C
                    Wn = Wn.at[a, b, ch : ch + C, :].set(kernel[dy, dx])
    pad = ((A, kh - 1 - A), (A, kh - 1 - A))
    return jax.lax.conv_general_dilated(
        x2.astype(dtype), Wn.astype(dtype), (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def fast_dropout(x, rate: float, key, salt: int):
    """TPU-tuned dropout: identical Bernoulli(1-rate) keep-mask semantics
    to ``nn.Dropout``, but the mask bits come from the XLA hardware
    rng-bit-generator ('rbg') instead of the threefry software hash.

    At flagship dims the FlowNet trunk draws ~1.5e9 mask elements per
    train step; threefry mask generation measured +49 ms of the 131 ms
    step where the rbg path costs +27 ms (BENCH.md round 3 — an 8-bit
    threshold variant was also measured and is SLOWER: the u32->u8
    bitcast breaks XLA's fusion). Keep probability and the 1/(1-rate)
    expectation-preserving scale are exact; only the bit stream differs
    from the threefry path.

    ``key`` is the dropout PRNG key from ``make_rng`` (raw uint32[2] or
    typed); ``salt`` decorrelates call sites sharing a key.
    """
    if rate <= 0.0:
        return x
    data = key if not jnp.issubdtype(key.dtype, jax.dtypes.prng_key) \
        else jax.random.key_data(key)
    rbg = jax.random.wrap_key_data(
        jnp.concatenate([data, data]).astype(jnp.uint32), impl="rbg"
    )
    keep = jax.random.bernoulli(
        jax.random.fold_in(rbg, salt), 1.0 - float(rate), x.shape
    )
    return x * keep.astype(x.dtype) * jnp.asarray(1.0 / (1.0 - rate), x.dtype)


def _int8_conv(x, kernel, stride, pad, out_dtype):
    """Quantised convolution: per-output-channel symmetric int8 weights,
    per-tensor dynamic int8 activations, int32 MXU accumulation.

    The v5e/v5p MXU runs int8 contractions at 2x the bf16 rate, and the
    int8 activation tensors halve the HBM traffic between layers. Scales
    are computed at trace time (weights) / on the fly (activations), so
    the parameter pytree is the unquantised float checkpoint — nothing
    about training or conversion changes.

    The activation scale is PER BATCH ELEMENT (axis 0), not per tensor:
    batched eval / the StreamingEngine co-batch independent sessions onto
    lanes, and a shared dynamic scale would make one session's
    quantisation (and outputs) depend on what the other lanes carry —
    including idle lanes replaying stale windows."""
    kmax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))          # (O,)
    kscale = jnp.maximum(kmax, 1e-8) / 127.0
    kq = jnp.clip(jnp.round(kernel / kscale), -127, 127).astype(jnp.int8)
    amax = jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True)   # (B,1,1,1)
    ascale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / ascale),
                  -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, kq, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * (ascale * kscale)).astype(out_dtype)


class ConvBlock(nn.Module):
    """Conv2d(torch-style symmetric padding) + BatchNorm + LeakyReLU(0.1)
    + Dropout (Encoder.py:8-35 ``conv`` with batchNorm=True).

    ``s2d=True`` computes the (stride-2, odd-kernel) conv through the
    exact space-to-depth rewrite — same math, same parameters, ~4x MXU
    utilisation for low-channel inputs.

    ``int8=True`` runs the EVAL-time conv through the quantised int8 MXU
    path (:func:`_int8_conv`); training always uses the float conv and
    the parameters stay float, so checkpoints are unchanged."""

    features: int
    kernel: int
    stride: int = 1
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    s2d: bool = False
    int8: bool = False
    # graph-level BN removal for bias-folded eval variables
    # (fold_batchnorm_into_bias): conv carries the folded bias, no BN ops
    skip_bn: bool = False
    # rbg uint8 dropout masks (fast_dropout) instead of nn.Dropout
    fast_drop: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        pad = (self.kernel - 1) // 2
        if self.skip_bn:
            # bias-folded eval path: plain conv (with bias) + LeakyReLU.
            # int8/s2d variants deliberately not combined (both ship off).
            x = nn.Conv(
                self.features, (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)), use_bias=True,
                dtype=self.dtype, kernel_init=KAIMING, name="conv",
            )(x)
            x = nn.leaky_relu(x.astype(self.dtype), 0.1)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            return x
        if self.int8 and not train:
            # same param structure as nn.Conv(name="conv", use_bias=False)
            kernel = self.param(
                "conv",
                lambda key: {
                    "kernel": KAIMING(
                        key,
                        (self.kernel, self.kernel, x.shape[-1], self.features),
                        jnp.float32,
                    )
                },
            )["kernel"]
            x = _int8_conv(x, kernel.astype(jnp.float32), self.stride, pad,
                           self.dtype)
        elif self.s2d and self.stride == 2 and x.shape[1] % 2 == 0 \
                and x.shape[2] % 2 == 0:
            kernel = self.param(
                "conv",
                lambda key: {
                    "kernel": nn.initializers.variance_scaling(
                        2.0, "fan_in", "normal"
                    )(key, (self.kernel, self.kernel, x.shape[-1],
                            self.features), jnp.float32)
                },
            )["kernel"]
            x = _space_to_depth_conv(x, kernel, self.dtype)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)),
                use_bias=False,
                dtype=self.dtype,
                kernel_init=KAIMING,
                name="conv",
            )(x)
        # Normalize in the compute dtype: flax computes the batch statistics
        # (and keeps the running stats) in float32 regardless, but applying
        # the per-channel affine in f32 forces an f32 materialisation of the
        # full activation tensor between conv and relu — measured at ~25 ms
        # of pure HBM traffic per flagship step (~1.5B activations), and in
        # train mode another ~9 ms on the stats pass (BENCH.md round 3).
        # In bf16 the affine fuses into the conv epilogue. Precision matches
        # the shipped eval path, which folds the same affine into bf16 conv
        # weights (models/fold.py).
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,  # = 1 - torch momentum 0.1
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)
        x = nn.leaky_relu(x.astype(self.dtype), 0.1)
        if self.fast_drop and train and self.dropout > 0.0:
            x = fast_dropout(x, self.dropout, self.make_rng("dropout"), 0)
        else:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class ImageEncoder(nn.Module):
    """(B, S, H, W, 3) frames -> (B, S-1, v_f_len) pair features.

    Conv pyramid (Encoder.py:82-90): 6->64 k7 s2, 64->128 k5 s2,
    128->256 k5 s2, 256->256 k3, 256->512 k3 s2, 512->512 k3,
    512->512 k3 s2, 512->512 k3, 512->1024 k3 s2, then Linear to v_f_len.
    """

    cfg: ModelConfig

    # (features, kernel, stride, dropout)
    TRUNK: Sequence[tuple] = (
        (64, 7, 2, 0.2),
        (128, 5, 2, 0.2),
        (256, 5, 2, 0.2),
        (256, 3, 1, 0.2),
        (512, 3, 2, 0.2),
        (512, 3, 1, 0.2),
        (512, 3, 2, 0.2),
        (512, 3, 1, 0.2),
        (1024, 3, 2, 0.5),
    )

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, S, H, W, C = img.shape
        dtype = jnp.dtype(self.cfg.compute_dtype)
        # consecutive-pair stacking along channels (Encoder.py:100-101)
        pairs = jnp.concatenate([img[:, :-1], img[:, 1:]], axis=-1)
        x = pairs.reshape(B * (S - 1), H, W, 2 * C).astype(dtype)
        for i, (f, k, s, d) in enumerate(self.TRUNK):
            # space-to-depth rewrite for the narrow-channel stride-2 convs
            s2d = self.cfg.encoder_s2d and s == 2 and x.shape[-1] <= 64
            x = ConvBlock(f, k, s, d, dtype=dtype, s2d=s2d,
                          int8=self.cfg.encoder_int8,
                          skip_bn=self.cfg.skip_bn,
                          fast_drop=self.cfg.fast_dropout,
                          name=f"block{i}")(x, train)
        x = x.reshape(B, S - 1, -1)
        x = nn.Dense(self.cfg.v_f_len, dtype=dtype, kernel_init=KAIMING,
                     name="visual_head")(x)
        return x.astype(jnp.float32)


class InertialEncoder(nn.Module):
    """(B, 10*(S-1)+1, 6) IMU stream -> (B, S-1, i_f_len).

    Regroups the stream into overlapping 11-sample windows
    (rows ``i*10 .. i*10+10``; Encoder.py:61-65), runs Conv1d
    6->64->128->256 (k3, BN, LeakyReLU, Dropout), flattens and projects.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, imu: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, N, C = imu.shape
        freq = 10
        num_windows = (N - 1) // freq
        dtype = jnp.dtype(self.cfg.compute_dtype)

        idx = jnp.arange(num_windows)[:, None] * freq + jnp.arange(freq + 1)[None, :]
        x = imu[:, idx, :]                              # (B, S-1, 11, 6)
        x = x.reshape(B * num_windows, freq + 1, C).astype(dtype)

        for i, f in enumerate((64, 128, 256)):
            x = nn.Conv(f, (3,), padding=((1, 1),), use_bias=True,
                        dtype=dtype, kernel_init=KAIMING, name=f"conv{i}")(x)
            if not self.cfg.skip_bn:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32,
                                 name=f"bn{i}")(x)
            x = nn.leaky_relu(x.astype(dtype), 0.1)
            x = nn.Dropout(self.cfg.imu_dropout, deterministic=not train)(x)

        x = x.reshape(B, num_windows, -1)               # (B, S-1, 11*256)
        x = nn.Dense(self.cfg.i_f_len, dtype=dtype, kernel_init=KAIMING,
                     name="proj")(x)
        return x.astype(jnp.float32)
