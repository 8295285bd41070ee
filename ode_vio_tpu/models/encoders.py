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
import jax.numpy as jnp

from ode_vio_tpu.config import ModelConfig


class ConvBlock(nn.Module):
    """Conv2d(torch-style symmetric padding) + BatchNorm + LeakyReLU(0.1)
    + Dropout (Encoder.py:8-35 ``conv`` with batchNorm=True)."""

    features: int
    kernel: int
    stride: int = 1
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,  # = 1 - torch momentum 0.1
            epsilon=1e-5,
            dtype=jnp.float32,
            name="bn",
        )(x)
        x = nn.leaky_relu(x.astype(self.dtype), 0.1)
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
            x = ConvBlock(f, k, s, d, dtype=dtype, name=f"block{i}")(x, train)
        x = x.reshape(B, S - 1, -1)
        x = nn.Dense(self.cfg.v_f_len, dtype=dtype, name="visual_head")(x)
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
                        dtype=dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32, name=f"bn{i}")(x)
            x = nn.leaky_relu(x.astype(dtype), 0.1)
            x = nn.Dropout(self.cfg.imu_dropout, deterministic=not train)(x)

        x = x.reshape(B, num_windows, -1)               # (B, S-1, 11*256)
        x = nn.Dense(self.cfg.i_f_len, dtype=dtype, name="proj")(x)
        return x.astype(jnp.float32)
