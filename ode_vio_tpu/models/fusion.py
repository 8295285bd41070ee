"""Visual-inertial fusion gates (/root/reference/src/models/FusionModule.py:7-29).

Three strategies over the concatenated (v_f_len + i_f_len) feature:
  * ``cat``  — plain concatenation,
  * ``soft`` — concatenation scaled by learned elementwise weights,
  * ``hard`` — per-feature binary mask sampled with straight-through
    Gumbel-softmax (tau=1, hard), matching torch's
    ``F.gumbel_softmax(..., tau=1, hard=True)``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ode_vio_tpu.models.common import KAIMING


def gumbel_softmax(rng, logits, tau: float = 1.0, hard: bool = True, axis=-1):
    """Straight-through Gumbel-softmax (the torch semantics: samples in both
    train and eval mode)."""
    g = jax.random.gumbel(rng, logits.shape, logits.dtype)
    y_soft = jax.nn.softmax((logits + g) / tau, axis=axis)
    if not hard:
        return y_soft
    index = jnp.argmax(y_soft, axis=axis)
    y_hard = jax.nn.one_hot(index, logits.shape[axis], dtype=logits.dtype, axis=axis)
    return y_hard + y_soft - jax.lax.stop_gradient(y_soft)


class FusionModule(nn.Module):
    feature_dim: int          # = v_f_len + i_f_len
    fuse_method: str = "cat"  # cat | soft | hard

    @nn.compact
    def __call__(self, v: jnp.ndarray, i: jnp.ndarray) -> jnp.ndarray:
        feat = jnp.concatenate([v, i], axis=-1)
        if self.fuse_method == "cat":
            return feat
        if self.fuse_method == "soft":
            weights = nn.Dense(self.feature_dim, kernel_init=KAIMING,
                               name="gate")(feat)
            return feat * weights
        if self.fuse_method == "hard":
            logits = nn.Dense(2 * self.feature_dim, kernel_init=KAIMING,
                              name="gate")(feat)
            logits = logits.reshape(feat.shape[:-1] + (self.feature_dim, 2))
            mask = gumbel_softmax(self.make_rng("gumbel"), logits, tau=1.0, hard=True)
            return feat * mask[..., 0]
        raise ValueError(f"fuse method '{self.fuse_method}' not supported")
