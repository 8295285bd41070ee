"""Per-feature ablation of the FlowNet trunk at flagship dims (B=32):
chain all 9 ConvBlocks (no dense head) under increasing feature sets and
time each with the slope method. Variants:

  conv          — bare convs only
  conv_relu     — + LeakyReLU
  bn_eval       — + BN with running stats (eval)
  bn_train      — + BN with batch stats + running update (train, no drop)
  bn_train_drop — + train-mode dropout masks (the full train trunk)

Locates the ~24 ms eval overhead over bare convs and the ~33 ms train
overhead over eval found by probe_encoder_mode/probe_encoder_cost.

``PYTHONPATH=/root/repo:/root/.axon_site python -u
scripts/probe_trunk_variants.py``
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import jax

try:
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

B, H, W = 32, 256, 512
PAIRS = B * 10
TRUNK = (
    (64, 7, 2, 0.2), (128, 5, 2, 0.2), (256, 5, 2, 0.2), (256, 3, 1, 0.2),
    (512, 3, 2, 0.2), (512, 3, 1, 0.2), (512, 3, 2, 0.2), (512, 3, 1, 0.2),
    (1024, 3, 2, 0.5),
)


def _u8_dropout(x, rate, key, salt):
    """Dropout whose keep-mask spends 8 random bits per element instead of
    bernoulli's 32: generate x.size/4 uint32 words and bitcast each to 4
    uint8 thresholds; keep where threshold >= rate*256. Probability
    quantisation is 1/256 (0.2 -> 51/256 ~ 0.199)."""
    thresh = int(round(rate * 256.0))
    kept = (256 - thresh) / 256.0
    nw = x.size // 4
    bits32 = jax.random.bits(jax.random.fold_in(key, salt), (nw,),
                             jnp.uint32)
    bits = jax.lax.bitcast_convert_type(bits32, jnp.uint8).reshape(x.shape)
    mask = (bits >= jnp.uint8(thresh)).astype(x.dtype)
    return x * mask * jnp.asarray(1.0 / kept, x.dtype)


class Trunk(nn.Module):
    use_bn: bool = False
    use_relu: bool = False
    use_drop: bool = False
    use_bias: bool = False
    u8_drop: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        for i, (f, k, s, d) in enumerate(TRUNK):
            pad = (k - 1) // 2
            x = nn.Conv(f, (k, k), strides=(s, s),
                        padding=((pad, pad), (pad, pad)),
                        use_bias=self.use_bias,
                        dtype=jnp.bfloat16, name=f"conv{i}")(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.bfloat16,
                                 name=f"bn{i}")(x)
            if self.use_relu:
                x = nn.leaky_relu(x.astype(jnp.bfloat16), 0.1)
            if self.use_drop and train:
                if self.u8_drop:
                    x = _u8_dropout(x, d, self.make_rng("dropout"), i)
                else:
                    x = nn.Dropout(d, deterministic=False)(x)
        return x


def slope(run, args, k1=2, k2=6, reps=3):
    float(run(*args, 1))
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(*args, k1))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(*args, k2))
        tb = time.perf_counter() - t0
        samples.append((tb - ta) / (k2 - k1))
    samples.sort()
    return samples[len(samples) // 2]


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.random((PAIRS, H, W, 6), np.float32).astype(np.float32) - 0.5
    ).astype(jnp.bfloat16)

    cases = [
        ("conv", dict(), False),
        ("conv_relu", dict(use_relu=True), False),
        ("bn_eval", dict(use_bn=True, use_relu=True), False),
        ("bn_train", dict(use_bn=True, use_relu=True), True),
        ("bn_train_drop", dict(use_bn=True, use_relu=True, use_drop=True),
         True),
        # same, but the dropout rng is an 'rbg' typed key: bernoulli then
        # draws its bits from XLA's hardware rng-bit-generator instead of
        # the threefry software hash
        ("bn_train_drop_rbg", dict(use_bn=True, use_relu=True,
                                   use_drop=True), True),
        # uint8-threshold dropout (8 random bits/element) on an rbg key
        ("bn_train_drop_pack8", dict(use_bn=True, use_relu=True,
                                     use_drop=True, u8_drop=True), True),
        # eval-path candidate: BN folded into conv WEIGHTS+BIAS, graph
        # carries no BN at all (vs bn_eval's +16 ms identity affine)
        ("conv_bias_relu", dict(use_relu=True, use_bias=True), False),
    ]
    for name, kw, train in cases:
        drop_key = (
            jax.random.key(1, impl="rbg")
            if name.endswith("_rbg") or name.endswith("_pack8")
            else jax.random.PRNGKey(1)
        )
        mod = Trunk(**kw)
        variables = mod.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            x[:2], train=False,
        )

        @partial(jax.jit, static_argnums=(2,))
        def run(variables, x, k, mod=mod, train=train, drop_key=drop_key):
            def body(c, i):
                xi = x + i.astype(jnp.bfloat16) * 1e-3
                if train:
                    y, _ = mod.apply(
                        variables, xi, train=True,
                        rngs={"dropout": drop_key},
                        mutable=["batch_stats"],
                    )
                else:
                    y = mod.apply(variables, xi, train=False)
                return c + jnp.sum(y.astype(jnp.float32)), None
            tot, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32),
                jnp.arange(k, dtype=jnp.float32),
            )
            return tot

        t = slope(run, (variables, x))
        print(json.dumps({"case": name, "ms": round(t * 1e3, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
