"""Backward-conv probes for the UNFROZEN training path (VERDICT r2 next
#1b): per-trunk-layer fwd and fwd+bwd slope-method timings at flagship
dims, comparing XLA's native strided backward (dgrad = lhs-dilated conv)
against the space-to-depth formulation (stride-1 fwd -> dilation-free
dgrad/wgrad at 16/9 the nominal FLOPs for k=3, 25/16ths for k=5).

Run on the TPU: ``python scripts/probe_backward.py``. One JSON line per
(layer, variant); recorded in BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax

try:
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from ode_vio_tpu.models.encoders import _space_to_depth_conv

# (name, Cin, Cout, k, stride, H, W) at 256x512 input, B=320 pairs
TRUNK = [
    ("L0", 6, 64, 7, 2, 256, 512),
    ("L1", 64, 128, 5, 2, 128, 256),
    ("L2", 128, 256, 5, 2, 64, 128),
    ("L3", 256, 256, 3, 1, 32, 64),
    ("L4", 256, 512, 3, 2, 32, 64),
    ("L5", 512, 512, 3, 1, 16, 32),
    ("L6", 512, 512, 3, 2, 16, 32),
    ("L7", 512, 512, 3, 1, 8, 16),
    ("L8", 512, 1024, 3, 2, 8, 16),
]


def slope_time(fn, args, iters=8, reps=3):
    """Median slope-method time of one fn application (seconds)."""

    def make(K):
        @jax.jit
        def run(*a):
            def body(c, _):
                out = fn(*[c[0] if i == 0 else x
                           for i, x in enumerate(a)])
                # dependency chain + full reduction (DCE guard)
                nxt = c[0] * 0.999 + out[0]
                return (nxt, c[1] + out[1]), None
            (xf, acc), _ = jax.lax.scan(body, (a[0], 0.0), None, length=K)
            return jnp.sum(xf) + acc
        return run

    r1, r2 = make(2), make(2 + iters)
    # time float(...) — an actual value fetch. Through the axon relay
    # block_until_ready() can return without waiting (async futures);
    # fetching the f32 scalar forces completion, and the constant ~40 ms
    # tunnel RTT cancels in the K2-vs-K(2+iters) slope.
    float(r1(*args))
    float(r2(*args))
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(r1(*args))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(r2(*args))
        tb = time.perf_counter() - t0
        samples.append((tb - ta) / iters)
    samples.sort()
    return samples[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=320)  # B=32 x (S-1)
    ap.add_argument("--layers", type=str, nargs="+", default=None)
    args = ap.parse_args()

    B = args.pairs
    rng = np.random.default_rng(0)
    for name, ci, co, k, s, h, w in TRUNK:
        if args.layers and name not in args.layers:
            continue
        x = jnp.asarray(rng.standard_normal((B, h, w, ci)), jnp.bfloat16)
        W = jnp.asarray(0.05 * rng.standard_normal((k, k, ci, co)),
                        jnp.bfloat16)
        pad = (k - 1) // 2
        gflop = 2.0 * B * (h // s) * (w // s) * k * k * ci * co / 1e9

        def conv_native(x, W):
            return jax.lax.conv_general_dilated(
                x, W, (s, s), ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def conv_s2d(x, W):
            return _space_to_depth_conv(x, W, jnp.bfloat16)

        variants = {"native": conv_native}
        if s == 2 and h % 2 == 0 and w % 2 == 0:
            variants["s2d"] = conv_s2d

        for vname, conv in variants.items():
            def fwd(x, W):
                y = conv(x, W)
                # (chainable same-shape tensor, scalar reduction)
                return (x * 0.0 + jnp.mean(y), jnp.sum(y.astype(jnp.float32)))

            def fwdbwd(x, W):
                def loss(x_, W_):
                    y = conv(x_, W_)
                    return jnp.sum((y * y).astype(jnp.float32))

                l, (dx, dW) = jax.value_and_grad(loss, argnums=(0, 1))(x, W)
                return (dx, l + jnp.sum(dW.astype(jnp.float32)))

            t_f = slope_time(fwd, (x, W))
            t_fb = slope_time(fwdbwd, (x, W))
            print(json.dumps({
                "layer": name, "variant": vname,
                "fwd_ms": round(t_f * 1e3, 3),
                "fwd_tfs": round(gflop / t_f / 1e3, 1),
                "fwdbwd_ms": round(t_fb * 1e3, 3),
                "bwd_ms": round((t_fb - t_f) * 1e3, 3),
                "bwd_tfs": round(2 * gflop / max(t_fb - t_f, 1e-9) / 1e3, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
