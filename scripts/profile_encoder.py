"""Per-layer FlowNet-S trunk microbenchmark on the real TPU.

Times each ConvBlock at flagship shapes (B=64 windows -> 640 pairs of
256x512) to locate the MXU-utilisation gaps BENCH.md's aggregate number
hides. Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_encoder.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

PAIRS = 640  # B=64 x 10 transitions
H, W = 256, 512

# (features, kernel, stride) per trunk block (Encoder.py:82-90)
TRUNK = [
    (64, 7, 2), (128, 5, 2), (256, 5, 2), (256, 3, 1),
    (512, 3, 2), (512, 3, 1), (512, 3, 2), (512, 3, 1), (1024, 3, 2),
]


def main():
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    h, w, cin = H, W, 6
    total_ms = 0.0
    total_tf = 0.0
    print(f"device={jax.devices()[0]} pairs={PAIRS} dtype={dtype}")
    for i, (cout, k, s) in enumerate(TRUNK):
        x = jnp.asarray(
            rng.standard_normal((PAIRS, h, w, cin)).astype(np.float32), dtype
        )
        kern = jnp.asarray(
            (rng.standard_normal((k, k, cin, cout)) * 0.05).astype(np.float32),
            dtype,
        )
        pad = (k - 1) // 2

        @jax.jit
        def conv(x, kern, s=s, pad=pad):
            return jax.lax.conv_general_dilated(
                x, kern, (s, s), ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        out = conv(x, kern)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = conv(x, kern)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / 10 * 1e3
        ho, wo = h // s, w // s
        gflop = 2 * PAIRS * ho * wo * cout * (k * k * cin) / 1e9
        tfs = gflop / ms
        total_ms += ms
        total_tf += gflop / 1e3
        print(f"block{i}: {cin:5d}->{cout:4d} k{k} s{s} {h}x{w} "
              f"{ms:7.2f} ms  {gflop:7.1f} GF  {tfs:6.1f} TF/s")
        h, w, cin = ho, wo, cout
    print(f"total conv: {total_ms:.2f} ms, {total_tf*1e3:.0f} GF, "
          f"{total_tf*1e3/total_ms:.1f} TF/s")


if __name__ == "__main__":
    main()
