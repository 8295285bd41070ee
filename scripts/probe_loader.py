"""Train input-pipeline throughput probe (VERDICT r2 next #6).

Measures the PrefetchingLoader's decoded-frames/s at production image
size against the measured train-step budget, sweeping decode threads.
Run: ``python scripts/probe_loader.py [--img_h 256 --img_w 512]``.
Results are recorded in BENCH.md.

The probe is hermetic: it writes a synthetic KITTI tree of random-noise
PNGs (the worst case for zlib inflate — real KITTI photographs decode
faster) and times (a) the raw decode+assemble path and (b) the full
prefetching iterator as the training loop consumes it.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img_h", type=int, default=256)
    ap.add_argument("--img_w", type=int, default=512)
    ap.add_argument("--seq_len", type=int, default=11)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--n_frames", type=int, default=161)
    ap.add_argument("--threads", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--train_step_ms", type=float, default=131.1,
                    help="measured train step budget (BENCH.md) the loader "
                         "must outrun; frames/step = batch*(seq_len-1)")
    args = ap.parse_args()

    from ode_vio_tpu.data import native_loader
    from ode_vio_tpu.data.kitti import BoundarySafeBatchSampler, KittiDataset
    from ode_vio_tpu.data.loader import PrefetchingLoader
    from ode_vio_tpu.data.synthetic import make_kitti_tree

    with tempfile.TemporaryDirectory() as td:
        root = make_kitti_tree(
            os.path.join(td, "kitti"), seqs=("00",), n_frames=args.n_frames,
            img_hw=(args.img_h, args.img_w),
        )
        ds = KittiDataset(str(root), sequence_length=args.seq_len,
                          train_seqs=("00",))
        print(json.dumps({
            "native_decoder": native_loader.is_available(),
            "host_cpus": os.cpu_count(),
            "windows": len(ds.samples),
        }))

        results = []
        for threads in args.threads:
            sampler = BoundarySafeBatchSampler(
                len(ds.samples), args.batch_size, shuffle=False,
                drop_last=True)
            loader = PrefetchingLoader(
                ds, sampler, (args.img_h, args.img_w),
                decode_threads=threads)
            # warm one pass (page cache, thread pool spin-up)
            for _ in loader:
                break
            t0 = time.perf_counter()
            frames = 0
            batches = 0
            for imgs, imus, gts, ts in loader:
                frames += imgs.shape[0] * imgs.shape[1]
                batches += 1
            dt = time.perf_counter() - t0
            fps = frames / dt
            # the device consumes batch*(seq_len-1) PAIR transitions per
            # step but the loader decodes batch*seq_len frames per batch
            step_frames = args.batch_size * args.seq_len
            feed_ms = 1e3 * step_frames / fps
            results.append({
                "decode_threads": threads,
                "decoded_frames_per_sec": round(fps, 1),
                "ms_per_batch": round(1e3 * dt / max(batches, 1), 1),
                "feed_ms_per_step": round(feed_ms, 1),
                "train_step_ms": args.train_step_ms,
                "device_bound": bool(feed_ms <= args.train_step_ms),
            })
            print(json.dumps(results[-1]))

        best = max(results, key=lambda r: r["decoded_frames_per_sec"])
        print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
