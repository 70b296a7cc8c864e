"""Reproducible codec decode-throughput harness (BENCH/BASELINE.md
codec table). Pure driver-side: generates the deterministic
gradient+noise corpus, encodes with our encoder, and times decode_jpeg
single-core through both paths (scalar, and the round-7 transposed
restart-segment batch decoder where eligible).

Usage: python tools/bench_codecs.py [--repeats 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gene_etl_spark.operators import jpeg as J  # noqa: E402


def corpus(h: int, w: int, seed: int = 5) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    g = ((yy * 255 // max(h - 1, 1) + xx * 255 // max(w - 1, 1)) // 2).astype(np.int32)
    img = np.stack([g, 255 - g, (g * 2) % 256], axis=-1)
    return np.clip(img + rng.integers(-12, 13, img.shape), 0, 255).astype(np.uint8)


def timed(fn, repeats: int) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    rows = [
        ("256x256 4:4:4 q85 DRI=8", (256, 256), False, 85, 8),
        ("256x256 4:2:0 q75 DRI=8", (256, 256), True, 75, 8),
        ("512x512 4:4:4 q85 DRI=8", (512, 512), False, 85, 8),
        ("512x512 4:2:0 q75 DRI=8", (512, 512), True, 75, 8),
        ("256x256 4:4:4 q85 no-DRI", (256, 256), False, 85, 0),
    ]
    print(f"{'stream':28s} {'bytes':>7s} {'scalar MB/s':>12s} {'batch MB/s':>11s} {'speedup':>8s}")
    default_thr = J._BATCH_MIN_SEGMENTS
    for label, (h, w), sub, q, dri in rows:
        img = corpus(h, w)
        enc = J.encode_jpeg(img, quality=q, subsample=sub, restart_interval=dri)
        J._BATCH_MIN_SEGMENTS = 10**9
        t_scalar = timed(lambda: J.decode_jpeg(enc), args.repeats)
        J._BATCH_MIN_SEGMENTS = 1  # force batch wherever structurally possible
        t_batch = timed(lambda: J.decode_jpeg(enc), args.repeats)
        ref = None
        J._BATCH_MIN_SEGMENTS = 10**9
        ref = J.decode_jpeg(enc)
        J._BATCH_MIN_SEGMENTS = 1
        assert np.array_equal(ref["pixels"], J.decode_jpeg(enc)["pixels"]), label
        mb = len(enc) / 1e6
        print(
            f"{label:28s} {len(enc):7d} {mb / t_scalar:12.2f} "
            f"{mb / t_batch:11.2f} {t_scalar / t_batch:7.1f}x"
        )
    J._BATCH_MIN_SEGMENTS = default_thr


if __name__ == "__main__":
    main()
