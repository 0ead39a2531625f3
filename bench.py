"""Benchmark: TPU picture-analysis + 35-mode intra search throughput, 1080p.

Prints ONE JSON line. Metric: 1080p frames/second through the jit-compiled
analysis graph (decimation pyramid + variance maps + full open-loop intra
mode search at CU sizes 4/8/16/32) on one chip — the TPU hot path built so
far. vs_baseline normalises against 1080p50 real-time (the reference's
design point is real-time multichannel encoding; Docs/
svt-hevc_encoder_user_guide.md:398).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main() -> None:
    import jax  # noqa: E402

    from svt_hevc_tpu.tpu.analysis import analyze_frame  # noqa: E402

    rng = np.random.default_rng(0)
    y = jax.numpy.asarray(
        rng.integers(0, 256, (1088, 1920)).astype(np.float32))

    # compile + warmup
    out = analyze_frame(y)
    jax.block_until_ready(out)

    n_iter = 50
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = analyze_frame(y)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = n_iter / dt
    print(json.dumps({
        "metric": "intra_analysis_1080p_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
