"""Benchmark: TPU per-frame frontend throughput at 1080p on one chip.

The frontend = everything the TPU does per frame today: decimation
pyramid + variance maps + full 35-mode open-loop intra search at CU sizes
4/8/16/32 (svt_hevc_tpu.tpu.analysis) PLUS 3-level hierarchical motion
estimation against the previous frame (svt_hevc_tpu.tpu.me).

Prints ONE JSON line. vs_baseline normalises against 1080p50 real-time
(the reference's design point is real-time multichannel encoding,
Docs/svt-hevc_encoder_user_guide.md:398).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main() -> None:
    import jax  # noqa: E402
    import jax.numpy as jnp  # noqa: E402

    from svt_hevc_tpu.tpu.analysis import analyze_frame  # noqa: E402
    from svt_hevc_tpu.tpu.me import hme_search  # noqa: E402

    rng = np.random.default_rng(0)
    cur = jnp.asarray(rng.integers(0, 256, (1088, 1920)).astype(np.float32))
    prev = jnp.asarray(rng.integers(0, 256, (1088, 1920)).astype(np.float32))

    # compile + warmup
    jax.block_until_ready(analyze_frame(cur))
    jax.block_until_ready(hme_search(cur, prev))

    n_iter = 50
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = analyze_frame(cur)
        mv, sad = hme_search(cur, prev)
    jax.block_until_ready((out, mv, sad))
    dt = time.perf_counter() - t0

    fps = n_iter / dt
    print(json.dumps({
        "metric": "tpu_frontend_1080p_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
