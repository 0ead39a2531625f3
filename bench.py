"""Benchmark: FULL encode throughput at 1080p, M7, IPPP, one chip.

Times Encoder.encode_pictures() end-to-end — TPU frontend (analysis/OIS/
HME), mode decision, encode pass, DLF/SAO, CABAC, packetization — the
analogue of the reference's speed test (Tests/SVT-HEVC_FunctionalTests.py
run_speed_test :1409), NOT just the TPU frontend.

Prints ONE JSON line. vs_baseline normalises against 1080p50 real-time
(the reference's design point is real-time encoding at its presets,
Docs/svt-hevc_encoder_user_guide.md:398).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

W, H = 1920, 1080
WARMUP_FRAMES = 2          # compile + cache TPU graphs
MAX_FRAMES = 64
TIME_BUDGET_S = 120.0


def make_frames(n):
    """Synthetic 1080p content: textured background with global pan +
    moving objects, so inter coding does real work."""
    from svt_hevc_tpu.io.yuv import Frame
    rng = np.random.default_rng(7)
    big = rng.integers(0, 256, (H + 128, W + 128)).astype(np.float32)
    # low-pass for natural-ish spectrum
    for _ in range(2):
        big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)
               + np.roll(big, -1, 0) + np.roll(big, -1, 1)) / 5.0
    big = big * 0.7 + 64
    frames = []
    for i in range(n):
        ox, oy = (2 * i) % 64, i % 64
        y = big[oy:oy + H, ox:ox + W].astype(np.uint8).copy()
        # moving square object
        sx, sy = (100 + 7 * i) % (W - 200), (80 + 5 * i) % (H - 200)
        y[sy:sy + 96, sx:sx + 96] = 200
        cb = np.full((H // 2, W // 2), 120, np.uint8)
        cr = np.full((H // 2, W // 2), 124, np.uint8)
        frames.append(Frame(y=y, cb=cb, cr=cr))
    return frames


def main() -> None:
    from svt_hevc_tpu.config import EncoderConfig
    from svt_hevc_tpu.pipeline.encoder import Encoder

    cfg = EncoderConfig(width=W, height=H, qp=32, fps_num=50,
                        enc_mode=7, intra_period=-1)
    enc = Encoder(cfg)
    frames = make_frames(MAX_FRAMES)

    n_done = 0
    total_bytes = 0
    t0 = None
    for au in enc.encode_pictures(iter(frames)):
        total_bytes += len(au.data)
        if au.display_idx == WARMUP_FRAMES - 1:
            t0 = time.perf_counter()      # start clock after warmup frames
            continue
        if t0 is not None:
            n_done += 1
            if time.perf_counter() - t0 > TIME_BUDGET_S:
                break
    dt = time.perf_counter() - t0 if t0 is not None else float("inf")

    fps = n_done / dt
    print(json.dumps({
        "metric": "full_encode_1080p_m7_ipp_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 50.0, 4),
    }))


if __name__ == "__main__":
    main()
