"""Benchmark: FULL encode throughput at 1080p, M7, IPPP, one chip.

Times Encoder.encode_pictures() end-to-end — TPU frontend (analysis/OIS/
HME), mode decision, encode pass, DLF/SAO, CABAC, packetization — the
analogue of the reference's speed test (Tests/SVT-HEVC_FunctionalTests.py
run_speed_test :1409), NOT just the TPU frontend.

Prints ONE JSON line, ALWAYS: a SIGTERM/SIGINT/SIGALRM or the internal
deadline emits the partial result instead of dying silently (a bench that
can time out silently is not a bench). The headline metric is the
steady-state IPPP fps; idr_seconds / compile_seconds are reported
separately so warmup cost is visible, not hidden in the average.
vs_baseline normalises against 1080p50 real-time (the reference's design
point is real-time encoding at its presets,
Docs/svt-hevc_encoder_user_guide.md:398).
"""

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

W, H = 1920, 1080
WARMUP_FRAMES = 3          # IDR + first P (graph compile) + 1 settled P
MAX_FRAMES = 64
TIME_BUDGET_S = 90.0       # steady-state measurement window
DEADLINE_S = 540.0         # absolute wall-clock backstop (SIGALRM)

_state = {
    "idr_seconds": None,        # first (IDR) frame wall time
    "compile_seconds": None,    # first P frame (includes graph compile)
    "steady_frames": 0,
    "steady_seconds": 0.0,
    "phase": "startup",
}
_emitted = False


def _emit(rc: int = 0) -> None:
    global _emitted
    if _emitted:
        return
    _emitted = True
    s = _state
    fps = (s["steady_frames"] / s["steady_seconds"]
           if s["steady_seconds"] > 0 and s["steady_frames"] > 0 else 0.0)
    print(json.dumps({
        "metric": "full_encode_1080p_m7_ipp_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 50.0, 4),
        "idr_seconds": (round(s["idr_seconds"], 3)
                        if s["idr_seconds"] is not None else None),
        "compile_seconds": (round(s["compile_seconds"], 3)
                            if s["compile_seconds"] is not None else None),
        "steady_frames": s["steady_frames"],
        "phase": s["phase"],
    }), flush=True)
    if rc:
        os._exit(rc)


def _on_signal(signum, frame):
    _state["phase"] += f"/sig{signum}"
    _emit(rc=0)
    os._exit(0)


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
    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGALRM):
        signal.signal(sig, _on_signal)
    signal.alarm(int(DEADLINE_S))

    from svt_hevc_tpu.config import EncoderConfig
    from svt_hevc_tpu.pipeline.encoder import Encoder

    cfg = EncoderConfig(width=W, height=H, qp=32, fps_num=50,
                        enc_mode=7, intra_period=-1)
    enc = Encoder(cfg)
    frames = make_frames(MAX_FRAMES)

    _state["phase"] = "warmup"
    t_prev = time.perf_counter()
    t0 = None
    for au in enc.encode_pictures(iter(frames)):
        now = time.perf_counter()
        if au.display_idx == 0:
            _state["idr_seconds"] = now - t_prev
        elif au.display_idx == 1:
            _state["compile_seconds"] = now - t_prev
        t_prev = now
        if au.display_idx == WARMUP_FRAMES - 1:
            _state["phase"] = "steady"
            t0 = now                  # start clock after warmup frames
            continue
        if t0 is not None:
            _state["steady_frames"] += 1
            _state["steady_seconds"] = now - t0
            if now - t0 > TIME_BUDGET_S:
                break
    _state["phase"] = "done"
    _emit()


if __name__ == "__main__":
    main()
