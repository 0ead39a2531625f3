"""Profile a short 1080p M7 IPPP encode (bench.py conditions) and print
the top host-side hotspots + per-stage wall times."""

import cProfile
import io
import pstats
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import importlib
    bench = importlib.import_module("bench")
    from svt_hevc_tpu.config import EncoderConfig
    from svt_hevc_tpu.pipeline.encoder import Encoder

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    frames = bench.make_frames(n)
    cfg = EncoderConfig(width=bench.W, height=bench.H, qp=32, fps_num=50,
                        enc_mode=7, intra_period=-1)
    enc = Encoder(cfg)
    it = iter(frames)
    gen = enc.encode_pictures(it)
    # warmup: 2 frames (compile)
    t0 = time.perf_counter()
    next(gen); next(gen)
    print(f"warmup (2 frames incl. compile): {time.perf_counter()-t0:.1f}s",
          flush=True)

    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    cnt = 0
    for au in gen:
        cnt += 1
    pr.disable()
    dt = time.perf_counter() - t0
    print(f"{cnt} frames in {dt:.2f}s = {cnt/dt:.3f} fps", flush=True)
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(45)
    print(s.getvalue())


if __name__ == "__main__":
    main()
