"""Per-stage wall times for one fast-path 1080p P frame (device compute
vs tunnel transfer split). Run on the real TPU."""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:32s} {dt*1000:9.1f} ms", flush=True)
    return out


def main():
    import importlib
    bench = importlib.import_module("bench")
    import jax
    import jax.numpy as jnp
    from svt_hevc_tpu.config import EncoderConfig
    from svt_hevc_tpu.pipeline.encoder import Encoder
    from svt_hevc_tpu.tpu import encode as tenc
    from svt_hevc_tpu.tpu.me import hme_search
    from svt_hevc_tpu.pipeline.fast_path import decide_tree

    frames = bench.make_frames(4)
    cfg = EncoderConfig(width=bench.W, height=bench.H, qp=32, fps_num=50,
                        enc_mode=7, intra_period=-1)
    enc = Encoder(cfg)
    # warm up the whole pipeline (compiles everything)
    gen = enc.encode_pictures(iter(frames))
    t("warmup 2 frames (compile)", lambda: (next(gen), next(gen)))

    w64 = (cfg.coded_width + 63) // 64 * 64
    h64 = (cfg.coded_height + 63) // 64 * 64
    fr = frames[2]

    def block(x):
        return jax.block_until_ready(x)

    src_dev = t("prep src upload", lambda: block(tenc.prep_planes(
        np.ascontiguousarray(fr.y), np.ascontiguousarray(fr.cb),
        np.ascontiguousarray(fr.cr), w64, h64)))
    ref_dev = next(iter(enc._dev_dpb.values()))
    mv = t("hme compute", lambda: block(hme_search(src_dev[0], ref_dev[0])))
    me_seed = t("hme fetch", lambda: np.asarray(mv[0]))
    from svt_hevc_tpu.tpu.analysis import ois_packed
    of = t("ois compute", lambda: block(ois_packed(src_dev[0])))
    t("ois fetch", lambda: np.asarray(of))
    raws = t("phase planes compute", lambda: block((
        tenc.luma_phase_planes(ref_dev[0]),
        tenc.chroma_phase_planes(ref_dev[1]),
        tenc.chroma_phase_planes(ref_dev[2]))))
    mdf = t("dense_md compute", lambda: block(tenc.dense_md_p_packed(
        src_dev[0], ref_dev[0], raws[0], jnp.asarray(me_seed))))
    md = t("dense_md fetch", lambda: tenc.unpack(np.asarray(mdf),
                                                 tenc.md_specs(h64, w64)))
    specs = []
    for n in (4, 8, 16, 32):
        specs.append((f"m{n}", (h64 // n, w64 // n), np.int32))
        specs.append((f"c{n}", (h64 // n, w64 // n), np.int32))
    ois = {n: (np.zeros((h64 // n, w64 // n), np.int32),
               np.full((h64 // n, w64 // n), 10**6, np.int32))
           for n in (4, 8, 16, 32)}
    maps = t("decide_tree host", lambda: decide_tree(md, ois, 5))
    tu = np.minimum(maps.cu_log2_8, 5)
    epf = t("encode_pass compute", lambda: block(tenc.encode_pass_p_packed(
        src_dev[0], src_dev[1], src_dev[2], raws[0], raws[1], raws[2],
        jnp.asarray(maps.mv8), jnp.asarray(maps.inter8), jnp.asarray(tu),
        jnp.int32(32), jnp.int32(32))))
    t("encode_pass fetch (12.7MB)", lambda: np.asarray(epf))


if __name__ == "__main__":
    main()
