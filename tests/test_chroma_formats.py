"""4:2:2 / 4:4:4 chroma format tests (MainREXT profile).

The reference supports P420/P422/P444 input with profile 4 (MainREXT)
required for 422/444 (reference: Source/Lib/Codec/EbEncHandle.c:2454-2456;
test content matrix Tests/SVT-HEVC_FunctionalTests.py:70-100). Every encode
here is decoded by the conformance decoder and must bit-match the encoder
reconstruction — including the REXT-specific syntax: two stacked chroma TBs
with doubled cbf flags for 4:2:2 (7.3.8.8/7.3.8.10), the 4:2:2 intra mode
remap (Table 8-3), luma-sized chroma TBs and per-PU chroma modes for 4:4:4.
"""

import numpy as np
import pytest

from svt_hevc_tpu.config import EncoderConfig
from svt_hevc_tpu.decoder.decoder import decode_stream
from svt_hevc_tpu.io.yuv import Frame
from svt_hevc_tpu.pipeline.encoder import Encoder


def chroma_dims(w, h, cf):
    return (w // (2 if cf in (1, 2) else 1), h // (2 if cf == 1 else 1))


def make_frames(n, w, h, cf, bit_depth=8, seed=0):
    rng = np.random.default_rng(seed)
    cw, ch = chroma_dims(w, h, cf)
    mx = (1 << bit_depth) - 1
    dt = np.uint8 if bit_depth == 8 else np.uint16
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * mx) // max(w - 1, 1)
    cyy, cxx = np.mgrid[0:ch, 0:cw]
    cbase = (cyy * mx) // max(ch - 1, 1)
    out = []
    for i in range(n):
        y = np.clip(base + rng.integers(-24, 25, (h, w)) + 3 * i, 0, mx)
        cb = np.clip(cbase + rng.integers(-12, 13, (ch, cw)), 0, mx)
        cr = np.clip(mx - cbase + rng.integers(-12, 13, (ch, cw)), 0, mx)
        out.append(Frame(y.astype(dt), cb.astype(dt), cr.astype(dt)))
    return out


def roundtrip(cfg, frames, **kw):
    stream, recons = Encoder(cfg).encode(frames, **kw)
    decoded = decode_stream(stream)
    assert len(decoded) == len(frames)
    for d, r in zip(decoded, recons):
        np.testing.assert_array_equal(d.y, r.y)
        np.testing.assert_array_equal(d.cb, r.cb)
        np.testing.assert_array_equal(d.cr, r.cr)
    return stream, recons


@pytest.mark.parametrize("cf", [2, 3])
@pytest.mark.parametrize("qp", [24, 37])
def test_intra_bitmatch(cf, qp):
    cfg = EncoderConfig(width=64, height=64, qp=qp, chroma_format=cf)
    _, recons = roundtrip(cfg, make_frames(1, 64, 64, cf, seed=qp))


@pytest.mark.parametrize("cf", [2, 3])
def test_psnr_reasonable(cf):
    frames = make_frames(1, 64, 64, cf, seed=7)
    cfg = EncoderConfig(width=64, height=64, qp=22, chroma_format=cf)
    _, recons = roundtrip(cfg, frames)
    py, pcb, pcr = recons[0].psnr(frames[0])
    assert py > 34.0 and pcb > 34.0 and pcr > 34.0, (py, pcb, pcr)


@pytest.mark.parametrize("cf", [2, 3])
def test_inter_low_delay(cf):
    cfg = EncoderConfig(width=64, height=64, qp=30, chroma_format=cf,
                        intra_period=-1)
    roundtrip(cfg, make_frames(4, 64, 64, cf, seed=2))


@pytest.mark.parametrize("cf", [2, 3])
def test_random_access_hier_b(cf):
    cfg = EncoderConfig(width=64, height=64, qp=32, chroma_format=cf,
                        pred_structure=2, hierarchical_levels=2,
                        intra_period=-1)
    roundtrip(cfg, make_frames(5, 64, 64, cf, seed=3))


@pytest.mark.parametrize("cf", [2, 3])
def test_10bit(cf):
    cfg = EncoderConfig(width=64, height=64, qp=28, chroma_format=cf,
                        bit_depth=10)
    roundtrip(cfg, make_frames(2, 64, 64, cf, 10, seed=4))


@pytest.mark.parametrize("cf", [2, 3])
def test_rd_mode_decision(cf):
    cfg = EncoderConfig(width=64, height=64, qp=30, chroma_format=cf,
                        enc_mode=0)
    roundtrip(cfg, make_frames(1, 64, 64, cf, seed=5), rd=True)


@pytest.mark.parametrize("cf", [2, 3])
def test_forced_nxn_partition(cf):
    """Force NxN everywhere: exercises the 4x4 chroma TB aggregation
    (4:2:0/4:2:2 blk3 case) and the per-PU chroma modes of 4:4:4 NxN."""
    cfg = EncoderConfig(width=64, height=64, qp=30, chroma_format=cf)
    frames = make_frames(1, 64, 64, cf, seed=6)
    enc = Encoder(cfg)
    stream = enc.headers()
    pic = enc.encode_frame(frames[0],
                           split_policy=lambda x0, y0, log2, d: log2 > 3,
                           part_nxn_policy=lambda x0, y0: True, rd=False)
    decoded = decode_stream(stream + pic.nal_bytes)
    np.testing.assert_array_equal(decoded[0].y, pic.recon.y)
    np.testing.assert_array_equal(decoded[0].cb, pic.recon.cb)
    np.testing.assert_array_equal(decoded[0].cr, pic.recon.cr)


@pytest.mark.parametrize("cf", [2, 3])
def test_ctb64_and_tiles(cf):
    cfg = EncoderConfig(width=128, height=128, qp=33, chroma_format=cf,
                        ctb_size=64, tile_columns=2, tile_rows=2)
    roundtrip(cfg, make_frames(2, 128, 128, cf, seed=8))


@pytest.mark.parametrize("cf", [2, 3])
def test_odd_dimensions_conf_window(cf):
    cfg = EncoderConfig(width=72, height=68, qp=30, chroma_format=cf)
    frames = make_frames(2, 72, 68, cf, seed=9)
    _, recons = roundtrip(cfg, frames)
    assert recons[0].y.shape == (68, 72)
    assert recons[0].cb.shape == chroma_dims(72, 68, cf)[::-1]


def test_sps_signals_chroma_format():
    from svt_hevc_tpu.bitstream.headers import parse_sps, write_sps
    for cf in (1, 2, 3):
        cfg = EncoderConfig(width=64, height=64, chroma_format=cf).validate()
        sps = parse_sps(write_sps(cfg))
        assert sps.chroma_format_idc == cf


def test_rext_profile_derivation():
    assert EncoderConfig(width=64, height=64, chroma_format=1).profile == 1
    assert EncoderConfig(width=64, height=64, chroma_format=1,
                         bit_depth=10).profile == 2
    assert EncoderConfig(width=64, height=64, chroma_format=2).profile == 4
    assert EncoderConfig(width=64, height=64, chroma_format=3).profile == 4


def test_mode_422_remap_table():
    from svt_hevc_tpu.core.ctu import MODE_422_MAP
    assert len(MODE_422_MAP) == 35
    assert MODE_422_MAP[0] == 0 and MODE_422_MAP[1] == 1
    assert MODE_422_MAP[26] == 26 and MODE_422_MAP[10] == 10
    assert MODE_422_MAP[34] == 31


@pytest.mark.parametrize("cf", [2, 3])
def test_yuv_io_roundtrip(cf, tmp_path):
    from svt_hevc_tpu.io.yuv import read_yuv, write_yuv420
    frames = make_frames(2, 48, 32, cf, seed=11)
    path = tmp_path / "c.yuv"
    write_yuv420(str(path), frames)
    back = list(read_yuv(str(path), 48, 32, chroma_format=cf))
    assert len(back) == 2
    np.testing.assert_array_equal(back[1].cb, frames[1].cb)


@pytest.mark.parametrize("cs,cf", [("420", 1), ("422", 2), ("444", 3)])
def test_y4m_chroma_formats(cs, cf, tmp_path):
    from svt_hevc_tpu.io.yuv import read_y4m
    frames = make_frames(2, 32, 32, cf, seed=12)
    path = tmp_path / "c.y4m"
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W32 H32 F25:1 Ip A1:1 C{cs}\n".encode())
        for fr in frames:
            f.write(b"FRAME\n")
            f.write(fr.y.tobytes() + fr.cb.tobytes() + fr.cr.tobytes())
    back = list(read_y4m(str(path)))
    assert len(back) == 2
    np.testing.assert_array_equal(back[0].cr, frames[0].cr)
