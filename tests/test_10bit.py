"""10-bit (Main10) path tests."""

import numpy as np
import pytest

from svt_hevc_tpu.config import EncoderConfig
from svt_hevc_tpu.decoder.decoder import decode_stream
from svt_hevc_tpu.io.yuv import Frame
from svt_hevc_tpu.pipeline.encoder import Encoder


def make_frame10(w, h, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx * 1023) // max(w - 1, 1) + rng.integers(-40, 41, (h, w)))
    cb = 512 + (xx[::2, ::2] % 128) - 64
    cr = 512 - (yy[::2, ::2] % 128) + 32
    return Frame(y=np.clip(y, 0, 1023).astype(np.uint16),
                 cb=np.clip(cb, 0, 1023).astype(np.uint16),
                 cr=np.clip(cr, 0, 1023).astype(np.uint16))


def _roundtrip10(frame, qp, **kw):
    cfg = EncoderConfig(width=frame.width, height=frame.height,
                        bit_depth=10, qp=qp, **kw)
    enc = Encoder(cfg)
    stream, recons = enc.encode([frame])
    dec = decode_stream(stream)
    return stream, recons[0], dec[0]


@pytest.mark.parametrize("qp", [20, 32, 45])
def test_10bit_bitmatch(qp):
    frame = make_frame10(64, 64, seed=qp)
    _, recon, dec = _roundtrip10(frame, qp)
    assert dec.y.dtype == np.uint16
    np.testing.assert_array_equal(recon.y, dec.y)
    np.testing.assert_array_equal(recon.cb, dec.cb)
    np.testing.assert_array_equal(recon.cr, dec.cr)


def test_10bit_psnr_exceeds_8bit_floor():
    frame = make_frame10(64, 64, seed=3)
    _, recon, _ = _roundtrip10(frame, 22)
    py = recon.psnr(frame)[0]
    assert py > 40.0, py
    assert recon.y.max() > 255     # actually using the 10-bit range


def test_10bit_sps_signals_main10():
    from svt_hevc_tpu.bitstream.headers import parse_sps, write_sps
    cfg = EncoderConfig(width=64, height=64, bit_depth=10).validate()
    sps = parse_sps(write_sps(cfg))
    assert sps.bit_depth == 10


def test_10bit_p_frames():
    base = make_frame10(64, 64, seed=5)
    frames = [base]
    for i in (1, 2):
        y = np.roll(base.y, 2 * i, axis=1)
        frames.append(Frame(y=y, cb=base.cb.copy(), cr=base.cr.copy()))
    cfg = EncoderConfig(width=64, height=64, bit_depth=10, qp=30,
                        intra_period=-1)
    enc = Encoder(cfg)
    stream, recons = enc.encode(frames)
    decoded = decode_stream(stream)
    for r, d in zip(recons, decoded):
        np.testing.assert_array_equal(r.y, d.y)
        np.testing.assert_array_equal(r.cb, d.cb)
        np.testing.assert_array_equal(r.cr, d.cr)


def test_10bit_yuv_io(tmp_path):
    from svt_hevc_tpu.io.yuv import read_yuv420, write_yuv420
    frames = [make_frame10(64, 64, seed=i) for i in range(2)]
    path = tmp_path / "ten.yuv"
    write_yuv420(str(path), frames)
    back = list(read_yuv420(str(path), 64, 64, bit_depth=10))
    assert len(back) == 2
    for a, b in zip(frames, back):
        np.testing.assert_array_equal(a.y, b.y)
        np.testing.assert_array_equal(a.cb, b.cb)


def test_10bit_uses_device_fast_path():
    """10-bit must run the fused device path (r4 verdict item 8: 10-bit
    fell to the ~0.01x host path), producing an oracle-decodable stream
    whose recon bit-matches the decode."""
    from svt_hevc_tpu.pipeline import fast_path as fp

    calls = {"p": 0, "i": 0}
    orig_p, orig_i = fp.run_fast_p, fp.run_fast_i

    def spy_p(*a, **k):
        calls["p"] += 1
        return orig_p(*a, **k)

    def spy_i(*a, **k):
        calls["i"] += 1
        return orig_i(*a, **k)

    fp.run_fast_p, fp.run_fast_i = spy_p, spy_i
    try:
        frames = [make_frame10(96, 64, seed=s) for s in range(4)]
        cfg = EncoderConfig(width=96, height=64, bit_depth=10, qp=30,
                            intra_period=-1, scene_change_detection=False)
        enc = Encoder(cfg)
        stream, recons = enc.encode(frames)
    finally:
        fp.run_fast_p, fp.run_fast_i = orig_p, orig_i
    assert calls["i"] == 1 and calls["p"] == 3, calls
    dec = decode_stream(stream)
    for r, d in zip(recons, dec):
        np.testing.assert_array_equal(r.y, d.y)
        np.testing.assert_array_equal(r.cb, d.cb)
