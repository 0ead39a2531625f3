"""End-to-end conformance: encode -> real bitstream -> decode -> bit-match.

The project analogue of the reference's HM decode-and-compare gate
(reference: Tests/SVT-HEVC_FunctionalTests.py:641 recon==decode), using the
in-repo conformance decoder as the oracle.
"""

import numpy as np
import pytest

from svt_hevc_tpu.config import EncoderConfig
from svt_hevc_tpu.decoder.decoder import decode_stream
from svt_hevc_tpu.io.yuv import Frame
from svt_hevc_tpu.pipeline.encoder import Encoder


def make_frame(w, h, kind="gradient", seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "gradient":
        y = ((xx * 255) // max(w - 1, 1) + (yy * 31) // max(h - 1, 1)) % 256
    elif kind == "noise":
        y = rng.integers(0, 256, size=(h, w))
    elif kind == "flat":
        y = np.full((h, w), 128)
    elif kind == "edges":
        y = np.where((xx // 16 + yy // 16) % 2 == 0, 40, 215)
        y = y + rng.integers(-8, 9, size=(h, w))
        y = np.clip(y, 0, 255)
    else:
        raise ValueError(kind)
    cb = 128 + (xx[::2, ::2] // 8) % 32 - 16
    cr = 128 - (yy[::2, ::2] // 8) % 32 + 8
    return Frame(y=y.astype(np.uint8), cb=np.clip(cb, 0, 255).astype(np.uint8),
                 cr=np.clip(cr, 0, 255).astype(np.uint8))


def roundtrip(frame, **cfg_kw):
    cfg = EncoderConfig(width=frame.width, height=frame.height, **cfg_kw)
    enc = Encoder(cfg)
    stream, recons = enc.encode([frame])
    decoded = decode_stream(stream)
    assert len(decoded) == 1
    return stream, recons[0], decoded[0]


@pytest.mark.parametrize("kind", ["gradient", "noise", "flat", "edges"])
def test_recon_bitmatch_64x64(kind):
    frame = make_frame(64, 64, kind)
    _, recon, dec = roundtrip(frame, qp=32)
    np.testing.assert_array_equal(recon.y, dec.y)
    np.testing.assert_array_equal(recon.cb, dec.cb)
    np.testing.assert_array_equal(recon.cr, dec.cr)


@pytest.mark.parametrize("qp", [12, 22, 32, 45, 51])
def test_recon_bitmatch_qp_sweep(qp):
    frame = make_frame(96, 64, "edges", seed=qp)
    _, recon, dec = roundtrip(frame, qp=qp)
    np.testing.assert_array_equal(recon.y, dec.y)
    np.testing.assert_array_equal(recon.cb, dec.cb)
    np.testing.assert_array_equal(recon.cr, dec.cr)


def test_recon_bitmatch_nonaligned_size():
    # 72x88: multiple of 8 but not of CTB -> forced quadtree splits at edges
    frame = make_frame(72, 88, "gradient")
    _, recon, dec = roundtrip(frame, qp=30)
    np.testing.assert_array_equal(recon.y, dec.y)
    np.testing.assert_array_equal(recon.cb, dec.cb)
    np.testing.assert_array_equal(recon.cr, dec.cr)


def test_recon_bitmatch_crop():
    # 68x84: needs conformance-window cropping (coded 72x88)
    frame = make_frame(68, 84, "edges", seed=3)
    _, recon, dec = roundtrip(frame, qp=30)
    assert dec.y.shape == (84, 68)
    np.testing.assert_array_equal(recon.y, dec.y)
    np.testing.assert_array_equal(recon.cb, dec.cb)
    np.testing.assert_array_equal(recon.cr, dec.cr)


def test_recon_bitmatch_ctb64():
    frame = make_frame(128, 64, "edges", seed=9)
    _, recon, dec = roundtrip(frame, qp=32, ctb_size=64)
    np.testing.assert_array_equal(recon.y, dec.y)
    np.testing.assert_array_equal(recon.cb, dec.cb)
    np.testing.assert_array_equal(recon.cr, dec.cr)


def test_nxn_partition_roundtrip():
    frame = make_frame(64, 64, "noise", seed=5)
    cfg = EncoderConfig(width=64, height=64, qp=35)
    enc = Encoder(cfg)
    # force min-size CUs with NxN partitions everywhere
    pic = enc.encode_frame(
        frame,
        split_policy=lambda x0, y0, log2, depth: log2 > 3,
        part_nxn_policy=lambda x0, y0: True)
    stream = enc.headers() + pic.nal_bytes
    dec = decode_stream(stream)[0]
    np.testing.assert_array_equal(pic.recon.y, dec.y)
    np.testing.assert_array_equal(pic.recon.cb, dec.cb)
    np.testing.assert_array_equal(pic.recon.cr, dec.cr)


def test_multi_frame_stream():
    frames = [make_frame(64, 64, "edges", seed=s) for s in range(3)]
    cfg = EncoderConfig(width=64, height=64, qp=32)
    enc = Encoder(cfg)
    stream, recons = enc.encode(frames)
    decoded = decode_stream(stream)
    assert len(decoded) == 3
    for r, d in zip(recons, decoded):
        np.testing.assert_array_equal(r.y, d.y)


def test_psnr_sane():
    frame = make_frame(96, 96, "gradient")
    _, recon, _ = roundtrip(frame, qp=27)
    py, pcb, pcr = recon.psnr(frame)
    assert py > 36.0, py
    assert pcb > 36.0 and pcr > 36.0


def test_quality_improves_with_lower_qp():
    frame = make_frame(64, 64, "edges", seed=11)
    _, r_hi, _ = roundtrip(frame, qp=45)
    _, r_lo, _ = roundtrip(frame, qp=20)
    assert r_lo.psnr(frame)[0] > r_hi.psnr(frame)[0] + 3.0


def test_deterministic():
    frame = make_frame(64, 64, "noise", seed=1)
    s1, _, _ = roundtrip(frame, qp=32)
    s2, _, _ = roundtrip(frame, qp=32)
    assert s1 == s2
