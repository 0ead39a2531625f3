"""Inter (low-delay P) tests: MCP interpolation vs scalar spec math,
AMVP/merge syntax, and end-to-end P-frame bit-match."""

import numpy as np
import pytest

from svt_hevc_tpu.config import EncoderConfig
from svt_hevc_tpu.core.inter import (CHROMA_FILTERS, LUMA_FILTERS,
                                     interp_chroma, interp_luma)
from svt_hevc_tpu.decoder.decoder import decode_stream
from svt_hevc_tpu.io.yuv import Frame
from svt_hevc_tpu.pipeline.encoder import Encoder

from test_endtoend import make_frame


# ------------------------------------------------------------- interpolation

def scalar_interp_luma(ref, x0, y0, n, mvx, mvy):
    """Per-pixel 8.5.4.2.2 (8-bit)."""
    h, w = ref.shape
    ix, fx = x0 + (mvx >> 2), mvx & 3
    iy, fy = y0 + (mvy >> 2), mvy & 3

    def rp(x, y):
        return int(ref[min(max(y, 0), h - 1), min(max(x, 0), w - 1)])

    out = np.zeros((n, n), np.int32)
    for y in range(n):
        for x in range(n):
            if fx == 0 and fy == 0:
                out[y, x] = rp(ix + x, iy + y)
            elif fy == 0:
                f = LUMA_FILTERS[fx]
                v = sum(int(f[k]) * rp(ix + x + k - 3, iy + y) for k in range(8))
                out[y, x] = min(max((v + 32) >> 6, 0), 255)
            elif fx == 0:
                f = LUMA_FILTERS[fy]
                v = sum(int(f[k]) * rp(ix + x, iy + y + k - 3) for k in range(8))
                out[y, x] = min(max((v + 32) >> 6, 0), 255)
            else:
                # normative: hor pass >> shift1 (0 for 8-bit), ver pass
                # >> shift2 (6), final (v + 32) >> 6
                fh, fv = LUMA_FILTERS[fx], LUMA_FILTERS[fy]
                acc = 0
                for ky in range(8):
                    hsum = sum(int(fh[kx]) * rp(ix + x + kx - 3, iy + y + ky - 3)
                               for kx in range(8))
                    acc += int(fv[ky]) * hsum
                out[y, x] = min(max(((acc >> 6) + 32) >> 6, 0), 255)
    return out


@pytest.mark.parametrize("mv", [(0, 0), (4, 8), (1, 0), (0, 2), (3, 3),
                                (-5, 7), (-13, -9)])
def test_interp_luma_integer_and_frac(mv):
    rng = np.random.default_rng(1)
    ref = rng.integers(0, 256, (48, 48)).astype(np.int32)
    got = interp_luma(ref, 16, 16, 8, 8, mv[0], mv[1])
    if mv[0] & 3 or mv[1] & 3:
        want = scalar_interp_luma(ref, 16, 16, 8, mv[0], mv[1])
        if mv[0] & 3 and mv[1] & 3:
            np.testing.assert_array_equal(got, want)
        else:
            np.testing.assert_array_equal(got, want)
    else:
        np.testing.assert_array_equal(
            got, ref[16 + (mv[1] >> 2):24 + (mv[1] >> 2),
                     16 + (mv[0] >> 2):24 + (mv[0] >> 2)])


def test_interp_chroma_halfpel():
    rng = np.random.default_rng(2)
    ref = rng.integers(0, 256, (32, 32)).astype(np.int32)
    got = interp_chroma(ref, 8, 8, 4, 4, 4, 0)   # fx=4 (half), fy=0
    f = CHROMA_FILTERS[4]
    for y in range(4):
        for x in range(4):
            v = sum(int(f[k]) * int(ref[8 + y, 8 + x + k - 1]) for k in range(4))
            assert got[y, x] == min(max((v + 32) >> 6, 0), 255)


# ----------------------------------------------------------------- end-to-end

def moving_sequence(w, h, nframes, dx=2, dy=1, seed=0):
    """Textured background translating by (dx, dy) per frame."""
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 256, (h + nframes * abs(dy) + 8,
                                w + nframes * abs(dx) + 8)).astype(np.uint8)
    # smooth it a little so ME has gradients to lock onto
    big = ((big[:-1, :-1].astype(np.int32) + big[1:, :-1] + big[:-1, 1:]
            + big[1:, 1:]) // 4).astype(np.uint8)
    frames = []
    for i in range(nframes):
        ox, oy = i * abs(dx), i * abs(dy)
        y = big[oy:oy + h, ox:ox + w]
        cb = np.full((h // 2, w // 2), 120, np.uint8)
        cr = np.full((h // 2, w // 2), 130, np.uint8)
        frames.append(Frame(y=y.copy(), cb=cb, cr=cr))
    return frames


def _roundtrip_seq(frames, qp, **cfg_kw):
    cfg = EncoderConfig(width=frames[0].width, height=frames[0].height,
                        qp=qp, intra_period=-1, **cfg_kw)
    enc = Encoder(cfg)
    stream, recons = enc.encode(frames)
    decoded = decode_stream(stream)
    assert len(decoded) == len(frames)
    return stream, recons, decoded


def test_p_frame_bitmatch():
    frames = moving_sequence(64, 64, 3)
    _, recons, decoded = _roundtrip_seq(frames, qp=32)
    for i, (r, d) in enumerate(zip(recons, decoded)):
        np.testing.assert_array_equal(r.y, d.y, err_msg=f"frame {i} luma")
        np.testing.assert_array_equal(r.cb, d.cb, err_msg=f"frame {i} cb")
        np.testing.assert_array_equal(r.cr, d.cr, err_msg=f"frame {i} cr")


def test_p_frame_bitmatch_larger():
    frames = moving_sequence(96, 64, 4, dx=3, dy=2, seed=5)
    _, recons, decoded = _roundtrip_seq(frames, qp=37)
    for r, d in zip(recons, decoded):
        np.testing.assert_array_equal(r.y, d.y)
        np.testing.assert_array_equal(r.cb, d.cb)
        np.testing.assert_array_equal(r.cr, d.cr)


def test_p_frames_much_cheaper_than_intra():
    """Static content: P frames should cost a tiny fraction of I frames
    (skip CUs dominate)."""
    frame = make_frame(64, 64, "edges", seed=3)
    frames = [frame, frame, frame]
    cfg_i = EncoderConfig(width=64, height=64, qp=32, intra_period=0)
    s_i, _ = Encoder(cfg_i).encode(frames)
    cfg_p = EncoderConfig(width=64, height=64, qp=32, intra_period=-1)
    s_p, _ = Encoder(cfg_p).encode(frames)
    assert len(s_p) < len(s_i) * 0.55, (len(s_p), len(s_i))


def test_p_frame_quality():
    frames = moving_sequence(64, 64, 3)
    _, recons, _ = _roundtrip_seq(frames, qp=30)
    for fr, rec in zip(frames, recons):
        assert rec.psnr(fr)[0] > 30.0


def test_periodic_intra_refresh():
    frames = moving_sequence(64, 64, 5)
    cfg = EncoderConfig(width=64, height=64, qp=32, intra_period=1)
    enc = Encoder(cfg)
    stream, recons = enc.encode(frames)   # I P I P I
    decoded = decode_stream(stream)
    assert len(decoded) == 5
    for r, d in zip(recons, decoded):
        np.testing.assert_array_equal(r.y, d.y)
