"""Independent conformance oracle: libde265 decode == encoder recon.

The analogue of the reference's HM gate (Tests/SVT-HEVC_FunctionalTests.py
:641,1087 — every encode decoded by an independent decoder and compared
byte-for-byte against the encoder's own reconstruction).  Our in-repo
decoder shares traversal code with the encoder; libde265 shares nothing,
so a shared spec misreading fails here.
"""

import numpy as np
import pytest

from svt_hevc_tpu.config import EncoderConfig
from svt_hevc_tpu.io import de265_decoder as oracle
from svt_hevc_tpu.io.yuv import Frame
from svt_hevc_tpu.pipeline.encoder import Encoder

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="libde265 not installed")


def make_seq(w, h, n, seed=0, bit_depth=8):
    rng = np.random.default_rng(seed)
    hi = (1 << bit_depth) - 1
    dt = np.uint8 if bit_depth == 8 else np.uint16
    base = rng.integers(0, hi + 1, (h + 64, w + 64)).astype(np.float32)
    for _ in range(2):
        base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) / 3.0
    frames = []
    for i in range(n):
        ox, oy = (3 * i) % 32, (2 * i) % 32
        y = base[oy:oy + h, ox:ox + w].astype(dt)
        sx, sy = (5 * i) % max(w - 24, 1), (4 * i) % max(h - 24, 1)
        y = y.copy()
        y[sy:sy + 16, sx:sx + 16] = hi * 3 // 4
        cb = np.full((h // 2, w // 2), hi // 2 - 5, dt)
        cr = np.full((h // 2, w // 2), hi // 2 + 6, dt)
        frames.append(Frame(y=y, cb=cb, cr=cr))
    return frames


def check(frames, **cfg_kw):
    cfg = EncoderConfig(width=frames[0].width, height=frames[0].height,
                        **cfg_kw)
    enc = Encoder(cfg)
    stream, recons = enc.encode(frames)
    decoded = oracle.decode_annexb(bytes(stream))
    assert len(decoded) == len(recons), (
        f"oracle produced {len(decoded)} pictures, expected {len(recons)}")
    for i, ((dy, dcb, dcr), rec) in enumerate(zip(decoded, recons)):
        np.testing.assert_array_equal(dy, np.asarray(rec.y, np.int32),
                                      err_msg=f"luma mismatch pic {i}")
        np.testing.assert_array_equal(dcb, np.asarray(rec.cb, np.int32),
                                      err_msg=f"cb mismatch pic {i}")
        np.testing.assert_array_equal(dcr, np.asarray(rec.cr, np.int32),
                                      err_msg=f"cr mismatch pic {i}")
    return stream


def test_oracle_intra_only():
    check(make_seq(96, 80, 3), qp=30, intra_period=0)


def test_oracle_ipp():
    check(make_seq(128, 96, 6, seed=1), qp=32, intra_period=-1)


def test_oracle_ipp_qp_sweep():
    for qp in (18, 37, 48):
        check(make_seq(80, 64, 3, seed=qp), qp=qp, intra_period=-1)


def test_oracle_hierarchical_b():
    check(make_seq(96, 64, 9, seed=2), qp=33, intra_period=8,
          pred_structure=2, hierarchical_levels=2)


def test_oracle_low_delay_b():
    check(make_seq(96, 64, 5, seed=3), qp=33, intra_period=-1,
          pred_structure=1, hierarchical_levels=2)


def test_oracle_tiles():
    check(make_seq(192, 128, 4, seed=4), qp=34, intra_period=-1,
          tile_columns=2, tile_rows=2)


def test_oracle_10bit():
    check(make_seq(96, 64, 3, seed=5, bit_depth=10), qp=31,
          intra_period=-1, bit_depth=10)


def test_oracle_no_loop_filters():
    check(make_seq(96, 64, 3, seed=6), qp=30, intra_period=-1,
          enable_deblocking=False, enable_sao=False)


def test_oracle_adaptive_qp():
    check(make_seq(128, 96, 3, seed=7), qp=33, intra_period=-1,
          improve_sharpness=True)


def test_oracle_rejects_corrupt_stream():
    frames = make_seq(64, 64, 2, seed=8)
    cfg = EncoderConfig(width=64, height=64, qp=30, intra_period=-1)
    stream, recons = Encoder(cfg).encode(frames)
    data = bytearray(bytes(stream))
    data[len(data) // 2] ^= 0xFF
    try:
        decoded = oracle.decode_annexb(bytes(data))
    except RuntimeError:
        return
    # if the decoder doesn't error out, the flipped bit must at least have
    # changed or lost a decoded picture vs the clean reconstruction
    changed = len(decoded) != len(recons) or any(
        not np.array_equal(dy, np.asarray(rec.y, np.int32))
        or not np.array_equal(dcb, np.asarray(rec.cb, np.int32))
        or not np.array_equal(dcr, np.asarray(rec.cr, np.int32))
        for (dy, dcb, dcr), rec in zip(decoded, recons))
    assert changed, "oracle decoded a corrupted stream to the clean recon"
