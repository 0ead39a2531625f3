"""Native full-frame CU-tree emitter (native/emitter.c) equivalence:
byte-identical streams vs the Python fast-path walk (the oracle), the
project analogue of the reference's C_DEFAULT-vs-ASM asm_test."""

import os

import numpy as np
import pytest

from svt_hevc_tpu.config import EncoderConfig
from svt_hevc_tpu.io.yuv import Frame
from svt_hevc_tpu.pipeline.encoder import Encoder
from svt_hevc_tpu.pipeline.native_emit import native_emit_available


def _frames(n, w, h, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    cyy, cxx = np.mgrid[0:h // 2, 0:w // 2]
    base = (32 + ((xx * 5) // 7 + (yy * 3) // 5) % 180).astype(np.int32)
    noise = rng.integers(-6, 7, (h, w))
    out = []
    for i in range(n):
        # global pan + local texture change + a moving bright square
        y = np.roll(base, (i, 2 * i), (0, 1)) + noise * ((i % 3) == 0)
        sq_y, sq_x = 8 + 4 * i, 12 + 6 * i
        y[sq_y:sq_y + 12, sq_x:sq_x + 12] = 220
        cb = 110 + (cxx + 3 * i) % 40 + rng.integers(-2, 3, (h // 2, w // 2))
        cr = 90 + (cyy * 2 + i) % 50
        out.append(Frame(y=np.clip(y, 0, 255).astype(np.uint8),
                         cb=np.clip(cb, 0, 255).astype(np.uint8),
                         cr=np.clip(cr, 0, 255).astype(np.uint8)))
    return out


def _encode(frames, *, native, **kw):
    cfg = EncoderConfig(width=frames[0].y.shape[1],
                        height=frames[0].y.shape[0], **kw)
    old = os.environ.pop("SVT_TPU_NO_NATIVE_EMIT", None)
    try:
        if not native:
            os.environ["SVT_TPU_NO_NATIVE_EMIT"] = "1"
        enc = Encoder(cfg)
        stream, recons = enc.encode(frames)
        motion = {k: (v["mv"].copy(), v["ref_idx"].copy())
                  for k, v in enc._ref_motion.items()}
    finally:
        if old is not None:
            os.environ["SVT_TPU_NO_NATIVE_EMIT"] = old
        else:
            os.environ.pop("SVT_TPU_NO_NATIVE_EMIT", None)
    return stream, recons, motion


needs_native = pytest.mark.skipif(not native_emit_available(),
                                  reason="native lib unavailable")


@needs_native
@pytest.mark.parametrize("qp", [22, 32, 45])
def test_ipp_byte_identical(qp):
    frames = _frames(5, 128, 96)
    kw = dict(qp=qp, intra_period=-1, enc_mode=7)
    s_nat, _, m_nat = _encode(frames, native=True, **kw)
    s_py, _, m_py = _encode(frames, native=False, **kw)
    assert s_nat == s_py
    # the C walk must also report the identical final motion field (the
    # TMVP collocated source of future pictures)
    assert set(m_nat) == set(m_py)
    for k in m_nat:
        assert np.array_equal(m_nat[k][0], m_py[k][0]), f"mv poc {k}"
        assert np.array_equal(m_nat[k][1], m_py[k][1]), f"ref poc {k}"


@needs_native
def test_i_only_byte_identical():
    frames = _frames(2, 192, 128, seed=9)
    kw = dict(qp=30, intra_period=0, enc_mode=7)
    s_nat, _, _ = _encode(frames, native=True, **kw)
    s_py, _, _ = _encode(frames, native=False, **kw)
    assert s_nat == s_py


@needs_native
def test_no_sao_no_dlf_byte_identical():
    frames = _frames(4, 64, 64, seed=11)
    kw = dict(qp=35, intra_period=-1, enc_mode=7,
              enable_sao=False, enable_deblocking=False)
    s_nat, _, _ = _encode(frames, native=True, **kw)
    s_py, _, _ = _encode(frames, native=False, **kw)
    assert s_nat == s_py


@needs_native
def test_odd_dims_byte_identical():
    # coded dims 8-aligned but not CTB-aligned: forced splits at the
    # boundary exercise the out-of-picture quadtree path
    frames = _frames(3, 120, 72, seed=5)
    kw = dict(qp=28, intra_period=-1, enc_mode=7)
    s_nat, _, _ = _encode(frames, native=True, **kw)
    s_py, _, _ = _encode(frames, native=False, **kw)
    assert s_nat == s_py


@needs_native
@pytest.mark.parametrize("kw", [
    dict(qp=30, intra_period=-1, enc_mode=7, pred_structure=2,
         hierarchical_levels=2),               # RA hierarchical-B
    dict(qp=34, intra_period=-1, enc_mode=7, pred_structure=1,
         hierarchical_levels=0),               # low-delay B
])
def test_b_pictures_byte_identical(kw):
    """B pictures through the fused device path (fast_b_fused_dev):
    native emitter == Python walk, and both decode bit-exact."""
    from svt_hevc_tpu.decoder.decoder import decode_stream
    frames = _frames(9, 128, 96, seed=13)
    s_nat, recons, m_nat = _encode(frames, native=True, **kw)
    s_py, _, m_py = _encode(frames, native=False, **kw)
    assert s_nat == s_py
    for k in m_nat:
        assert np.array_equal(m_nat[k][0], m_py[k][0]), f"mv poc {k}"
        assert np.array_equal(m_nat[k][1], m_py[k][1]), f"ref poc {k}"
    dec = decode_stream(s_nat)
    rec = [r for r in recons if r is not None]
    assert len(dec) == len(rec)
    for d, r in zip(dec, rec):
        assert np.array_equal(np.asarray(d.y), np.asarray(r.y))
        assert np.array_equal(np.asarray(d.cb), np.asarray(r.cb))
        assert np.array_equal(np.asarray(d.cr), np.asarray(r.cr))


@needs_native
def test_b_pictures_de265_oracle():
    """RA-B fast-path stream accepted bit-exact by the independent
    libde265 decoder (the reference's HM-decoder conformance check)."""
    from svt_hevc_tpu.io import de265_decoder as d265
    if not d265.available():
        pytest.skip("libde265 unavailable")
    frames = _frames(9, 128, 96, seed=29)
    s_nat, recons, _ = _encode(frames, native=True, qp=28, intra_period=-1,
                               enc_mode=7, pred_structure=2,
                               hierarchical_levels=2)
    pics = d265.decode_annexb(s_nat)
    assert len(pics) == len(recons)
    for (dy, dcb, dcr), r in zip(pics, recons):
        assert np.array_equal(dy, np.asarray(r.y))
        assert np.array_equal(dcb, np.asarray(r.cb))
        assert np.array_equal(dcr, np.asarray(r.cr))


@needs_native
def test_decodes_bit_exact():
    from svt_hevc_tpu.decoder.decoder import decode_stream
    frames = _frames(5, 128, 96, seed=21)
    s_nat, recons, _ = _encode(frames, native=True, qp=30, intra_period=-1,
                               enc_mode=7)
    dec = decode_stream(s_nat)
    assert len(dec) == len(recons)
    for d, r in zip(dec, recons):
        assert np.array_equal(np.asarray(d.y), np.asarray(r.y))
        assert np.array_equal(np.asarray(d.cb), np.asarray(r.cb))
        assert np.array_equal(np.asarray(d.cr), np.asarray(r.cr))
