"""Bit writer/reader, emulation prevention, NAL framing, header roundtrip."""

import random

import pytest

from svt_hevc_tpu.bitstream.bitwriter import (BitReader, BitWriter,
                                              ebsp_to_rbsp, rbsp_to_ebsp)
from svt_hevc_tpu.bitstream.nal import NalUnitType, split_annexb, wrap_nal
from svt_hevc_tpu.bitstream import headers
from svt_hevc_tpu.config import EncoderConfig


def test_bitwriter_roundtrip_fixed():
    w = BitWriter()
    w.u(5, 3)
    w.u(0, 1)
    w.u(1023, 10)
    w.ue(0)
    w.ue(7)
    w.se(-3)
    w.se(4)
    w.rbsp_trailing_bits()
    r = BitReader(w.get_bytes())
    assert r.u(3) == 5
    assert r.u(1) == 0
    assert r.u(10) == 1023
    assert r.ue() == 0
    assert r.ue() == 7
    assert r.se() == -3
    assert r.se() == 4


def test_bitwriter_roundtrip_random():
    rng = random.Random(7)
    ops = []
    w = BitWriter()
    for _ in range(2000):
        kind = rng.randrange(3)
        if kind == 0:
            n = rng.randrange(1, 25)
            v = rng.randrange(1 << n)
            w.u(v, n)
            ops.append(("u", n, v))
        elif kind == 1:
            v = rng.randrange(100000)
            w.ue(v)
            ops.append(("ue", None, v))
        else:
            v = rng.randrange(-5000, 5000)
            w.se(v)
            ops.append(("se", None, v))
    w.rbsp_trailing_bits()
    r = BitReader(w.get_bytes())
    for kind, n, v in ops:
        got = r.u(n) if kind == "u" else (r.ue() if kind == "ue" else r.se())
        assert got == v, (kind, n, v, got)


@pytest.mark.parametrize("payload", [
    b"\x00\x00\x00",
    b"\x00\x00\x01\x00\x00\x02\x00\x00\x03\x00\x00\x04",
    b"\x00\x00",
    b"\xff\x00\x00\x00\x00\xff",
    bytes(range(256)) * 3,
    b"\x00" * 64,
])
def test_emulation_prevention_roundtrip(payload):
    ebsp = rbsp_to_ebsp(payload)
    # no 00 00 0x pattern with x <= 2 may remain (00 00 03 is the escape)
    for i in range(len(ebsp) - 2):
        assert not (ebsp[i] == 0 and ebsp[i + 1] == 0 and ebsp[i + 2] <= 2), ebsp
    assert ebsp_to_rbsp(ebsp) == payload


def test_emulation_prevention_random():
    rng = random.Random(3)
    for _ in range(200):
        payload = bytes(rng.choice([0, 0, 0, 1, 2, 3, 255]) for _ in range(rng.randrange(80)))
        assert ebsp_to_rbsp(rbsp_to_ebsp(payload)) == payload


def test_nal_wrap_and_split():
    stream = (wrap_nal(NalUnitType.VPS_NUT, b"\x10\x20")
              + wrap_nal(NalUnitType.SPS_NUT, b"\x00\x00\x00\x01\x05")
              + wrap_nal(NalUnitType.IDR_W_RADL, b"\xaa\xbb\x00\x00\x02"))
    nals = split_annexb(stream)
    assert [t for t, _ in nals] == [NalUnitType.VPS_NUT, NalUnitType.SPS_NUT,
                                    NalUnitType.IDR_W_RADL]
    assert ebsp_to_rbsp(nals[0][1]) == b"\x10\x20"
    assert ebsp_to_rbsp(nals[1][1]) == b"\x00\x00\x00\x01\x05"
    assert ebsp_to_rbsp(nals[2][1]) == b"\xaa\xbb\x00\x00\x02"


def test_sps_pps_write_parse_roundtrip():
    cfg = EncoderConfig(width=176, height=144, qp=30).validate()
    sps = headers.parse_sps(headers.write_sps(cfg))
    assert sps.width == 176 and sps.height == 144
    assert sps.log2_ctb == cfg.ctb_log2
    assert sps.bit_depth == 8
    assert sps.sao_enabled   # SAO on by default now
    pps = headers.parse_pps(headers.write_pps(cfg))
    assert pps.init_qp == 26
    assert not pps.deblocking_disabled   # DLF on by default now
    assert not pps.sign_data_hiding


def test_sps_conformance_window_for_odd_sizes():
    cfg = EncoderConfig(width=1920, height=1080, qp=30).validate()
    sps = headers.parse_sps(headers.write_sps(cfg))
    assert sps.width == 1920
    assert sps.height == 1088 - 8  # 1080 already multiple of 8
    cfg2 = EncoderConfig(width=100, height=66, qp=30)
    assert cfg2.coded_width == 104 and cfg2.coded_height == 72
    assert cfg2.conf_win_right == 2 and cfg2.conf_win_bottom == 3


def test_slice_header_roundtrip():
    cfg = EncoderConfig(width=176, height=144, qp=37).validate()
    w = headers.write_slice_header(cfg, slice_qp=37)
    w.write_bytes(b"\xde\xad")   # fake slice data after alignment
    rbsp = w.get_bytes()
    sps = headers.parse_sps(headers.write_sps(cfg))
    pps = headers.parse_pps(headers.write_pps(cfg))
    h = headers.parse_slice_header(rbsp, int(NalUnitType.IDR_W_RADL), sps, pps)
    assert h.slice_type == 2
    assert h.slice_qp == 37
    assert h.data_bit_offset % 8 == 0
    assert rbsp[h.data_bit_offset // 8:] == b"\xde\xad"
