"""Conformance HEVC decoder for the feature set this encoder emits.

This is the project's stand-in for the HM TAppDecoder oracle used by the
reference's functional tests (reference: Tests/SVT-HEVC_FunctionalTests.py
decode_test :1087, recon bit-match :641): every encode in the test suite is
decoded with this module and the output must bit-match the encoder's own
reconstruction. The decoder shares zero encoder-side decision code — it
consumes only the coded bytes — but reconstructs through the same normative
helpers (intra / transforms / quant), which is exactly the invariant HEVC
mandates of encoder and decoder.
"""

from __future__ import annotations

import numpy as np

from ..bitstream.bitwriter import ebsp_to_rbsp
from ..bitstream.cabac import CabacDecoder
from ..bitstream.contexts import init_contexts
from ..bitstream.headers import parse_pps, parse_slice_header, parse_sps, tile_grid
from ..bitstream.nal import NalUnitType, split_annexb
from ..core.ctu import CtuDecoder, PictureState
from ..core.deblock import deblock_picture
from ..core.sao import SaoCtbParams, apply_sao, decode_sao_ctb
from ..io.yuv import Frame


def decode_stream(stream: bytes) -> list[Frame]:
    """Decode an Annex-B byte stream into output frames in display (POC)
    order. The DPB holds decoded pictures by POC; IDRs start a new coded
    video sequence."""
    sps = pps = None
    dpb: dict[int, list] = {}       # poc -> planes
    out: list[tuple[int, int, Frame]] = []    # (cvs, poc, frame)
    cvs = 0
    for nal_type, ebsp in split_annexb(stream):
        rbsp = ebsp_to_rbsp(ebsp)
        if nal_type == NalUnitType.SPS_NUT:
            sps = parse_sps(rbsp)
        elif nal_type == NalUnitType.PPS_NUT:
            pps = parse_pps(rbsp)
        elif nal_type in (NalUnitType.IDR_W_RADL, NalUnitType.IDR_N_LP,
                          NalUnitType.CRA_NUT, NalUnitType.TRAIL_R,
                          NalUnitType.TRAIL_N):
            if sps is None or pps is None:
                raise ValueError("slice before SPS/PPS")
            if nal_type in (NalUnitType.IDR_W_RADL, NalUnitType.IDR_N_LP):
                dpb.clear()
                cvs += 1
            frame, planes, poc = _decode_slice(rbsp, int(nal_type), sps, pps,
                                               dpb)
            dpb[poc] = planes
            out.append((cvs, poc, frame))
            if len(dpb) > 17:
                del dpb[min(dpb)]
    out.sort(key=lambda t: (t[0], t[1]))
    return [f for _, _, f in out]


def _decode_slice(rbsp: bytes, nal_type: int, sps, pps, dpb):
    hdr = parse_slice_header(rbsp, nal_type, sps, pps)

    st = PictureState(sps.width, sps.height, hdr.slice_qp, sps.log2_ctb,
                      sps.bit_depth, chroma_format=sps.chroma_format_idc)
    st.constrained_intra = pps.constrained_intra
    if pps.cu_qp_delta_enabled:
        if pps.diff_cu_qp_delta_depth != 0:
            raise NotImplementedError("QG smaller than CTB")
        st.enable_cu_qp_delta()
    if hdr.slice_type != 2:
        # reference list construction (8.3.4) with one active ref per
        # list: L0 = closest past (or closest future if none past);
        # L1 = closest future (or closest past if none future)
        past = [hdr.poc - d for d in hdr.neg_deltas]
        future = [hdr.poc + d for d in hdr.pos_deltas]
        for rp in past + future:
            if rp not in dpb:
                raise ValueError(f"missing reference POC {rp}")
        l0 = past + future
        l1 = future + past
        if not l0:
            raise ValueError("P/B slice with an empty RPS")
        st.slice_type = hdr.slice_type
        st.ref_planes = [[dpb[l0[0]]], [dpb[l1[0]]] if l1 else []]
        st.ref_pocs = [[l0[0]], [l1[0]] if l1 else []]
        st.poc = hdr.poc
        st.max_merge = hdr.max_num_merge_cand
    data = rbsp[hdr.data_bit_offset // 8:]
    init_type = {2: 0, 1: 1, 0: 2}[hdr.slice_type]

    ctb = 1 << sps.log2_ctb
    n_ctb_x = (sps.width + ctb - 1) // ctb
    n_ctb_y = (sps.height + ctb - 1) // ctb
    sao_on = sps.sao_enabled and (hdr.sao_luma or hdr.sao_chroma)
    sao_grid = [[SaoCtbParams() for _ in range(n_ctb_x)]
                for _ in range(n_ctb_y)] if sao_on else None

    # tile-scan decode: one independent CABAC substream per tile
    col_bd, row_bd = tile_grid(n_ctb_x, n_ctb_y, pps.tile_columns, pps.tile_rows)
    offsets = [0]
    for sz in hdr.entry_points:
        offsets.append(offsets[-1] + sz)
    t_idx = 0
    for tr in range(pps.tile_rows):
        for tc in range(pps.tile_columns):
            st.begin_tile()
            sub = data[offsets[t_idx]:] if t_idx >= len(hdr.entry_points) \
                else data[offsets[t_idx]:offsets[t_idx + 1]]
            bac = CabacDecoder(sub, init_contexts(hdr.slice_qp,
                                                  init_type=init_type))
            dec = CtuDecoder(st, bac)
            for cy in range(row_bd[tr], row_bd[tr + 1]):
                for cx in range(col_bd[tc], col_bd[tc + 1]):
                    if sao_on:
                        decode_sao_ctb(bac, sao_grid, cx, cy,
                                       hdr.sao_luma, hdr.sao_chroma,
                                       bit_depth=sps.bit_depth,
                                       left_ok=cx > col_bd[tc],
                                       up_ok=cy > row_bd[tr])
                    dec.code_ctu(cx * ctb, cy * ctb)
                    end = bac.decode_terminate()
                    last = (cy == n_ctb_y - 1) and (cx == n_ctb_x - 1)
                    if bool(end) != bool(last):
                        raise ValueError(
                            f"end_of_slice flag mismatch at CTU ({cx},{cy})")
            t_idx += 1

    if not pps.deblocking_disabled:
        deblock_picture(st, beta_offset=pps.beta_offset_div2,
                        tc_offset=pps.tc_offset_div2)
    if sao_on:
        apply_sao(st, sao_grid, hdr.sao_luma, hdr.sao_chroma)

    # conformance window crop (offsets in SubWidthC/SubHeightC luma units)
    left, right, top, bottom = sps.conf_win
    swc = 2 if sps.chroma_format_idc in (1, 2) else 1
    shc = 2 if sps.chroma_format_idc == 1 else 1
    w = sps.width - swc * (left + right)
    h = sps.height - shc * (top + bottom)
    dt = np.uint8 if sps.bit_depth == 8 else np.uint16
    lx, ly = swc * left, shc * top
    frame = Frame(
        y=st.planes[0][ly:ly + h, lx:lx + w].astype(dt),
        cb=st.planes[1][top:top + (h // shc), left:left + (w // swc)].astype(dt),
        cr=st.planes[2][top:top + (h // shc), left:left + (w // swc)].astype(dt),
    )
    return frame, [p.copy() for p in st.planes], hdr.poc
