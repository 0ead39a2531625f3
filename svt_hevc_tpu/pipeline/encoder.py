"""Encoder pipeline: frames -> Annex-B HEVC byte stream (+ recon frames).

All-intra CQP path. Per picture: pad to coded dims, CABAC-encode the CTU
raster scan through the shared CTU coder, wrap slice into an IDR NAL.

Analogue of the reference steady-state path (SURVEY.md section 3.2):
ResourceCoordination ... EncDec -> EntropyCoding -> Packetization
(reference: Source/Lib/Codec/EbEncHandle.c:3603, EbPacketizationProcess.c:121)
collapsed into a staged per-frame loop; pixel-stage batching moves to the
TPU kernels in svt_hevc_tpu.tpu.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..bitstream.cabac import CabacEncoder
from ..bitstream.contexts import init_contexts
from ..bitstream.headers import write_pps, write_slice_header, write_sps, write_vps
from ..bitstream.nal import NalUnitType, wrap_nal
from ..config import EncoderConfig
from ..core.ctu import CtuEncoder, PictureState
from ..core.deblock import deblock_picture
from ..core.rdo import RdSearch, _Region
from ..io.yuv import Frame


def pad_plane(plane: np.ndarray, w: int, h: int) -> np.ndarray:
    """Edge-replicate a plane to coded dimensions (reference analogue:
    EbPictureAnalysisProcess.c PadPictureToMultipleOfLcuDimensions)."""
    out = np.empty((h, w), np.int32)
    ph, pw = plane.shape
    out[:ph, :pw] = plane
    if pw < w:
        out[:ph, pw:] = plane[:, -1:]
    if ph < h:
        out[ph:, :] = out[ph - 1:ph, :]
    return out


@dataclass
class EncodedPicture:
    nal_bytes: bytes          # slice NAL (Annex-B)
    recon: Frame              # cropped reconstruction
    poc: int = 0


class Encoder:
    """All-intra HEVC encoder (CQP)."""

    def __init__(self, cfg: EncoderConfig):
        self.cfg = cfg.validate()
        self._sent_headers = False

    def headers(self) -> bytes:
        cfg = self.cfg
        return (wrap_nal(NalUnitType.VPS_NUT, write_vps(cfg))
                + wrap_nal(NalUnitType.SPS_NUT, write_sps(cfg))
                + wrap_nal(NalUnitType.PPS_NUT, write_pps(cfg)))

    def encode_frame(self, frame: Frame, *, split_policy=None,
                     part_nxn_policy=None, rd: bool = False) -> EncodedPicture:
        cfg = self.cfg
        cw, ch = cfg.coded_width, cfg.coded_height
        src = [
            pad_plane(frame.y.astype(np.int32), cw, ch),
            pad_plane(frame.cb.astype(np.int32), cw // 2, ch // 2),
            pad_plane(frame.cr.astype(np.int32), cw // 2, ch // 2),
        ]
        st = PictureState(cw, ch, cfg.qp, cfg.ctb_log2, cfg.bit_depth)
        bac = CabacEncoder(init_contexts(cfg.qp, init_type=0))

        ctb = cfg.ctb_size
        n_ctb_x = (cw + ctb - 1) // ctb
        n_ctb_y = (ch + ctb - 1) // ctb
        enc = None
        if not rd:
            enc = CtuEncoder(st, bac, src, split_policy=split_policy,
                             part_nxn_policy=part_nxn_policy)
        for cy in range(n_ctb_y):
            for cx in range(n_ctb_x):
                x0, y0 = cx * ctb, cy * ctb
                if rd:
                    # RD trials reconstruct in-place; snapshot, search, then
                    # fully restore so the final CABAC walk replays the
                    # winning decisions against decoder-identical state
                    snap = _Region(st, x0, y0, ctb)
                    rds = RdSearch(st, src)
                    decisions, _ = rds.compress_ctu(x0, y0, list(bac.ctx))
                    snap.restore(st)
                    enc = CtuEncoder(
                        st, bac, src,
                        split_policy=decisions.split_policy,
                        part_nxn_policy=decisions.part_nxn_policy,
                        mode_policy=decisions.mode_policy)
                enc.code_ctu(x0, y0)
                last = (cy == n_ctb_y - 1) and (cx == n_ctb_x - 1)
                bac.encode_terminate(1 if last else 0)
        bac.finish()

        if cfg.enable_deblocking:
            deblock_picture(st)

        w = write_slice_header(cfg, slice_qp=cfg.qp, is_idr=True)
        w.write_bytes(bac.data)
        nal = wrap_nal(NalUnitType.IDR_W_RADL, w.get_bytes())

        recon = Frame(
            y=st.planes[0][:frame.height, :frame.width].astype(np.uint8),
            cb=st.planes[1][:frame.height // 2, :frame.width // 2].astype(np.uint8),
            cr=st.planes[2][:frame.height // 2, :frame.width // 2].astype(np.uint8),
        )
        return EncodedPicture(nal_bytes=nal, recon=recon)

    def encode(self, frames, *, rd: bool = False) -> tuple[bytes, list[Frame]]:
        """Encode an iterable of frames; returns (annex_b_stream, recons)."""
        chunks = [self.headers()]
        recons = []
        for fr in frames:
            pic = self.encode_frame(fr, rd=rd)
            chunks.append(pic.nal_bytes)
            recons.append(pic.recon)
        return b"".join(chunks), recons
