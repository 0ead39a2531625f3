"""Rate control: CQP and frame-level ABR with a VBV clamp.

Round-1 scope of the reference's rate-control process (reference:
Source/Lib/Codec/EbRateControlProcess.c — CQP path :2422, VBR
HighLevelRcInputPictureMode2 :296 / FrameLevelRcInputPictureMode2 :878,
VBV Vbv_Buf_Calc :2177): a pure host-side pytree-of-scalars controller.
Frame QP adapts multiplicatively toward the target bits/frame from the
running complexity estimate; the VBV model clamps QP upward when the
buffer would underflow. State is trivially checkpointable (plain attrs),
matching the survey note (SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import math

from ..config import EncoderConfig


class RateControl:
    """pick_qp() before each frame; update() with the coded size after."""

    def __init__(self, cfg: EncoderConfig):
        self.cfg = cfg
        self.mode = cfg.rate_control_mode
        self.fps = cfg.fps_num / max(cfg.fps_den, 1)
        self.target_bits = (cfg.target_bitrate / self.fps
                            if cfg.target_bitrate else 0.0)
        self.qp = float(cfg.qp)
        # complexity: running bits * 2^((qp-base)/6) normaliser
        self._cplx = None
        self._frames = 0
        # VBV (decoder buffer model): fill grows by maxrate/fps per frame,
        # drains by the coded size
        self.vbv_bufsize = float(cfg.vbv_bufsize or 0)
        self.vbv_maxrate = float(cfg.vbv_maxrate or cfg.target_bitrate or 0)
        self.vbv_fill = self.vbv_bufsize * 0.9

    # ------------------------------------------------------------------ api
    def pick_qp(self, is_idr: bool) -> int:
        if self.mode == 0 or not self.target_bits:
            return self.cfg.qp
        qp = self.qp
        if self._cplx is not None:
            # predicted bits at current qp from the complexity model
            pred = self._cplx * 2.0 ** ((self.cfg.qp - qp) / 6.0)
            err = pred / self.target_bits
            qp += 3.0 * math.log2(max(err, 1e-6))
            qp = min(max(qp, self.qp - 4.0), self.qp + 4.0)
        if is_idr:
            qp -= 3.0          # I frames get a quality boost (ref: CQP offsets)
        # VBV clamp: if the buffer is near empty, force coarser quant
        if self.vbv_bufsize > 0:
            headroom = self.vbv_fill / self.vbv_bufsize
            if headroom < 0.15:
                qp += 6.0 * (0.15 - headroom) / 0.15
        return int(min(max(round(qp), 1), 51))

    def update(self, coded_bits: int, used_qp: int) -> None:
        if self.mode == 0 or not self.target_bits:
            return
        # complexity normalised to the configured base QP
        norm = coded_bits * 2.0 ** ((used_qp - self.cfg.qp) / 6.0)
        self._cplx = (norm if self._cplx is None
                      else 0.7 * self._cplx + 0.3 * norm)
        self._frames += 1
        # track the *unclamped* controller qp so it follows the content
        pred = self._cplx * 2.0 ** ((self.cfg.qp - self.qp) / 6.0)
        err = pred / self.target_bits
        self.qp = min(max(self.qp + 1.5 * math.log2(max(err, 1e-6)), 1.0), 51.0)
        if self.vbv_bufsize > 0:
            self.vbv_fill += self.vbv_maxrate / self.fps - coded_bits
            self.vbv_fill = min(max(self.vbv_fill, 0.0), self.vbv_bufsize)
