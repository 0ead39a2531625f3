"""Encoder pipeline orchestration (placeholder — built up in stages).

The analogue of the reference's EbEncHandle.c pipeline construction +
EbH265EncSendPicture/EbH265GetPacket flow, re-designed as a host-driven
staged jit graph instead of 13 pthread kernels.
"""

from __future__ import annotations

from ..config import EncoderConfig


class Encoder:
    def __init__(self, cfg: EncoderConfig) -> None:
        self.cfg = cfg.validate()

    def encode(self, frames) -> bytes:
        raise NotImplementedError("encode pipeline lands with the intra path")
