"""Quantization / inverse quantization (H.265 8.6.3, flat scaling lists).

Forward quant is HM-style RDO-free scalar quant (non-normative); dequant is
the normative scaling process. Analogue of reference
Source/Lib/Codec/EbTransforms.c UnifiedQuantizeInvQuantize (:2978) without
the two-stage PM path (that RDOQ analogue lands with the BD-rate work).
"""

from __future__ import annotations

import numpy as np

QUANT_SCALES = np.array([26214, 23302, 20560, 18396, 16404, 14564], dtype=np.int64)
INV_QUANT_SCALES = np.array([40, 45, 51, 57, 64, 72], dtype=np.int64)


def transform_shift(log2n: int, bit_depth: int = 8) -> int:
    """MAX_TR_DYNAMIC_RANGE(15) - bitDepth - log2(size)."""
    return 15 - bit_depth - log2n


def quantize(coeff: np.ndarray, qp: int, *, is_intra: bool = True,
             bit_depth: int = 8) -> np.ndarray:
    n = coeff.shape[-1]
    log2n = n.bit_length() - 1
    qbits = 14 + qp // 6 + transform_shift(log2n, bit_depth)
    f = QUANT_SCALES[qp % 6]
    offset = (171 if is_intra else 85) << (qbits - 9)
    c = coeff.astype(np.int64)
    level = (np.abs(c) * f + offset) >> qbits
    level = np.clip(level, 0, 32767)
    return (np.sign(c) * level).astype(np.int32)


def dequantize(level: np.ndarray, qp: int, *, bit_depth: int = 8) -> np.ndarray:
    """Normative scaling (8.6.3) for flat (m=16) scaling lists."""
    n = level.shape[-1]
    log2n = n.bit_length() - 1
    shift = 6 - transform_shift(log2n, bit_depth)   # == log2n + bit_depth - 13 + 6
    scale = int(INV_QUANT_SCALES[qp % 6]) << (qp // 6)
    lv = np.clip(level.astype(np.int64), -32768, 32767)
    d = (lv * scale + (1 << (shift - 1))) >> shift
    return np.clip(d, -32768, 32767).astype(np.int32)
