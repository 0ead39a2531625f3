"""CABAC context model tables and layout (ITU-T H.265 tables 9-4 .. 9-32).

All numeric init values are constants mandated by the H.265 specification
(identical in every conformant encoder; cf. reference
Source/Lib/Codec/EbCabacContextModel.c).  Context state is packed as
(pStateIdx << 1) | valMps in 7 bits.
"""

from __future__ import annotations

CNU = 154  # "context not used" spec placeholder init value

# ---- spec Table 9-46: rangeTabLps[pStateIdx][qRangeIdx] -----------------
RANGE_TAB_LPS = [
    [128, 176, 208, 240], [128, 167, 197, 227], [128, 158, 187, 216],
    [123, 150, 178, 205], [116, 142, 169, 195], [111, 135, 160, 185],
    [105, 128, 152, 175], [100, 122, 144, 166], [95, 116, 137, 158],
    [90, 110, 130, 150], [85, 104, 123, 142], [81, 99, 117, 135],
    [77, 94, 111, 128], [73, 89, 105, 122], [69, 85, 100, 116],
    [66, 80, 95, 110], [62, 76, 90, 104], [59, 72, 86, 99],
    [56, 69, 81, 94], [53, 65, 77, 89], [51, 62, 73, 85],
    [48, 59, 69, 80], [46, 56, 66, 76], [43, 53, 63, 72],
    [41, 50, 59, 69], [39, 48, 56, 65], [37, 45, 54, 62],
    [35, 43, 51, 59], [33, 41, 48, 56], [32, 39, 46, 53],
    [30, 37, 43, 50], [29, 35, 41, 48], [27, 33, 39, 45],
    [26, 31, 37, 43], [24, 30, 35, 41], [23, 28, 33, 39],
    [22, 27, 32, 37], [21, 26, 30, 35], [20, 24, 29, 33],
    [19, 23, 27, 31], [18, 22, 26, 30], [17, 21, 25, 28],
    [16, 20, 23, 27], [15, 19, 22, 25], [14, 18, 21, 24],
    [14, 17, 20, 23], [13, 16, 19, 22], [12, 15, 18, 21],
    [12, 14, 17, 20], [11, 14, 16, 19], [11, 13, 15, 18],
    [10, 12, 15, 17], [10, 12, 14, 16], [9, 11, 13, 15],
    [9, 11, 12, 14], [8, 10, 12, 14], [8, 9, 11, 13],
    [7, 9, 11, 12], [7, 9, 10, 12], [7, 8, 10, 11],
    [6, 8, 9, 11], [6, 7, 9, 10], [6, 7, 8, 9], [2, 2, 2, 2],
]

# ---- spec Table 9-47: transIdxLps; transIdxMps = min(s + 1, 62) ----------
TRANS_IDX_LPS = [
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 22, 22, 23, 24,
    24, 25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
    33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63,
]

# Packed-state transition LUTs: packed = (pStateIdx << 1) | valMps.
NEXT_STATE_MPS = [0] * 128
NEXT_STATE_LPS = [0] * 128
for _s in range(64):
    for _mps in range(2):
        _p = (_s << 1) | _mps
        NEXT_STATE_MPS[_p] = (min(_s + 1, 62) << 1) | _mps
        if _s == 0:  # LPS at state 0 flips MPS
            NEXT_STATE_LPS[_p] = (0 << 1) | (1 - _mps)
        else:
            NEXT_STATE_LPS[_p] = (TRANS_IDX_LPS[_s] << 1) | _mps
NEXT_STATE_MPS[126] = 126
NEXT_STATE_MPS[127] = 127
NEXT_STATE_LPS[126] = 126
NEXT_STATE_LPS[127] = 127

# renorm shift for the encoder: number of leading renorm shifts for an
# LPS range value (range < 256 after LPS); index = lpsRange >> 3
RENORM_TABLE = [
    6, 5, 4, 4, 3, 3, 3, 3, 2, 2, 2, 2, 2, 2, 2, 2,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
]


def init_state(init_value: int, qp: int) -> int:
    """H.265 9.3.2.2 context initialisation -> packed state."""
    slope = (init_value >> 4) * 5 - 45
    offset = ((init_value & 15) << 3) - 16
    pre = min(max(1, ((slope * min(max(qp, 0), 51)) >> 4) + offset), 126)
    if pre <= 63:
        return ((63 - pre) << 1) | 0
    return ((pre - 64) << 1) | 1


# ------------------------------------------------------------------ layout
# Context buffer layout (one flat list per slice). Offsets below; sizes per
# HM/spec. initType: 0 = I-slice (spec init tables for initType 0).

class Ctx:
    SPLIT_CU = 0              # 3
    PART_MODE = 3             # 1 (intra bin0 only for now)
    PREV_INTRA_LUMA = 4       # 1
    INTRA_CHROMA = 5          # 1
    CBF_LUMA = 6              # 2
    CBF_CHROMA = 8            # 5
    SPLIT_TRANSFORM = 13      # 3
    LAST_X = 16               # 18 (15 luma + 3 chroma)
    LAST_Y = 34               # 18
    SIG_GROUP = 52            # 4 (2 luma + 2 chroma)
    SIG = 56                  # 42 (27 luma + 15 chroma)
    GT1 = 98                  # 24 (16 luma + 8 chroma)
    GT2 = 122                 # 6 (4 luma + 2 chroma)
    SAO_MERGE = 128           # 1
    SAO_TYPE = 129            # 1
    TQ_BYPASS = 130           # 1
    NUM = 131


# init values for I slices (spec initType 0)
_INIT_I = (
    [139, 141, 157]                                     # split_cu_flag
    + [184]                                             # part_mode
    + [184]                                             # prev_intra_luma_pred_flag
    + [63]                                              # intra_chroma_pred_mode
    + [111, 141]                                        # cbf_luma
    + [94, 138, 182, CNU, CNU]                          # cbf_cb/cr
    + [153, 138, 138]                                   # split_transform_flag
    + [110, 110, 124, 125, 140, 153, 125, 127, 140,     # last_sig_x (luma)
       109, 111, 143, 127, 111, 79]
    + [108, 123, 63]                                    # last_sig_x (chroma)
    + [110, 110, 124, 125, 140, 153, 125, 127, 140,     # last_sig_y (luma)
       109, 111, 143, 127, 111, 79]
    + [108, 123, 63]                                    # last_sig_y (chroma)
    + [91, 171, 134, 141]                               # coded_sub_block_flag
    + [111, 111, 125, 110, 110, 94, 124, 108, 124,      # sig_coeff_flag luma (27)
       107, 125, 141, 179, 153, 125, 107, 125, 141,
       179, 153, 125, 107, 125, 141, 179, 153, 125]
    + [140, 139, 182, 182, 152, 136, 152, 136, 153,     # sig_coeff_flag chroma (15)
       136, 139, 111, 136, 139, 111]
    + [140, 92, 137, 138, 140, 152, 138, 139,           # greater1 luma (16)
       153, 74, 149, 92, 139, 107, 122, 152]
    + [140, 179, 166, 182, 140, 227, 122, 197]          # greater1 chroma (8)
    + [138, 153, 136, 167]                              # greater2 luma (4)
    + [152, 152]                                        # greater2 chroma (2)
    + [153]                                             # sao_merge
    + [200]                                             # sao_type_idx
    + [154]                                             # cu_transquant_bypass
)
assert len(_INIT_I) == Ctx.NUM, len(_INIT_I)

INIT_VALUES = {0: _INIT_I}   # initType -> table; P/B (1, 2) added with inter


def init_contexts(qp: int, init_type: int = 0) -> list[int]:
    table = INIT_VALUES[init_type]
    return [init_state(v, qp) for v in table]
