"""Inter prediction: normative MCP interpolation + AMVP/merge derivation.

Motion-compensated prediction per H.265 8.5.4 (8-tap luma / 4-tap chroma
separable interpolation, quarter-pel luma, eighth-pel chroma) and the
spatial merge (8.5.3.2.3/4) and AMVP (8.5.3.2.5/6) candidate lists.
Temporal (TMVP) candidates are disabled via sps_temporal_mvp_enabled_flag=0,
which is a conformant configuration and removes the collocated-picture
dependency (this encoder's scope for the low-delay P path; the reference
equivalent is EbAdaptiveMotionVectorPrediction.c FillAMVPCandidates :1749 /
EbMvMerge.h with its TMVP map, EbCodingLoop.c:4500).

MVs are (mvx, mvy) in quarter-luma-sample units. The motion field lives in
PictureState at 4x4 granularity: st.mv[(y>>2, x>>2)] and st.ref_idx
(-1 = no inter motion, i.e. intra or not yet decoded).
"""

from __future__ import annotations

import numpy as np

# H.265 Table 8-11: luma 8-tap filters for fractional positions 1..3
LUMA_FILTERS = {
    0: np.array([0, 0, 0, 64, 0, 0, 0, 0], np.int64),
    1: np.array([-1, 4, -10, 58, 17, -5, 1, 0], np.int64),
    2: np.array([-1, 4, -11, 40, 40, -11, 4, -1], np.int64),
    3: np.array([0, 1, -5, 17, 58, -10, 4, -1], np.int64),
}
# H.265 Table 8-12: chroma 4-tap filters for eighth positions 1..7
CHROMA_FILTERS = {
    0: np.array([0, 64, 0, 0], np.int64),
    1: np.array([-2, 58, 10, -2], np.int64),
    2: np.array([-4, 54, 16, -2], np.int64),
    3: np.array([-6, 46, 28, -4], np.int64),
    4: np.array([-4, 36, 36, -4], np.int64),
    5: np.array([-4, 28, 46, -6], np.int64),
    6: np.array([-2, 16, 54, -4], np.int64),
    7: np.array([-2, 10, 58, -2], np.int64),
}


def _gather_window(ref: np.ndarray, x0: int, y0: int, w: int, h: int) -> np.ndarray:
    """Read a (h, w) window with edge clamping (8.5.4.2.1 reference sample
    clipping — equivalent to the reference's padded pictures,
    EbMcp.c GeneratePadding :1017)."""
    hh, ww = ref.shape
    ys = np.clip(np.arange(y0, y0 + h), 0, hh - 1)
    xs = np.clip(np.arange(x0, x0 + w), 0, ww - 1)
    return ref[ys[:, None], xs[None, :]]


def interp_luma(ref: np.ndarray, x0: int, y0: int, n_w: int, n_h: int,
                mvx: int, mvy: int, bit_depth: int = 8) -> np.ndarray:
    """Uni-pred luma MCP: (n_h, n_w) block at integer position (x0, y0)
    displaced by quarter-pel MV. Returns clipped samples."""
    ix, fx = x0 + (mvx >> 2), mvx & 3
    iy, fy = y0 + (mvy >> 2), mvy & 3
    shift1 = bit_depth - 8
    maxval = (1 << bit_depth) - 1

    if fx == 0 and fy == 0:
        return _gather_window(ref, ix, iy, n_w, n_h).astype(np.int32)

    if fx and fy:
        win = _gather_window(ref, ix - 3, iy - 3, n_w + 7, n_h + 7).astype(np.int64)
    elif fx:
        win = _gather_window(ref, ix - 3, iy, n_w + 7, n_h).astype(np.int64)
    else:
        win = _gather_window(ref, ix, iy - 3, n_w, n_h + 7).astype(np.int64)

    if fx:
        f = LUMA_FILTERS[fx]
        win = sum(f[k] * win[:, k:k + n_w] for k in range(8)) >> shift1
    if fy:
        f = LUMA_FILTERS[fy]
        second_shift = 6 if fx else shift1
        win = sum(f[k] * win[k:k + n_h, :] for k in range(8)) >> second_shift
        final_shift = (6 + 6 - shift1) if fx else 6
    else:
        final_shift = 6
    # weighted-sample default process: (val << (6 - passes_shift)) ... for
    # 8-bit: single-frac: val is 14-bit after >>0 then ... normalise:
    if fx and fy:
        # after hor >>shift1 (14-bit) and ver >>6: total downshift needed
        # to 8-bit: (val + 32) >> 6
        out = (win + 32) >> 6
    else:
        # one pass, value = sum >> shift1; normalise by (val + 32) >> 6
        out = (win + 32) >> 6
    return np.clip(out, 0, maxval).astype(np.int32)


def interp_chroma(ref: np.ndarray, x0: int, y0: int, n_w: int, n_h: int,
                  mvx: int, mvy: int, bit_depth: int = 8) -> np.ndarray:
    """Uni-pred chroma MCP: chroma-plane coords, MV in eighth-chroma-pel
    (i.e. the luma quarter-pel MV used directly for 4:2:0)."""
    ix, fx = x0 + (mvx >> 3), mvx & 7
    iy, fy = y0 + (mvy >> 3), mvy & 7
    shift1 = bit_depth - 8
    maxval = (1 << bit_depth) - 1

    if fx == 0 and fy == 0:
        return _gather_window(ref, ix, iy, n_w, n_h).astype(np.int32)

    if fx and fy:
        win = _gather_window(ref, ix - 1, iy - 1, n_w + 3, n_h + 3).astype(np.int64)
    elif fx:
        win = _gather_window(ref, ix - 1, iy, n_w + 3, n_h).astype(np.int64)
    else:
        win = _gather_window(ref, ix, iy - 1, n_w, n_h + 3).astype(np.int64)

    if fx:
        f = CHROMA_FILTERS[fx]
        win = sum(f[k] * win[:, k:k + n_w] for k in range(4)) >> shift1
    if fy:
        f = CHROMA_FILTERS[fy]
        second_shift = 6 if fx else shift1
        win = sum(f[k] * win[k:k + n_h, :] for k in range(4)) >> second_shift
    out = (win + 32) >> 6
    return np.clip(out, 0, maxval).astype(np.int32)


def mc_predict(ref_planes, x0: int, y0: int, n: int, mv,
               bit_depth: int = 8):
    """Predict luma (n x n at x0,y0) + both chroma (n/2 at x0/2,y0/2)."""
    mvx, mvy = int(mv[0]), int(mv[1])
    py = interp_luma(ref_planes[0], x0, y0, n, n, mvx, mvy, bit_depth)
    pcb = interp_chroma(ref_planes[1], x0 >> 1, y0 >> 1, n >> 1, n >> 1,
                        mvx, mvy, bit_depth)
    pcr = interp_chroma(ref_planes[2], x0 >> 1, y0 >> 1, n >> 1, n >> 1,
                        mvx, mvy, bit_depth)
    return py, pcb, pcr


# ------------------------------------------------------- candidate derivation

def _motion_at(st, x: int, y: int):
    """(mv, ref_idx) at luma position, or None if outside / not inter /
    not yet decoded."""
    if x < 0 or y < 0 or x >= st.w or y >= st.h:
        return None
    if not st.avail[0][y >> 2, x >> 2]:
        return None
    r = int(st.ref_idx[y >> 2, x >> 2])
    if r < 0:
        return None
    return (int(st.mv[y >> 2, x >> 2, 0]), int(st.mv[y >> 2, x >> 2, 1])), r


def merge_candidates(st, x0: int, y0: int, n: int, max_cand: int = 5):
    """Spatial merge list (8.5.3.2.3) for a 2Nx2N PU, zero-filled to
    max_cand (TMVP disabled). Returns list of ((mvx, mvy), ref_idx)."""
    a1 = _motion_at(st, x0 - 1, y0 + n - 1)
    b1 = _motion_at(st, x0 + n - 1, y0 - 1)
    b0 = _motion_at(st, x0 + n, y0 - 1)
    a0 = _motion_at(st, x0 - 1, y0 + n)
    b2 = _motion_at(st, x0 - 1, y0 - 1)

    cand = []

    def push(m, dup_of=None):
        if m is None:
            return
        if dup_of is not None and m == dup_of:
            return
        if m not in cand:
            cand.append(m)

    # spec pairwise pruning: A1; B1 (vs A1); B0 (vs B1); A0 (vs A1); B2
    # (vs A1 and B1, only if fewer than 4)
    if a1 is not None:
        cand.append(a1)
    if b1 is not None and b1 != a1:
        cand.append(b1)
    if b0 is not None and b0 != b1:
        cand.append(b0)
    if a0 is not None and a0 != a1:
        cand.append(a0)
    if len(cand) < 4 and b2 is not None and b2 != a1 and b2 != b1:
        cand.append(b2)

    while len(cand) < max_cand:
        cand.append(((0, 0), 0))
    return cand[:max_cand]


def amvp_candidates(st, x0: int, y0: int, n: int):
    """Spatial AMVP list (8.5.3.2.5), 2 entries, zero-filled. All
    references have the same POC distance in our low-delay single-ref
    configuration, so no MV scaling is required."""
    a0 = _motion_at(st, x0 - 1, y0 + n)
    a1 = _motion_at(st, x0 - 1, y0 + n - 1)
    b0 = _motion_at(st, x0 + n, y0 - 1)
    b1 = _motion_at(st, x0 + n - 1, y0 - 1)
    b2 = _motion_at(st, x0 - 1, y0 - 1)

    cand = []
    for m in (a0, a1):
        if m is not None:
            cand.append(m[0])
            break
    for m in (b0, b1, b2):
        if m is not None:
            if not cand or m[0] != cand[0]:
                cand.append(m[0])
            break
    while len(cand) < 2:
        cand.append((0, 0))
    return cand[:2]
