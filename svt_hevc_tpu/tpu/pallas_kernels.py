"""Hand-written Pallas TPU kernels for the hot compute loops.

First kernel: the full-search SAD field — the innermost loop of motion
estimation (reference analogue: EbComputeSAD_SadLoopKernel_AVX512.c /
GetEightHorizontalSearchPointResultsAll85PUs, EbMotionEstimation.c:156).

Layout: one grid program per 16-pixel block row. The source row slab
arrives pre-blocked in VMEM; the padded reference stays in HBM/ANY and the
program DMAs its overlapping (n + 2r)-row slab into VMEM scratch (block
rows overlap by 2r, which BlockSpec tiling cannot express). The
(2R+1)^2-displacement loop is static (unrolled by Mosaic); every
displacement is one lane-parallel absolute-difference reduction plus a
blockwise segment sum.

The jnp fallback in me.py computes the identical field via XLA; the two
are equivalence-tested (interpret mode on CPU). me._block_sad_all_disp
dispatches to this kernel when the one-time probe (me._pallas_usable)
compiled and ran it on the active non-CPU backend; otherwise the XLA
path serves (bit-identical either way).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sad_row_kernel(src_ref, ref_hbm, out_ref, *, n: int, r: int, w: int,
                    w_pad: int):
    s2 = 2 * r + 1
    bw = w // n

    i = pl.program_id(0)
    # blockwise segment sum as a matmul with a 0/1 selector — lane-dim
    # reshapes are layout-hostile on the VPU, but (1, w) @ (w, bw) rides
    # the MXU
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (w, bw), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (w, bw), 1)
    sel = (row_ids // n == col_ids).astype(jnp.float32)

    def body(slab, sem):
        dma = pltpu.make_async_copy(
            ref_hbm.at[pl.ds(i * n, n + 2 * r), :], slab, sem)
        dma.start()
        dma.wait()
        src = src_ref[:, :]                        # (n, w)
        for dy in range(s2):
            for dx in range(s2):
                shifted = slab[dy:dy + n, dx:dx + w]
                diff = jnp.abs(src - shifted)      # (n, w)
                col = jnp.sum(diff, axis=0, keepdims=True)   # (1, w)
                # HIGHEST: full-f32 MXU passes — SAD sums are exact
                # integers and must match the XLA path bit-for-bit
                blocks = jnp.dot(col, sel,
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
                out_ref[0, dy * s2 + dx, :] = blocks[0]

    pl.run_scoped(
        body,
        slab=pltpu.VMEM((n + 2 * r, w_pad), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def sad_field_pallas(src: jnp.ndarray, ref: jnp.ndarray, n: int = 16,
                     r: int = 4, interpret: bool = False) -> jnp.ndarray:
    """SAD of every aligned (n, n) block of src vs ref displaced by every
    (dy, dx) in [-r, r]^2. Returns (2r+1, 2r+1, H//n, W//n) float32 —
    identical to svt_hevc_tpu.tpu.me._block_sad_all_disp."""
    h, w = src.shape
    s2 = 2 * r + 1
    bh, bw = h // n, w // n
    src = src.astype(jnp.float32)
    pad = jnp.pad(ref.astype(jnp.float32), r, mode="edge")   # (h+2r, w+2r)
    # the DMA slab's lane dimension must be 128-aligned
    w_pad = -(-(w + 2 * r) // 128) * 128
    pad = jnp.pad(pad, ((0, 0), (0, w_pad - (w + 2 * r))), mode="edge")

    out = pl.pallas_call(
        functools.partial(_sad_row_kernel, n=n, r=r, w=w, w_pad=w_pad),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((n, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, s2 * s2, bw), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s2 * s2, bw), jnp.float32),
        interpret=interpret,
    )(src, pad)
    return out.transpose(1, 0, 2).reshape(s2, s2, bh, bw)


def on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


# --------------------------------------------------------------- MC kernel
#
# Second kernel: per-block motion-compensated prediction — the MC gather
# that XLA lowers to an element-granular gather costing ~22-50 ms per
# 1080p plane (measured), ~40x a fused elementwise pass. The reference's
# hot loop interpolates per-PU windows on demand (EbMcp.c:99-804); this
# kernel does the same per 8x8 (luma) / 4x4 (chroma) block:
#
#   grid = one program per block row. The program DMAs the band of the
#   edge-padded integer reference that any MV of its row can touch
#   (|MV| is clamped to PAD-9 full-pel upstream) into VMEM, then per
#   block dynamic-slices the (n+taps-1)^2 window out of the band and
#   applies the two separable spec filters with scalar-vector madds.
#
# Integer-exact with tpu.encode._mc_raw_{luma,chroma}_direct (the shift
# pairing H >> (bit_depth-8), V >> 6 on the same int32 windows) and so
# with the phase-plane path — equivalence is test-enforced
# (tests/test_pallas.py, interpret mode on CPU).

def _mc_row_kernel(idx_ref, ftab_ref, ref_hbm,
                   out_ref, *, nbx: int, n: int, rpp: int, taps: int,
                   band_rows: int, w_band: int, shift1: int,
                   round_shift: int, maxval: int):
    win_n = n + taps - 1
    i = pl.program_id(0)

    def body(band, sem):
        dma = pltpu.make_async_copy(
            ref_hbm.at[pl.ds(i * n * rpp, band_rows), :], band, sem)
        dma.start()
        dma.wait()
        for r_ in range(rpp):          # block rows within this program
            for b in range(nbx):
                dy = idx_ref[r_, 0, b] + r_ * n
                dx = idx_ref[r_, 1, b] + b * n  # band covers the width;
                fxb = idx_ref[r_, 2, b]         # rows start at block row
                fyb = idx_ref[r_, 3, b]
                # Mosaic only slices VMEM at tile-aligned offsets
                # (sublane multiple of 8, lane multiple of 128): read an
                # aligned (win_n+8, 256) super-window, collapse the row
                # remainder with masked adds and the lane remainder with
                # a dynamic lane rotate (tpu.DynamicRotate)
                dy8 = pl.multiple_of((dy >> 3) << 3, 8)
                rem_y = dy & 7
                dx128 = pl.multiple_of((dx >> 7) << 7, 128)
                rem_x = dx & 127
                tall = band[pl.ds(dy8, win_n + 8), pl.ds(dx128, 256)]
                wide = jnp.zeros((win_n, 256), jnp.int32)
                for q in range(8):
                    wide = wide + jnp.where(rem_y == q,
                                            tall[q:q + win_n, :], 0)
                win = pltpu.roll(wide, shift=-rem_x, axis=1)[:, :win_n]
                mid = jnp.zeros((win_n, n), jnp.int32)
                for k in range(taps):
                    mid = mid + ftab_ref[fxb, k] * win[:, k:k + n]
                mid = mid >> shift1
                acc = jnp.zeros((n, n), jnp.int32)
                for k in range(taps):
                    acc = acc + ftab_ref[fyb, k] * mid[k:k + n, :]
                acc = acc >> 6
                if round_shift > 0:
                    acc = jnp.clip(
                        (acc + (1 << (round_shift - 1))) >> round_shift,
                        0, maxval)
                out_ref[r_ * n:(r_ + 1) * n, b * n:(b + 1) * n] = acc

    pl.run_scoped(
        body,
        band=pltpu.VMEM((band_rows, w_band), jnp.int32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit,
                   static_argnums=(5, 6, 7, 8, 9, 10))
def mc_block_pallas(ref_ext: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray,
                    fx: jnp.ndarray, fy: jnp.ndarray, n: int, taps: int,
                    pad: int, rounded: bool, bit_depth: int = 8,
                    interpret: bool = False) -> jnp.ndarray:
    """Per-block MC from an edge-padded integer plane.

    ref_ext: (h + 2*(pad+ceil(taps/2)), w + 2*(pad+ceil(taps/2))) int32;
    sy/sx: per-block window-origin offsets RELATIVE to the block origin
    in ref_ext coordinates, i.e. integer-MV + pad + 1 (see
    tpu.encode._mc_raw_luma_direct); fx/fy: per-block filter phases.
    Returns the (h, w) int32 plane — 14-bit intermediates when
    rounded=False, clipped pixels when rounded=True."""
    from ..core.inter import CHROMA_FILTERS, LUMA_FILTERS
    import numpy as np

    margin = taps // 2
    hp, wp = ref_ext.shape
    h = hp - 2 * (pad + margin)
    w = wp - 2 * (pad + margin)
    nby, nbx = h // n, w // n
    # output VMEM blocks must be >= 8 sublanes: process 8//n block rows
    # per program (2 for 4x4 chroma blocks)
    rpp = max(8 // n, 1)
    # + 8 rows so the 8-aligned sublane-tile reads never run off the
    # band; DMA slice shapes must themselves be 8-row aligned
    band_rows = -(-(n * rpp + 2 * (pad + margin) + 8) // 8) * 8
    # lane alignment for the DMA band, + one extra lane tile so the
    # aligned 256-wide super-window reads never run off the band
    w_band = -(-wp // 128) * 128 + 128
    ref_p = jnp.pad(ref_ext.astype(jnp.int32),
                    ((0, band_rows), (0, w_band - wp)))
    filt = (np.stack([np.asarray(LUMA_FILTERS[p], np.int64)
                      for p in range(4)])
            if taps == 8 else
            np.stack([np.asarray(CHROMA_FILTERS[p], np.int64)
                      for p in range(8)])).astype(np.int32)
    shift1 = bit_depth - 8
    round_shift = (14 - bit_depth) if rounded else 0
    # SMEM blocks need (8, 128)-divisible tails: pack the four per-block
    # index maps into one (nby, 8, nbx_pad) int32 array
    nbx_pad = -(-nbx // 128) * 128
    idx = jnp.zeros((nby, 8, nbx_pad), jnp.int32)
    for slot, arr in enumerate((sy, sx, fx, fy)):
        idx = idx.at[:, slot, :nbx].set(arr.astype(jnp.int32))
    ft = jnp.zeros((8, 128), jnp.int32)
    ft = ft.at[:filt.shape[0], :filt.shape[1]].set(jnp.asarray(filt))
    # window origin absolute row = b*n + sy_rel; band starts at row b*n,
    # so the in-band offset is simply sy_rel (non-negative by clamping)
    out = pl.pallas_call(
        functools.partial(
            _mc_row_kernel, nbx=nbx, n=n, rpp=rpp, taps=taps,
            band_rows=band_rows, w_band=w_band,
            shift1=shift1, round_shift=round_shift,
            maxval=(1 << bit_depth) - 1),
        grid=(nby // rpp,),
        in_specs=[
            pl.BlockSpec((rpp, 8, nbx_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((n * rpp, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        interpret=interpret,
    )(idx, ft, ref_p)
    return out
