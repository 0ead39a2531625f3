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
