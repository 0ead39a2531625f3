"""Device deblocking == host deblocking, bit-exact.

Builds random fast-path decision maps (valid quadtree, single-ref MVs,
random cbf), fills a PictureState exactly as the fast-path walk would
(TU-grid edge flags, motion field, cbf map), and checks
tpu.dlf.derive_bs_maps + deblock_dev against core.deblock.deblock_picture.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from svt_hevc_tpu.core.ctu import PictureState, chroma_qp  # noqa: E402
from svt_hevc_tpu.core.deblock import (deblock_picture,  # noqa: E402
                                       derive_bs_horizontal,
                                       derive_bs_vertical)
from svt_hevc_tpu.tpu.dlf import deblock_dev, derive_bs_maps  # noqa: E402
from tests.test_intra_pass import random_quadtree  # noqa: E402


def build_state(w, h, qp, cu_log2, inter8, mv8, slice_type, rng):
    """Fill a PictureState the way the fast-path walk would, plus a
    random per-TU cbf. Returns (st, cbf4 at 64-aligned dims)."""
    st = PictureState(w, h, qp, 6)
    st.slice_type = slice_type
    st.ref_pocs = [[0], []]
    nby, nbx = cu_log2.shape
    cbf4 = np.zeros((nby * 2, nbx * 2), np.int32)
    done = np.zeros((nby, nbx), bool)
    for by in range(nby):
        for bx in range(nbx):
            if done[by, bx] or bx * 8 >= w or by * 8 >= h:
                continue
            lg = int(cu_log2[by, bx])
            n = 1 << lg
            k = n // 8
            done[by:by + k, bx:bx + k] = True
            x0, y0 = bx * 8, by * 8
            # TU grid = min(CU, 32): mark edge flags like transform_unit
            tn = min(n, 32)
            for ty in range(y0, y0 + n, tn):
                for tx in range(x0, x0 + n, tn):
                    st.edge_v[ty >> 2:(ty + tn) >> 2, tx >> 3] = True
                    st.edge_h[ty >> 3, tx >> 2:(tx + tn) >> 2] = True
                    cbf = int(rng.random() < 0.5)
                    cbf4[ty >> 2:(ty + tn) >> 2, tx >> 2:(tx + tn) >> 2] = cbf
            ys = slice(y0 >> 2, (y0 + n) >> 2)
            xs = slice(x0 >> 2, (x0 + n) >> 2)
            if inter8[by, bx]:
                st.mv[ys, xs, 0, 0] = mv8[by, bx, 0]
                st.mv[ys, xs, 0, 1] = mv8[by, bx, 1]
                st.ref_idx[ys, xs, 0] = 0
            else:
                st.ref_idx[ys, xs, :] = -1
    st.cbf4[:, :] = cbf4[:h // 4, :w // 4]
    return st, cbf4


@pytest.mark.parametrize("w,h,seed,qp,all_intra", [
    (128, 64, 0, 32, False),
    (96, 80, 1, 37, False),
    (128, 128, 2, 27, True),
    (192, 136, 3, 45, False),
])
def test_dlf_device_matches_host(w, h, seed, qp, all_intra):
    rng = np.random.default_rng(seed)
    w64, h64 = (w + 63) // 64 * 64, (h + 63) // 64 * 64
    nby, nbx = h64 // 8, w64 // 8

    cu_log2 = random_quadtree(nby, nbx, w, h, rng)
    inter8 = (np.zeros((nby, nbx), bool) if all_intra
              else rng.random((nby, nbx)) < 0.8)
    # per-CU constant inter flag / mv
    mv8 = rng.integers(-32, 33, (nby, nbx, 2)).astype(np.int32)
    for by in range(nby):
        for bx in range(nbx):
            k = (1 << cu_log2[by, bx]) // 8
            oy, ox = by // k * k, bx // k * k
            inter8[by, bx] = inter8[oy, ox]
            mv8[by, bx] = mv8[oy, ox]

    planes = [rng.integers(0, 256, (h, w)).astype(np.int32),
              rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32),
              rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)]

    st, cbf4 = build_state(w, h, qp, cu_log2, inter8, mv8,
                           slice_type=2 if all_intra else 1, rng=rng)
    for c in range(3):
        st.planes[c][:] = planes[c]

    # host reference
    bs_v_host = derive_bs_vertical(st)
    bs_h_host = derive_bs_horizontal(st)
    deblock_picture(st)

    # device
    bs_v, bs_ht = derive_bs_maps(jnp.asarray(cu_log2), jnp.asarray(inter8),
                                 jnp.asarray(mv8),
                                 jnp.asarray(cbf4.astype(np.int32)), w, h)
    np.testing.assert_array_equal(np.asarray(bs_v)[:h // 4, :w // 8],
                                  bs_v_host, err_msg="bs_v")
    np.testing.assert_array_equal(np.asarray(bs_ht).T[:h // 8, :w // 4],
                                  bs_h_host, err_msg="bs_h")

    pads = [np.zeros((h64, w64), np.int32),
            np.zeros((h64 // 2, w64 // 2), np.int32),
            np.zeros((h64 // 2, w64 // 2), np.int32)]
    for c, p in enumerate(planes):
        ph, pw = p.shape
        pads[c][:ph, :pw] = p
    y, cb, cr = deblock_dev(jnp.asarray(pads[0]), jnp.asarray(pads[1]),
                            jnp.asarray(pads[2]), bs_v, bs_ht,
                            jnp.int32(qp), jnp.int32(chroma_qp(qp)))
    np.testing.assert_array_equal(np.asarray(y)[:h, :w], st.planes[0],
                                  err_msg="Y")
    np.testing.assert_array_equal(np.asarray(cb)[:h // 2, :w // 2],
                                  st.planes[1], err_msg="Cb")
    np.testing.assert_array_equal(np.asarray(cr)[:h // 2, :w // 2],
                                  st.planes[2], err_msg="Cr")


@pytest.mark.parametrize("w,h,seed,qp", [
    (128, 64, 4, 32),
    (192, 136, 5, 37),
])
def test_dlf_device_matches_host_rqt(w, h, seed, qp):
    """The RQT branch of the device bS derivation (ADVICE r3): a random
    legal per-CU TU map (respecting the transform depth budget), edge
    flags and cbf at TU granularity, compared against the host filter."""
    rng = np.random.default_rng(seed)
    w64, h64 = (w + 63) // 64 * 64, (h + 63) // 64 * 64
    nby, nbx = h64 // 8, w64 // 8

    cu_log2 = random_quadtree(nby, nbx, w, h, rng)
    inter8 = rng.random((nby, nbx)) < 0.85
    mv8 = rng.integers(-32, 33, (nby, nbx, 2)).astype(np.int32)
    tu8 = np.zeros((nby, nbx), np.int32)
    done = np.zeros((nby, nbx), bool)
    for by in range(nby):
        for bx in range(nbx):
            if done[by, bx]:
                continue
            lg = int(cu_log2[by, bx])
            k = (1 << lg) // 8
            done[by:by + k, bx:bx + k] = True
            inter8[by:by + k, bx:bx + k] = inter8[by, bx]
            mv8[by:by + k, bx:bx + k] = mv8[by, bx]
            # legal TU log2 range at this CU: [max(lg-2, 3), min(lg, 5)]
            lo, hi = max(lg - 2, 3), min(lg, 5)
            if not inter8[by, bx]:
                lo = hi = min(lg, 5)     # intra TU == min(CU, 32)
            # quadtree-consistent random TU sizes inside the CU
            for ty in range(by, by + k):
                for tx in range(bx, bx + k):
                    tu8[ty, tx] = rng.integers(lo, hi + 1)
            # legalize: a TU of size t must be t-aligned and uniform
            for lg_t in (5, 4):
                kt = (1 << lg_t) // 8
                if kt > k:
                    continue         # TU cannot exceed the CU
                for ty in range(by, by + k, kt):
                    for tx in range(bx, bx + k, kt):
                        blk = tu8[ty:ty + kt, tx:tx + kt]
                        if (blk >= lg_t).any():
                            blk[:] = lg_t if rng.random() < 0.5 else \
                                np.minimum(blk, lg_t - 1)
    tu8 = np.maximum(tu8, 3)

    st = PictureState(w, h, qp, 6)
    st.slice_type = 1
    st.ref_pocs = [[0], []]
    cbf4 = np.zeros((nby * 2, nbx * 2), np.int32)
    done[:] = False
    for by in range(nby):
        for bx in range(nbx):
            if done[by, bx] or bx * 8 >= w or by * 8 >= h:
                continue
            lg = int(cu_log2[by, bx])
            n = 1 << lg
            k = n // 8
            done[by:by + k, bx:bx + k] = True
            x0, y0 = bx * 8, by * 8
            seen = np.zeros((k, k), bool)
            for sy in range(k):
                for sx in range(k):
                    if seen[sy, sx]:
                        continue
                    tlg = int(tu8[by + sy, bx + sx])
                    tn = 1 << tlg
                    kt = tn // 8
                    seen[sy:sy + kt, sx:sx + kt] = True
                    ty, tx = y0 + sy * 8, x0 + sx * 8
                    st.edge_v[ty >> 2:(ty + tn) >> 2, tx >> 3] = True
                    st.edge_h[ty >> 3, tx >> 2:(tx + tn) >> 2] = True
                    cbf = int(rng.random() < 0.5)
                    cbf4[ty >> 2:(ty + tn) >> 2, tx >> 2:(tx + tn) >> 2] = cbf
            ys = slice(y0 >> 2, (y0 + n) >> 2)
            xs = slice(x0 >> 2, (x0 + n) >> 2)
            if inter8[by, bx]:
                st.mv[ys, xs, 0, 0] = mv8[by, bx, 0]
                st.mv[ys, xs, 0, 1] = mv8[by, bx, 1]
                st.ref_idx[ys, xs, 0] = 0
            else:
                st.ref_idx[ys, xs, :] = -1
    st.cbf4[:, :] = cbf4[:h // 4, :w // 4]

    planes = [rng.integers(0, 256, (h, w)).astype(np.int32),
              rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32),
              rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)]
    for c in range(3):
        st.planes[c][:] = planes[c]

    bs_v_host = derive_bs_vertical(st)
    bs_h_host = derive_bs_horizontal(st)
    deblock_picture(st)

    bs_v, bs_ht = derive_bs_maps(jnp.asarray(cu_log2), jnp.asarray(inter8),
                                 jnp.asarray(mv8),
                                 jnp.asarray(cbf4.astype(np.int32)), w, h,
                                 tu_log2_8=jnp.asarray(tu8))
    np.testing.assert_array_equal(np.asarray(bs_v)[:h // 4, :w // 8],
                                  bs_v_host, err_msg="bs_v")
    np.testing.assert_array_equal(np.asarray(bs_ht).T[:h // 8, :w // 4],
                                  bs_h_host, err_msg="bs_h")

    pads = [np.zeros((h64, w64), np.int32),
            np.zeros((h64 // 2, w64 // 2), np.int32),
            np.zeros((h64 // 2, w64 // 2), np.int32)]
    for c, p in enumerate(planes):
        ph, pw = p.shape
        pads[c][:ph, :pw] = p
    y, cb, cr = deblock_dev(jnp.asarray(pads[0]), jnp.asarray(pads[1]),
                            jnp.asarray(pads[2]), bs_v, bs_ht,
                            jnp.int32(qp), jnp.int32(chroma_qp(qp)))
    np.testing.assert_array_equal(np.asarray(y)[:h, :w], st.planes[0],
                                  err_msg="Y")
    np.testing.assert_array_equal(np.asarray(cb)[:h // 2, :w // 2],
                                  st.planes[1], err_msg="Cb")
    np.testing.assert_array_equal(np.asarray(cr)[:h // 2, :w // 2],
                                  st.planes[2], err_msg="Cr")
