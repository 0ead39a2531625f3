"""Pallas kernel tests (interpreter mode on the CPU mesh): the hand
kernel must produce the exact SAD field of the XLA path."""

import numpy as np
import pytest

import jax.numpy as jnp

from svt_hevc_tpu.tpu.me import _block_sad_all_disp
from svt_hevc_tpu.tpu.pallas_kernels import sad_field_pallas


@pytest.mark.parametrize("shape", [(64, 128), (32, 256)])
@pytest.mark.parametrize("r", [2, 4])
def test_pallas_sad_matches_xla(shape, r):
    rng = np.random.default_rng(shape[0] + r)
    src = rng.integers(0, 256, shape).astype(np.float32)
    ref = rng.integers(0, 256, shape).astype(np.float32)
    want = np.asarray(_block_sad_all_disp(jnp.asarray(src), jnp.asarray(ref),
                                          16, r))
    got = np.asarray(sad_field_pallas(jnp.asarray(src), jnp.asarray(ref),
                                      16, r, True))
    np.testing.assert_array_equal(want, got)


def test_mc_block_kernel_matches_direct():
    """mc_block_pallas (interpret) is bit-exact with the XLA direct MC
    at 8 and 10 bit, rounded and 14-bit forms, luma and chroma — the
    guarantee that lets the TPU dispatch swap it in without changing
    streams."""
    import numpy as np
    import jax.numpy as jnp
    from svt_hevc_tpu.tpu import encode as tenc
    from svt_hevc_tpu.tpu.pallas_kernels import mc_block_pallas

    rng = np.random.default_rng(9)
    h, w = 64, 128
    PAD = tenc.PAD
    mv = rng.integers(-219, 219, (h // 8, w // 8, 2)).astype(np.int32)
    mvx, mvy = mv[..., 0], mv[..., 1]
    for bd in (8, 10):
        ref = rng.integers(0, 1 << bd, (h, w)).astype(np.int32)
        refc = rng.integers(0, 1 << bd, (h // 2, w // 2)).astype(np.int32)
        ey = tenc._ext_y(jnp.asarray(ref))
        ec = tenc._ext_c(jnp.asarray(refc))
        ly = (jnp.asarray((mvy >> 2) + PAD + 1),
              jnp.asarray((mvx >> 2) + PAD + 1),
              jnp.asarray(mvx & 3), jnp.asarray(mvy & 3))
        lc = (jnp.asarray((mvy >> 3) + PAD // 2 + 1),
              jnp.asarray((mvx >> 3) + PAD // 2 + 1),
              jnp.asarray(mvx & 7), jnp.asarray(mvy & 7))
        for rounded in (False, True):
            want = (tenc._mc_pred_luma_direct if rounded
                    else tenc._mc_raw_luma_direct)(ey, jnp.asarray(mv), bd)
            got = mc_block_pallas(ey, *ly, 8, 8, PAD, rounded, bd, True)
            np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
            wantc = (tenc._mc_pred_chroma_direct if rounded
                     else tenc._mc_raw_chroma_direct)(ec, jnp.asarray(mv),
                                                      bd)
            gotc = mc_block_pallas(ec, *lc, 4, 4, PAD // 2, rounded, bd,
                                   True)
            np.testing.assert_array_equal(np.asarray(wantc),
                                          np.asarray(gotc))
