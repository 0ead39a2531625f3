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
