"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(conftest.py forces XLA_FLAGS=--xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svt_hevc_tpu.parallel import HALO, frontend_step, make_mesh, sharded_hme
from svt_hevc_tpu.tpu.me import hme_search


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_make_mesh_axes(mesh):
    assert mesh.shape["gop"] * mesh.shape["tile"] == 8
    assert mesh.shape["gop"] == 2


def test_sharded_hme_matches_single_device(mesh):
    rng = np.random.default_rng(3)
    h, w = 64 * mesh.shape["tile"], 128
    ref = rng.integers(0, 255, (h, w)).astype(np.float32)
    # source = reference shifted by (+6, -3): every interior block's true
    # MV is recoverable by the hierarchical search
    src = np.roll(np.roll(ref, 6, axis=0), -3, axis=1)
    mv_s, sad_s = sharded_hme(jnp.asarray(src), jnp.asarray(ref), mesh)
    mv_g, sad_g = hme_search(jnp.asarray(src), jnp.asarray(ref))
    k = HALO // 16
    # interior block rows (full search reach inside exchanged halos) must
    # match the single-chip field exactly
    np.testing.assert_array_equal(np.asarray(mv_s)[k:-k],
                                  np.asarray(mv_g)[k:-k])
    np.testing.assert_allclose(np.asarray(sad_s)[k:-k],
                               np.asarray(sad_g)[k:-k], rtol=1e-5)
    # and the bulk of the field finds the planted displacement:
    # src(y, x) = ref(y - 6, x + 3) => mv = (mvx, mvy) = (+3, -6) full-pel
    interior = np.asarray(mv_s)[k:-k, 1:-1]
    frac = np.mean((interior[..., 0] == 3 * 4) & (interior[..., 1] == -6 * 4))
    assert frac > 0.9, frac


def test_sharded_hme_executes_with_collectives(mesh):
    """The lowered HLO must actually contain a collective permute (the
    halo exchange rides the mesh, not a gather through replicated memory)."""
    rng = np.random.default_rng(4)
    h, w = 64 * mesh.shape["tile"], 128
    src = jnp.asarray(rng.integers(0, 255, (h, w)), jnp.float32)
    ref = jnp.asarray(rng.integers(0, 255, (h, w)), jnp.float32)
    txt = jax.jit(lambda a, b: sharded_hme(a, b, mesh)).lower(src, ref) \
        .compiler_ir(dialect="stablehlo")
    assert "collective_permute" in str(txt)


def test_frontend_step_gop_tile_sharded(mesh):
    step, in_sh = frontend_step(mesh)
    rng = np.random.default_rng(5)
    frames = jnp.asarray(
        rng.integers(0, 255, (mesh.shape["gop"] * 2,
                              mesh.shape["tile"] * 128, 256)), jnp.float32)
    frames = jax.device_put(frames, in_sh)
    out, total = step(frames)
    jax.block_until_ready(total)
    assert np.isfinite(float(total))
    assert out["cost16"].shape[0] == frames.shape[0]


def test_gop_encode_step_matches_single_device():
    """The real fused encode (dense MD + decision + encode pass) sharded
    picture-parallel over the 8-device mesh must bit-match per-picture
    single-device execution (SURVEY §2.6 gop sharding)."""
    import jax
    import jax.numpy as jnp

    from svt_hevc_tpu.parallel import gop_encode_step, make_mesh
    from svt_hevc_tpu.tpu.encode import fast_p_fused_packed
    from svt_hevc_tpu.tpu.me import hme_search

    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    B, H, W = 8, 128, 128
    srcs = jnp.asarray(rng.integers(0, 255, (B, H, W)), jnp.int32)
    refs = jnp.roll(srcs, (0, 3, -2), (0, 1, 2))
    csrc = jnp.asarray(rng.integers(0, 255, (B, H // 2, W // 2)), jnp.int32)
    cref = jnp.roll(csrc, (0, 1, -1), (0, 1, 2))
    mvs = jnp.stack([hme_search(srcs[b], refs[b])[0] for b in range(B)])
    step, _ = gop_encode_step(mesh)
    got = np.asarray(step((srcs, csrc, csrc), (refs, cref, cref), mvs,
                          jnp.int32(30), jnp.int32(31)))
    for b in (0, 3, 7):
        want = np.asarray(fast_p_fused_packed(
            srcs[b], csrc[b], csrc[b], refs[b], cref[b], cref[b], mvs[b],
            jnp.int32(30), jnp.int32(31), ctb_log2=5, w=W, h=H,
            bit_depth=8))
        assert np.array_equal(got[b], want), b
