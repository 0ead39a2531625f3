"""TPU hierarchical motion estimation tests (virtual CPU mesh)."""

import numpy as np

from svt_hevc_tpu.tpu.me import hme_search


def _textured(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h, w)).astype(np.float32)
    # low-pass for gradient structure
    k = np.ones((3, 3)) / 9.0
    out = base.copy()
    out[1:-1, 1:-1] = sum(base[1 + dy:h - 1 + dy, 1 + dx:w - 1 + dx] * k[dy + 1, dx + 1]
                          for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    return out


def test_global_translation_found():
    h, w = 128, 128
    big = _textured(h + 64, w + 64, seed=1)
    ref = big[32:32 + h, 32:32 + w]
    for dx, dy in ((3, 2), (-5, 7), (10, -4), (0, 0)):
        src = big[32 + dy:32 + dy + h, 32 + dx:32 + dx + w]
        mv, sad = hme_search(src, ref)
        mv = np.asarray(mv)
        # interior blocks should find exactly (dx, dy) in quarter-pel units
        inner = mv[2:-2, 2:-2]
        frac_correct = ((inner[..., 0] == 4 * dx) & (inner[..., 1] == 4 * dy)).mean()
        assert frac_correct > 0.9, (dx, dy, frac_correct)


def test_zero_motion_zero_sad():
    src = _textured(64, 64, seed=2)
    mv, sad = hme_search(src, src.copy())
    assert np.asarray(sad).max() == 0
    assert np.abs(np.asarray(mv)).max() == 0


def test_large_motion_within_range():
    """Hierarchy must reach displacements far beyond the +/-4 fine window."""
    h, w = 192, 192
    big = _textured(h + 100, w + 100, seed=3)
    ref = big[50:50 + h, 50:50 + w]
    dx, dy = 30, -22
    src = big[50 + dy:50 + dy + h, 50 + dx:50 + dx + w]
    mv, _ = hme_search(src, ref)
    inner = np.asarray(mv)[3:-3, 3:-3]
    frac = ((inner[..., 0] == 4 * dx) & (inner[..., 1] == 4 * dy)).mean()
    assert frac > 0.8, frac


def test_p_encode_with_me_seed_bitmatch():
    """Pipeline wiring: TPU-seeded P encode still decodes bit-exact."""
    from test_inter import _roundtrip_seq, moving_sequence
    frames = moving_sequence(64, 64, 3, dx=6, dy=0, seed=4)
    _, recons, decoded = _roundtrip_seq(frames, qp=34)
    for r, d in zip(recons, decoded):
        np.testing.assert_array_equal(r.y, d.y)
