"""Source denoise tests (reference enableDenoiseFlag,
EbPictureAnalysisProcess.c noiseExtract* :1020-1320)."""

import numpy as np

from svt_hevc_tpu.config import EncoderConfig
from svt_hevc_tpu.decoder.decoder import decode_stream
from svt_hevc_tpu.io.yuv import Frame
from svt_hevc_tpu.pipeline.encoder import Encoder

from test_endtoend import make_frame


def _noisy_frame(seed):
    rng = np.random.default_rng(seed)
    y = np.tile(np.linspace(30, 220, 96, dtype=np.float32), (64, 1))
    y = y + rng.normal(0, 8.0, y.shape)
    return Frame(y=np.clip(y, 0, 255).astype(np.uint8),
                 cb=np.full((32, 48), 120, np.uint8),
                 cr=np.full((32, 48), 130, np.uint8))


def test_denoise_plane_classifies_noise():
    import jax.numpy as jnp
    from svt_hevc_tpu.tpu.analysis import denoise_plane
    rng = np.random.default_rng(1)
    clean = np.tile(np.linspace(30, 220, 128, dtype=np.float32), (64, 1))
    noisy = clean + rng.normal(0, 8.0, clean.shape).astype(np.float32)
    out_c, sig_c = denoise_plane(jnp.asarray(clean))
    out_n, sig_n = denoise_plane(jnp.asarray(noisy))
    assert float(sig_c) < 1.1           # clean gradient: near-zero noise
    assert float(sig_n) > 3.0
    # clean content passes through (class 0: no filtering beyond rounding)
    np.testing.assert_allclose(np.asarray(out_c), np.round(clean), atol=1)
    # noisy content moves toward the clean signal
    e_before = np.abs(noisy - clean).mean()
    e_after = np.abs(np.asarray(out_n) - clean).mean()
    assert e_after < 0.7 * e_before


def test_denoise_shrinks_noisy_stream():
    frames = [_noisy_frame(2)]
    base = EncoderConfig(width=96, height=64, qp=20)
    den = base.replace(enable_denoise=True)
    s0, _ = Encoder(base).encode(list(frames))
    s1, r1 = Encoder(den).encode(list(frames))
    assert len(s1) < 0.9 * len(s0)
    d = decode_stream(s1)
    np.testing.assert_array_equal(d[0].y, r1[0].y)


def test_denoise_clean_content_unchanged():
    ramp = np.tile(np.linspace(20, 230, 64, dtype=np.uint8), (64, 1))
    frame = Frame(y=ramp, cb=np.full((32, 32), 120, np.uint8),
                  cr=np.full((32, 32), 130, np.uint8))
    cfg = EncoderConfig(width=64, height=64, qp=30, enable_denoise=True)
    s1, r1 = Encoder(cfg).encode([frame])
    s0, r0 = Encoder(cfg.replace(enable_denoise=False)).encode([frame])
    np.testing.assert_array_equal(r0[0].y, r1[0].y)   # class 0: no-op
