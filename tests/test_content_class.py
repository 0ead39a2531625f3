"""Content classification (pipeline/content_class.py) — the analogue of
the reference's SourceBasedOperations grass/skin/dark/stationary classes
(EbSourceBasedOperationsProcess.c:1159-1369) feeding QPM."""

import numpy as np

from svt_hevc_tpu.config import EncoderConfig
from svt_hevc_tpu.decoder.decoder import decode_stream
from svt_hevc_tpu.io.yuv import Frame
from svt_hevc_tpu.pipeline.content_class import classify_ctbs, qp_class_delta
from svt_hevc_tpu.pipeline.encoder import Encoder


def _quadrant_frame(w=128, h=128):
    """Four 64x64 quadrants: grass-like (TL), skin-like (TR), dark (BL),
    neutral noisy texture (BR)."""
    rng = np.random.default_rng(4)
    y = np.full((h, w), 128, np.uint8)
    cb = np.full((h // 2, w // 2), 128, np.uint8)
    cr = np.full((h // 2, w // 2), 128, np.uint8)
    # grass: mid luma, low Cb, neutral Cr, textured
    y[:64, :64] = 90 + rng.integers(0, 40, (64, 64))
    cb[:32, :32] = 105
    cr[:32, :32] = 130
    # skin: higher luma, Cr above neutral, Cb a bit below
    y[:64, 64:] = 170
    cb[:32, 32:] = 110
    cr[32:, 32:] = 128           # (BR untouched)
    cr[:32, 32:] = 150
    # dark quadrant
    y[64:, :64] = 20
    # noisy texture
    y[64:, 64:] = rng.integers(0, 256, (64, 64))
    return Frame(y=y, cb=cb, cr=cr)


def test_classes_detected():
    fr = _quadrant_frame()
    act = np.array([[100.0, 50.0], [10.0, 5000.0]])
    cls = classify_ctbs(fr.y.astype(np.int32), fr.cb.astype(np.int32),
                        fr.cr.astype(np.int32), 64, activity=act)
    assert cls["grass"][0, 0] and not cls["grass"][1, 1]
    assert cls["skin"][0, 1] and not cls["skin"][0, 0]
    assert cls["dark"][1, 0] and not cls["dark"][0, 0]
    assert cls["high_texture"][1, 1]
    assert 0.2 < cls["pct_grass"] + cls["pct_skin"] + cls["pct_dark"] <= 1.0

    d = qp_class_delta(cls)
    assert d[0, 0] < 0 and d[0, 1] < 0 and d[1, 0] < 0   # protected
    assert d[1, 1] > 0                                   # masked texture


def test_stationary_edge_protection():
    y = np.full((64, 128), 100, np.int32)
    y[:, 60:68] = 240                        # strong vertical edge
    cls = classify_ctbs(y, np.full((32, 64), 128, np.int32),
                        np.full((32, 64), 128, np.int32), 64,
                        prev_y=y.copy())
    assert cls["stationary_edge"].any()
    d = qp_class_delta(cls)
    assert d[cls["stationary_edge"]].max() < 0


def test_qpm_stream_with_classes_decodes():
    """QPM + content classes end-to-end: per-CTB cu_qp_delta stream must
    still decode bit-exactly against the encoder recon."""
    fr = _quadrant_frame()
    cfg = EncoderConfig(width=128, height=128, qp=34, intra_period=-1,
                        improve_sharpness=True,
                        scene_change_detection=False)
    enc = Encoder(cfg)
    stream, recons = enc.encode([fr, fr])
    decoded = decode_stream(stream)
    for r, d in zip(recons, decoded):
        np.testing.assert_array_equal(r.y, d.y)
    assert enc.last_classes["pct_dark"] > 0.1
