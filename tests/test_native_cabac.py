"""Native C CABAC backend: bit-exact equivalence with the Python reference
backend (the project analogue of the reference asm_test,
Tests/SVT-HEVC_FunctionalTests.py:830)."""

import numpy as np
import pytest

from svt_hevc_tpu.bitstream.cabac import CabacDecoder, CabacEncoder
from svt_hevc_tpu.bitstream.contexts import Ctx, init_contexts
from svt_hevc_tpu.bitstream.recorder import CabacRecorder
from svt_hevc_tpu.native import cabac_encode_ops, native_cabac_lib


def _random_ops(seed, n=3000):
    rng = np.random.default_rng(seed)
    rec = CabacRecorder()
    for _ in range(n):
        k = rng.integers(0, 20)
        if k < 12:
            rec.encode_bin(int(rng.integers(0, Ctx.NUM)), int(rng.integers(0, 2)))
        elif k < 16:
            rec.encode_bypass(int(rng.integers(0, 2)))
        elif k < 19:
            nbits = int(rng.integers(1, 20))
            rec.encode_bypass_bins(int(rng.integers(0, 1 << nbits)), nbits)
        else:
            rec.encode_terminate(0)
    rec.encode_terminate(1)
    return rec


def _python_encode(rec, ctx):
    enc = CabacEncoder(list(ctx))
    for kind, a, v in rec.iter_ops():
        if kind == 0:
            enc.encode_bin(a, v)
        elif kind == 1:
            enc.encode_bypass(v)
        elif kind == 2:
            enc.encode_bypass_bins(v, a)
        else:
            enc.encode_terminate(v)
    enc.finish()
    return enc.data


def test_native_lib_builds():
    assert native_cabac_lib() is not None, "C toolchain must build the core"


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("qp", [20, 35])
def test_native_matches_python(seed, qp):
    rec = _random_ops(seed)
    ctx = init_contexts(qp, 0)
    want = _python_encode(rec, ctx)
    got = cabac_encode_ops(rec.op_array(), ctx)
    assert got is not None
    assert got == want


def test_native_stream_decodes():
    rec = CabacRecorder()
    rng = np.random.default_rng(9)
    bins = [(int(rng.integers(0, 40)), int(rng.integers(0, 2)))
            for _ in range(500)]
    for c, b in bins:
        rec.encode_bin(c, b)
    rec.encode_terminate(1)
    ctx = init_contexts(30, 0)
    data = cabac_encode_ops(rec.op_array(), ctx)
    dec = CabacDecoder(data, init_contexts(30, 0))
    for c, b in bins:
        assert dec.decode_bin(c) == b
    assert dec.decode_terminate() == 1


def test_pipeline_native_vs_python_identical():
    """Full frame: native pass-2 bytes == Python replay bytes."""
    from test_endtoend import make_frame
    from svt_hevc_tpu.config import EncoderConfig
    from svt_hevc_tpu.pipeline import encoder as pipe
    frame = make_frame(64, 64, "edges", seed=21)
    cfg = EncoderConfig(width=64, height=64, qp=33)
    s_native, _ = pipe.Encoder(cfg).encode([frame])
    # force the Python fallback
    orig = pipe.cabac_encode_ops
    pipe.cabac_encode_ops = lambda ops, ctx: None
    try:
        s_python, _ = pipe.Encoder(cfg).encode([frame])
    finally:
        pipe.cabac_encode_ops = orig
    assert s_native == s_python
