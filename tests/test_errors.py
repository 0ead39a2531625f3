"""Error-code taxonomy (reference: Source/API/EbErrorCodes.h,
EbErrorHandling.h:15): stable numeric codes surfaced through the API and
its error callback."""

import numpy as np
import pytest

from svt_hevc_tpu.config import EncoderConfig
from svt_hevc_tpu.errors import EncoderError, ErrorCode, classify


def test_codes_stable_and_grouped():
    assert int(ErrorCode.OK) == 0
    assert 0x100 <= int(ErrorCode.BAD_PARAMETER) < 0x200
    assert 0x300 <= int(ErrorCode.DEVICE_OOM) < 0x400
    assert 0x500 <= int(ErrorCode.BITSTREAM_DESYNC) < 0x600


def test_classify_maps_exceptions():
    assert classify(ValueError("x")) == ErrorCode.BAD_PARAMETER
    assert classify(NotImplementedError("y")) == ErrorCode.UNSUPPORTED_FORMAT
    assert classify(RuntimeError("TMVP collocated motion ...")) \
        == ErrorCode.PIPELINE_ORDERING
    assert classify(MemoryError()) == ErrorCode.DEVICE_OOM
    e = EncoderError(ErrorCode.LEVEL_CONSTRAINT, "tiles", "config")
    assert classify(e) == ErrorCode.LEVEL_CONSTRAINT
    assert "LEVEL_CONSTRAINT" in str(e)


def test_send_picture_validates_input():
    from svt_hevc_tpu.api import EncoderHandle
    from svt_hevc_tpu.io.yuv import Frame

    h = EncoderHandle(EncoderConfig(width=64, height=64, qp=32))
    bad = Frame(y=np.zeros((256, 256), np.uint8),
                cb=np.zeros((128, 128), np.uint8),
                cr=np.zeros((128, 128), np.uint8))
    with pytest.raises(EncoderError) as ei:
        h.send_picture(bad)
    assert ei.value.code == ErrorCode.INPUT_FORMAT
    h.send_eos()
    assert h.get_packet(timeout=60) is None
    assert h.error_code == ErrorCode.OK


def test_handle_surfaces_code_and_callback():
    from svt_hevc_tpu.api import EncoderHandle
    from svt_hevc_tpu.io.yuv import Frame

    h = EncoderHandle(EncoderConfig(width=64, height=64, qp=32))
    seen = []
    h.set_error_callback(lambda code, exc: seen.append(code))
    # a frame whose planes break inside the pipeline (None chroma) ->
    # worker-thread exception surfaced with a taxonomy code
    bad = Frame(y=np.zeros((64, 64), np.uint8), cb=None, cr=None)
    h.send_picture(bad)
    h.send_eos()
    with pytest.raises(BaseException):
        while h.get_packet(timeout=60) is not None:
            pass
    assert h.error_code != ErrorCode.OK
    assert seen and seen[0] == h.error_code
