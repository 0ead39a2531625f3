"""Level/tier derivation (spec Tables A.6/A.8; reference analogue:
per-level tile caps EbEncHandle.c:69-76 and VerifySettings :2134)."""

import numpy as np
import pytest

from svt_hevc_tpu.config import EncoderConfig
from svt_hevc_tpu.level import derive_level


def _cfg(**kw):
    return EncoderConfig(width=kw.pop("width", 1920),
                         height=kw.pop("height", 1080), qp=32, **kw)


def test_level_ladder():
    assert derive_level(_cfg(width=352, height=288, fps_num=30))[0].name == "2"
    assert derive_level(_cfg(fps_num=50))[0].name == "4.1"
    assert derive_level(_cfg(width=3840, height=2160,
                             fps_num=60))[0].name == "5.1"
    assert derive_level(_cfg(width=7680, height=4320,
                             fps_num=50))[0].name == "6.1"


def test_high_tier_from_bitrate():
    lv, high = derive_level(_cfg(fps_num=50, rate_control_mode=1,
                                 target_bitrate=25_000_000))
    assert high and lv.name == "4.1"


def test_tiles_push_level_up():
    lv, _ = derive_level(_cfg(fps_num=30, tile_columns=6, tile_rows=6))
    assert lv.name == "5"     # 4.x allows only 5x5 tiles


def test_tile_col_row_caps_not_swapped():
    # spec Table A.6 / reference EbEncHandle.c:69-76: level 5.x allows at
    # most 10 tile columns but 11 tile rows; 11 columns needs level 6
    lv, _ = derive_level(_cfg(fps_num=30, tile_columns=11, tile_rows=1))
    assert lv.name == "6"
    lv, _ = derive_level(_cfg(fps_num=30, tile_columns=1, tile_rows=11))
    assert lv.name == "5"


def test_over_level_62_rejected():
    with pytest.raises(ValueError):
        EncoderConfig(width=8192, height=4320, qp=32, fps_num=130).validate()


def test_level_idc_signalled():
    from svt_hevc_tpu.bitstream.bitwriter import ebsp_to_rbsp
    from svt_hevc_tpu.pipeline.encoder import Encoder
    from svt_hevc_tpu.io.yuv import Frame
    y = np.zeros((96, 128), np.uint8)
    u = np.zeros((48, 64), np.uint8)
    cfg = EncoderConfig(width=128, height=96, qp=32, fps_num=30)
    stream, _ = Encoder(cfg).encode([Frame(y=y, cb=u, cr=u.copy())])
    # level 1: 128*96=12288 luma samples, 30fps -> idc 30 in the SPS PTL
    lv, _ = derive_level(cfg)
    assert lv.idc == 30
    assert bytes([lv.idc]) in stream[:128]
