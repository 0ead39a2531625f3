"""SEI and VUI tests."""

import numpy as np

from svt_hevc_tpu.bitstream import sei
from svt_hevc_tpu.bitstream.bitwriter import BitReader, ebsp_to_rbsp
from svt_hevc_tpu.bitstream.nal import NalUnitType, split_annexb
from svt_hevc_tpu.config import EncoderConfig
from svt_hevc_tpu.decoder.decoder import decode_stream
from svt_hevc_tpu.pipeline.encoder import Encoder

from test_endtoend import make_frame


def test_sei_roundtrip():
    msgs = [
        sei.write_active_parameter_sets(),
        sei.write_content_light_level(1000, 400),
        sei.write_mastering_display(
            [(13250, 34500), (7500, 3000), (34000, 16000)],
            (15635, 16450), 10000000, 50),
        sei.write_recovery_point(0),
        sei.write_user_data_unregistered(b"\x01" * 16, b"svt-hevc-tpu"),
    ]
    rbsp = sei.sei_rbsp(msgs)
    parsed = sei.parse_sei_rbsp(rbsp)
    types = [m.payload_type for m in parsed]
    assert types == [sei.SEI_ACTIVE_PARAMETER_SETS,
                     sei.SEI_CONTENT_LIGHT_LEVEL,
                     sei.SEI_MASTERING_DISPLAY,
                     sei.SEI_RECOVERY_POINT,
                     sei.SEI_USER_DATA_UNREGISTERED]
    # content light level payload
    r = BitReader(parsed[1].payload)
    assert r.u(16) == 1000 and r.u(16) == 400
    assert parsed[4].payload[16:] == b"svt-hevc-tpu"


def test_stream_carries_sei_and_decodes():
    frame = make_frame(64, 64, "gradient")
    cfg = EncoderConfig(width=64, height=64, qp=33, max_cll=900, max_fall=300,
                        mastering_display=(13250, 34500, 7500, 3000, 34000,
                                           16000, 15635, 16450, 10000000, 50))
    enc = Encoder(cfg)
    stream, recons = enc.encode([frame])
    sei_nals = [e for t, e in split_annexb(stream)
                if t == NalUnitType.PREFIX_SEI_NUT]
    assert len(sei_nals) == 1
    msgs = sei.parse_sei_rbsp(ebsp_to_rbsp(sei_nals[0]))
    assert sei.SEI_CONTENT_LIGHT_LEVEL in [m.payload_type for m in msgs]
    assert sei.SEI_MASTERING_DISPLAY in [m.payload_type for m in msgs]
    # decoder skips SEI and still bit-matches
    dec = decode_stream(stream)[0]
    np.testing.assert_array_equal(recons[0].y, dec.y)


def test_vui_timing_in_sps():
    from svt_hevc_tpu.bitstream.headers import write_sps
    cfg = EncoderConfig(width=64, height=64, fps_num=60000, fps_den=1001).validate()
    data = write_sps(cfg)
    # the 64-bit timing field appears verbatim (byte-aligned or not, check
    # via bit scan): search for time_scale value 60000 in the bitstream
    bits = "".join(f"{b:08b}" for b in data)
    assert f"{1001:032b}" + f"{60000:032b}" in bits
