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


def test_hrd_buffering_period_and_pic_timing():
    """enable_hrd: SPS VUI carries hrd_parameters; each IDR AU gets a
    buffering_period SEI and every AU a pic_timing SEI; the stream still
    decodes bit-exact (SEI NALs are transparent to the decoder)."""
    import numpy as np
    from svt_hevc_tpu.bitstream import sei as sei_mod
    from svt_hevc_tpu.bitstream.bitwriter import ebsp_to_rbsp
    from svt_hevc_tpu.bitstream.nal import NalUnitType, split_annexb
    from svt_hevc_tpu.config import EncoderConfig
    from svt_hevc_tpu.decoder.decoder import decode_stream
    from svt_hevc_tpu.pipeline.encoder import Encoder
    from test_endtoend import make_frame

    frames = [make_frame(64, 64, "gradient", seed=s) for s in range(4)]
    cfg = EncoderConfig(width=64, height=64, qp=34, intra_period=1,
                        rate_control_mode=1, target_bitrate=200_000,
                        vbv_maxrate=250_000, vbv_bufsize=250_000,
                        enable_hrd=True, scene_change_detection=False)
    stream, recons = Encoder(cfg).encode(frames)
    bp = pt = 0
    for t, e in split_annexb(stream):
        if t == NalUnitType.PREFIX_SEI_NUT:
            for m in sei_mod.parse_sei_rbsp(ebsp_to_rbsp(e)):
                if m.payload_type == sei_mod.SEI_BUFFERING_PERIOD:
                    bp += 1
                elif m.payload_type == sei_mod.SEI_PIC_TIMING:
                    pt += 1
    assert bp == 2          # IDRs at frame 0 and 2 (intra_period=1)
    assert pt == 4          # every AU
    decoded = decode_stream(stream)
    for r, d in zip(recons, decoded):
        np.testing.assert_array_equal(r.y, d.y)


def test_hrd_random_access_output_delays():
    from svt_hevc_tpu.config import EncoderConfig
    from svt_hevc_tpu.decoder.decoder import decode_stream
    from svt_hevc_tpu.pipeline.encoder import Encoder
    from test_inter import moving_sequence
    import numpy as np

    frames = moving_sequence(64, 64, 9, dx=1, dy=1, seed=2)
    cfg = EncoderConfig(width=64, height=64, qp=34, pred_structure=2,
                        hierarchical_levels=2, intra_period=-1,
                        target_bitrate=300_000, enable_hrd=True)
    stream, recons = Encoder(cfg).encode(frames)
    decoded = decode_stream(stream)
    assert len(decoded) == len(recons)
    for r, d in zip(recons, decoded):
        np.testing.assert_array_equal(r.y, d.y)


def test_hrd_rate_size_rounding():
    from svt_hevc_tpu.bitstream.headers import hrd_rate_size
    from svt_hevc_tpu.config import EncoderConfig
    cfg = EncoderConfig(width=64, height=64, rate_control_mode=1,
                        target_bitrate=1_000_000, vbv_maxrate=1_000_000,
                        vbv_bufsize=2_000_000, enable_hrd=True)
    rate, size = hrd_rate_size(cfg)
    assert rate >= 1_000_000 and rate % 1024 == 0
    assert size >= 2_000_000 and size % 1024 == 0


def test_per_picture_metadata_and_eos():
    """Per-picture registered/unregistered user data SEIs, Dolby Vision
    RPU passthrough as NAL 62 (reference: EbPacketizationProcess.c
    :733-752), and the EOS NAL (codeEosNal)."""
    from svt_hevc_tpu.bitstream import sei as sei_mod
    from svt_hevc_tpu.bitstream.nal import NalUnitType, split_annexb
    from svt_hevc_tpu.decoder.decoder import decode_stream

    from svt_hevc_tpu.io.yuv import Frame
    rng = np.random.default_rng(5)
    y = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    u = np.full((32, 32), 128, np.uint8)
    fr = Frame(y=y, cb=u, cr=u.copy(),
               dv_rpu=b"\x19\x08rpu-payload",
               sei_t35=b"\xb5\x00\x3c\x00\x01\x04",
               sei_unreg=(bytes(range(16)), b"hello"))
    cfg = EncoderConfig(width=64, height=64, qp=32, intra_period=0,
                        dolby_vision_profile=81, code_eos_nal=True)
    stream, recons = Encoder(cfg).encode([fr])

    nals = split_annexb(stream)
    types = [t for t, _ in nals]
    assert NalUnitType.UNSPEC62 in types
    assert types[-1] == NalUnitType.EOS_NUT
    # RPU payload is carried verbatim (after the 2-byte NAL header)
    rpu = [bytes(e) for t, e in nals if t == NalUnitType.UNSPEC62][0]
    assert b"rpu-payload" in rpu
    # user data SEIs present
    msgs = [m for t, e in nals if t == NalUnitType.PREFIX_SEI_NUT
            for m in sei_mod.parse_sei_rbsp(bytes(e))]
    ptypes = [m.payload_type for m in msgs]
    assert sei_mod.SEI_USER_DATA_REGISTERED in ptypes
    assert sei_mod.SEI_USER_DATA_UNREGISTERED in ptypes
    # stream still decodes bit-exactly with the extra NALs present
    decoded = decode_stream(stream)
    np.testing.assert_array_equal(recons[0].y, decoded[0].y)


def test_filler_payload_sei():
    from svt_hevc_tpu.bitstream import sei as sei_mod
    msg = sei_mod.write_filler_payload(100)
    parsed = sei_mod.parse_sei_rbsp(msg + b"\x80")
    assert parsed[0].payload_type == sei_mod.SEI_FILLER_PAYLOAD
    assert parsed[0].payload == b"\xff" * 100
