"""CABAC engine roundtrip: encoder output must decode bit-exactly with the
normative decoding engine (H.265 9.3.4.3), across context/bypass/terminate
mixes, all QPs, and adversarial probability skews (carry propagation)."""

import random

from svt_hevc_tpu.bitstream.cabac import CabacDecoder, CabacEncoder
from svt_hevc_tpu.bitstream.contexts import Ctx, init_contexts, init_state


def roundtrip(script, qp=32):
    """script: list of ('ctx', idx, bin) | ('byp', bin) | ('bypn', val, n)."""
    enc = CabacEncoder(init_contexts(qp))
    for op in script:
        if op[0] == "ctx":
            enc.encode_bin(op[1], op[2])
        elif op[0] == "byp":
            enc.encode_bypass(op[1])
        else:
            enc.encode_bypass_bins(op[1], op[2])
    enc.encode_terminate(1)
    enc.finish()
    data = enc.data
    dec = CabacDecoder(data, init_contexts(qp))
    for op in script:
        if op[0] == "ctx":
            assert dec.decode_bin(op[1]) == op[2], op
        elif op[0] == "byp":
            assert dec.decode_bypass() == op[1], op
        else:
            assert dec.decode_bypass_bins(op[2]) == op[1], op
    assert dec.decode_terminate() == 1
    return data


def test_cabac_simple():
    roundtrip([("ctx", Ctx.SPLIT_CU, 1), ("ctx", Ctx.SPLIT_CU, 0),
               ("byp", 1), ("byp", 0), ("bypn", 0x155, 10)])


def test_cabac_empty():
    roundtrip([])


def test_cabac_random_mixes():
    rng = random.Random(42)
    for trial in range(30):
        qp = rng.randrange(0, 52)
        n = rng.randrange(1, 4000)
        script = []
        for _ in range(n):
            k = rng.randrange(10)
            if k < 6:
                script.append(("ctx", rng.randrange(Ctx.NUM), rng.randrange(2)))
            elif k < 9:
                script.append(("byp", rng.randrange(2)))
            else:
                nb = rng.randrange(1, 17)
                script.append(("bypn", rng.randrange(1 << nb), nb))
        roundtrip(script, qp)


def test_cabac_skewed_sequences():
    """Long runs of MPS then LPS — stresses carry/renorm paths."""
    for pattern in ([1] * 500 + [0], [0] * 500 + [1], [1, 0] * 300,
                    [1] * 100 + [0] * 100 + [1] * 100):
        script = [("ctx", Ctx.SIG, b) for b in pattern]
        roundtrip(script)


def test_cabac_all_bypass_ones():
    """All-ones bypass creates 0xFF cascades -> carry buffering."""
    roundtrip([("byp", 1)] * 2000)
    roundtrip([("byp", 0)] * 2000)


def test_cabac_mid_terminate_zero():
    """terminate(0) bins interleaved (end_of_slice_segment_flag per CTU)."""
    qp = 30
    enc = CabacEncoder(init_contexts(qp))
    for i in range(50):
        enc.encode_bin(Ctx.SPLIT_CU, i & 1)
        enc.encode_terminate(0)
    enc.encode_terminate(1)
    enc.finish()
    dec = CabacDecoder(enc.data, init_contexts(qp))
    for i in range(50):
        assert dec.decode_bin(Ctx.SPLIT_CU) == (i & 1)
        assert dec.decode_terminate() == 0
    assert dec.decode_terminate() == 1


def test_init_state_matches_spec_formula():
    # hand-computed example: initValue 154 (CNU) at qp 26:
    # slope = 9*5-45 = 0, offset = (10<<3)-16 = 64 -> pre = 64 -> state 0, mps 1
    assert init_state(154, 26) == 1
    # initValue 63 at qp 0: slope=3*5-45=-30, offset=(15<<3)-16=104
    # pre = clip(104 + 0) = 104 -> mps 1, pState 40
    assert init_state(63, 0) == (40 << 1 | 1)


def test_cabac_output_is_compact():
    """Encoding 1000 highly-probable MPS bins should cost well under 200 bits."""
    qp = 32
    enc = CabacEncoder(init_contexts(qp))
    for _ in range(1000):
        enc.encode_bin(Ctx.SPLIT_CU, enc.ctx[Ctx.SPLIT_CU] & 1)  # always MPS
    enc.encode_terminate(1)
    enc.finish()
    assert len(enc.data) < 30
