"""Encoder-integrated mesh picture parallelism (cfg.mesh_pictures):
the hierarchy's non-reference leaves run as ONE vmapped fused graph
sharded over the 8-device CPU mesh, and the emitted stream must be
BYTE-IDENTICAL to the single-device path (the reference's
pictures-in-flight scaling, EbEncHandle.c:1645, as a scheduling choice
that can never change the bitstream)."""

import numpy as np

import svt_hevc_tpu.parallel.pictures as pics
from svt_hevc_tpu.config import EncoderConfig
from svt_hevc_tpu.decoder.decoder import decode_stream
from svt_hevc_tpu.pipeline.encoder import Encoder

from test_inter import moving_sequence


def _encode(cfg, frames):
    enc = Encoder(cfg)
    data = b""
    recons = []
    for au in enc.encode_pictures(iter(frames)):
        data += au.data
        recons.append(au.recon)
    return enc.headers() + data, recons


def test_mesh_pictures_bit_identical_hl1():
    frames = moving_sequence(128, 64, 13, dx=2, dy=1, seed=31)
    base = EncoderConfig(width=128, height=64, qp=32, intra_period=-1,
                         hierarchical_levels=1, fps_num=25,
                         scene_change_detection=False)
    ref_stream, _ = _encode(base, frames)
    pics._batched_graphs.cache_clear()
    mesh_stream, recons = _encode(base.replace(mesh_pictures=True), frames)
    assert mesh_stream == ref_stream
    # the batched dispatch actually ran (graph cache was populated)
    assert pics._batched_graphs.cache_info().currsize >= 1
    # and the stream decodes bit-exactly against its recon
    decoded = decode_stream(mesh_stream)
    assert len(decoded) == len(frames)
    for r, d in zip(recons, decoded):
        np.testing.assert_array_equal(np.asarray(r.y), d.y)


def test_mesh_pictures_bit_identical_hl2_idr():
    """hl=2 with a mid-stream IDR: the flush-before-IDR path and partial
    batches (padded lanes) must preserve byte identity."""
    frames = moving_sequence(128, 64, 14, dx=1, dy=2, seed=32)
    base = EncoderConfig(width=128, height=64, qp=34, intra_period=7,
                         hierarchical_levels=2, fps_num=25,
                         scene_change_detection=False)
    ref_stream, _ = _encode(base, frames)
    mesh_stream, _ = _encode(base.replace(mesh_pictures=True), frames)
    assert mesh_stream == ref_stream
