"""Independent conformance oracle: decode Annex-B HEVC with libde265.

The reference project validates every encode by decoding it with the HM
reference decoder and comparing the decode against the encoder's own
reconstruction (Tests/SVT-HEVC_FunctionalTests.py:641,1087 —
``filecmp.cmp('decoded.yuv', 'recon.yuv')``).  Our in-repo decoder shares
traversal code with the encoder, so it cannot catch a shared misreading of
the spec.  libde265 is a fully independent third-party HEVC decoder; this
module binds its stable C API via ctypes (no headers needed) and exposes

    decode_annexb(data) -> list of (y, cb, cr) numpy planes in output order

Supports Main (8-bit) and Main10 4:2:0 streams — the bulk of the test
matrix.  ``available()`` gates tests so they skip cleanly where the shared
library is absent.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_LIB_NAMES = ("libde265.so.0", "libde265.so", "libde265.0.dylib", "libde265.dylib")

_lib = None
_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    for name in _LIB_NAMES:
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            lib = None
    if lib is None:
        found = ctypes.util.find_library("de265")
        if found:
            try:
                lib = ctypes.CDLL(found)
            except OSError:
                lib = None
    if lib is None:
        _load_failed = True
        return None

    # signatures per libde265/de265.h (v1.0.x, stable API)
    lib.de265_new_decoder.restype = ctypes.c_void_p
    lib.de265_new_decoder.argtypes = []
    lib.de265_push_data.restype = ctypes.c_int
    lib.de265_push_data.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_int, ctypes.c_int64,
                                    ctypes.c_void_p]
    lib.de265_flush_data.restype = ctypes.c_int
    lib.de265_flush_data.argtypes = [ctypes.c_void_p]
    lib.de265_decode.restype = ctypes.c_int
    lib.de265_decode.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_int)]
    lib.de265_get_next_picture.restype = ctypes.c_void_p
    lib.de265_get_next_picture.argtypes = [ctypes.c_void_p]
    lib.de265_get_image_width.restype = ctypes.c_int
    lib.de265_get_image_width.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.de265_get_image_height.restype = ctypes.c_int
    lib.de265_get_image_height.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.de265_get_image_plane.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.de265_get_image_plane.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                          ctypes.POINTER(ctypes.c_int)]
    lib.de265_get_bits_per_pixel.restype = ctypes.c_int
    lib.de265_get_bits_per_pixel.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.de265_get_chroma_format.restype = ctypes.c_int
    lib.de265_get_chroma_format.argtypes = [ctypes.c_void_p]
    lib.de265_free_decoder.restype = ctypes.c_int
    lib.de265_free_decoder.argtypes = [ctypes.c_void_p]
    lib.de265_get_error_text.restype = ctypes.c_char_p
    lib.de265_get_error_text.argtypes = [ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    """True when libde265 can be loaded."""
    return _load() is not None


_DE265_OK = 0
# de265_error codes that mean "keep pumping", per de265.h (verified via
# de265_get_error_text on the installed library; codes 4/5 are genuine
# decode errors — COEFFICIENT_OUT_OF_IMAGE_BOUNDS / CHECKSUM_MISMATCH —
# and must stay fatal)
_WAITING_INPUT = 13         # DE265_ERROR_WAITING_FOR_INPUT_DATA
_IMAGE_BUFFER_FULL = 9      # DE265_ERROR_IMAGE_BUFFER_FULL


def _copy_plane(lib, img, channel: int) -> np.ndarray:
    w = lib.de265_get_image_width(img, channel)
    h = lib.de265_get_image_height(img, channel)
    stride = ctypes.c_int(0)
    ptr = lib.de265_get_image_plane(img, channel, ctypes.byref(stride))
    bpp = lib.de265_get_bits_per_pixel(img, channel)
    nbytes = stride.value * h
    raw = np.ctypeslib.as_array(ptr, shape=(nbytes,))
    if bpp > 8:
        rows = raw.view(np.uint16).reshape(h, stride.value // 2)[:, :w]
    else:
        rows = raw.reshape(h, stride.value)[:, :w]
    return rows.astype(np.int32).copy()


def decode_annexb(data: bytes, max_pictures: int = 4096):
    """Decode an Annex-B byte stream; return planes in output order.

    Returns a list of (y, cb, cr) int32 arrays (cb/cr None for mono).
    Raises RuntimeError on any decode error — a stream the independent
    decoder rejects is a conformance failure.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("libde265 not available")
    ctx = lib.de265_new_decoder()
    if not ctx:
        raise RuntimeError("de265_new_decoder failed")
    out = []
    try:
        buf = ctypes.create_string_buffer(data, len(data))
        err = lib.de265_push_data(ctx, buf, len(data), 0, None)
        if err != _DE265_OK:
            raise RuntimeError(f"de265_push_data: {_errtext(lib, err)}")
        err = lib.de265_flush_data(ctx)
        if err != _DE265_OK:
            raise RuntimeError(f"de265_flush_data: {_errtext(lib, err)}")
        more = ctypes.c_int(1)
        while more.value:
            err = lib.de265_decode(ctx, ctypes.byref(more))
            if err not in (_DE265_OK, _WAITING_INPUT, _IMAGE_BUFFER_FULL):
                raise RuntimeError(f"de265_decode: {_errtext(lib, err)}")
            while True:
                img = lib.de265_get_next_picture(ctx)
                if not img:
                    break
                y = _copy_plane(lib, img, 0)
                chroma = lib.de265_get_chroma_format(img)
                if chroma == 0:   # mono
                    out.append((y, None, None))
                else:
                    out.append((y, _copy_plane(lib, img, 1),
                                _copy_plane(lib, img, 2)))
                if len(out) >= max_pictures:
                    more.value = 0
                    break
            if err == _WAITING_INPUT and more.value:
                # end of stream and decoder still wants data: done
                break
    finally:
        lib.de265_free_decoder(ctx)
    return out


def _errtext(lib, err: int) -> str:
    try:
        txt = lib.de265_get_error_text(err)
        return f"{err} ({txt.decode('ascii', 'replace')})"
    except Exception:
        return str(err)
