"""svt_hevc_tpu — a TPU-native HEVC (H.265) encoder built from scratch.

A JAX/XLA/Pallas re-design of the capabilities of SVT-HEVC
(reference: OpenVisualCloud/SVT-HEVC). The pixel-parallel compute path
(analysis, intra/inter prediction, transforms, quantization, in-loop
filters, distortion metrics) runs as batched JAX/Pallas programs on TPU;
the irreducibly sequential entropy layer (CABAC bin coding) runs on the
host (Python reference backend + native C backend), tile-parallel, exactly
mirroring the reference's per-tile entropy design
(reference: Source/Lib/Codec/EbEntropyCodingProcess.c:313).

Public API (analogue of Source/API/EbApi.h):
    from svt_hevc_tpu import Encoder, EncoderConfig
    enc = Encoder(EncoderConfig(width=..., height=..., qp=32))
    stream: bytes = enc.encode(frames)         # Annex-B byte stream

Streaming API (EbH265EncSendPicture / EbH265GetPacket analogue):
    from svt_hevc_tpu import EncoderHandle
    h = EncoderHandle(cfg); h.send_picture(f); ...; h.send_eos()
    for pkt in h.packets(): out.write(pkt.data)
"""

import os as _os

# Persistent XLA compilation cache: first-time compiles of the batched
# encode graphs cost minutes on a tunneled TPU; cached reloads are ~ms.
# The env var alone is not honored by this JAX build, so set the config
# directly. (Overridable / disable with JAX_COMPILATION_CACHE_DIR="".)
_cache = _os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.expanduser("~/.cache/svt_hevc_tpu_jax"))
if _cache:
    import jax as _jax
    if _jax.config.jax_compilation_cache_dir is None:
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from .api import EncoderHandle, Packet
from .config import EncoderConfig
from .pipeline.encoder import Encoder

__version__ = "0.1.0"

__all__ = ["Encoder", "EncoderConfig", "EncoderHandle", "Packet",
           "__version__"]
