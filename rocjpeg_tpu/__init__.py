"""rocjpeg_tpu — a TPU-native JPEG decode framework.

A from-scratch rebuild of the capability surface of AMD's rocJPEG SDK
(reference at /root/reference) for TPUs: everything rocJPEG delegates to the
VCN fixed-function ASIC — Huffman entropy decode, dequantization, 8x8 IDCT,
chroma upsampling, color conversion — is implemented in software
(JAX/XLA/Pallas on-device; C++ on the host), exposed through a session API
mirroring the 9-function C API (api/rocjpeg.h:204-343).
"""

import os as _os

# The wave entropy decoder is a large XLA program (minutes of cold compile on
# a remote-compile TPU); persist compiled executables across processes.
# Opt out with ROCJPEG_TPU_NO_COMPILE_CACHE=1 or point the dir elsewhere.
if not _os.environ.get("ROCJPEG_TPU_NO_COMPILE_CACHE"):
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/rjt_xla_cache"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from .status import RocJpegError, Status, get_error_name
from .types import (Backend, ChromaSubsampling, CropRectangle, DecodedImage,
                    DecodeParams, ImageInfo, OutputFormat, TpuDecodeSpec)

__version__ = "0.5.0"
