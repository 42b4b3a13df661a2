"""rocjpeg_tpu — a TPU-native JPEG decode framework.

A from-scratch rebuild of the capability surface of AMD's rocJPEG SDK
(reference at /root/reference) for TPUs: everything rocJPEG delegates to the
VCN fixed-function ASIC — Huffman entropy decode, dequantization, 8x8 IDCT,
chroma upsampling, color conversion — is implemented in software
(JAX/XLA/Pallas on-device; C++ on the host), exposed through a session API
mirroring the 9-function C API (api/rocjpeg.h:204-343).
"""

from .status import RocJpegError, Status, get_error_name
from .types import (Backend, ChromaSubsampling, CropRectangle, DecodedImage,
                    DecodeParams, ImageInfo, OutputFormat, TpuDecodeSpec)

__version__ = "0.1.0"
