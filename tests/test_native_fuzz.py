"""Fuzz the native C++ host library ONLY (no XLA): truncation, bit-flip,
and garbage sweeps through the native parser and entropy decoder. This is
the suite `make test-asan` runs with the -fsanitize=address build preloaded
(the ASAN packaging analog, reference CMakeLists.txt:160,200-206) — the
XLA-driving fuzz suite (tests/test_fuzz.py) cannot run under a preloaded
libasan, and everything it would catch in C++ is reachable from here.

Contract under fuzzing: every call either succeeds or raises RocJpegError;
never a crash, never an out-of-bounds access (ASAN-checked), never a
non-framework exception from the native boundary."""

import numpy as np
import pytest

from rocjpeg_tpu.core.bitstream import JpegStreamParser
from rocjpeg_tpu.runtime import native
from rocjpeg_tpu.status import RocJpegError
from rocjpeg_tpu.testing import encoder

pytestmark = pytest.mark.skipif(not native.AVAILABLE,
                                reason="native library not built")


@pytest.fixture(scope="module")
def base_blob():
    return encoder.encode_planes(
        encoder.random_planes("420", 136, 104, seed=77), "420",
        restart_interval=3)


def _native_roundtrip(data: bytes):
    """Drive every native entry point on one blob: parse (if built),
    segment-length scan, row packing, and the scan decoder."""
    p = JpegStreamParser().parse(data)
    out = native.decode_scan(p)
    if native.PACK_AVAILABLE:
        scan = p.slice_data
        lens, found = native.seg_lens(scan, 1 << 12)
        nseg = max(1, min(found, 1 << 12))
        n_words = (int(lens.max()) + 3) // 4 + 2 if lens.size else 4
        rows = -(-nseg // 128)
        words = np.zeros((rows, n_words, 128), np.uint32)
        native.pack_rows(scan, words, 0, n_words, nseg)
    return out


def test_truncation_sweep(base_blob):
    n = len(base_blob)
    for cut in list(range(0, 64)) + list(range(64, n, max(1, n // 96))):
        blob = base_blob[:cut]
        try:
            _native_roundtrip(blob)
        except RocJpegError:
            pass


def test_bitflip_sweep(base_blob):
    rng = np.random.default_rng(5)
    raw = np.frombuffer(base_blob, np.uint8).copy()
    for _ in range(128):
        pos = int(rng.integers(0, raw.size))
        bit = 1 << int(rng.integers(0, 8))
        mut = raw.copy()
        mut[pos] ^= bit
        try:
            _native_roundtrip(mut.tobytes())
        except RocJpegError:
            pass


def test_native_parse_garbage():
    if not native.PARSE_AVAILABLE:
        pytest.skip("native parser not built")
    rng = np.random.default_rng(11)
    blobs = [b"", b"\xff", b"\xff\xd8", b"\xff\xd8\xff",
             b"\xff\xd8" + b"\xff" * 500,
             bytes(rng.integers(0, 256, 1024, np.uint8)),
             b"\xff\xd8" + bytes(rng.integers(0, 256, 2048, np.uint8))]
    for blob in blobs:
        try:
            native.parse_header(blob)
        except RocJpegError:
            pass


def test_native_decode_hostile_tables(base_blob):
    """Corrupt Huffman value tables after parse: the native decoder must
    fail cleanly (or decode) without reading out of bounds."""
    rng = np.random.default_rng(13)
    for _ in range(16):
        p = JpegStreamParser().parse(base_blob)
        t = p.huffman_tables[int(rng.integers(0, 2))]
        arr = np.asarray(t.ac_values, np.uint8).copy()
        arr[rng.integers(0, arr.size)] = rng.integers(0, 256)
        t.ac_values = arr.tolist() if isinstance(t.ac_values, list) else arr
        try:
            native.decode_scan(p)
        except RocJpegError:
            pass
