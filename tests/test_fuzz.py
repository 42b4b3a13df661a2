"""Robustness fuzz: mutated/truncated streams through the full public API
must either decode or raise RocJpegError — never a raw Python exception,
never a crash (the reference's whole-API contract: every failure is a
status code, api.cpp:168-174)."""

import numpy as np
import pytest

from rocjpeg_tpu import api
from rocjpeg_tpu.status import RocJpegError
from rocjpeg_tpu.testing import encoder
from rocjpeg_tpu.types import DecodeParams, OutputFormat


@pytest.fixture(scope="module")
def base_blob():
    return encoder.encode_planes(
        encoder.random_planes("420", 96, 64, seed=3), "420",
        restart_interval=2)


def _try_decode(dec, blob):
    try:
        stream = api.JpegStream(blob)
        img = dec.decode(stream, DecodeParams(OutputFormat.RGB))
        np.asarray(img.channel[0])
    except RocJpegError:
        pass  # expected failure mode


def test_truncation_sweep(base_blob):
    dec = api.Decoder(device_entropy="auto")
    n = len(base_blob)
    for cut in sorted({2, 4, 8, 16, 21, 64, 100, 150, 200, n // 4, n // 3,
                       n // 2, 2 * n // 3, n - 40, n - 7, n - 1}):
        _try_decode(dec, base_blob[:cut])


def test_bitflip_sweep(base_blob):
    dec = api.Decoder(device_entropy="auto")
    rng = np.random.default_rng(0)
    for _ in range(24):
        mutated = bytearray(base_blob)
        for _ in range(rng.integers(1, 4)):
            i = int(rng.integers(2, len(mutated)))
            mutated[i] ^= int(rng.integers(1, 256))
        _try_decode(dec, bytes(mutated))


def test_garbage_inputs():
    dec = api.Decoder()
    rng = np.random.default_rng(1)
    for blob in (b"", b"\x00", b"\xff\xd8", b"\xff" * 64,
                 rng.integers(0, 256, 512, dtype=np.uint8).tobytes(),
                 b"\xff\xd8\xff\xd9"):
        _try_decode(dec, blob)
