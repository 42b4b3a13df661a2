"""Native (C++) entropy decoder equivalence tests: must match the Python
oracle bit-for-bit on every input, including restart-segmented and
pathological streams."""

import numpy as np
import pytest

from rocjpeg_tpu.core import entropy
from rocjpeg_tpu.core.bitstream import JpegStreamParser
from rocjpeg_tpu.runtime import host_decode, native
from rocjpeg_tpu.status import RocJpegError
from rocjpeg_tpu.testing import encoder

pytestmark = pytest.mark.skipif(not native.AVAILABLE,
                                reason="native library not built")


def _check(data: bytes):
    p = JpegStreamParser().parse(data)
    ref = entropy.decode_scan(p)
    nat = native.decode_scan(p)
    assert len(ref) == len(nat)
    for a, b in zip(ref, nat):
        np.testing.assert_array_equal(a, b)


def test_corpus_equivalence(corpus):
    for data in corpus.values():
        _check(data)


@pytest.mark.parametrize("css", ["444", "440", "422", "420", "411", "400"])
@pytest.mark.parametrize("ri", [0, 1, 5])
def test_matrix_equivalence(css, ri):
    data = encoder.encode_planes(
        encoder.random_planes(css, 136, 104, seed=31), css, restart_interval=ri)
    _check(data)


def test_dense_stuffing_equivalence():
    rng = np.random.default_rng(6)
    coeffs = [rng.choice([-1023, 1023, -255, 255], (12, 16, 64)).astype(np.int32)]
    data = encoder.encode_coefficients(coeffs, encoder.SAMPLING["400"], 128, 96,
                                       [encoder.QTABLE_LUMA], [0],
                                       restart_interval=2)
    _check(data)


def test_native_rejects_truncated(corpus):
    data = corpus["mug_420"]
    p = JpegStreamParser().parse(data[:len(data) // 2])
    with pytest.raises(RocJpegError):
        native.decode_scan(p)


def test_batch_backend_threads(corpus):
    params = [JpegStreamParser().parse(d) for d in corpus.values()] * 2
    outs = host_decode.decode_coefficients_batch(params)
    assert len(outs) == len(params)
    for p, planes in zip(params, outs):
        ref = entropy.decode_scan(p)
        for a, b in zip(ref, planes):
            np.testing.assert_array_equal(a, b)
