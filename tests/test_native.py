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


def test_native_parser_matches_python():
    """The C++ parser must produce field-identical params and identical
    error strings vs the Python oracle, across the corpus, synthetic CSS
    matrix, and malformed inputs."""
    import numpy as np
    import pytest
    from rocjpeg_tpu.core import bitstream as bs
    from rocjpeg_tpu.runtime import native
    from rocjpeg_tpu.status import RocJpegError
    from rocjpeg_tpu.testing import encoder

    if not getattr(native, "PARSE_AVAILABLE", False):
        pytest.skip("native parser not built")

    blobs = []
    for css in ("444", "440", "422", "420", "411", "400"):
        blobs.append(encoder.encode_planes(
            encoder.random_planes(css, 96, 64, seed=1), css,
            restart_interval=3))
    import glob
    for path in sorted(glob.glob("/root/reference/data/images/*.jpg")):
        blobs.append(open(path, "rb").read())
    # Malformed variants of the first blob.
    bad = [b"", b"\xff\xd8", blobs[0][:40], blobs[0][:200],
           blobs[0].replace(b"\xff\xc0", b"\xff\xc2", 1)]

    def py_parse(data):
        parser = bs.JpegStreamParser()
        # call the python path directly by bypassing the native hook
        orig = bs._NATIVE_PARSER
        bs._NATIVE_PARSER = (None,)
        try:
            return parser.parse(data)
        finally:
            bs._NATIVE_PARSER = orig

    for blob in blobs:
        a = py_parse(blob)
        b = native.parse_header(blob)
        assert (a.picture_width, a.picture_height, a.num_components) == \
               (b.picture_width, b.picture_height, b.num_components)
        assert a.chroma_subsampling == b.chroma_subsampling
        assert a.restart_interval == b.restart_interval
        assert a.num_mcus == b.num_mcus
        assert a.slice_data == b.slice_data
        for ca, cb in zip(a.components, b.components):
            assert dataclasses_equal(ca, cb)
        for sa, sc in zip(a.scan_components, b.scan_components):
            assert dataclasses_equal(sa, sc)
        np.testing.assert_array_equal(a.quantiser_tables, b.quantiser_tables)
        np.testing.assert_array_equal(a.load_quantiser_table,
                                      b.load_quantiser_table)
        np.testing.assert_array_equal(a.load_huffman_table,
                                      b.load_huffman_table)
        for ta, tb in zip(a.huffman_tables, b.huffman_tables):
            for f in ("num_dc_codes", "dc_values", "num_ac_codes", "ac_values"):
                np.testing.assert_array_equal(getattr(ta, f), getattr(tb, f))

    for blob in bad:
        try:
            py_parse(blob)
            py_err = None
        except RocJpegError as e:
            py_err = str(e)
        try:
            native.parse_header(blob)
            nat_err = None
        except RocJpegError as e:
            nat_err = str(e)
        assert (py_err is None) == (nat_err is None), (py_err, nat_err)


def dataclasses_equal(a, b):
    import dataclasses
    return dataclasses.asdict(a) == dataclasses.asdict(b)


def _patch_sof_sampling(data: bytes, comp: int, samp: int) -> bytes:
    """Return a copy of ``data`` with SOF0 component ``comp``'s sampling
    byte (h<<4|v) replaced by ``samp``."""
    # Walk marker segments from SOI so we find the real SOF0, not a stray
    # 0xFFC0 byte pair inside another segment.
    i, n = 2, len(data)
    while i + 4 <= n:
        assert data[i] == 0xFF
        marker = data[i + 1]
        if marker == 0xC0:
            break
        i += 2 + int.from_bytes(data[i + 2:i + 4], "big")
    else:
        raise AssertionError("no SOF0")
    # marker(2) len(2) precision(1) height(2) width(2) ncomp(1) then
    # 3 bytes per component: id, sampling, quant_sel.
    off = i + 10 + 3 * comp + 1
    return data[:off] + bytes([samp]) + data[off + 1:]


def test_unknown_subsampling_parses_not_crashes(corpus):
    """Regression: unclassifiable sampling patterns must parse to
    CSS_UNKNOWN in BOTH parsers — never raise (reference parser.cpp:432-470
    treats UNKNOWN as a value; rejection happens at decode,
    vaapi_decoder.cpp:634-637)."""
    from rocjpeg_tpu import api
    from rocjpeg_tpu.types import ChromaSubsampling

    if not getattr(native, "PARSE_AVAILABLE", False):
        pytest.skip("native parser not built")

    data = _patch_sof_sampling(corpus["mug_420"], 0, 0x31)  # h=3, v=1
    p_nat = native.parse_header(data)
    assert p_nat.chroma_subsampling == ChromaSubsampling.CSS_UNKNOWN
    # Full API path: stream parses, decode rejects with a status error.
    s = api.JpegStream(data)
    assert s.params.chroma_subsampling == ChromaSubsampling.CSS_UNKNOWN


def test_sof_sampling_fuzz_differential(corpus):
    """Sweep every plausible SOF sampling byte for each component and
    assert the native and Python parsers agree on outcome: identical
    subsampling classification, or identical error-vs-success."""
    from rocjpeg_tpu.core import bitstream as bs

    if not getattr(native, "PARSE_AVAILABLE", False):
        pytest.skip("native parser not built")

    def py_parse(data):
        orig = bs._NATIVE_PARSER
        bs._NATIVE_PARSER = (None,)
        try:
            return bs.JpegStreamParser().parse(data)
        finally:
            bs._NATIVE_PARSER = orig

    base = corpus["mug_420"]
    for comp in range(3):
        for h in range(0, 6):
            for v in range(0, 6):
                data = _patch_sof_sampling(base, comp, (h << 4) | v)
                try:
                    a = py_parse(data)
                    py_out = ("ok", a.chroma_subsampling, a.num_mcus)
                except RocJpegError as e:
                    py_out = ("err", str(e))
                try:
                    b = native.parse_header(data)
                    nat_out = ("ok", b.chroma_subsampling, b.num_mcus)
                except RocJpegError as e:
                    nat_out = ("err", str(e))
                assert py_out == nat_out, (comp, h, v, py_out, nat_out)


# ---------------------------------------------------------------------------
# SIMD index walkers (ASAN-covered here: this suite runs under
# `make test-asan`, and the gather-heavy AVX2/AVX-512 walkers are exactly
# the code that wants address-sanitizer eyes).
# ---------------------------------------------------------------------------

def _dri0_params(w, h, seed):
    blob = encoder.encode_planes(
        encoder.random_planes("420", w, h, seed=seed), "420",
        restart_interval=0)
    return JpegStreamParser().parse(blob)


def test_index_scan8_asan_covered():
    plist = [_dri0_params(128, 96, 50 + s) for s in range(8)]
    out = native.index_scan8(plist, 64)
    if out is None:
        pytest.skip("AVX2 walker unavailable")
    for p, got in zip(plist, out):
        ref = native.index_scan(p, 64)
        for x, y in zip(ref, got):
            np.testing.assert_array_equal(x, y)


def test_index_scan16_asan_covered():
    plist = [_dri0_params(128, 96, 70 + s) for s in range(16)]
    out = native.index_scan16(plist, 64)
    if out is None:
        pytest.skip("AVX-512 walker unavailable")
    for p, got in zip(plist, out):
        ref = native.index_scan(p, 64)
        for x, y in zip(ref, got):
            np.testing.assert_array_equal(x, y)
