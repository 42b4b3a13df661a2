"""Caller-allocated destination buffers: ``Decoder.decode_into``.

The reference's core output contract is "write into user buffers honoring
per-channel pitch" (``RocJpegImage``, api/rocjpeg.h:104-107; pitch/offset
copy math src/rocjpeg_decoder.cpp:372-399). This suite pins the Python-API
equivalent across the full format x subsampling matrix with BOTH tight and
non-tight pitches, plus the error contract (missing channel 0, short
pitch, undersized buffer) and the C-ABI pointer path.
"""

import numpy as np
import pytest

from rocjpeg_tpu import api
from rocjpeg_tpu.core import golden
from rocjpeg_tpu.status import RocJpegError, Status
from rocjpeg_tpu.testing import encoder
from rocjpeg_tpu.types import DecodedImage, DecodeParams, OutputFormat

CSS_LIST = ["444", "440", "422", "420", "400"]
FORMATS = [OutputFormat.NATIVE, OutputFormat.YUV_PLANAR, OutputFormat.Y,
           OutputFormat.RGB, OutputFormat.RGB_PLANAR]


@pytest.fixture(scope="module")
def decoder():
    return api.Decoder()


@pytest.fixture(scope="module")
def fixtures():
    return {css: encoder.encode_planes(
        encoder.random_planes(css, 128, 96, seed=33), css, restart_interval=6)
        for css in CSS_LIST}


def _dims(arr):
    a = np.asarray(arr)
    if a.ndim == 1:
        a = a[None, :]
    return a.shape[0], a.shape[1] * a.itemsize


def _alloc_dest(ref, slack):
    """Caller-allocated DecodedImage: per-channel buffers with ``slack``
    extra bytes of pitch beyond the row size, poison-filled so untouched
    slack is detectable."""
    d = DecodedImage.empty()
    shapes = []
    for ci, (arr, _pitch) in enumerate(ref):
        h, row = _dims(arr)
        pitch = row + slack
        buf = np.full(h * pitch, 0xA5, np.uint8)
        d.channel[ci] = buf
        d.pitch[ci] = pitch
        shapes.append((h, row, pitch))
    return d, shapes


def _check_dest(d, shapes, ref):
    for ci, ((h, row, pitch), (arr, _p)) in enumerate(zip(shapes, ref)):
        buf = d.channel[ci]
        rows = buf.reshape(h, pitch)
        src = np.asarray(arr)
        if src.ndim == 1:
            src = src[None, :]
        np.testing.assert_array_equal(rows[:, :row],
                                      src.view(np.uint8).reshape(h, row),
                                      err_msg=f"ch={ci}")
        # Slack bytes past each row must be untouched (reference pitch
        # semantics: the decoder writes width bytes per row, nothing more).
        if pitch > row:
            assert (rows[:, row:] == 0xA5).all(), f"ch={ci} slack clobbered"


@pytest.mark.parametrize("fmt", FORMATS)
@pytest.mark.parametrize("css", CSS_LIST)
@pytest.mark.parametrize("slack", [0, 13])
def test_matrix_decode_into(decoder, fixtures, css, fmt, slack):
    data = fixtures[css]
    ref = golden.decode(data, fmt)
    dest, shapes = _alloc_dest(ref, slack)
    decoder.decode_into(api.JpegStream(data), dest,
                        DecodeParams(output_format=fmt))
    _check_dest(dest, shapes, ref)


def test_decode_into_batched(decoder, fixtures):
    blobs = [fixtures["420"], fixtures["422"]]
    refs = [golden.decode(b, OutputFormat.RGB) for b in blobs]
    dests, shapes = zip(*[_alloc_dest(r, 7) for r in refs])
    decoder.decode_into([api.JpegStream(b) for b in blobs], list(dests),
                        DecodeParams(output_format=OutputFormat.RGB))
    for d, s, r in zip(dests, shapes, refs):
        _check_dest(d, s, r)


def test_decode_into_skips_unallocated_chroma(decoder, fixtures):
    """Channels the caller left as None are skipped (the reference writes
    only caller-allocated channels) — except channel 0."""
    data = fixtures["420"]
    ref = golden.decode(data, OutputFormat.NATIVE)
    dest, shapes = _alloc_dest(ref, 0)
    for ci in range(1, 4):
        dest.channel[ci] = None
    decoder.decode_into(api.JpegStream(data), dest,
                        DecodeParams(output_format=OutputFormat.NATIVE))
    _check_dest(dest, shapes[:1], ref[:1])


def test_decode_into_with_crop(decoder, fixtures):
    """Crop + caller buffers: the buffer need only fit the CROPPED dims
    (reference ROI copy semantics, src/rocjpeg_decoder.cpp:372-399)."""
    from rocjpeg_tpu.types import CropRectangle
    data = fixtures["420"]
    crop = CropRectangle(left=16, top=8, right=16 + 64, bottom=8 + 64)
    params = DecodeParams(output_format=OutputFormat.RGB,
                          crop_rectangle=crop)
    ref = golden.decode(data, OutputFormat.RGB, crop)
    dest, shapes = _alloc_dest(ref, 9)
    decoder.decode_into(api.JpegStream(data), dest, params)
    _check_dest(dest, shapes, ref)


def test_decode_into_null_channel0(decoder, fixtures):
    dest = DecodedImage.empty()
    with pytest.raises(RocJpegError) as ei:
        decoder.decode_into(api.JpegStream(fixtures["420"]), dest)
    assert ei.value.status == Status.INVALID_PARAMETER


def test_decode_into_short_pitch(decoder, fixtures):
    data = fixtures["420"]
    ref = golden.decode(data, OutputFormat.RGB)
    dest, _ = _alloc_dest(ref, 0)
    dest.pitch[0] -= 1
    with pytest.raises(RocJpegError) as ei:
        decoder.decode_into(api.JpegStream(data), dest,
                            DecodeParams(output_format=OutputFormat.RGB))
    assert ei.value.status == Status.INVALID_PARAMETER


def test_decode_into_undersized_buffer(decoder, fixtures):
    data = fixtures["420"]
    ref = golden.decode(data, OutputFormat.Y)
    dest, _ = _alloc_dest(ref, 0)
    dest.channel[0] = dest.channel[0][:-64]
    with pytest.raises(RocJpegError) as ei:
        decoder.decode_into(api.JpegStream(data), dest,
                            DecodeParams(output_format=OutputFormat.Y))
    assert ei.value.status == Status.INVALID_PARAMETER


def test_decode_into_noncontiguous_buffer_rejected(decoder, fixtures):
    """A non-contiguous destination view must be REJECTED: reshape(-1)
    would copy and the write would silently land in the copy, not the
    caller's memory (pitch is how padded layouts are expressed here)."""
    data = fixtures["420"]
    ref = golden.decode(data, OutputFormat.Y)
    h, row = _dims(ref[0][0])
    frame = np.zeros((h, row + 32), np.uint8)
    view = frame[:, :row]  # writable but non-contiguous
    dest = DecodedImage.empty()
    dest.channel[0] = view
    dest.pitch[0] = row
    with pytest.raises(RocJpegError) as ei:
        decoder.decode_into(api.JpegStream(data), dest,
                            DecodeParams(output_format=OutputFormat.Y))
    assert ei.value.status == Status.INVALID_PARAMETER
    assert not frame.any()  # nothing was written anywhere


def test_decode_into_readonly_buffer(decoder, fixtures):
    data = fixtures["420"]
    ref = golden.decode(data, OutputFormat.Y)
    dest, _ = _alloc_dest(ref, 0)
    dest.channel[0].flags.writeable = False
    with pytest.raises(RocJpegError) as ei:
        decoder.decode_into(api.JpegStream(data), dest,
                            DecodeParams(output_format=OutputFormat.Y))
    assert ei.value.status == Status.INVALID_PARAMETER


def test_decode_into_raw_pointer(decoder, fixtures):
    """The C-ABI path passes raw pointer integers; non-tight pitch included
    (pointer writes are what csrc/rocjpeg_capi.cpp forwards)."""
    data = fixtures["420"]
    ref = golden.decode(data, OutputFormat.RGB)
    h, row = _dims(ref[0][0])
    pitch = row + 24
    backing = np.full(h * pitch, 0x5A, np.uint8)
    dest = DecodedImage.empty()
    dest.channel[0] = backing.ctypes.data
    dest.pitch[0] = pitch
    decoder.decode_into(api.JpegStream(data), dest,
                        DecodeParams(output_format=OutputFormat.RGB))
    rows = backing.reshape(h, pitch)
    src = np.asarray(ref[0][0]).view(np.uint8).reshape(h, row)
    np.testing.assert_array_equal(rows[:, :row], src)
    assert (rows[:, row:] == 0x5A).all()
