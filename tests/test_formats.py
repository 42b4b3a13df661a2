"""Full CSS x OutputFormat matrix on device vs golden — the coverage of the
reference's 13 CTest cases (test/CMakeLists.txt:53-207) plus the golden
bit-exactness the reference never had, including 4:4:0 which PIL cannot
generate (fixtures come from our encoder)."""

import numpy as np
import pytest

from rocjpeg_tpu import api
from rocjpeg_tpu.core import golden
from rocjpeg_tpu.status import RocJpegError, Status
from rocjpeg_tpu.testing import encoder
from rocjpeg_tpu.types import CropRectangle, DecodeParams, OutputFormat

CSS_LIST = ["444", "440", "422", "420", "400"]
FORMATS = [OutputFormat.NATIVE, OutputFormat.YUV_PLANAR, OutputFormat.Y,
           OutputFormat.RGB, OutputFormat.RGB_PLANAR]


@pytest.fixture(scope="module")
def decoder():
    return api.Decoder()


@pytest.fixture(scope="module")
def fixtures():
    return {css: encoder.encode_planes(
        encoder.random_planes(css, 128, 96, seed=21), css, restart_interval=6)
        for css in CSS_LIST}


@pytest.mark.parametrize("fmt", FORMATS)
@pytest.mark.parametrize("css", CSS_LIST)
def test_matrix_device_vs_golden(decoder, fixtures, css, fmt):
    data = fixtures[css]
    ref = golden.decode(data, fmt)
    img = decoder.decode(api.JpegStream(data), DecodeParams(output_format=fmt))
    for ci, (ref_arr, ref_pitch) in enumerate(ref):
        assert img.pitch[ci] == ref_pitch
        np.testing.assert_array_equal(np.asarray(img.channel[ci]), ref_arr,
                                      err_msg=f"css={css} fmt={fmt.name} ch={ci}")


@pytest.mark.parametrize("css", CSS_LIST)
def test_matrix_crop(decoder, fixtures, css):
    # Even-aligned crop across the matrix, RGB output (the reference crop
    # tests run every format; RGB exercises the full pipeline).
    data = fixtures[css]
    crop = CropRectangle(left=16, top=8, right=16 + 64, bottom=8 + 64)
    ref = golden.decode(data, OutputFormat.RGB, crop)
    img = decoder.decode(api.JpegStream(data),
                         DecodeParams(OutputFormat.RGB, crop))
    np.testing.assert_array_equal(np.asarray(img.channel[0]), ref[0][0])


def test_411_rejected(decoder):
    data = encoder.encode_planes(encoder.random_planes("411", 128, 96, 3), "411")
    with pytest.raises(RocJpegError) as e:
        decoder.decode(api.JpegStream(data))
    assert e.value.status == Status.JPEG_NOT_SUPPORTED


def test_411_image_info(decoder):
    # GetImageInfo still reports 411 with quarter-width chroma
    # (decoder.cpp:348-352) even though decode rejects it.
    data = encoder.encode_planes(encoder.random_planes("411", 128, 96, 3), "411")
    info = decoder.get_image_info(api.JpegStream(data))
    assert info.widths[1] == 128 >> 2
    assert info.heights[1] == 96
