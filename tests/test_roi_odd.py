"""Odd-coordinate ROI semantics, pinned.

The reference's CopyChannel computes chroma ROI offsets with byte
arithmetic (decoder.cpp:372-399: NV12/422V use top>>1 on chroma planes,
YUYV multiplies left by 2). For ODD left/top that byte math lands inside an
interleaved UV pair / YUYV quad and silently swaps chroma channels — a
quirk of pointer arithmetic, not a semantic contract. This framework pins
the sane plane-arithmetic semantics instead, and these tests lock them:

  luma   = full[top : top+h, left : left+w]
  chroma = full[top//vf : top//vf + h//vf, left//hf : left//hf + w//hf]

i.e. chroma comes from the subsampling cell CONTAINING the requested
origin; U/V never swap. Docstring reference: ops/postprocess.py:76-90.
"""

import numpy as np
import pytest

from rocjpeg_tpu import api
from rocjpeg_tpu.core import golden
from rocjpeg_tpu.core.bitstream import JpegStreamParser
from rocjpeg_tpu.ops import layout
from rocjpeg_tpu.testing import encoder
from rocjpeg_tpu.types import (CropRectangle, DecodeParams, OutputFormat)

L, T, W, H = 11, 7, 48, 40  # odd left/top, even size


def _full_planes(blob):
    p = JpegStreamParser().parse(blob)
    return golden.decode_planes(p), p


@pytest.fixture(scope="module")
def blob420():
    return encoder.encode_planes(
        encoder.random_planes("420", 128, 96, seed=11), "420",
        restart_interval=2)


@pytest.fixture(scope="module")
def blob422():
    return encoder.encode_planes(
        encoder.random_planes("422", 128, 96, seed=12), "422",
        restart_interval=2)


@pytest.fixture(scope="module")
def blob440():
    return encoder.encode_planes(
        encoder.random_planes("440", 128, 96, seed=13), "440",
        restart_interval=2)


def _decode(blob, fmt, crop):
    dec = api.Decoder()
    img = dec.decode(api.JpegStream(blob), DecodeParams(fmt, crop))
    return [np.asarray(c) for c in img.channel if c is not None]


def test_odd_crop_y(blob420):
    crop = CropRectangle(L, T, L + W, T + H)
    (planes, _) = _full_planes(blob420)
    y = _decode(blob420, OutputFormat.Y, crop)[0]
    np.testing.assert_array_equal(y, planes[0][T:T + H, L:L + W])


def test_odd_crop_yuv_planar_420(blob420):
    crop = CropRectangle(L, T, L + W, T + H)
    (planes, _) = _full_planes(blob420)
    y, u, v = _decode(blob420, OutputFormat.YUV_PLANAR, crop)
    np.testing.assert_array_equal(y, planes[0][T:T + H, L:L + W])
    ct, cl = T // 2, L // 2
    np.testing.assert_array_equal(
        u, planes[1][ct:ct + H // 2, cl:cl + W // 2])
    np.testing.assert_array_equal(
        v, planes[2][ct:ct + H // 2, cl:cl + W // 2])


def test_odd_crop_native_nv12(blob420):
    crop = CropRectangle(L, T, L + W, T + H)
    (planes, _) = _full_planes(blob420)
    y, uv = _decode(blob420, OutputFormat.NATIVE, crop)
    np.testing.assert_array_equal(y, planes[0][T:T + H, L:L + W])
    ct, cl = T // 2, L // 2
    expect_uv = np.asarray(layout.interleave_uv(
        np,
        planes[1][ct:ct + H // 2, cl:cl + W // 2],
        planes[2][ct:ct + H // 2, cl:cl + W // 2]))
    # U and V must come through in U,V order — never swapped (unlike the
    # reference's odd-left byte offset, which would shift into a V byte).
    np.testing.assert_array_equal(uv, expect_uv)


def test_odd_crop_native_yuyv(blob422):
    crop = CropRectangle(L, T, L + W, T + H)
    (planes, _) = _full_planes(blob422)
    (yuyv,) = _decode(blob422, OutputFormat.NATIVE, crop)
    cl = L // 2
    expect = np.asarray(layout.pack_yuyv(
        np,
        planes[0][T:T + H, L:L + W],
        planes[1][T:T + H, cl:cl + W // 2],
        planes[2][T:T + H, cl:cl + W // 2]))
    np.testing.assert_array_equal(yuyv, expect)


def test_odd_crop_native_422v(blob440):
    crop = CropRectangle(L, T, L + W, T + H)
    (planes, _) = _full_planes(blob440)
    y, u, v = _decode(blob440, OutputFormat.NATIVE, crop)
    np.testing.assert_array_equal(y, planes[0][T:T + H, L:L + W])
    ct = T // 2
    np.testing.assert_array_equal(u, planes[1][ct:ct + H // 2, L:L + W])
    np.testing.assert_array_equal(v, planes[2][ct:ct + H // 2, L:L + W])


@pytest.mark.parametrize("fmt", [OutputFormat.RGB, OutputFormat.RGB_PLANAR])
def test_odd_crop_rgb_matches_golden(blob420, fmt):
    """RGB paths: the API's odd-crop output must equal the golden oracle's
    (both floor chroma origins then upsample the cropped window)."""
    crop = CropRectangle(L, T, L + W, T + H)
    got = _decode(blob420, fmt, crop)
    ref = golden.decode(blob420, fmt, crop)
    for g, (r, _pitch) in zip(got, ref):
        np.testing.assert_array_equal(g, r)


def test_odd_sized_crop(blob420):
    """Odd WIDTH/HEIGHT: chroma planes floor to w//2, h//2; RGB upsample
    edge-pads back to the odd luma size."""
    crop = CropRectangle(10, 6, 10 + 33, 6 + 27)
    y, u, v = _decode(blob420, OutputFormat.YUV_PLANAR, crop)
    assert y.shape == (27, 33) and u.shape == (13, 16) and v.shape == (13, 16)
    (rgb,) = _decode(blob420, OutputFormat.RGB, crop)
    assert rgb.shape[0] == 27 and rgb.shape[1] == 33 * 3
