"""Golden-decoder validation against an independent oracle (PIL/libjpeg).

The luma plane never passes through chroma upsampling or color conversion,
so for every corpus image our Y output must be bit-identical to libjpeg's
raw (draft-mode) YCbCr luma — both implement the standard fixed-point islow
IDCT contract. This independently validates the entropy decoder and IDCT;
chroma geometry is covered by the CSS-matrix roundtrip tests in
test_entropy.py / test_formats.py.
"""

import io

import numpy as np
import pytest
from PIL import Image

from rocjpeg_tpu.core import golden
from rocjpeg_tpu.types import ChromaSubsampling as CSS
from rocjpeg_tpu.types import CropRectangle, OutputFormat


def _pil_raw_ycbcr(data: bytes) -> np.ndarray:
    im = Image.open(io.BytesIO(data))
    if im.mode == "L":
        return np.asarray(im)[..., None]
    im.draft("YCbCr", im.size)
    return np.asarray(im)


@pytest.mark.parametrize("name", ["mug_400", "mug_420", "mug_422"])
def test_luma_bit_exact_vs_libjpeg(corpus, name):
    ref_y = _pil_raw_ycbcr(corpus[name])[:, :, 0]
    (y, pitch), = golden.decode(corpus[name], OutputFormat.Y)
    assert pitch == ref_y.shape[1]
    np.testing.assert_array_equal(y, ref_y)


def test_chroma_bit_exact_vs_libjpeg_444():
    # Synthesize a 4:4:4 JPEG with PIL: draft-mode YCbCr has no chroma
    # upsampling for 444, so all three planes compare bit-exactly.
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (128, 160, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, "JPEG", quality=92, subsampling=0)
    data = buf.getvalue()
    ref = _pil_raw_ycbcr(data)
    chans = golden.decode(data, OutputFormat.YUV_PLANAR)
    for i in range(3):
        np.testing.assert_array_equal(chans[i][0], ref[:, :, i])


def test_native_420_layout(corpus):
    chans = golden.decode(corpus["mug_420"], OutputFormat.NATIVE)
    assert len(chans) == 2  # NV12: Y + interleaved UV
    y, y_pitch = chans[0]
    uv, uv_pitch = chans[1]
    assert y.shape == (2160, 3840) and y_pitch == 3840
    assert uv.shape == (1080, 3840) and uv_pitch == 3840
    # Interleaved UV: even bytes are U, odd are V.
    planar = golden.decode(corpus["mug_420"], OutputFormat.YUV_PLANAR)
    np.testing.assert_array_equal(uv[:, 0::2], planar[1][0])
    np.testing.assert_array_equal(uv[:, 1::2], planar[2][0])


def test_native_422_yuyv_layout(corpus):
    chans = golden.decode(corpus["mug_422"], OutputFormat.NATIVE)
    assert len(chans) == 1  # packed YUYV
    yuyv, pitch = chans[0]
    assert yuyv.shape == (2160, 2 * 3840) and pitch == 2 * 3840
    planar = golden.decode(corpus["mug_422"], OutputFormat.YUV_PLANAR)
    np.testing.assert_array_equal(yuyv[:, 0::2], planar[0][0])  # Y
    np.testing.assert_array_equal(yuyv[:, 1::4], planar[1][0])  # U
    np.testing.assert_array_equal(yuyv[:, 3::4], planar[2][0])  # V


def test_rgb_400_replicates_luma(corpus):
    (y, _), = golden.decode(corpus["mug_400"], OutputFormat.Y)
    (rgb, pitch), = golden.decode(corpus["mug_400"], OutputFormat.RGB)
    assert pitch == 3 * 3840
    rgb3 = rgb.reshape(2160, 3840, 3)
    for c in range(3):
        np.testing.assert_array_equal(rgb3[:, :, c], y)


def test_rgb_planar_matches_rgb(corpus):
    chans_p = golden.decode(corpus["mug_420"], OutputFormat.RGB_PLANAR)
    (rgb, _), = golden.decode(corpus["mug_420"], OutputFormat.RGB)
    rgb3 = rgb.reshape(2160, 3840, 3)
    for c in range(3):
        np.testing.assert_array_equal(chans_p[c][0], rgb3[:, :, c])


def test_crop_roi(corpus):
    crop = CropRectangle(left=96, top=64, right=96 + 640, bottom=64 + 480)
    (full_y, _), = golden.decode(corpus["mug_420"], OutputFormat.Y)
    (roi_y, pitch), = golden.decode(corpus["mug_420"], OutputFormat.Y, crop)
    assert roi_y.shape == (480, 640) and pitch == 640
    np.testing.assert_array_equal(roi_y, full_y[64:64 + 480, 96:96 + 640])


def test_invalid_crop_falls_back_to_full(corpus):
    # The reference CTest crop 960,540,2880,1620 has roi > image for the
    # bundled images in one config; an invalid ROI (zero/negative/oversize)
    # decodes the full image (decoder.cpp:123-131).
    crop = CropRectangle(left=0, top=0, right=0, bottom=0)
    (y, _), = golden.decode(corpus["mug_420"], OutputFormat.Y, crop)
    assert y.shape == (2160, 3840)
    crop = CropRectangle(left=0, top=0, right=5000, bottom=5000)
    (y, _), = golden.decode(corpus["mug_420"], OutputFormat.Y, crop)
    assert y.shape == (2160, 3840)


def test_rgb_bt709_constants():
    # Flat-color 444 image through the BT.709 full-range matrix
    # (hip_kernels.cpp:76-78): check against the real-valued formula.
    from rocjpeg_tpu.ops import color
    y = np.full((8, 128), 120, np.uint8)
    u = np.full((8, 128), 200, np.uint8)
    v = np.full((8, 128), 50, np.uint8)
    r, g, b = color.yuv_to_rgb(np, y, u, v)
    exp_r = np.clip(round(120 + 1.5748 * (50 - 128)), 0, 255)
    exp_g = np.clip(round(120 - 0.1873 * (200 - 128) - 0.4681 * (50 - 128)), 0, 255)
    exp_b = np.clip(round(120 + 1.8556 * (200 - 128)), 0, 255)
    assert r[0, 0] == exp_r and g[0, 0] == exp_g and b[0, 0] == exp_b
