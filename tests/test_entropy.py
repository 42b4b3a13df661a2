"""Entropy-decoder tests via coefficient-domain roundtrips: encode known
quantized coefficients, decode the scan, require exact equality. This covers
DC prediction, EOB/ZRL runs, byte stuffing, and restart-interval
segmentation independently of the IDCT."""

import io

import numpy as np
import pytest
from PIL import Image

from rocjpeg_tpu.core import entropy
from rocjpeg_tpu.core.bitstream import JpegStreamParser
from rocjpeg_tpu.core.zigzag import ZIGZAG_ORDER
from rocjpeg_tpu.testing import encoder


def _roundtrip(css, w, h, ri, seed=0):
    rng = np.random.default_rng(seed)
    sampling = encoder.SAMPLING[css]
    max_h = max(hh for hh, vv in sampling)
    max_v = max(vv for hh, vv in sampling)
    mcus_w = (w + max_h * 8 - 1) // (max_h * 8)
    mcus_h = (h + max_v * 8 - 1) // (max_v * 8)
    coeffs = []
    for hh, vv in sampling:
        shape = (mcus_h * vv, mcus_w * hh, 64)
        c = rng.integers(-80, 80, shape).astype(np.int32)
        # sparsify so EOB/ZRL paths are exercised
        mask = rng.random(shape) < 0.7
        c[mask] = 0
        coeffs.append(c)
    qids = [0] + [1] * (len(sampling) - 1)
    qts = [encoder.QTABLE_LUMA] * len(sampling)
    data = encoder.encode_coefficients(coeffs, sampling, w, h, qts, qids,
                                       restart_interval=ri)
    p = JpegStreamParser().parse(data)
    dec = entropy.decode_scan(p)
    assert len(dec) == len(coeffs)
    for i in range(len(coeffs)):
        np.testing.assert_array_equal(dec[i][..., ZIGZAG_ORDER], coeffs[i])


@pytest.mark.parametrize("css", ["444", "440", "422", "420", "411", "400"])
def test_coefficient_roundtrip(css):
    _roundtrip(css, 128, 96, ri=0, seed=1)


@pytest.mark.parametrize("ri", [1, 3, 7, 48])
def test_restart_intervals(ri):
    _roundtrip("420", 128, 96, ri=ri, seed=2)


def test_restart_interval_not_dividing_mcu_count():
    # 420 at 136x96: 9x6=54 MCUs, ri=7 -> last segment is short.
    _roundtrip("420", 136, 96, ri=7, seed=3)


def test_odd_dimensions():
    _roundtrip("420", 130, 94, ri=0, seed=4)
    _roundtrip("444", 65, 67, ri=0, seed=5)


def test_dense_coefficients_stuffing():
    # Max-magnitude coefficients generate long codes and 0xFF bytes,
    # exercising byte stuffing heavily.
    rng = np.random.default_rng(6)
    coeffs = [rng.choice([-1023, 1023, -512, 511], (12, 16, 64)).astype(np.int32)]
    data = encoder.encode_coefficients(coeffs, encoder.SAMPLING["400"], 128, 96,
                                       [encoder.QTABLE_LUMA], [0])
    p = JpegStreamParser().parse(data)
    dec = entropy.decode_scan(p)
    np.testing.assert_array_equal(dec[0][..., ZIGZAG_ORDER], coeffs[0])


def test_split_restart_segments():
    scan = b"\x12\x34" + b"\xff\xd0" + b"\x56" + b"\xff\xd1" + b"\x78\xff\x00\x9a"
    segs = entropy.split_restart_segments(scan)
    assert segs == [b"\x12\x34", b"\x56", b"\x78\xff\x00\x9a"]


def test_unstuff():
    out = entropy.unstuff(b"\x01\xff\x00\x02\xff\x00")
    np.testing.assert_array_equal(out, np.array([1, 0xFF, 2, 0xFF], np.uint8))


def test_encoder_accepted_by_libjpeg():
    # Sanity: PIL/libjpeg decodes fixture streams, luma bit-exact vs us.
    from rocjpeg_tpu.core import golden
    from rocjpeg_tpu.types import OutputFormat
    for css in ["444", "440", "422", "420"]:
        planes = encoder.random_planes(css, 96, 64, seed=9)
        data = encoder.encode_planes(planes, css, restart_interval=4)
        im = Image.open(io.BytesIO(data))
        im.draft("YCbCr", im.size)
        ref_y = np.asarray(im)[:, :, 0]
        (y, _), = golden.decode(data, OutputFormat.Y)
        np.testing.assert_array_equal(y, ref_y)
