"""CLI workload tests — the 13 CTest cases of the reference test package
(test/CMakeLists.txt:53-207), driven through this framework's CLI tools:

  jpeg-decode-fmt-{native,yuv_planar,y,rgb,rgb_planar}      (x5)
  jpeg-decode-threads-fmt-native                            (x1)
  jpeg-decode-batch-fmt-native                              (x1)
  jpeg-decode-crop-fmt-{native,yuv_planar,y,rgb,rgb_planar} (x5)
  jpeg-decode-crop-batch-fmt-native                         (x1)

The reference runs them on its bundled 4K mug images; here a small
synthesized corpus keeps CPU-jit times sane while driving the exact same
flags. The crop rectangle is the reference's 960,540,2880,1620 — larger
than the corpus images, so (as in the reference suite, see SURVEY.md §4)
the crop cases exercise the invalid-ROI full-image fallback
(src/rocjpeg_decoder.cpp:129-131).
"""

import os

import pytest

from rocjpeg_tpu.testing import encoder
from rocjpeg_tpu.tools import jpegdecode, jpegdecodebatched, jpegdecodeperf

CROP = "960,540,2880,1620"
FORMATS = ["native", "yuv_planar", "y", "rgb", "rgb_planar"]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    for i, css in enumerate(("420", "422", "400")):
        blob = encoder.encode_planes(
            encoder.random_planes(css, 96, 64, seed=i), css,
            restart_interval=2)
        (d / f"img_{css}.jpg").write_bytes(blob)
    return str(d)


@pytest.mark.parametrize("fmt", FORMATS)
def test_jpeg_decode_fmt(corpus_dir, tmp_path, fmt):
    rc = jpegdecode.main(["-i", corpus_dir, "-fmt", fmt,
                          "-o", str(tmp_path / "out")])
    assert rc == 0


def test_jpeg_decode_threads_fmt_native(corpus_dir):
    rc = jpegdecodeperf.main(["-i", corpus_dir, "-fmt", "native", "-t", "2"])
    assert rc == 0


def test_jpeg_decode_batch_fmt_native(corpus_dir):
    rc = jpegdecodebatched.main(["-i", corpus_dir, "-fmt", "native", "-b", "2"])
    assert rc == 0


@pytest.mark.parametrize("fmt", FORMATS)
def test_jpeg_decode_crop_fmt(corpus_dir, tmp_path, fmt):
    rc = jpegdecode.main(["-i", corpus_dir, "-fmt", fmt, "-crop", CROP,
                          "-o", str(tmp_path / "out")])
    assert rc == 0


def test_jpeg_decode_crop_batch_fmt_native(corpus_dir):
    rc = jpegdecodebatched.main(["-i", corpus_dir, "-fmt", "native",
                                 "-b", "2", "-crop", CROP])
    assert rc == 0


def test_jpeg_decode_valid_crop(corpus_dir, tmp_path):
    # A crop that actually fits — exercises the real ROI path end-to-end.
    rc = jpegdecode.main(["-i", corpus_dir, "-fmt", "rgb", "-crop",
                          "16,16,80,48", "-o", str(tmp_path / "out")])
    assert rc == 0
