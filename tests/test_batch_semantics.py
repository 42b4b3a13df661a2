"""Batched-decode semantics: lane-budget chunking (the num_jpeg_cores
chunking analog, src/rocjpeg_decoder.cpp:208-218), per-image error
attribution (the reference's per-image drain loop naturally attributes
failures, src/rocjpeg_decoder.cpp:220-286), and host-path backpressure."""

import numpy as np
import pytest

from rocjpeg_tpu import api, pipeline
from rocjpeg_tpu.core import golden
from rocjpeg_tpu.status import RocJpegError, Status
from rocjpeg_tpu.testing import encoder
from rocjpeg_tpu.types import DecodeParams, OutputFormat, TpuDecodeSpec


def _blobs(n, w=128, h=96, ri=4):
    return [encoder.encode_planes(
        encoder.random_planes("420", w, h, seed=s), "420",
        restart_interval=ri) for s in range(n)]


def _narrow_spec(lanes):
    return TpuDecodeSpec(name="test", num_decode_lanes=lanes)


def test_decode_batched_chunks_by_lane_budget(monkeypatch):
    """A shape group larger than spec.num_decode_lanes must split into
    lane-budget-sized sub-batches (each its own device program), and the
    results must still be bit-exact per image."""
    blobs = _blobs(5)
    dec = api.Decoder(spec=_narrow_spec(2), device_entropy="off")

    calls = []
    real = pipeline.decode_group

    def spy(params_list, *a, **k):
        calls.append(len(params_list))
        return real(params_list, *a, **k)

    monkeypatch.setattr(pipeline, "decode_group", spy)
    monkeypatch.setattr(api, "decode_group", spy, raising=False)
    imgs = dec.decode_batched([api.JpegStream(b) for b in blobs],
                              DecodeParams(OutputFormat.Y))
    assert calls == [2, 2, 1]
    for b, img in zip(blobs, imgs):
        (ref, _), = golden.decode(b, OutputFormat.Y)
        np.testing.assert_array_equal(np.asarray(img.channel[0]), ref)


def test_decode_batched_chunks_device_path():
    """Chunking also applies to the device-entropy path (each chunk is one
    wave program) and stays bit-exact."""
    blobs = _blobs(5)
    dec = api.Decoder(spec=_narrow_spec(2), device_entropy="on")
    imgs = dec.decode_batched([api.JpegStream(b) for b in blobs],
                              DecodeParams(OutputFormat.Y))
    assert len(dec.last_error_flags) == 3  # one err token per chunk
    for b, img in zip(blobs, imgs):
        (ref, _), = golden.decode(b, OutputFormat.Y)
        np.testing.assert_array_equal(np.asarray(img.channel[0]), ref)


def _corrupt(stream):
    """Garbage the middle of the scan (keeps segment structure; the wave
    flags invalid codes as lane errors — same pattern as
    tests/test_device_entropy.py::test_wave_detects_corrupt_scan)."""
    bad = bytearray(stream.params.slice_data)
    assert len(bad) > 64
    for i in range(32, 64):
        bad[i] = 0xFF if i % 2 else 0xD9
    stream.params.slice_data = bytes(bad)
    return stream


def test_batched_error_names_failing_image():
    """check_errors=True: a corrupt scan in a batch raises BAD_JPEG naming
    the offending batch index, not just 'somewhere in the batch'."""
    blobs = _blobs(8)
    streams = [api.JpegStream(b) for b in blobs]
    _corrupt(streams[5])
    dec = api.Decoder(device_entropy="on")
    with pytest.raises(RocJpegError) as ei:
        dec.decode_batched(streams, DecodeParams(OutputFormat.Y))
    assert ei.value.status == Status.BAD_JPEG
    assert "[5]" in str(ei.value)


def test_last_failed_indices_lazy_attribution():
    """check_errors=False: the decode itself never syncs; the same
    attribution is available on demand via last_failed_indices()."""
    blobs = _blobs(8)
    streams = [api.JpegStream(b) for b in blobs]
    _corrupt(streams[2])
    _corrupt(streams[6])
    dec = api.Decoder(device_entropy="on", check_errors=False)
    imgs = dec.decode_batched(streams, DecodeParams(OutputFormat.Y))
    assert len(imgs) == 8
    assert dec.last_failed_indices() == [2, 6]


def test_last_failed_indices_clean_batch():
    blobs = _blobs(4)
    dec = api.Decoder(device_entropy="on", check_errors=False)
    dec.decode_batched([api.JpegStream(b) for b in blobs],
                       DecodeParams(OutputFormat.Y))
    assert dec.last_failed_indices() == []


@pytest.mark.parametrize("entropy", ["off", "on"])
def test_inflight_backpressure_bounded(entropy):
    """check_errors=False pipelines must be backpressured on BOTH paths:
    at most max_inflight submissions are outstanding after any call (the
    host path used to skip the tracking entirely)."""
    blobs = _blobs(3)
    dec = api.Decoder(device_entropy=entropy, check_errors=False)
    streams = [api.JpegStream(b) for b in blobs]
    for _ in range(5):
        dec.decode_batched(streams, DecodeParams(OutputFormat.Y))
        assert 1 <= len(dec._inflight) <= dec._max_inflight
