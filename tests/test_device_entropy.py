"""On-device (wave) entropy decoder tests: bit-exact vs the host oracle
across the CSS matrix, restart intervals, batches, and through the API."""

import numpy as np
import pytest

from rocjpeg_tpu import api
from rocjpeg_tpu.core import entropy, golden
from rocjpeg_tpu.core.bitstream import JpegStreamParser
from rocjpeg_tpu.ops import device_entropy as de
from rocjpeg_tpu.testing import encoder
from rocjpeg_tpu.types import DecodeParams, OutputFormat


def _check_wave(blobs):
    plist = [JpegStreamParser().parse(b) for b in blobs]
    tables = de.DeviceScanTables.from_params(plist[0])
    geom0 = de.GroupGeometry.from_params(plist[0], len(plist))
    packed = de.pack_segments(plist, geom0.total_blocks)
    out, err, geom = de.decode_coefficients_on_device(plist, tables, packed)
    assert not bool(np.asarray(err).any())
    comps = de.unflatten_coefficients(out, geom, plist[0])
    for i, p in enumerate(plist):
        ref = entropy.decode_scan(p)
        for ci in range(len(ref)):
            a = ref[ci]
            b = np.asarray(comps[ci][i])[:a.shape[0], :a.shape[1]]
            np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("css", ["444", "440", "422", "420", "411", "400"])
def test_wave_matrix(css):
    blobs = [encoder.encode_planes(
        encoder.random_planes(css, 136, 104, seed=s), css, restart_interval=4)
        for s in range(3)]
    _check_wave(blobs)


@pytest.mark.parametrize("ri", [0, 1, 7])
def test_wave_restart_intervals(ri):
    blobs = [encoder.encode_planes(
        encoder.random_planes("420", 128, 96, seed=s), "420",
        restart_interval=ri) for s in range(2)]
    _check_wave(blobs)


def test_wave_dense_long_codes():
    rng = np.random.default_rng(6)
    coeffs = [rng.choice([-1023, 1023, -255, 255], (12, 16, 64)).astype(np.int32)]
    data = encoder.encode_coefficients(coeffs, encoder.SAMPLING["400"], 128, 96,
                                       [encoder.QTABLE_LUMA], [0],
                                       restart_interval=2)
    _check_wave([data])


def test_wave_detects_corrupt_scan():
    blob = encoder.encode_planes(
        encoder.random_planes("420", 128, 96, seed=1), "420", restart_interval=4)
    p = JpegStreamParser().parse(blob)
    # Truncate the scan brutally: keep the segment structure but zero a chunk.
    bad = bytearray(p.slice_data)
    if len(bad) > 64:
        for i in range(32, min(64, len(bad))):
            bad[i] = 0xFF if i % 2 else 0xD9  # garbage marker-ish bytes
    p.slice_data = bytes(bad)
    tables = de.DeviceScanTables.from_params(p)
    geom0 = de.GroupGeometry.from_params(p, 1)
    try:
        packed = de.pack_segments([p], geom0.total_blocks)
    except Exception:
        return  # host-side segmentation already rejected it — fine
    _, err, _ = de.decode_coefficients_on_device([p], tables, packed)
    assert bool(np.asarray(err).any())


def test_api_device_entropy_bit_exact():
    dec = api.Decoder(device_entropy="on")
    blobs = [encoder.encode_planes(
        encoder.random_planes("420", 128, 96, seed=s), "420",
        restart_interval=4) for s in range(4)]
    imgs = dec.decode_batched([api.JpegStream(b) for b in blobs],
                              DecodeParams(OutputFormat.RGB))
    for b, img in zip(blobs, imgs):
        (ref, _), = golden.decode(b, OutputFormat.RGB)
        np.testing.assert_array_equal(np.asarray(img.channel[0]), ref)


def test_api_mixed_tables_split_groups():
    # Two encoders with different quant tables share Huffman tables here, so
    # they group together; different Huffman tables split groups. Either
    # way results must be exact.
    dec = api.Decoder(device_entropy="on")
    a = encoder.encode_planes(encoder.random_planes("420", 128, 96, 1), "420",
                              restart_interval=4)
    b = encoder.encode_planes(encoder.random_planes("420", 128, 96, 2), "420",
                              restart_interval=2)
    imgs = dec.decode_batched([api.JpegStream(a), api.JpegStream(b)],
                              DecodeParams(OutputFormat.Y))
    for blob, img in zip((a, b), imgs):
        (ref, _), = golden.decode(blob, OutputFormat.Y)
        np.testing.assert_array_equal(np.asarray(img.channel[0]), ref)


def test_auto_mode_small_group_uses_host():
    dec = api.Decoder(device_entropy="auto")
    blob = encoder.encode_planes(
        encoder.random_planes("420", 64, 64, seed=3), "420")  # 1 segment
    img = dec.decode(api.JpegStream(blob), DecodeParams(OutputFormat.Y))
    (ref, _), = golden.decode(blob, OutputFormat.Y)
    np.testing.assert_array_equal(np.asarray(img.channel[0]), ref)


# Note: the bundled mug images carry no restart markers (1 segment = 1 lane),
# so running them through the wave decoder is correct but needs millions of
# sequential steps — the 'auto' policy routes such streams to the host path
# (covered by test_auto_mode_small_group_uses_host).
