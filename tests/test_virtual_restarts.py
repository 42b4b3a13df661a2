"""Virtual restart points: DRI=0 scans decoded on the wave.

The reference's realistic corpus (data/images/mug_*.jpg) has no restart
markers, so the wave has no lane parallelism to exploit natively. The native
index pass (csrc rjt_index_scan) manufactures it: (bit offset, MCU index,
DC predictors) recorded at symbol-balanced MCU boundaries become virtual
RSTn markers, the wave decodes the segments in parallel, and the transform
adds each lane's entry predictor back to its DC coefficients
(pipeline._transform_from_flat with dc_fix=True).
"""

import numpy as np
import pytest

from rocjpeg_tpu import api
from rocjpeg_tpu.core import entropy, golden
from rocjpeg_tpu.core.bitstream import JpegStreamParser
from rocjpeg_tpu.ops import device_entropy as de
from rocjpeg_tpu.runtime import host_decode
from rocjpeg_tpu.testing import encoder
from rocjpeg_tpu.types import DecodeParams, OutputFormat

native = host_decode.native_index_module()
pytestmark = pytest.mark.skipif(native is None,
                                reason="native index pass not built")


def _dri0(css, w, h, seed):
    return encoder.encode_planes(encoder.random_planes(css, w, h, seed=seed),
                                 css, restart_interval=0)


# ---------------------------------------------------------------------------
# Index-pass unit tests
# ---------------------------------------------------------------------------

def test_index_records_match_oracle():
    """With min_symbols=1 a record lands at EVERY MCU boundary; record r
    must hold the exact decode state entering MCU r."""
    blob = _dri0("420", 128, 96, seed=1)
    p = JpegStreamParser().parse(blob)
    clean, bit_off, dc, mcu_idx, syms = native.index_scan(p, 1)
    comps = entropy.decode_scan(p)
    total = p.num_mcus
    assert len(bit_off) == total
    np.testing.assert_array_equal(mcu_idx, np.arange(total, dtype=np.int32))
    assert bit_off[0] == 0 and tuple(dc[0]) == (0, 0, 0)
    assert bool(np.all(np.diff(bit_off) > 0))
    # Predictor entering MCU 1 = DC values of the last blocks decoded in
    # MCU 0 (420: Y block (1, 1), U/V block (0, 0)).
    assert dc[1][0] == comps[0][1, 1, 0]
    assert dc[1][1] == comps[1][0, 0, 0]
    assert dc[1][2] == comps[2][0, 0, 0]


def test_index_records_symbol_balanced():
    """With a symbol budget S, every lane except possibly the last must
    carry >= S symbols and < S + one-MCU-worth of symbols."""
    blob = _dri0("420", 256, 128, seed=2)
    p = JpegStreamParser().parse(blob)
    clean, bit_off, dc, mcu_idx, syms = native.index_scan(p, 200)
    assert len(bit_off) > 2
    assert bool(np.all(np.diff(mcu_idx) >= 1))
    # Segment bit lengths should be fairly uniform (balanced): the max
    # segment is bounded by budget + one MCU, so well under 4x the median.
    lens = np.diff(np.append(bit_off, len(clean) * 8))
    assert lens.max() < 4 * np.median(lens)
    # Every lane except the last carries >= the budget; counts are exact.
    assert bool(np.all(syms[:-1] >= 200))


def test_index_scan2_matches_two_single_scans():
    a = JpegStreamParser().parse(_dri0("420", 128, 96, seed=2))
    b = JpegStreamParser().parse(_dri0("420", 128, 96, seed=3))
    sa, sb = native.index_scan(a, 64), native.index_scan(b, 64)
    ra, rb = native.index_scan2(a, b, 64)
    for one, two in ((sa, ra), (sb, rb)):
        for x, y in zip(one, two):
            np.testing.assert_array_equal(x, y)


def test_index_scan8_matches_single_scans():
    plist = [JpegStreamParser().parse(_dri0("420", 128, 96, seed=10 + s))
             for s in range(8)]
    out = native.index_scan8(plist, 64)
    if out is None:
        pytest.skip("AVX2 walker unavailable on this host")
    for p, got in zip(plist, out):
        ref = native.index_scan(p, 64)
        for x, y in zip(ref, got):
            np.testing.assert_array_equal(x, y)


def test_index_scan16_matches_single_scans():
    """The AVX-512 16-stream walker must be record-exact vs the scalar
    walker on sixteen DISTINCT streams (lanes at different block phases)."""
    plist = [JpegStreamParser().parse(_dri0("420", 128, 96, seed=20 + s))
             for s in range(16)]
    out = native.index_scan16(plist, 64)
    if out is None:
        pytest.skip("AVX-512 walker unavailable on this host")
    for p, got in zip(plist, out):
        ref = native.index_scan(p, 64)
        for x, y in zip(ref, got):
            np.testing.assert_array_equal(x, y)


def test_index_scan16_mixed_sizes_rejected():
    """Non-uniform jobs (different dims) must return None (fallback), not
    walk garbage."""
    a = [JpegStreamParser().parse(_dri0("420", 128, 96, seed=30 + s))
         for s in range(8)]
    b = [JpegStreamParser().parse(_dri0("420", 144, 112, seed=40 + s))
         for s in range(8)]
    assert native.index_scan16(a + b, 64) is None


def test_index_scan_rejects_corrupt_stream():
    from rocjpeg_tpu.status import RocJpegError
    blob = _dri0("420", 128, 96, seed=4)
    p = JpegStreamParser().parse(blob)
    bad = bytearray(p.slice_data)
    # A real RSTn marker embedded in a DRI=0 scan is structural corruption.
    bad[len(bad) // 2:len(bad) // 2 + 2] = b"\xff\xd3"
    p.slice_data = bytes(bad)
    with pytest.raises(RocJpegError):
        native.index_scan(p, 64)


# ---------------------------------------------------------------------------
# Wave decode via virtual segments (kernel level)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("css", ["444", "440", "422", "420", "411", "400"])
def test_virtual_wave_css_matrix(css):
    blobs = [_dri0(css, 136, 104, seed=s) for s in range(2)]
    plist = [JpegStreamParser().parse(b) for b in blobs]
    tables = de.DeviceScanTables.from_params(plist[0])
    geom0 = de.GroupGeometry.from_params(plist[0], len(plist))
    packed, dc_flat, lane_of_mcu = de.pack_virtual_segments(
        plist, geom0.total_blocks, 100)
    out, err, geom = de.decode_coefficients_on_device(plist, tables, packed)
    assert not bool(np.asarray(err).any())
    comps = de.unflatten_coefficients(out, geom, plist[0])
    from rocjpeg_tpu.pipeline import _mcu_maps
    mcu_maps = _mcu_maps(geom)
    for i, p in enumerate(plist):
        ref = entropy.decode_scan(p)
        for ci in range(len(ref)):
            a = ref[ci]
            b = np.asarray(comps[ci][i]).copy()
            lanes = lane_of_mcu[i][mcu_maps[ci]]
            b[..., 0] += dc_flat[lanes, ci]
            np.testing.assert_array_equal(a, b[:a.shape[0], :a.shape[1]])


@pytest.mark.parametrize("s", [1, 50, 10 ** 9])
def test_virtual_wave_symbol_budget_variants(s):
    """Budgets below one MCU, mid-range, and beyond the whole image
    (one lane per image)."""
    blob = _dri0("420", 96, 64, seed=5)
    dec = api.Decoder(device_entropy="on")
    import os
    os.environ["ROCJPEG_TPU_VSYMS"] = str(s)
    try:
        img = dec.decode(api.JpegStream(blob), DecodeParams(OutputFormat.Y))
    finally:
        del os.environ["ROCJPEG_TPU_VSYMS"]
    (ref, _), = golden.decode(blob, OutputFormat.Y)
    np.testing.assert_array_equal(np.asarray(img.channel[0]), ref)


# ---------------------------------------------------------------------------
# Full API path
# ---------------------------------------------------------------------------

def test_api_virtual_bit_exact_rgb():
    dec = api.Decoder(device_entropy="on")
    blobs = [_dri0("420", 136, 104, seed=s) for s in range(3)]
    imgs = dec.decode_batched([api.JpegStream(b) for b in blobs],
                              DecodeParams(OutputFormat.RGB))
    assert dec.last_error_flags, "wave path must have run"
    for b, img in zip(blobs, imgs):
        (ref, _), = golden.decode(b, OutputFormat.RGB)
        np.testing.assert_array_equal(np.asarray(img.channel[0]), ref)


def test_api_virtual_corrupt_scan_raises():
    """A stream the index walk rejects must fall back to the host path,
    which reports BAD_JPEG (reference: rocJpegDecode error status)."""
    from rocjpeg_tpu.status import RocJpegError, Status
    blob = _dri0("420", 136, 104, seed=6)
    stream = api.JpegStream(blob)
    cut = stream.params.slice_data[:len(stream.params.slice_data) // 3]
    stream.params.slice_data = cut  # truncate after parse
    dec = api.Decoder(device_entropy="on")
    with pytest.raises(RocJpegError) as ei:
        dec.decode(stream, DecodeParams(OutputFormat.Y))
    assert ei.value.status == Status.BAD_JPEG


def test_mug_420_rides_the_wave_bit_exact():
    """The reference's own 4K corpus (DRI=0) must decode on the wave in
    'auto' mode and stay bit-exact vs the golden oracle."""
    data = open("/root/reference/data/images/mug_420.jpg", "rb").read()
    dec = api.Decoder(device_entropy="auto")
    img = dec.decode(api.JpegStream(data), DecodeParams(OutputFormat.Y))
    assert dec.last_error_flags, "expected the device-entropy path"
    (ref, _), = golden.decode(data, OutputFormat.Y)
    np.testing.assert_array_equal(np.asarray(img.channel[0]), ref)


def test_auto_small_dri0_still_host():
    """Tiny DRI=0 images stay on the host path in auto mode (too few
    virtual lanes to pay for a device program)."""
    blob = _dri0("420", 64, 64, seed=7)
    dec = api.Decoder(device_entropy="auto")
    img = dec.decode(api.JpegStream(blob), DecodeParams(OutputFormat.Y))
    assert not dec.last_error_flags
    (ref, _), = golden.decode(blob, OutputFormat.Y)
    np.testing.assert_array_equal(np.asarray(img.channel[0]), ref)
