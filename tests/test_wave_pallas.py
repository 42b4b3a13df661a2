"""Production Pallas wave kernel under the Pallas interpreter (CPU).

Pins the TPU kernel's emission semantics bit-exactly to the host entropy
oracle across the CSS x restart x corrupt-stream matrix, without TPU
hardware. This is the correctness coverage for kernels/wave_pallas.py —
the jnp wave is covered by tests/test_device_entropy.py; if the two ever
diverge, one of the suites fails.

The interpreter executes the kernel's while loop round-by-round in Python,
so wall time scales with the longest lane's symbol count: the images here
are deliberately low-entropy (smooth gradients -> few AC coefficients) and
small. Dense/noisy payloads are covered by one long-code case.
"""

import numpy as np
import pytest

from rocjpeg_tpu.core import entropy
from rocjpeg_tpu.core.bitstream import JpegStreamParser
from rocjpeg_tpu.ops import device_entropy as de
from rocjpeg_tpu.testing import encoder


@pytest.fixture(autouse=True)
def _interpret_backend(monkeypatch):
    monkeypatch.setenv("ROCJPEG_TPU_WAVE", "pallas-interpret")


def smooth_planes(css, width, height, seed=0):
    """Low-entropy planes: a gradient plus mild blockwise offsets, so each
    8x8 block quantizes to a handful of nonzero coefficients."""
    rng = np.random.default_rng(seed)
    hf, vf = {"444": (1, 1), "440": (1, 2), "422": (2, 1),
              "420": (2, 2), "411": (4, 1), "400": (1, 1)}[css]

    def grad(h, w):
        y = np.linspace(0, 120, h, dtype=np.float32)[:, None]
        x = np.linspace(0, 90, w, dtype=np.float32)[None, :]
        noise = rng.integers(0, 6, (h, w))
        return np.clip(60 + y + x + noise, 0, 255).astype(np.uint8)

    planes = [grad(height, width)]
    if css != "400":
        planes.append(grad(height // vf, width // hf))
        planes.append(grad(height // vf, width // hf))
    return planes


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
def test_pallas_wave_css_matrix(css):
    blobs = [encoder.encode_planes(smooth_planes(css, 64, 48, seed=s), css,
                                   restart_interval=1) for s in range(2)]
    _check_wave(blobs)


@pytest.mark.parametrize("ri", [0, 1, 3])
def test_pallas_wave_restart_intervals(ri):
    # ri=0: one segment carries the whole image (the DRI=0 lane shape).
    blobs = [encoder.encode_planes(smooth_planes("420", 48, 32, seed=s),
                                   "420", restart_interval=ri)
             for s in range(2)]
    _check_wave(blobs)


def test_pallas_wave_dense_long_codes():
    # Max-magnitude coefficients force 16-bit AC codes + 10-bit extends —
    # the deepest code paths in the matcher.
    rng = np.random.default_rng(6)
    coeffs = [rng.choice([-1023, 1023, -255, 255],
                         (2, 8, 64)).astype(np.int32)]
    data = encoder.encode_coefficients(coeffs, encoder.SAMPLING["400"],
                                       64, 16, [encoder.QTABLE_LUMA], [0],
                                       restart_interval=1)
    _check_wave([data])


def test_pallas_wave_detects_corrupt_scan():
    blob = encoder.encode_planes(smooth_planes("420", 48, 32, seed=1),
                                 "420", restart_interval=1)
    p = JpegStreamParser().parse(blob)
    bad = bytearray(p.slice_data)
    if len(bad) > 48:
        for i in range(16, min(48, len(bad))):
            bad[i] = 0xFF if i % 2 else 0xD9
    p.slice_data = bytes(bad)
    tables = de.DeviceScanTables.from_params(p)
    geom0 = de.GroupGeometry.from_params(p, 1)
    try:
        packed = de.pack_segments([p], geom0.total_blocks)
    except Exception:
        return  # host-side segmentation already rejected it — fine
    _, err, _ = de.decode_coefficients_on_device([p], tables, packed)
    assert bool(np.asarray(err).any())
