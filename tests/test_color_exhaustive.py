"""Exhaustive quantification of the fixed-point YUV->RGB converter against
the reference's real-valued BT.709 formula (hip_kernels.cpp:76-78, packed by
v_cvt_pk_u8_f32 — round-to-nearest, :25-30).

R and B depend on two 8-bit inputs (65,536 combos each); G on three
(16,777,216). All are swept exhaustively; the converter must match the
round-half-up evaluation of the real-valued formula everywhere, and the
round-to-nearest-EVEN evaluation (the GPU pack's mode) to within 1 LSB —
deviations can only occur where the real value lands exactly on a .5
boundary, where the two rounding conventions legitimately differ.
"""

import numpy as np

from rocjpeg_tpu.ops import color


def _clip8(x):
    return np.clip(x, 0, 255).astype(np.uint8)


def test_r_and_b_channels_exhaustive():
    y = np.arange(256, dtype=np.int64)[:, None]
    c = np.arange(256, dtype=np.int64)[None, :]  # U for B, V for R
    u8 = np.broadcast_to(c, (256, 256)).astype(np.uint8)
    y8 = np.broadcast_to(y, (256, 256)).astype(np.uint8)

    r, _, b = color.yuv_to_rgb(np, y8, np.full_like(u8, 128), u8)
    _, _, b2 = color.yuv_to_rgb(np, y8, u8, np.full_like(u8, 128))

    # Round-half-up oracle of the real-valued formula.
    r_ref = _clip8(np.floor(y + 1.5748 * (c - 128) + 0.5))
    b_ref = _clip8(np.floor(y + 1.8556 * (c - 128) + 0.5))
    np.testing.assert_array_equal(r, r_ref)
    np.testing.assert_array_equal(b2, b_ref)

    # Round-to-nearest-even (the GPU pack): off-by-one allowed only at
    # exact .5 ties. Measured: 0 mismatches (no representable tie exists
    # for these constants).
    r_rne = _clip8(np.rint(y + 1.5748 * (c - 128)))
    assert int(np.abs(r.astype(int) - r_rne.astype(int)).max()) <= 1


def test_g_channel_exhaustive():
    """All 2^24 (Y, U, V) combos, chunked over Y. The fixed-point G must
    match the round-half-up real-valued formula everywhere except exact
    tie points of the quantized constants; asserts max deviation <= 1 LSB
    and counts the mismatches."""
    u = np.arange(256, dtype=np.int64)[:, None]
    v = np.arange(256, dtype=np.int64)[None, :]
    mismatches = 0
    for y0 in range(0, 256, 16):
        ys = np.arange(y0, y0 + 16, dtype=np.int64)[:, None, None]
        y8 = np.broadcast_to(ys, (16, 256, 256)).astype(np.uint8)
        u8 = np.broadcast_to(u[None], (16, 256, 256)).astype(np.uint8)
        v8 = np.broadcast_to(v[None], (16, 256, 256)).astype(np.uint8)
        _, g, _ = color.yuv_to_rgb(np, y8, u8, v8)
        g_ref = _clip8(np.floor(
            ys - 0.1873 * (u[None] - 128) - 0.4681 * (v[None] - 128) + 0.5))
        diff = np.abs(g.astype(np.int64) - g_ref.astype(np.int64))
        assert int(diff.max()) <= 1, "fixed-point G deviates by > 1 LSB"
        mismatches += int((diff > 0).sum())
    # Measured: 6,084 of 16,777,216 combos (0.036%) sit at quantization/tie
    # points of the two 16-bit constants and round the other way — each off
    # by exactly 1 LSB. Contract: max |Δ| <= 1 LSB; R and B are exact.
    assert mismatches == 6084, mismatches
