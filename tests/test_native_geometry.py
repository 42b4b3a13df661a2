"""Native lane-geometry bookkeeping (rjt_record_maxes / rjt_lane_geometry)
against a local numpy oracle, jax-free.

This file deliberately imports NO jax so it can run under `make test-asan`
(LD_PRELOAD'd libasan does not coexist with XLA's native libraries); the
jax-integrated equivalence test lives in tests/test_device_entropy.py via
pack_virtual_segments' Python-fallback comparison.
"""
import numpy as np
import pytest

from rocjpeg_tpu.runtime import native

pytestmark = pytest.mark.skipif(
    not (native.AVAILABLE and native.geometry_available()),
    reason="native geometry pass unavailable")


def _synth_records(rng, n_rec, total_mcus, end_bit):
    """A synthetic per-image record set with the walkers' invariants:
    bit offsets strictly increasing from 0, MCU indices non-decreasing
    from 0, and positive symbol counts."""
    bo = np.sort(rng.choice(np.arange(1, end_bit, dtype=np.int64),
                            n_rec - 1, replace=False))
    bo = np.concatenate([[0], bo]).astype(np.int64)
    mi = np.sort(rng.integers(0, total_mcus, n_rec - 1,
                              dtype=np.int32))
    mi = np.concatenate([[0], mi]).astype(np.int32)
    sc = rng.integers(1, 2000, n_rec, dtype=np.int32)
    dc = rng.integers(-2048, 2048, (n_rec, 3), dtype=np.int32)
    return bo, dc, mi, sc


def _oracle(meta, n_pad, total):
    """The Python bookkeeping the native pass replaced (the same loop as
    ops/device_entropy._lane_geometry_py, restated numpy-only)."""
    n_imgs = len(meta)
    lane_words = np.zeros(n_pad, np.int64)
    bit_starts = np.zeros(n_pad, np.int64)
    bit_ends = np.zeros(n_pad, np.int64)
    img_base = np.zeros(n_pad, np.int32)
    mcu_start = np.zeros(n_pad, np.int32)
    mcu_count = np.zeros(n_pad, np.int32)
    lane_bank = np.zeros(n_pad, np.int32)
    dc_flat = np.zeros((n_pad, 3), np.int32)
    lane_of_mcu = np.zeros((n_imgs, total), np.int32)
    max_bits = 0
    max_syms = 0
    for (bo, dc, mi, sc, eb, em, l0, ib, bank, row) in meta:
        n_rec = len(bo)
        sl = slice(l0, l0 + n_rec)
        ends = np.append(bo[1:], eb)
        bit_starts[sl] = bo
        bit_ends[sl] = ends
        lane_words[sl] = (ends - bo + 31) // 32
        nxt = np.append(mi[1:], em) if n_rec else mi
        counts = (nxt - mi).astype(np.int32)
        img_base[sl] = ib
        mcu_start[sl] = mi
        mcu_count[sl] = counts
        lane_bank[sl] = bank
        dc_flat[sl] = dc
        if n_rec:
            for r in range(n_rec):
                lane_of_mcu[row, mi[r]:nxt[r]] = l0 + r
            max_bits = max(max_bits, int((ends - bo).max()))
            max_syms = max(max_syms, int(sc.max()))
    return (lane_words, bit_starts, bit_ends, img_base, mcu_start,
            mcu_count, lane_bank, dc_flat, lane_of_mcu, max_bits, max_syms)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_geometry_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    total = 513
    n_imgs = 5
    meta = []
    acc = 0
    for i in range(n_imgs):
        n_rec = int(rng.integers(1, 40))
        end_bit = int(rng.integers(n_rec + 1, 200_000))
        bo, dc, mi, sc = _synth_records(rng, n_rec, total, end_bit)
        meta.append((bo, dc, mi, sc, end_bit, total, acc,
                     i * 7777, i % 4, i))
        acc += n_rec
    n_pad = acc + int(rng.integers(0, 64))

    exp = _oracle(meta, n_pad, total)

    lane_words = np.zeros(n_pad, np.int64)
    bit_starts = np.zeros(n_pad, np.int64)
    bit_ends = np.zeros(n_pad, np.int64)
    img_base = np.zeros(n_pad, np.int32)
    mcu_start = np.zeros(n_pad, np.int32)
    mcu_count = np.zeros(n_pad, np.int32)
    lane_bank = np.zeros(n_pad, np.int32)
    dc_flat = np.zeros((n_pad, 3), np.int32)
    lane_of_mcu = np.zeros((n_imgs, total), np.int32)
    jobs = native.build_geom_jobs(meta)
    mb, ms = native.record_maxes(jobs, len(meta))
    native.lane_geometry(jobs, len(meta), lane_words, bit_starts, bit_ends,
                         img_base, mcu_start, mcu_count, lane_bank, dc_flat,
                         lane_of_mcu, total)

    got = (lane_words, bit_starts, bit_ends, img_base, mcu_start,
           mcu_count, lane_bank, dc_flat, lane_of_mcu, mb, ms)
    names = ("lane_words", "bit_starts", "bit_ends", "img_base",
             "mcu_start", "mcu_count", "lane_bank", "dc_flat",
             "lane_of_mcu", "max_bits", "max_syms")
    for name, g, e in zip(names, got, exp):
        assert np.array_equal(g, e), name


def test_empty_records():
    """An image with zero kept records (ROI filter tail) writes nothing."""
    meta = [(np.zeros(0, np.int64), np.zeros((0, 3), np.int32),
             np.zeros(0, np.int32), np.zeros(0, np.int32), 0, 0, 0, 0, 0,
             0)]
    jobs = native.build_geom_jobs(meta)
    mb, ms = native.record_maxes(jobs, 1)
    assert (mb, ms) == (0, 0)
    lane_words = np.zeros(4, np.int64)
    arrs = [np.zeros(4, np.int64), np.zeros(4, np.int64)]
    i32 = [np.zeros(4, np.int32) for _ in range(4)]
    dc_flat = np.zeros((4, 3), np.int32)
    lane_of_mcu = np.zeros((1, 8), np.int32)
    native.lane_geometry(jobs, 1, lane_words, arrs[0], arrs[1], i32[0],
                         i32[1], i32[2], i32[3], dc_flat, lane_of_mcu, 8)
    assert not lane_words.any() and not lane_of_mcu.any()
