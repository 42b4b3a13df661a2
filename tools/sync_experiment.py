"""Empirical check of Huffman self-synchronization on real JPEG scans.

For the sync-wave design (device-side DRI=0 entropy decode): a lane starting
a canonical walk (assume MCU start: k=0, slot=0) at an arbitrary byte offset
should converge to the TRUE walk's (bit position, k, slot) trajectory within
a few hundred symbols. This script measures the sync distance distribution
on the reference's bundled mug images and on synthetic corpora.
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rocjpeg_tpu.core.bitstream import JpegStreamParser


def build_lut(bits, values, is_dc):
    """16-bit window -> (total_skip, k_advance) fused entry; 0 = invalid."""
    t16 = np.zeros(1 << 16, np.uint32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(int(bits[length - 1])):
            rs = int(values[k])
            run, size = rs >> 4, rs & 15
            if is_dc:
                ent = (length + size) | (1 << 8) | (size << 16)
            else:
                k_adv = (run + 1) if size else (16 if run == 15 else 64)
                ent = (length + size) | (k_adv << 8) | (size << 16)
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            t16[lo:hi] = ent
            code += 1
            k += 1
        code <<= 1
    return t16


def unstuff(scan):
    b = np.frombuffer(scan, np.uint8)
    ff = np.flatnonzero(b[:-1] == 0xFF)
    stuffed = ff[b[ff + 1] == 0x00] + 1
    return np.delete(b, stuffed)


class Walker:
    """Scalar canonical JPEG MCU walker over a clean (unstuffed) stream."""

    def __init__(self, clean, luts, nslots, bitpos=0):
        self.c = clean
        self.luts = luts  # [slot][is_dc] -> t16
        self.nslots = nslots
        self.bit = bitpos
        self.k = 0
        self.s = 0
        self.mcu = 0
        self.nbits = len(clean) * 8

    def peek16(self):
        byte = self.bit >> 3
        sh = self.bit & 7
        w = 0
        for i in range(3):
            v = int(self.c[byte + i]) if byte + i < len(self.c) else 0
            w = (w << 8) | v
        return (w >> (8 - sh)) & 0xFFFF

    def step(self):
        """One symbol. Returns False on invalid code (slides 1 bit)."""
        w = self.peek16()
        ent = int(self.luts[self.s][1 if self.k == 0 else 0][w])
        if ent == 0:
            self.bit += 1  # benign slide (sync-in repair)
            return False
        self.bit += ent & 0xFF
        self.k += (ent >> 8) & 0xFF
        if self.k >= 64:
            self.k = 0
            self.s += 1
            if self.s >= self.nslots:
                self.s = 0
                self.mcu += 1
        return True

    def state(self):
        return (self.bit, self.k, self.s)


def analyze(name, data, probes=24, seed=0):
    p = JpegStreamParser().parse(data)
    clean = unstuff(p.slice_data)
    total = p.num_mcus
    luts = []
    for ci, sc in enumerate(p.scan_components):
        fc = p.components[ci]
        t = p.huffman_tables
        dc = build_lut(t[sc.dc_table_selector].num_dc_codes,
                       t[sc.dc_table_selector].dc_values, True)
        ac = build_lut(t[sc.ac_table_selector].num_ac_codes,
                       t[sc.ac_table_selector].ac_values, False)
        for _ in range(fc.h_sampling_factor * fc.v_sampling_factor):
            luts.append((ac, dc))
    nslots = len(luts)

    # True walk: record the full state trajectory at every symbol boundary.
    tw = Walker(clean, luts, nslots)
    true_states = {}
    while tw.mcu < total and tw.bit < tw.nbits:
        true_states[tw.state()] = tw.mcu
        tw.step()
    print(f"[{name}] clean={len(clean)}B mcus={total} nslots={nslots} "
          f"true walk ended bit={tw.bit}/{tw.nbits} mcu={tw.mcu}")

    rng = np.random.default_rng(seed)
    offs = sorted(rng.integers(64, max(65, len(clean) - 2048), probes))
    dists = []
    fails = 0
    slides = 0
    for off in offs:
        wk = Walker(clean, luts, nslots, bitpos=off * 8)
        synced = None
        for _ in range(4096):
            if wk.state() in true_states:
                synced = wk.bit - off * 8
                break
            if wk.bit >= wk.nbits:
                break
            if not wk.step():
                slides += 1
        if synced is None:
            fails += 1
        else:
            dists.append(synced)
    d = np.array(dists)
    print(f"[{name}] probes={probes} fails={fails} slides={slides} "
          f"sync bits: p50={np.median(d):.0f} p90={np.percentile(d, 90):.0f} "
          f"max={d.max() if d.size else -1}")


if __name__ == "__main__":
    mug = open("/root/reference/data/images/mug_420.jpg", "rb").read()
    analyze("mug_420", mug)
    mug422 = open("/root/reference/data/images/mug_422.jpg", "rb").read()
    analyze("mug_422", mug422)
    # Synthetic corpora (the bench's dri0 generator).
    from bench import build_corpus
    datas = build_corpus(2, 1920, 1088, seed=1, ri_mcus=0)
    for i, d in enumerate(datas):
        analyze(f"dri0_{i}", d)
