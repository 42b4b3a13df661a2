"""The bench regression gate must ratchet against the BEST-EVER recorded
round, not only the previous one — a chain of 0.93x declines never trips a
previous-round-only gate (VERDICT r04 #3)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import check_regressions  # noqa: E402


def _write_round(d, n, headline, mug=1000.0):
    with open(os.path.join(d, f"BENCH_r{n}.json"), "w") as f:
        json.dump({"parsed": {"value": headline,
                              "mug420_mpix_s": mug}}, f)


def test_gate_passes_on_parity(tmp_path):
    _write_round(tmp_path, 1, 7000.0)
    _write_round(tmp_path, 2, 6900.0)
    assert not check_regressions({"value": 6950.0,
                                  "mug420_mpix_s": 1000.0},
                                 bench_dir=str(tmp_path))


def test_gate_trips_vs_previous_round(tmp_path):
    _write_round(tmp_path, 1, 7000.0)
    assert check_regressions({"value": 5000.0, "mug420_mpix_s": 1000.0},
                             bench_dir=str(tmp_path))


def test_gate_trips_on_slow_ratchet_vs_best(tmp_path):
    """Each round inside the previous-round tolerance (0.93x steps), but
    the cumulative drift falls below 0.85x best-ever: must trip."""
    _write_round(tmp_path, 1, 7000.0)   # best
    _write_round(tmp_path, 2, 6510.0)   # 0.93x r1 -- passed old gate
    _write_round(tmp_path, 3, 6054.0)   # 0.93x r2 -- passed old gate
    # 0.93x r3 = 5630 = 0.80x best: previous-round ratio is fine (>= 0.8),
    # best-ever ratio (< 0.85) must flag.
    assert check_regressions({"value": 5630.0, "mug420_mpix_s": 1000.0},
                             bench_dir=str(tmp_path))


def test_gate_improvement_never_trips(tmp_path):
    _write_round(tmp_path, 1, 7000.0, mug=743.0)
    assert not check_regressions({"value": 7500.0,
                                  "mug420_mpix_s": 1400.0},
                                 bench_dir=str(tmp_path))


def test_gate_handles_missing_legs(tmp_path):
    _write_round(tmp_path, 1, 7000.0)
    # A result missing some legs (e.g. no reference corpus) must not crash
    # and must still gate the legs present.
    assert not check_regressions({"value": 6900.0},
                                 bench_dir=str(tmp_path))
    assert check_regressions({"value": 100.0}, bench_dir=str(tmp_path))


def test_gate_no_history_is_silent(tmp_path):
    assert not check_regressions({"value": 1.0}, bench_dir=str(tmp_path))
