"""Library logging/observability — the rocjpeg_commons.h analog.

The reference has two macros: ERR (always-on stderr, rocjpeg_commons.h:41)
and INFO (compiled in under DBGINFO, :36-40). Here: err() always prints to
stderr; info() prints when ROCJPEG_TPU_DBGINFO is set; timed() is an
opt-in scope timer for pipeline stages (the reference keeps timing in the
samples — std::chrono around decode calls — so stage timing stays off by
default here too).
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

_DBG = bool(os.environ.get("ROCJPEG_TPU_DBGINFO"))


def err(msg: str) -> None:
    print(f"ERROR: {msg}", file=sys.stderr, flush=True)


def info(msg: str) -> None:
    if _DBG:
        print(f"INFO: {msg}", file=sys.stderr, flush=True)


@contextlib.contextmanager
def timed(label: str):
    """Scope timer, reported through info() (visible under DBGINFO)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        info(f"{label}: {(time.perf_counter() - t0) * 1e3:.2f} ms")
