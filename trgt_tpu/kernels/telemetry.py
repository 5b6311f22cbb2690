"""Device-work telemetry: DP cell-update counters per kernel family.

Each device kernel wrapper records the PADDED work it dispatches
(batch x rows x cols, i.e. what the chip actually computes, including
padding waste), so the bench can report cell-updates/sec per stage and
compare against a roofline instead of raw loci/sec (VERDICT r2 weak #7).
The counters are cumulative per process; bench.py snapshots them around
a timed run. Thread-safe: the extraction prefetch thread and the main
thread both dispatch kernels.
"""

import threading
from collections import Counter

_LOCK = threading.Lock()
_CELLS: Counter = Counter()


def add_cells(kind: str, n: int) -> None:
    with _LOCK:
        _CELLS[kind] += int(n)


def snapshot() -> dict:
    with _LOCK:
        return dict(_CELLS)


def clear() -> None:
    with _LOCK:
        _CELLS.clear()
