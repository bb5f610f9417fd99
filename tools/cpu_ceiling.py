"""Hardware scaling-ceiling probe for the N-vs-4N evidence run.

This sandbox is a virtualized single-socket box with noisy neighbors: a
PURE-CPU spin loop (no memory traffic, no shared state, no Ray) run in 32
concurrent processes is measurably slower per process than in 8 — i.e.
the HOST caps how well any embarrassingly-parallel program can scale
8→32 here. `ceiling(lo, hi)` measures that cap so `bench.py --scaling`
can report pipeline efficiency alongside the machine's ceiling; on a real
N→4N node cluster (separate sockets, separate memory buses) this ceiling
is ~1.0 and does not bind.

Run standalone: python tools/cpu_ceiling.py [lo hi]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

_ITERS = 20_000_000


def _spin(_):
    t0 = time.perf_counter()
    x = 0
    for i in range(_ITERS):
        x += i & 7
    return time.perf_counter() - t0


def per_proc_sec(n_procs: int) -> float:
    """Mean wall time of the fixed spin when n_procs run concurrently."""
    with mp.Pool(n_procs) as pool:
        times = pool.map(_spin, range(n_procs))
    return sum(times) / len(times)


def ceiling(lo: int = 8, hi: int = 32, reps: int = 2) -> dict:
    """Best-of-reps per-proc times; ceiling_efficiency = the efficiency an
    IDEAL fully-parallel workload would show going lo→hi on this host."""
    lo_t = min(per_proc_sec(lo) for _ in range(reps))
    hi_t = min(per_proc_sec(hi) for _ in range(reps))
    return {
        "spin_sec_per_proc_lo": round(lo_t, 3),
        "spin_sec_per_proc_hi": round(hi_t, 3),
        "ceiling_efficiency": round(lo_t / hi_t, 3),
    }


if __name__ == "__main__":
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    print(json.dumps({"lo": lo, "hi": hi, **ceiling(lo, hi)}))
