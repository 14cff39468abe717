"""Memory-bandwidth roofline probe for the single-box scaling measurements.

The KG-build headline became DRAM-bound at full width in round 3 (t16≈t32 on
the 246M-turn input). This probe demonstrates the BOX ceiling independently
of any engine code: a pure numpy STREAM-triad-like kernel (a = b + s·c over
arrays far larger than LLC) run in 1..32 concurrent PROCESSES. If aggregate
GB/s stops growing past P processes while per-process work is embarrassingly
parallel, then any data engine moving bytes at that rate is bandwidth-capped
at P cores on this machine — and sub-saturation CPU levels are the faithful
proxy for multi-node scaling, where every node brings its own memory
channels.

Prints one JSON line: {"procs": {1: GBps, 2: ..., ...}, "array_mb": M}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

ARRAY_MB = int(os.environ.get("ROOFLINE_ARRAY_MB", "256"))
REPEATS = int(os.environ.get("ROOFLINE_REPEATS", "3"))


def _triad(n_iter: int, q: "mp.Queue") -> None:
    import numpy as np

    n = ARRAY_MB * 1024 * 1024 // 8
    b = np.ones(n)
    c = np.ones(n)
    a = np.empty(n)
    s = np.empty(n)  # scratch for the 0.5*c temporary, pre-faulted too
    # WARM every page of every buffer: on this Firecracker microVM a
    # first-touch page fault traps to the host and costs ~100× a DRAM
    # access, so an unwarmed run measures the hypervisor, not the memory
    for _ in range(2):
        np.multiply(c, 0.5, out=s)
        np.add(b, s, out=a)
    t0 = time.time()
    for _ in range(n_iter):
        np.multiply(c, 0.5, out=s)
        np.add(b, s, out=a)
    dt = time.time() - t0
    # bytes per iter: c r + s w + b r + s r + a w = 5 array passes
    q.put(5 * 8 * n * n_iter / dt / 1e9)  # GB/s for this process


def measure(procs: int, n_iter: int = 4) -> float:
    best = 0.0
    for _ in range(REPEATS):
        q: "mp.Queue" = mp.Queue()
        ps = [mp.Process(target=_triad, args=(n_iter, q)) for _ in range(procs)]
        for p in ps:
            p.start()
        total = sum(q.get() for _ in ps)
        for p in ps:
            p.join()
        best = max(best, total)
    return round(best, 1)


if __name__ == "__main__":
    levels = [int(x) for x in (sys.argv[1:] or ["1", "2", "4", "8", "16", "32"])]
    out = {"array_mb": ARRAY_MB, "gbps": {}}
    for p in levels:
        out["gbps"][p] = measure(p)
    print(json.dumps(out))
