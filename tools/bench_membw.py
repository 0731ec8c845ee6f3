"""Memory-bandwidth ceiling microbenchmark (scaling-evidence support).

Measures aggregate DRAM copy bandwidth (read+write) at increasing process
counts with a 200 MB numpy copy loop per process. Used in BASELINE.md to
separate "the plan doesn't scale" from "the box ran out of memory
bandwidth": stages whose cost is data MOVEMENT (Arrow serialization,
shuffle spill to tmpfs, wide-row streaming through joins) are bounded by
the aggregate number this prints, regardless of core count, while
compute-dense stages (sha256 ingest, detector kernels) keep scaling.

Usage: python tools/bench_membw.py  ->  one JSON line per process count.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np


def worker(q, seconds: float = 6.0) -> None:
    a = np.empty(200_000_000 // 8, dtype=np.float64)  # 200 MB
    b = np.empty_like(a)
    a[:] = 1.0
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        np.copyto(b, a)
        n += 1
    q.put(n * a.nbytes * 2 / (time.time() - t0))  # read+write bytes/s


def main() -> None:
    for procs in (1, 2, 4, 8, 16):
        q = mp.Queue()
        ps = [mp.Process(target=worker, args=(q,)) for _ in range(procs)]
        for p in ps:
            p.start()
        rates = [q.get() for _ in ps]
        for p in ps:
            p.join()
        total = sum(rates) / 1e9
        print(
            json.dumps(
                {
                    "procs": procs,
                    "aggregate_GBps": round(total, 1),
                    "per_proc_GBps": round(total / procs, 1),
                }
            )
        )


if __name__ == "__main__":
    main()
