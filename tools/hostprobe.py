#!/usr/bin/env python3
"""One-line host-noise probe for pairing with benchmark walls.

The guest loadavg is blind to co-tenant contention on this shared host;
CPU-only probes also read nominal when the bottleneck is the host MEMORY
BUS (the resource Spark shuffles/scans actually saturate). This probe
measures single-thread and 8-way aggregate memcpy bandwidth — the one
signal observed to collapse (>2x) exactly in the windows where identical
builds run 2-3x slower wall. Record its line next to every headline
bench number.
"""
import array
import json
import multiprocessing as mp
import os
import time


def memcpy_mbs(reps: int = 5, mb: int = 80) -> float:
    n = mb * 1_000_000 // 8
    b = array.array("q", bytes(8 * n))
    t = time.time()
    for _ in range(reps):
        c = b[:]  # noqa: F841
    dt = time.time() - t
    return reps * mb / dt


def _worker(_):
    return memcpy_mbs(reps=3)


def main():
    one = memcpy_mbs()
    with mp.Pool(8) as p:
        per = p.map(_worker, range(8))
    agg = sum(per)
    load1, load5, load15 = os.getloadavg()
    print(json.dumps({
        "probe": "memcpy",
        "one_thread_mbs": round(one),
        "eight_way_aggregate_mbs": round(agg),
        "loadavg": [round(load1, 2), round(load5, 2), round(load15, 2)],
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }))


if __name__ == "__main__":
    main()
