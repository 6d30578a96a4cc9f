"""Calm-epoch probe for scaling measurements on this shared VM.

The N->4N pair-ratio protocol (BENCH.md par.1) is only meaningful when
the host is not stealing cycles mid-pair; this probe measures the one
resource that gates every job here — shared memory bandwidth — by
streaming a 200 MB numpy array per process at 2 vs 8 pinned cores
(~15 s total, no JVM). Per-core efficiency >= ~0.85 marks an epoch
where a scaling run can show what the plan (rather than the host)
does; the ANN/minhash runs recorded in bench_results/ show every
sub-0.8 engine pair coinciding with a sub-0.8 reading here.

Usage: python tools/calm_probe.py [threshold]   # exit 0 iff calm
"""
import multiprocessing as mp
import os
import sys
import time

import numpy as np


def worker(core, out):
    os.sched_setaffinity(0, {core})
    a = np.empty(25_000_000, dtype=np.float64)  # 200 MB
    a[:] = 1.0
    t_end = time.time() + 5.0
    n = 0
    while time.time() < t_end:
        n += 1
        s = a.sum()
    out.put(n)


def level(cores):
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(c, q)) for c in cores]
    for p in ps:
        p.start()
    tot = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return tot / len(cores)


if __name__ == "__main__":
    per2 = level([0, 1])
    per8 = level(list(range(8)))
    eff = per8 / per2
    print(f"{eff:.3f}")
    sys.exit(0 if eff >= float(sys.argv[1] if len(sys.argv) > 1 else 0.85) else 1)
