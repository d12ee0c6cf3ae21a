#!/usr/bin/env python3
"""Host-noise probe for bench-epoch classification.

The guest is a VM on a shared host: round-10's uniform 1.43x bench
inflation and round-11's mid-day 3.5x sf1 inflation both occurred
with the guest IDLE — load average 6-8 and non-zero CPU pressure
with no runnable guest process, i.e. external (host-neighbor)
contention. Any timing artifact is only comparable to another run
from the same epoch, so every BENCH/BENCH_SCALING run should be
preceded by this probe and its reading recorded next to the number.

Prints one JSON line: fixed-work wall time (single-thread spin,
~1e8 iterations), 1/5/15-min load averages, and /proc/pressure/cpu
avg10/avg60/avg300. Readings are RELATIVE — compare against the
recorded epochs below rather than an absolute bar:
  r11 mid-day NOISY epoch (sf1 keys inflated ~3.5x vs the same
  morning): spin_sec 5.85, load5 6.6, cpu avg300 0.98 — guest idle.
Record a reading alongside every timing artifact; a pair of runs is
only comparable when their spin_sec agree within ~15%.

r12+: the parallel pool is sized to os.cpu_count() (32 here) to
match the bench's local[32]; parallel_spin_sec is NOT comparable to
r11-and-earlier readings taken with the old hardcoded 16-worker
pool (single-thread spin_sec is unaffected and remains the
cross-epoch anchor).
"""
import json
import multiprocessing
import os
import time


def _spin(n):
    x = 0
    for i in range(n):
        x += i & 7
    return x


def main():
    t0 = time.perf_counter()
    x = _spin(100_000_000)
    spin = time.perf_counter() - t0
    # parallel spin: host oversubscription hits wide parallelism far
    # harder than one thread — this is the number that tracks Spark
    # local[32] inflation, so the pool is sized to every guest CPU
    # (32 here), not a fraction of them
    nproc = os.cpu_count() or 32
    t0 = time.perf_counter()
    with multiprocessing.Pool(nproc) as p:
        p.map(_spin, [50_000_000] * nproc)
    pspin = time.perf_counter() - t0
    with open("/proc/loadavg") as f:
        l1, l5, l15 = f.read().split()[:3]
    cpu = {}
    try:
        with open("/proc/pressure/cpu") as f:
            for line in f:
                if line.startswith("some"):
                    for kv in line.split()[1:]:
                        k, _, v = kv.partition("=")
                        if k.startswith("avg"):
                            cpu[k] = float(v)
    except OSError:
        pass
    print(json.dumps({
        "probe": "host_noise",
        "spin_sec": round(spin, 3),
        "parallel_spin_sec": round(pspin, 3),
        "load1": float(l1), "load5": float(l5), "load15": float(l15),
        "cpu_pressure": cpu,
        "checksum": x,
    }))


if __name__ == "__main__":
    main()
