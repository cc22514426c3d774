"""Standalone machine-speed probe: print bench.py's CPU calibration
constant plus /proc/loadavg WITHOUT running any queries.

Round 13 measured a ~2x same-code headline spread (51.4 s vs 101.3 s)
that /proc/loadavg could not see (it read 0.08 at the slow run's
start) — co-tenant / frequency / memory-bandwidth contention is
invisible to the run queue, so bench.py records a
`cpu_calib_start/end_sec` pair with every run. This probe exposes the
same instrument standalone so a session can decide BEFORE a ~10-min
bench run whether the machine is in the quiet band (0.077-0.103 s on
this box, measured at the round-13 close) or inside an ambient
episode — and so post-hoc readers can spot-check the machine between
runs without paying for one.

Usage: `python tools/cpu_calib.py [n_probes]` — prints one JSON line
per probe: `{"cpu_calib_sec": ..., "loadavg": [...], "quiet_band":
[0.077, 0.103]}`. Exit code 0 if the LAST probe is inside the band,
1 otherwise (so shell scripts can gate: `python tools/cpu_calib.py ||
echo "ambient episode - defer bench"`).
"""

import json
import sys
import time

QUIET_BAND = (0.077, 0.103)  # measured round-13 close, this box


def cpu_calibration() -> float:
    """Best-of-3 wall seconds for bench.py's fixed single-thread
    allocation-free arithmetic loop (kept textually in sync with
    bench._cpu_calibration; importing bench here would drag the
    pyspark import into a probe that must stay sub-second)."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = 0
        for i in range(2_000_000):
            acc += i * i
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    calib = None
    for _ in range(n):
        calib = cpu_calibration()
        with open("/proc/loadavg") as fh:
            load = [float(x) for x in fh.read().split()[:3]]
        print(
            json.dumps(
                {
                    "cpu_calib_sec": calib,
                    "loadavg": load,
                    "quiet_band": list(QUIET_BAND),
                }
            ),
            flush=True,
        )
    sys.exit(0 if calib is not None and calib <= QUIET_BAND[1] else 1)


if __name__ == "__main__":
    main()
