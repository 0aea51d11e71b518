"""Device-timeline kernel timing for TPU micro-benchmarks.

Wall-clock slope timing is unreliable over the axon tunnel (the same compiled
program's dispatch can vary 2x between processes); the profiler's device
timeline is reproducible to ~0.1%. This helper traces a callable and sums the
durations of device events whose name contains a match string (Pallas calls
appear as "closed_call.N"; XLA ops by fused op name).
"""

from __future__ import annotations

import glob
import gzip
import json
import shutil
import sys
import tempfile


def log(m):
    print(m, file=sys.stderr, flush=True)


def device_time(fn, match: str, divisor: int = 1, verbose_miss: bool = True):
    """Run fn() under a trace; return (us_per_divisor, event_count) for
    device events containing `match`, or (None, 0) if none matched."""
    import jax

    tdir = tempfile.mkdtemp(prefix="ktrace_")
    jax.profiler.start_trace(tdir)
    fn()
    jax.profiler.stop_trace()
    paths = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        shutil.rmtree(tdir, ignore_errors=True)
        return None, 0
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    tot, cnt = 0.0, 0
    groups = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        nm = e.get("name", "")
        if nm.startswith("$"):
            continue
        groups[nm] = groups.get(nm, 0.0) + e["dur"]
        if match in nm:
            tot += e["dur"]
            cnt += 1
    shutil.rmtree(tdir, ignore_errors=True)
    if cnt == 0:
        if verbose_miss:
            top = sorted(groups.items(), key=lambda kv: -kv[1])[:12]
            log(f"    [no event matched '{match}'; top: "
                + ", ".join(f"{n}={d:.0f}us" for n, d in top) + "]")
        return None, 0
    return tot / divisor, cnt


def best_device_time(fn, match: str, divisor: int = 1, reps: int = 3):
    """Min of device_time over reps (first call should be pre-warmed)."""
    best = None
    for _ in range(reps):
        per, cnt = device_time(fn, match, divisor)
        if per is not None and (best is None or per < best):
            best = per
    return best
