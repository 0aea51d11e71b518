"""Profile one speculative scan tick at serving shapes; print op groups.

Answers "why does a spec round cost N x a plain decode step" with device-
timeline evidence (the r4 serving sweep measured ~3.8x at 7B b=8 S=512
int8-KV where ~1.3x was expected of the fused chunk path).

    nohup python tools/profile_spec.py > /tmp/prof_spec.log 2>&1 &
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
from collections import defaultdict

sys.path.insert(0, ".")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import argparse

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_config, _random_quant_params
    from rama_tpu.models.llama import QuantKVCache
    from rama_tpu.runtime.engine import _decode_tick, _spec_scan_tick

    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=8, choices=(4, 8))
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    cfg = _flagship_config()
    params = jax.block_until_ready(_random_quant_params(cfg, bits=args.bits))
    log("params loaded")

    b, s, k, m = args.batch, 512, 3, 4
    cache = QuantKVCache.create(cfg, batch=b, max_len=s)
    tokens = jnp.ones((b,), jnp.int32)
    pos = jnp.full((b,), 128, jnp.int32)
    temps = jnp.full((b,), 0.9, jnp.float32)
    tps = jnp.full((b,), 0.9, jnp.float32)
    keys = jnp.zeros((b, 2), jnp.uint32)
    hist = jnp.ones((b, s + k + 2), jnp.int32)

    def run_spec():
        nonlocal cache, hist
        samples, accepts, _t, _p, cache, hist = _spec_scan_tick(
            params, cfg, tokens, pos, temps, tps, keys, cache, hist, k, m)
        return np.asarray(samples)

    def run_tick():
        nonlocal cache
        out, cache = _decode_tick(params, cfg, tokens, pos, temps, tps,
                                  keys, cache, n=8)
        return np.asarray(out)

    for name, fn in (("spec", run_spec), ("tick", run_tick)):
        fn()  # compile+warm
        import time

        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        log(f"{name}: best wall {best * 1e3:.1f} ms "
            f"({'m=%d rounds k=%d' % (m, k) if name == 'spec' else 'n=8'})")

    tdir = "/tmp/spec_trace"
    jax.profiler.start_trace(tdir)
    run_spec()
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        log("no trace found")
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    groups, counts = defaultdict(float), defaultdict(int)
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "?")
        if name.startswith("process_") or "TSl" in name:
            continue
        groups[name] += e["dur"]
        counts[name] += 1
    log(f"-- top ops for one spec scan (m={m} rounds) --")
    for name, dur in sorted(groups.items(), key=lambda kv: -kv[1])[:40]:
        log(f"{dur / m:10.1f} us/round x{counts[name]:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
