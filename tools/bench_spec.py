"""Device-timeline cost of a speculative verification tick vs a plain
decode step at 7B shapes — the number that decides whether spec serving
wins (NEXT.md #5).

Measures three programs, each as ONE dispatch of an 8-iteration scan so the
tunnel's dispatch jitter cancels:
  step   — plain decode_step scan (the non-spec engine tick)
  fused  — forward_chunk T=k+1 via the chunked carry-cache kernels
  generic— the (B, T) forward the spec tick used before (re-stacks cache)

Per tick the spec path emits accept+1 in [1, k+1] tokens, so the break-even
mean accept is fused_cost/step_cost - 1.

Usage: nohup python tools/bench_spec.py [--bits 8] [-b 8] [-k 3] > log 2>&1 &
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import shutil
import sys
import tempfile
from collections import defaultdict
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def device_busy_us(fn, reps: int = 3):
    """Trace fn() and return min over reps of the device-pid "XLA Modules"
    lane total (whole-program device occupancy).

    Summing ALL device-lane events double-counts: every TPU pid carries both
    an "XLA Modules" lane (one event per executed program) and an "XLA Ops"
    lane (the same time split per op), and scan-heavy programs inflated 4x+
    that way (measured late r4: 58 ms/step vs 14.2 ms by wall slope for the
    identical b=8 int8 program — earlier RATIOS from this tool stay valid,
    absolute rows don't). Falls back to the all-events sum only if no module
    lane is labeled."""
    best = None
    for _ in range(reps):
        tdir = tempfile.mkdtemp(prefix="spectrace_")
        jax.profiler.start_trace(tdir)
        fn()
        jax.profiler.stop_trace()
        paths = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))
        if not paths:
            shutil.rmtree(tdir, ignore_errors=True)
            continue
        with gzip.open(paths[-1], "rt") as f:
            trace = json.load(f)
        events = trace.get("traceEvents", [])
        dev_pids = {e["pid"] for e in events
                    if e.get("ph") == "M" and e.get("name") == "process_name"
                    and "TPU" in str(e.get("args", {}).get("name", ""))}
        module_tids = {(e["pid"], e.get("tid")) for e in events
                       if e.get("ph") == "M" and e.get("name") == "thread_name"
                       and e["pid"] in dev_pids
                       and e.get("args", {}).get("name") == "XLA Modules"}
        # per-pid fallback: a device pid without a labeled module lane (seen
        # in some multi-chip traces) contributes its all-events sum instead
        # of being silently dropped (ADVICE r4)
        module_pids = {pid for pid, _ in module_tids}
        tot = 0.0
        for e in events:
            if e.get("ph") != "X" or "dur" not in e:
                continue
            pid = e.get("pid")
            if pid in module_pids:
                if (pid, e.get("tid")) not in module_tids:
                    continue
            elif dev_pids and pid not in dev_pids:
                continue
            nm = e.get("name", "")
            if nm.startswith(("$", "process_")) or "TSl" in nm:
                continue
            tot += e["dur"]
        shutil.rmtree(tdir, ignore_errors=True)
        if tot and (best is None or tot < best):
            best = tot
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=8, choices=(4, 8))
    ap.add_argument("-b", "--batch", type=int, default=8)
    ap.add_argument("-k", type=int, default=3, help="drafted tokens per tick")
    ap.add_argument("--ticks", type=int, default=8)
    ap.add_argument("--max-len", type=int, default=1024)
    args = ap.parse_args()

    from __graft_entry__ import _flagship_config, _random_quant_params
    from rama_tpu.models.llama import KVCache, decode_step, forward, forward_chunk
    from rama_tpu.runtime.sampler import sample_batched

    cfg = _flagship_config()
    params = jax.block_until_ready(_random_quant_params(cfg, bits=args.bits))
    log(f"params loaded (int{args.bits}); b={args.batch} k={args.k}")

    b, k, n = args.batch, args.k, args.ticks
    t = k + 1
    temps = jnp.full((b,), 0.9)
    top_ps = jnp.full((b,), 0.9)
    key = jax.random.PRNGKey(0)

    @partial(jax.jit, donate_argnames=("cache",))
    def steps_n(params, token, pos0, cache):
        def body(carry, key_j):
            token, pos, cache = carry
            logits, cache = decode_step(params, cfg, token, pos, cache)
            nxt = sample_batched(logits, key_j, temps, top_ps)
            return (nxt, pos + 1, cache), nxt

        keys = jax.random.split(key, n)
        (token, _, cache), out = jax.lax.scan(
            body, (token, pos0 * jnp.ones((b,), jnp.int32), cache), keys)
        return out, cache

    def make_ticks(fwd):
        @partial(jax.jit, donate_argnames=("cache",))
        def ticks_n(params, token, pos0, cache):
            def body(carry, key_j):
                token, pos, cache = carry
                chunk = jnp.concatenate(
                    [token[:, None],
                     jnp.broadcast_to(token[:, None], (b, k))], axis=1)
                logits, cache = fwd(params, cfg, chunk, pos, cache)
                nxt = sample_batched(logits[:, -1], key_j, temps, top_ps)
                return (nxt, pos + t, cache), nxt

            keys = jax.random.split(key, n)
            (token, _, cache), out = jax.lax.scan(
                body, (token, pos0 * jnp.ones((b,), jnp.int32), cache), keys)
            return out, cache

        return ticks_n

    def generic_fwd(params, cfg, chunk, pos0, cache):
        pos_index = pos0[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
        return forward(params, cfg, chunk, pos_index, cache)

    token = jnp.ones((b,), jnp.int32)
    results = {}
    for name, fn, per in [
        ("step", steps_n, n),
        ("fused", make_ticks(forward_chunk), n),
        ("generic", make_ticks(generic_fwd), n),
    ]:
        holder = [KVCache.create(cfg, batch=b, max_len=args.max_len)]

        def run():
            out, holder[0] = fn(params, token, jnp.int32(64), holder[0])
            np.asarray(out)  # completion barrier

        run()  # compile + warm
        us = device_busy_us(run)
        del holder
        if us is None:
            log(f"{name}: no trace")
            continue
        results[name] = us / per
        log(f"{name:8s}: {us / per:8.1f} us per {'tick' if per == n else '?'}")

    if "step" in results and "fused" in results:
        be = results["fused"] / results["step"] - 1
        log(f"fused tick = {results['fused'] / results['step']:.2f} plain "
            f"steps -> break-even mean accept {be:.2f} of k={k}")
    if "generic" in results and "fused" in results:
        log(f"fused is {results['generic'] / results['fused']:.2f}x cheaper "
            f"than the generic chunk forward")
    print(json.dumps({kk: round(vv, 1) for kk, vv in results.items()}))


if __name__ == "__main__":
    main()
