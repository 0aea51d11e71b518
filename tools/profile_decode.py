"""Profile one decode scan on the real chip and print per-op time groups.

Usage: nohup python tools/profile_decode.py [--bits 4] > /tmp/prof.log 2>&1 &
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--max-len", type=int, default=1024)
    ap.add_argument("--kv", default="bf16", choices=("bf16", "int8"))
    ap.add_argument("--pos", type=int, default=0)
    args = ap.parse_args()

    from __graft_entry__ import _flagship_config, _random_quant_params
    from rama_tpu.models.llama import KVCache, QuantKVCache, decode_step
    from rama_tpu.runtime.sampler import sample_greedy

    cfg = _flagship_config()
    params = jax.block_until_ready(_random_quant_params(cfg, bits=args.bits))
    log("params loaded")

    @partial(jax.jit, static_argnames=("n",), donate_argnames=("cache",))
    def decode_n(params, token, start_pos, cache, n):
        def body(carry, pos):
            token, cache = carry
            logits, cache = decode_step(params, cfg, token,
                                        pos * jnp.ones_like(token), cache)
            nxt = sample_greedy(logits)
            return (nxt, cache), nxt

        (token, cache), out = jax.lax.scan(
            body, (token, cache), start_pos + jnp.arange(n, dtype=jnp.int32))
        return out, cache

    token = jnp.ones((1,), jnp.int32)
    make = QuantKVCache.create if args.kv == "int8" else KVCache.create
    cache = make(cfg, batch=1, max_len=args.max_len)
    pos0 = jnp.int32(args.pos)
    out, cache = decode_n(params, token, pos0, cache, args.steps)
    np.asarray(out)  # warm/compile
    log("warmed; tracing")

    tdir = "/tmp/decode_trace"
    jax.profiler.start_trace(tdir)
    out, cache = decode_n(params, token, pos0, cache, args.steps)
    np.asarray(out)
    jax.profiler.stop_trace()

    # newest trace.json.gz under tdir
    paths = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        log("no trace file found")
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # keep device-lane complete events; group by name
    groups = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        cat = e.get("args", {}).get("device_type", "")
        name = e.get("name", "?")
        if name.startswith("process_") or "TSl" in name:
            continue
        pid = e.get("pid", 0)
        # device timeline pids carry XLA op events; host threads carry python
        if "run_id" in e.get("args", {}) or cat or True:
            groups[name] += e["dur"]
            counts[name] += 1
    for name, dur in sorted(groups.items(), key=lambda kv: -kv[1])[:45]:
        log(f"{dur / args.steps:10.1f} us/step  x{counts[name]:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
