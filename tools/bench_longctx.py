"""Long-context decode benchmark: 7B tok/s vs cache fill position at S=16K.

The reference caps context at the checkpoint header's seq_len (2048 for
llama2 exports, /root/reference/engine/export/export.py:411) and its
attention scans 0..pos serially; here the S-tiled decode-attention kernel
(ops/pallas/decode_attention.py) streams only the tiles below each slot's
position, so a 16K cache costs proportionally to the live prefix, not to S.
This tool pins that claim on the real chip: decode-step slope at several fill
positions of a 16K cache.

    nohup timeout 3600 python tools/bench_longctx.py --bits 8 --kv int8 &
    nohup timeout 3600 python tools/bench_longctx.py --bits 4 --kv bf16 &

Memory: int8 weights (6.9 GB) + int8 16K KV (4.4 GB) fits v5e; the bf16 16K
cache (8.6 GB) needs int4 weights (3.5 GB).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=8, choices=(4, 8))
    ap.add_argument("--kv", default="int8", choices=("int8", "bf16"))
    ap.add_argument("--max-len", type=int, default=16384)
    ap.add_argument("--positions", type=str, default="")
    ap.add_argument("--paged", action="store_true",
                    help="decode against a page pool (same capacity) via the"
                         " ragged paged kernels instead of the dense cache")
    ap.add_argument("--page-size", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_config, _random_quant_params
    from rama_tpu.models.llama import KVCache, QuantKVCache, decode_step
    from rama_tpu.runtime.sampler import sample_greedy

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    cfg = _flagship_config()
    t0 = time.time()
    params = jax.block_until_ready(_random_quant_params(cfg, bits=args.bits))
    if args.max_len > params["rope_cos"].shape[0]:
        # retabulate RoPE to the cache length (the engine does the same for
        # long-context serving); without this, rows past seq_len clip to the
        # last table row — same cost, dishonest rotations
        from rama_tpu.checkpoint import compute_freqs

        cos, sin = compute_freqs(cfg, seq_len=args.max_len)
        params["rope_cos"] = jnp.asarray(cos, jnp.float32)
        params["rope_sin"] = jnp.asarray(sin, jnp.float32)
    log(f"params on device in {time.time() - t0:.1f}s (int{args.bits})")

    S = args.max_len
    if args.positions:
        positions = [int(p) for p in args.positions.split(",")]
    else:
        positions = [1024, 4096, 8192, S - 72]

    token = jnp.ones((1,), jnp.int32)
    if args.paged:
        from rama_tpu.runtime.paged import (PagedKVCache, QuantPagedKVCache,
                                            _decode_step_paged_impl)

        ps = args.page_size
        num_pages = S // ps
        page_tables = jnp.arange(num_pages, dtype=jnp.int32)[None, :]

        @partial(jax.jit, static_argnames=("n",), donate_argnames=("cache",))
        def decode_n(params, token, start_pos, cache, n):
            def body(carry, pos):
                token, cache = carry
                logits, cache = _decode_step_paged_impl(
                    params, cfg, token, pos * jnp.ones_like(token), cache,
                    page_tables)
                nxt = sample_greedy(logits)
                return (nxt, cache), nxt

            (token, cache), out = jax.lax.scan(
                body, (token, cache),
                start_pos + jnp.arange(n, dtype=jnp.int32))
            return out, cache

        pmake = (QuantPagedKVCache.create if args.kv == "int8"
                 else PagedKVCache.create)
        cache = pmake(cfg, num_pages, ps)
        log(f"cache: paged {args.kv} S={S} ({num_pages} pages x {ps})")
    else:
        @partial(jax.jit, static_argnames=("n",), donate_argnames=("cache",))
        def decode_n(params, token, start_pos, cache, n):
            def body(carry, pos):
                token, cache = carry
                logits, cache = decode_step(params, cfg, token,
                                            pos * jnp.ones_like(token), cache)
                nxt = sample_greedy(logits)
                return (nxt, cache), nxt

            (token, cache), out = jax.lax.scan(
                body, (token, cache),
                start_pos + jnp.arange(n, dtype=jnp.int32))
            return out, cache

        make = QuantKVCache.create if args.kv == "int8" else KVCache.create
        cache = make(cfg, batch=1, max_len=S)
        log(f"cache: {args.kv} S={S}")

    curve = []
    for pos0 in positions:
        times = {}
        for n in (8, 64):
            out, cache = decode_n(params, token, jnp.int32(pos0), cache, n)
            np.asarray(out)  # compile+warm; barrier
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out, cache = decode_n(params, token, jnp.int32(pos0), cache, n)
                np.asarray(out)
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        per_step = (times[64] - times[8]) / 56
        tok_s = 1.0 / per_step
        curve.append({"pos": pos0, "tok_s": round(tok_s, 1),
                      "ms_step": round(per_step * 1e3, 2)})
        log(f"pos={pos0}: {per_step * 1e3:.2f} ms/step -> {tok_s:.1f} tok/s")

    tag = "_paged" if args.paged else ""
    print(json.dumps({
        "metric": (f"decode_tok_s_vs_pos_7b_int{args.bits}"
                   f"_kv_{args.kv}{tag}_s{S}"),
        "curve": curve,
    }), flush=True)


if __name__ == "__main__":
    main()
