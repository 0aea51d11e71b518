"""Chunked-prefill A/B on the real chip: decode stall + long-prompt TTFT.

Drives the 7B engine directly (no HTTP, the effect is engine-side): a steady
load of short-prompt streams decodes while long prompts are admitted
mid-flight. Measures, per configuration (--chunk 0 = whole-prompt prefill,
--chunk 256 = chunked):

- stall_p95_ms / stall_max_ms: inter-token gap percentiles on the ACTIVE
  short streams around each long admission — the decode hiccup a long
  prompt inflicts on everyone else (VERDICT r3 item 6);
- long_ttft_ms: admission-to-first-token for the long prompts themselves.

    nohup python tools/bench_chunked_prefill.py --bits 8 > /tmp/cpf.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time


def log(m):
    print(m, file=sys.stderr, flush=True)


def run_once(args, chunk: int) -> dict:
    import jax

    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_config, _random_quant_params
    from rama_tpu.config import EngineConfig
    from rama_tpu.runtime.engine import Engine, Request
    from rama_tpu.tokenizer import Tokenizer

    cfg = _flagship_config()
    params = jax.block_until_ready(_random_quant_params(cfg, bits=args.bits))
    tok = Tokenizer.from_file("tests/fixtures/tokenizer.bin", cfg.vocab_size)
    ecfg = EngineConfig(max_batch_size=8, decode_tick=8,
                        max_seq_len=args.max_seq_len, kv_quant="int8",
                        prefill_chunk=chunk,
                        prefill_chunk_min=args.chunk_min or None)
    eng = Engine(cfg, params, tok, ecfg)
    w = eng.warmup(max_prompt=args.long_tokens + 8)
    log(f"chunk={chunk}: warmup {w['programs']} programs "
        f"in {w['seconds']:.1f}s")
    eng.start()

    long_prompt = "the quick brown fox jumps over the lazy dog " * (
        args.long_tokens // 9)
    gaps: list[float] = []
    ttfts: list[float] = []

    def short_stream(i):
        req = eng.submit(Request(prompt="once upon a time", steps=args.steps,
                                 temperature=0.9))
        last = time.perf_counter()
        while True:
            t = req.queue.get(timeout=600)
            if t is None:
                break
            now = time.perf_counter()
            gaps.append(now - last)
            last = now

    def long_stream():
        t0 = time.perf_counter()
        req = eng.submit(Request(prompt=long_prompt, steps=8,
                                 temperature=0.9))
        first = None
        while True:
            t = req.queue.get(timeout=600)
            if t is None:
                break
            if first is None:
                first = time.perf_counter() - t0
        if first is not None:
            ttfts.append(first)

    try:
        # warm the decode ticks + short prefill bucket
        short_stream(0)
        gaps.clear()
        # 6 steady short streams; after they are flowing, admit 2 long
        # prompts one second apart
        shorts = [threading.Thread(target=short_stream, args=(i,))
                  for i in range(6)]
        for th in shorts:
            th.start()
        time.sleep(1.0)
        longs = []
        for _ in range(2):
            th = threading.Thread(target=long_stream)
            th.start()
            longs.append(th)
            time.sleep(1.0)
        for th in shorts + longs:
            th.join(timeout=600)
    finally:
        eng.stop()
    gaps.sort()
    return {
        "chunk": chunk,
        "stall_p95_ms": round(gaps[int(len(gaps) * 0.95)] * 1e3, 1)
        if gaps else None,
        "stall_max_ms": round(gaps[-1] * 1e3, 1) if gaps else None,
        "long_ttft_ms": [round(t * 1e3, 1) for t in ttfts],
        "engine_errors": eng.metrics["engine_errors"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=8, choices=(4, 8))
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--long-tokens", type=int, default=1500)
    ap.add_argument("--max-seq-len", type=int, default=2048)
    ap.add_argument("--chunks", default="0,256")
    ap.add_argument("--chunk-min", type=int, default=0,
                    help="prefill_chunk_min engage threshold (0 = engine "
                         "default, 4x chunk)")
    args = ap.parse_args()

    results = [run_once(args, int(c)) for c in args.chunks.split(",")]
    print(json.dumps({"metric": "chunked_prefill_ab_7b", "results": results}),
          flush=True)


if __name__ == "__main__":
    main()
