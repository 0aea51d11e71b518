"""Serving benchmark: throughput + TTFT against a running rama-tpu server.

    python tools/bench_serving.py --url http://localhost:3000 \
        --concurrency 8 --requests 32 --steps 64

Reports aggregate tok/s, request latency, and TTFT percentiles from the
client side, plus the server's own /metrics snapshot — the measurement the
reference left "TBD" (README.md:106-107).
"""

from __future__ import annotations

import argparse
import asyncio
import json
import time

import aiohttp

PROMPTS = [
    "once upon a time", "the quick brown fox", "in a distant galaxy",
    "my favorite food is", "the meaning of life", "a storm was coming",
]


async def one_request(session, url, prompt, steps, temperature):
    t0 = time.perf_counter()
    ttft = None
    tokens = 0
    params = {"prompt": prompt, "steps": steps, "temperature": temperature}
    async with session.get(f"{url}/gen", params=params) as resp:
        resp.raise_for_status()
        async for raw in resp.content:
            line = raw.decode("utf-8", "replace")
            if line.startswith("data: "):
                if ttft is None:
                    ttft = time.perf_counter() - t0
                tokens += 1
    return {"latency": time.perf_counter() - t0, "ttft": ttft, "tokens": tokens}


async def run(args):
    sem = asyncio.Semaphore(args.concurrency)
    results = []

    async with aiohttp.ClientSession() as session:
        async def task(i):
            async with sem:
                r = await one_request(session, args.url,
                                      PROMPTS[i % len(PROMPTS)], args.steps,
                                      args.temperature)
                results.append(r)

        t0 = time.perf_counter()
        await asyncio.gather(*[task(i) for i in range(args.requests)])
        wall = time.perf_counter() - t0

        async with session.get(f"{args.url}/metrics") as resp:
            server_metrics = await resp.json()

    total_tokens = sum(r["tokens"] for r in results)
    ttfts = sorted(r["ttft"] for r in results if r["ttft"] is not None)
    lats = sorted(r["latency"] for r in results)
    out = {
        "requests": len(results),
        "wall_s": round(wall, 3),
        "total_tokens": total_tokens,
        "throughput_tok_s": round(total_tokens / wall, 2),
        "ttft_p50_s": round(ttfts[len(ttfts) // 2], 3) if ttfts else None,
        "ttft_p95_s": round(ttfts[int(len(ttfts) * 0.95)], 3) if ttfts else None,
        "latency_p50_s": round(lats[len(lats) // 2], 3),
        "server_metrics": server_metrics,
    }
    print(json.dumps(out, indent=2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:3000")
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--temperature", type=float, default=0.9)
    asyncio.run(run(ap.parse_args()))


if __name__ == "__main__":
    main()
