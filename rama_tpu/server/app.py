"""HTTP inference server — the framework's L6.

Route parity with the reference server (server/src/main.rs:74-143):
- GET  /       -> HTML chat page with an EventSource client
- GET  /gen?prompt=...  -> SSE token stream (newlines escaped as \\n, like
                           mod.rs:246), with keep-alive
- POST /chat   -> echo stub (the reference's /chat is a stub too,
                  server/src/main.rs:115-117)

Additions over the reference (SURVEY §5 called these out as absent there):
- GET /metrics -> JSON: tok/s, TTFT p50/p95, slot occupancy, queue depth
- GET /healthz
- graceful 503 when the admission queue is full (the reference's bounded(30)
  channel just blocks)

Run:  python -m rama_tpu.server.app -m model.bin -t tokenizer.bin \
          [--address 0.0.0.0:3000] [--quant auto] [--batch 8]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import queue as queue_mod

from aiohttp import web

from rama_tpu.config import EngineConfig
from rama_tpu.runtime.engine import Engine, Request

HTML_PAGE = """<!DOCTYPE html>
<html>
<head><title>rama-tpu</title>
<style>
 body { font-family: monospace; margin: 2rem auto; max-width: 46rem; }
 #out { white-space: pre-wrap; border: 1px solid #999; min-height: 8rem;
        padding: 1rem; margin-top: 1rem; }
 input { width: 80%; padding: .4rem; } button { padding: .4rem 1rem; }
</style></head>
<body>
<h2>rama-tpu</h2>
<form id="f"><input id="p" placeholder="prompt..." autofocus>
<button>generate</button></form>
<div id="out"></div>
<script>
const f = document.getElementById('f'), p = document.getElementById('p'),
      out = document.getElementById('out');
let es = null;
f.addEventListener('submit', (e) => {
  e.preventDefault();
  if (es) es.close();
  out.textContent = '';
  es = new EventSource('/gen?prompt=' + encodeURIComponent(p.value));
  es.onmessage = (m) => { out.textContent += m.data.replaceAll('\\\\n', '\\n'); };
  es.onerror = () => es.close();
});
</script>
</body></html>"""


ENGINE_KEY = web.AppKey("engine", Engine)


def build_app(engine: Engine, default_steps: int = 255) -> web.Application:
    app = web.Application()
    app[ENGINE_KEY] = engine

    async def home(_req):
        return web.Response(text=HTML_PAGE, content_type="text/html")

    async def gen(request: web.Request):
        prompt = request.query.get("prompt", "")
        try:
            steps = int(request.query.get("steps", default_steps))
            temperature = float(request.query.get("temperature", 1.0))
            top_p = float(request.query.get("topp", 0.9))
        except ValueError as e:
            return web.json_response({"error": f"bad parameter: {e}"}, status=400)
        if steps < 1 or not (0.0 <= temperature <= 10.0) or not (0.0 < top_p <= 1.0):
            return web.json_response(
                {"error": "steps must be >=1, temperature in [0,10], topp in (0,1]"},
                status=400)
        echo = request.query.get("echo", "0") in ("1", "true")

        req = Request(prompt=prompt, steps=steps, temperature=temperature,
                      top_p=top_p, echo_prompt=echo)
        try:
            engine.submit(req, timeout=0.5)
        except queue_mod.Full:
            return web.json_response({"error": "server overloaded"}, status=503)

        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
            "Connection": "keep-alive",
        })
        await resp.prepare(request)
        if req.truncated:
            # SSE comment: visible to curious clients, ignored by
            # EventSource — the prompt was cut to fit the cache
            await resp.write(
                f": prompt truncated ({req.truncated} tokens dropped "
                f"to fit max_seq_len)\n\n".encode())
        loop = asyncio.get_running_loop()
        try:
            while True:
                # bridge the engine's thread-side queue into asyncio, with a
                # keep-alive comment on idle (reference: .keep_alive(),
                # server/src/main.rs:109-112)
                try:
                    tok = await asyncio.wait_for(
                        loop.run_in_executor(None, req.queue.get, True, 15.0),
                        timeout=20.0)
                except (asyncio.TimeoutError, queue_mod.Empty):
                    await resp.write(b": keep-alive\n\n")
                    continue
                if tok is None:
                    if req.error:
                        # distinguish engine failure from normal completion
                        await resp.write(
                            f"event: error\ndata: {req.error}\n\n".encode())
                    break
                data = tok.replace("\n", "\\n")
                await resp.write(f"data: {data}\n\n".encode())
        except (ConnectionResetError, asyncio.CancelledError):
            req.cancelled = True  # engine frees the slot on its next tick
            raise
        await resp.write_eof()
        return resp

    async def chat(request: web.Request):
        # parity: the reference /chat just echoes the body (main.rs:115-117)
        body = await request.text()
        return web.Response(text=body)

    async def metrics(_req):
        return web.json_response(engine.stats())

    async def healthz(_req):
        return web.json_response({"ok": True})

    app.router.add_get("/", home)
    app.router.add_get("/gen", gen)
    app.router.add_post("/chat", chat)
    app.router.add_get("/metrics", metrics)
    app.router.add_get("/healthz", healthz)
    return app


def load_engine(model_path: str, tokenizer_path: str, quant: str = "auto",
                dtype: str = "bfloat16", batch: int = 8,
                max_seq_len: int | None = None, paged: bool = False,
                page_size: int = 128, tp: int = 1, dp: int = 1,
                seq_par: bool = False,
                kv_quant: str | None = None, scale_dtype: str | None = None,
                spec_tick: int = 0,
                spec_mode: str = "ngram", spec_draft_model: str | None = None,
                prefill_chunk: int = 0,
                prefill_chunk_min: int | None = None,
                compile_cache: str | None = None) -> Engine:
    import jax.numpy as jnp

    from rama_tpu.checkpoint import (load_checkpoint, load_checkpoint_quantized,
                                     peek_version)
    from rama_tpu.models.llama import (load_params, load_params_quantized,
                                       quantize_params)
    from rama_tpu.tokenizer import Tokenizer

    jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    if quant == "auto" and peek_version(model_path) == 2:
        qp = load_checkpoint_quantized(model_path)
        cfg, params = qp.config, load_params_quantized(qp.config, qp, dtype=jdtype)
    elif quant in ("int8", "int4"):
        cfg, np_params = load_checkpoint(model_path)
        params = quantize_params(cfg, np_params, bits=8 if quant == "int8" else 4,
                                 dtype=jdtype)
    else:
        cfg, np_params = load_checkpoint(model_path)
        params = load_params(cfg, np_params, dtype=jdtype)
    # the Engine fuses QKV/W13 itself with the tp-aware column layout
    tokenizer = Tokenizer.from_file(tokenizer_path, cfg.vocab_size)
    draft = None
    if spec_draft_model:
        # draft checkpoint loads as plain bf16/fp32 — a draft model is small
        # enough that quantizing it buys nothing (its whole weight stream is
        # a fraction of one target chunk forward)
        dcfg, np_dparams = load_checkpoint(spec_draft_model)
        draft = (dcfg, load_params(dcfg, np_dparams, dtype=jdtype))
    ecfg = EngineConfig(model_path=model_path, tokenizer_path=tokenizer_path,
                        max_batch_size=batch, max_seq_len=max_seq_len,
                        paged_kv=paged, kv_page_size=page_size, tp_size=tp,
                        dp_size=dp, seq_par=seq_par,
                        kv_quant=kv_quant, scale_dtype=scale_dtype,
                        spec_tick=spec_tick,
                        spec_mode=spec_mode, prefill_chunk=prefill_chunk,
                        prefill_chunk_min=prefill_chunk_min,
                        compile_cache=compile_cache)
    return Engine(cfg, params, tokenizer, ecfg, draft=draft)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="rama-tpu-server")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-t", "--tokenizer", required=True)
    ap.add_argument("--address", default="0.0.0.0:3000")  # main.rs default
    ap.add_argument("--quant", default="auto",
                    choices=["auto", "none", "int8", "int4"])
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=255)
    ap.add_argument("--max-seq-len", type=int, default=None,
                    help="serving context length; may EXCEED the "
                         "checkpoint's seq_len (RoPE tables are retabulated "
                         "to the cache length — long-context serving)")
    ap.add_argument("--paged", action="store_true",
                    help="paged KV cache (page-pool memory, vLLM-style)")
    ap.add_argument("--page-size", type=int, default=128)
    ap.add_argument("--kv-quant", default=None, choices=["int8"],
                    help="int8 KV cache (halves cache HBM traffic, doubles "
                         "slot capacity); composes with paged/tp/dp")
    ap.add_argument("--scale-dtype", default=None, choices=["bf16"],
                    help="store weight-quant scales in bf16 (~8-14%% less "
                         "weight HBM traffic for <=2^-9 scale rounding)")
    ap.add_argument("--spec-tick", type=int, default=0,
                    help="speculative serving: drafts per tick verified in "
                         "one chunk forward (0 = off)")
    ap.add_argument("--spec-mode", default="ngram",
                    choices=["ngram", "draft"],
                    help="speculative proposer: n-gram prompt lookup or a "
                         "resident draft model (--spec-draft-model)")
    ap.add_argument("--spec-draft-model", default=None, metavar="BIN",
                    help=".bin checkpoint for --spec-mode draft (same "
                         "vocab; drafts spec-tick greedy tokens per round "
                         "inside the spec scan)")
    ap.add_argument("--prefill-chunk-min", type=int, default=None,
                    help="only prompts LONGER than this route through the "
                         "chunked-prefill job (default 4x --prefill-chunk)")
    ap.add_argument("--prefill-chunk", type=int, default=0,
                    help="chunked prefill: prompts longer than this admit "
                         "through a background job interleaved with decode "
                         "ticks, so a long admission stalls active streams "
                         "by one chunk instead of a whole-prompt dispatch "
                         "(0 = off; power of two >= 16)")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel degree (weights + KV heads sharded "
                         "over the `model` mesh axis)")
    ap.add_argument("--seq-par", action="store_true",
                    help="sequence-parallel serving: the model axis shards "
                         "the KV cache's SEQUENCE dim instead of heads "
                         "(blockwise attention; long-context mode — cache "
                         "capacity and attention reads scale with --tp)")
    ap.add_argument("--dp", type=int, default=1,
                    help="data-parallel degree (slot batch sharded over the "
                         "`data` mesh axis; must divide --batch)")
    ap.add_argument("--platform", default="auto", choices=["auto", "cpu", "tpu"])
    ap.add_argument("--coordinator", default=None,
                    help="multi-host: coordinator address (host0:port); every "
                         "process of the pod slice runs this same command "
                         "with --num-hosts/--host-id (or TPU env autodetect "
                         "via RAMA_NUM_HOSTS)")
    ap.add_argument("--num-hosts", type=int, default=None)
    ap.add_argument("--host-id", type=int, default=None)
    ap.add_argument("--warmup", action="store_true",
                    help="precompile every (k, T) prefill bucket and decode "
                         "tick before accepting traffic (no mid-serving XLA "
                         "compiles; pair with --compile-cache to pay the "
                         "cost once per machine)")
    ap.add_argument("--warmup-max-prompt", type=int, default=None,
                    help="bound the warmed prefill T buckets to this prompt "
                         "length (default: up to --max-seq-len)")
    ap.add_argument("--compile-cache", default=None, metavar="DIR",
                    help="persistent XLA compilation cache directory")
    args = ap.parse_args(argv)

    from rama_tpu.utils.platform import force_platform

    force_platform(args.platform)
    from rama_tpu.parallel.distributed import init_distributed, is_primary

    init_distributed(args.coordinator, args.num_hosts, args.host_id)
    engine = load_engine(args.model, args.tokenizer, args.quant, args.dtype,
                         args.batch, max_seq_len=args.max_seq_len,
                         paged=args.paged, page_size=args.page_size,
                         tp=args.tp, dp=args.dp, seq_par=args.seq_par,
                         kv_quant=args.kv_quant,
                         scale_dtype=args.scale_dtype,
                         spec_tick=args.spec_tick, spec_mode=args.spec_mode,
                         spec_draft_model=args.spec_draft_model,
                         prefill_chunk=args.prefill_chunk,
                         prefill_chunk_min=args.prefill_chunk_min,
                         compile_cache=args.compile_cache)
    if not is_primary():
        # follower host: no HTTP frontend; replay the primary's device calls
        # (including the primary's warmup dispatches, so every host compiles
        # the same program grid before traffic)
        engine.follow()
        return
    if args.warmup:
        import sys as _sys

        w = engine.warmup(max_prompt=args.warmup_max_prompt)
        print(f"warmup: {w['programs']} programs in {w['seconds']:.1f}s",
              file=_sys.stderr)
    engine.start()
    app = build_app(engine, default_steps=args.steps)
    host, _, port = args.address.rpartition(":")
    web.run_app(app, host=host or "0.0.0.0", port=int(port))


if __name__ == "__main__":
    main()
