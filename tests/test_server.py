"""HTTP server (L6): SSE framing vs the oracle chain, newline escaping,
parameter validation, overload 503, truncation comment, error events.

Covers the route behavior the reference implements in
server/src/main.rs:74-143 (SSE `data:` framing, newline escaping as \\n per
mod.rs:246, /chat echo stub main.rs:115-117) plus this framework's additions
(/metrics, /healthz, 400 on bad params, 503 when the bounded(30) admission
queue is full, SSE truncation comment). The engine itself is oracle-tested in
test_engine.py; here the subject is the aiohttp layer in server/app.py.
"""

import asyncio

import jax.numpy as jnp
import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from rama_tpu.config import EngineConfig
from rama_tpu.models.llama import load_params
from rama_tpu.runtime.engine import Engine, Request
from rama_tpu.server.app import build_app
from rama_tpu.testing.ref_model import RefModel, random_params, tiny_config
from rama_tpu.tokenizer import BOS_ID, Tokenizer


def make_newline_tokenizer(vocab_size: int) -> Tokenizer:
    """26 single-char tokens (so prompts encode, one char -> one token: no
    two-char string is in the vocab, so no BPE merges fire) and a long tail
    of newline-bearing tokens, so generated streams exercise the \\n escaping
    (mod.rs:246 parity) on most sampled ids."""
    singles = [chr(ord("a") + i) for i in range(26)]
    tail = [chr(ord("a") + i % 26) + str(i) + "\n"
            for i in range(vocab_size - 3 - len(singles))]
    vocab = ["<unk>", "<s>", "</s>"] + singles + tail
    scores = [0.0] * vocab_size
    return Tokenizer(vocab, scores, max_token_length=8)


@pytest.fixture(scope="module")
def served_engine():
    cfg = tiny_config(seq_len=64)
    np_params = random_params(cfg, seed=77)
    params = load_params(cfg, np_params, dtype=jnp.float32)
    tok = make_newline_tokenizer(cfg.vocab_size)
    eng = Engine(cfg, params, tok, EngineConfig(max_batch_size=4))
    eng.start()
    yield cfg, np_params, tok, eng
    eng.stop()


def oracle_ids(cfg, np_params, steps):
    """Greedy continuation after [BOS] (empty prompt), EOS-stopping like the
    engine does (mirrors test_engine.oracle_chain)."""
    ref = RefModel(cfg, np_params)
    logits = ref.step(BOS_ID, 0)
    out, pos = [], 1
    while len(out) < steps:
        nxt = int(np.argmax(logits))
        out.append(nxt)
        if nxt == 2:
            break
        logits = ref.step(nxt, pos)
        pos += 1
    return out


def parse_sse(body: str):
    """Split an SSE body into (comments, datas, events)."""
    comments, datas, events = [], [], []
    for block in body.split("\n\n"):
        for line in block.split("\n"):
            if line.startswith(": "):
                comments.append(line[2:])
            elif line.startswith("data: "):
                datas.append(line[len("data: "):])
            elif line.startswith("event: "):
                events.append(line[len("event: "):])
    return comments, datas, events


async def _client(engine, **kw):
    client = TestClient(TestServer(build_app(engine, **kw)))
    await client.start_server()
    return client


def test_gen_stream_matches_oracle_and_escapes_newlines(served_engine):
    cfg, np_params, tok, eng = served_engine

    async def main():
        client = await _client(eng)
        try:
            resp = await client.get("/gen", params={
                "prompt": "", "steps": "8", "temperature": "0.0"})
            assert resp.status == 200
            assert resp.headers["Content-Type"] == "text/event-stream"
            body = await asyncio.wait_for(resp.text(), timeout=120)
        finally:
            await client.close()
        _, datas, events = parse_sse(body)
        assert not events  # no error event on a clean stream
        want = [tok.decode_token(i) for i in oracle_ids(cfg, np_params, 8)]
        got = [d.replace("\\n", "\n") for d in datas]
        assert got == want
        # SSE payloads never carry a raw newline; token texts that do (most
        # of this vocab) must arrive in the escaped form
        for d, w in zip(datas, want):
            assert "\n" not in d
            if "\n" in w:
                assert "\\n" in d

    asyncio.run(main())


def test_gen_rejects_bad_params(served_engine):
    _, _, _, eng = served_engine

    async def main():
        client = await _client(eng)
        try:
            for params in ({"prompt": "a", "steps": "0"},
                           {"prompt": "a", "temperature": "abc"},
                           {"prompt": "a", "topp": "0"},
                           {"prompt": "a", "temperature": "11"}):
                resp = await client.get("/gen", params=params)
                assert resp.status == 400
                assert "error" in await resp.json()
        finally:
            await client.close()

    asyncio.run(main())


def test_gen_truncation_comment(served_engine):
    cfg, _, _, eng = served_engine

    async def main():
        client = await _client(eng)
        try:
            # seq_len=64 cache, one char -> one token: 320 tokens must clip
            long_prompt = "abcd" * 80
            resp = await client.get("/gen", params={
                "prompt": long_prompt, "steps": "2", "temperature": "0.0"})
            assert resp.status == 200
            body = await asyncio.wait_for(resp.text(), timeout=120)
        finally:
            await client.close()
        comments, datas, _ = parse_sse(body)
        assert any("prompt truncated" in c for c in comments)
        assert datas  # the clipped request still streams tokens

    asyncio.run(main())


def test_gen_503_when_admission_full():
    cfg = tiny_config(seq_len=32)
    params = load_params(cfg, random_params(cfg, seed=5), dtype=jnp.float32)
    tok = make_newline_tokenizer(cfg.vocab_size)
    # engine built but NOT started: nothing drains the bounded(30) admission
    # queue (reference: bounded(30) channel, server/src/main.rs:68 — which
    # blocks the handler instead of shedding load)
    eng = Engine(cfg, params, tok, EngineConfig(max_batch_size=2))
    for _ in range(30):
        eng.submit(Request(prompt="", steps=1))

    async def main():
        client = await _client(eng)
        try:
            resp = await client.get("/gen", params={"prompt": "", "steps": "1"})
            assert resp.status == 503
            assert (await resp.json())["error"] == "server overloaded"
        finally:
            await client.close()

    asyncio.run(main())


def test_gen_error_event(served_engine):
    """Engine-side stream failure surfaces as an SSE `event: error`."""
    _, _, _, eng = served_engine

    class FailingEngine:
        def submit(self, req, timeout=None):
            req.error = "injected failure"
            req.queue.put(None)
            return req

    async def main():
        client = await _client(FailingEngine())
        try:
            resp = await client.get("/gen", params={"prompt": "", "steps": "1"})
            assert resp.status == 200
            body = await asyncio.wait_for(resp.text(), timeout=30)
        finally:
            await client.close()
        _, datas, events = parse_sse(body)
        assert events == ["error"]
        assert "injected failure" in datas

    asyncio.run(main())


def test_home_chat_metrics_healthz(served_engine):
    _, _, _, eng = served_engine

    async def main():
        client = await _client(eng)
        try:
            resp = await client.get("/")
            assert resp.status == 200
            assert "EventSource" in await resp.text()

            resp = await client.post("/chat", data="hello world")
            assert resp.status == 200
            assert await resp.text() == "hello world"  # echo stub parity

            resp = await client.get("/metrics")
            stats = await resp.json()
            for key in ("tokens_generated", "requests_completed",
                        "active_slots", "queue_depth", "decode_tok_per_s",
                        "ttft_p50_ms"):
                assert key in stats

            resp = await client.get("/healthz")
            assert (await resp.json())["ok"] is True
        finally:
            await client.close()

    asyncio.run(main())
