"""Chunked prefill: long admissions interleave with decode, streams identical.

EngineConfig.prefill_chunk routes prompts longer than the chunk through a
background job (one (k, C) chunk forward per loop iteration) instead of one
whole-prompt dispatch. Sampling is keyed by (slot key, position) only, so
the served stream must be BIT-IDENTICAL to the unchunked engine's for every
prompt length and feature combination.
"""

import jax.numpy as jnp
import pytest

from rama_tpu.config import EngineConfig
from rama_tpu.models.llama import load_params
from rama_tpu.runtime.engine import Engine, Request
from rama_tpu.testing.ref_model import random_params, tiny_config

from tests.test_engine import collect, make_tokenizer

LONG = "abcdefghij" * 4          # 40 single-char tokens > chunk 16
SHORT = "abc"


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(seq_len=64)
    np_params = random_params(cfg, seed=23)
    tok = make_tokenizer(cfg.vocab_size)
    return cfg, np_params, tok


def run_engine(cfg, np_params, tok, ecfg, prompts, steps=10,
               temperature=0.7):
    params = load_params(cfg, np_params, dtype=jnp.float32)
    eng = Engine(cfg, params, tok, ecfg)
    eng.start()
    try:
        reqs = [eng.submit(Request(prompt=p, steps=steps,
                                   temperature=temperature))
                for p in prompts]
        outs = [collect(r) for r in reqs]
        for r in reqs:
            assert r.error is None, r.error
    finally:
        eng.stop()
    assert eng.metrics["engine_errors"] == 0
    return outs


@pytest.mark.parametrize("temperature", [0.0, 0.7])
def test_chunked_long_prompt_stream_identical(setup, temperature):
    cfg, np_params, tok = setup
    plain = run_engine(cfg, np_params, tok, EngineConfig(max_batch_size=2),
                       [LONG], temperature=temperature)
    chunked = run_engine(cfg, np_params, tok,
                         EngineConfig(max_batch_size=2, prefill_chunk=16, prefill_chunk_min=16),
                         [LONG], temperature=temperature)
    assert plain == chunked


def test_chunked_mixed_load(setup):
    """Short prompts admit through the fast path while a long prompt
    prefills in the background; every stream matches the unchunked run."""
    cfg, np_params, tok = setup
    prompts = [LONG, SHORT, "zq", LONG[:20]]
    plain = run_engine(cfg, np_params, tok, EngineConfig(max_batch_size=4),
                       prompts)
    chunked = run_engine(cfg, np_params, tok,
                         EngineConfig(max_batch_size=4, prefill_chunk=16, prefill_chunk_min=16),
                         prompts)
    assert plain == chunked


def test_chunked_prefill_paged(setup):
    cfg, np_params, tok = setup
    plain = run_engine(cfg, np_params, tok,
                       EngineConfig(max_batch_size=2, paged_kv=True,
                                    kv_page_size=16),
                       [LONG, SHORT])
    chunked = run_engine(cfg, np_params, tok,
                         EngineConfig(max_batch_size=2, paged_kv=True,
                                      kv_page_size=16, prefill_chunk=16, prefill_chunk_min=16),
                         [LONG, SHORT])
    assert plain == chunked


def test_chunked_prefill_kv_quant(setup):
    cfg, np_params, tok = setup
    plain = run_engine(cfg, np_params, tok,
                       EngineConfig(max_batch_size=2, kv_quant="int8"),
                       [LONG])
    chunked = run_engine(cfg, np_params, tok,
                         EngineConfig(max_batch_size=2, kv_quant="int8",
                                      prefill_chunk=16, prefill_chunk_min=16),
                         [LONG])
    assert plain == chunked


def test_chunked_prefill_tp_mesh(setup):
    cfg, np_params, tok = setup
    plain = run_engine(cfg, np_params, tok,
                       EngineConfig(max_batch_size=2, tp_size=2), [LONG])
    chunked = run_engine(cfg, np_params, tok,
                         EngineConfig(max_batch_size=2, tp_size=2,
                                      prefill_chunk=16, prefill_chunk_min=16), [LONG])
    assert plain == chunked


def test_chunked_prefill_paged_mesh(setup):
    cfg, np_params, tok = setup
    plain = run_engine(cfg, np_params, tok,
                       EngineConfig(max_batch_size=2, tp_size=2, dp_size=2,
                                    paged_kv=True, kv_page_size=16), [LONG])
    chunked = run_engine(cfg, np_params, tok,
                         EngineConfig(max_batch_size=2, tp_size=2, dp_size=2,
                                      paged_kv=True, kv_page_size=16,
                                      prefill_chunk=16, prefill_chunk_min=16), [LONG])
    assert plain == chunked


def test_chunked_prefill_with_spec(setup):
    cfg, np_params, tok = setup
    plain = run_engine(cfg, np_params, tok,
                       EngineConfig(max_batch_size=2, spec_tick=3), [LONG])
    chunked = run_engine(cfg, np_params, tok,
                         EngineConfig(max_batch_size=2, spec_tick=3,
                                      prefill_chunk=16, prefill_chunk_min=16), [LONG])
    assert plain == chunked


def test_chunked_prefill_rejects_bad_chunk(setup):
    cfg, np_params, tok = setup
    params = load_params(cfg, np_params, dtype=jnp.float32)
    with pytest.raises(ValueError):
        Engine(cfg, params, tok, EngineConfig(prefill_chunk=24))


def test_warmup_covers_chunked_programs(setup):
    """warmup() with prefill_chunk set compiles the chunk/finish programs;
    a long submission afterwards must not error."""
    cfg, np_params, tok = setup
    params = load_params(cfg, np_params, dtype=jnp.float32)
    eng = Engine(cfg, params, tok,
                 EngineConfig(max_batch_size=2, prefill_chunk=16, prefill_chunk_min=16))
    w = eng.warmup()
    assert w["programs"] > 0
    eng.start()
    try:
        req = eng.submit(Request(prompt=LONG, steps=6, temperature=0.0))
        out = collect(req)
        assert len(out) == 6
        assert req.error is None
    finally:
        eng.stop()
    assert eng.metrics["engine_errors"] == 0
