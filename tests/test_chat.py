"""Chat mode: mid-sequence bucketed prefill must equal token-at-a-time."""

import io

import jax.numpy as jnp
import numpy as np
import pytest

from rama_tpu.models.llama import KVCache, decode_step, load_params
from rama_tpu.runtime.chat import ChatContextFull, ChatSession, chat_repl
from rama_tpu.testing.ref_model import random_params, tiny_config
from rama_tpu.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config()
    params = load_params(cfg, random_params(cfg, seed=9), dtype=jnp.float32)
    return cfg, params


@pytest.fixture(scope="module")
def tok():
    import os

    path = os.path.join(os.path.dirname(__file__), "fixtures", "tokenizer.bin")
    return Tokenizer.from_file(path, 32000)


def _greedy_reference(params, cfg, ids, max_new):
    """Token-at-a-time greedy over the same stream (no padding, pos 0)."""
    cache = KVCache.create(cfg, batch=1, dtype=jnp.float32)
    out = []
    tok = None
    for pos, t in enumerate(ids):
        lg, cache = decode_step(params, cfg, jnp.asarray([t], jnp.int32),
                                jnp.asarray([pos], jnp.int32), cache)
    tok = int(np.argmax(np.asarray(lg)[0]))
    pos = len(ids)
    for _ in range(max_new):
        out.append(tok)
        lg, cache = decode_step(params, cfg, jnp.asarray([tok], jnp.int32),
                                jnp.asarray([pos], jnp.int32), cache)
        tok = int(np.argmax(np.asarray(lg)[0]))
        pos += 1
    return out


def test_turn_matches_unpadded_reference(model, tok):
    """The padded mid-sequence prefill must produce the same greedy stream
    as an unpadded token-at-a-time loop (tiny vocab-capped ids)."""
    cfg, params = model
    s = ChatSession(params, cfg, tok, temperature=0.0)
    ids = s._template("hello there")
    ids = [i % cfg.vocab_size for i in ids]
    s._template = lambda text: ids   # pin the capped ids for comparison
    pieces = list(s.turn("hello there", max_new=6))
    want_ids = _greedy_reference(params, cfg, ids, 6)
    want = [tok.decode_token(t) for t in want_ids]
    # the session stops yielding at EOS; compare the prefix it emitted
    assert pieces == want[: len(pieces)]
    assert len(pieces) >= 1


def test_multi_turn_positions_advance(model, tok):
    cfg, params = model
    s = ChatSession(params, cfg, tok, temperature=0.0)
    list(s.turn("hi", max_new=3))
    p1 = s.pos
    list(s.turn("again", max_new=3))
    assert s.pos > p1
    assert s.turns == 2


def test_context_full_raises(model, tok):
    cfg, params = model
    s = ChatSession(params, cfg, tok, temperature=0.0)
    s.pos = cfg.seq_len - 2
    with pytest.raises(ChatContextFull):
        list(s.turn("way too late", max_new=4))


def test_chat_repl_scripted(model, tok):
    cfg, params = model
    lines = iter(["hello", "exit"])
    out = io.StringIO()
    rc = chat_repl(params, cfg, tok, temperature=0.0, max_new=4,
                   cache_dtype=jnp.float32,
                   input_fn=lambda prompt: next(lines), out=out)
    assert rc == 0
    text = out.getvalue()
    assert text.startswith("Assistant: ")
