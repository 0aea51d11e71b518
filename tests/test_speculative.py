"""Speculative decoding: output must be IDENTICAL to sequential decoding.

The acceptance rule is sample-then-compare with per-position keys, so greedy
and sampled speculative streams must match a sequential loop token for token
— any divergence is a cache-consistency or acceptance bug.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rama_tpu.models.llama import KVCache, decode_step, load_params
from rama_tpu.runtime.sampler import sample_top_p
from rama_tpu.runtime.speculative import (generate_speculative_draft,
                                          generate_speculative_ngram,
                                          ngram_propose)
from rama_tpu.testing.ref_model import random_params, tiny_config
from rama_tpu.tokenizer import BOS_ID


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config()
    params = load_params(cfg, random_params(cfg, seed=3), dtype=jnp.float32)
    return cfg, params


def sequential_reference(params, cfg, prompt_ids, steps, temperature, top_p,
                         key):
    """Token-at-a-time loop with the fold_in(key, position) convention the
    speculative path uses."""
    cache = KVCache.create(cfg, batch=1, dtype=jnp.float32)
    cur = jnp.int32(BOS_ID)
    out = []
    for pos in range(steps):
        logits, cache = decode_step(params, cfg, cur[None],
                                    jnp.asarray([pos], jnp.int32), cache)
        if pos < len(prompt_ids):
            nxt = jnp.int32(prompt_ids[pos])
        elif temperature == 0.0:
            nxt = jnp.argmax(logits[0]).astype(jnp.int32)
        else:
            sub = jax.random.fold_in(key, pos + 1)
            nxt = sample_top_p(logits, sub, temperature, top_p)[0]
        out.append(int(nxt))
        cur = nxt
    return out


def test_ngram_propose_basic():
    toks = jnp.asarray([9, 5, 6, 7, 5, 6, 0, 0], jnp.int32)
    # tail [5, 6] at n=6 matches at j=1 -> continuation toks[3:] = [7, 5, 6]
    drafts = np.asarray(ngram_propose(toks, jnp.int32(6), 3, gram=2))
    assert drafts.tolist() == [7, 5, 6]
    # no match -> repeat last token
    toks2 = jnp.asarray([1, 2, 3, 4, 5, 0, 0, 0], jnp.int32)
    drafts2 = np.asarray(ngram_propose(toks2, jnp.int32(5), 3, gram=2))
    assert drafts2.tolist() == [5, 5, 5]


@pytest.mark.parametrize("temperature", [0.0, 0.8])
def test_ngram_spec_matches_sequential(model, temperature):
    cfg, params = model
    prompt_ids = [5, 9, 2, 5, 9, 2, 5, 9]    # repetitive: lookup will hit
    steps = 24
    key = jax.random.PRNGKey(7)
    cache = KVCache.create(cfg, batch=1, dtype=jnp.float32)
    got, rounds, accepted = generate_speculative_ngram(
        params, cfg, jnp.asarray(prompt_ids, jnp.int32), steps,
        len(prompt_ids), temperature, 0.9, key, cache, k=4, gram=2)
    want = sequential_reference(params, cfg, prompt_ids, steps, temperature,
                                0.9, key)
    assert np.asarray(got).tolist() == want
    assert int(rounds) >= 1


def test_draft_model_spec_matches_and_accepts(model):
    """Draft == target model: every draft accepted, rounds collapse ~k-fold."""
    cfg, params = model
    prompt_ids = [3, 1, 4, 1, 5]
    steps = 30
    k = 4
    key = jax.random.PRNGKey(0)
    cache = KVCache.create(cfg, batch=1, dtype=jnp.float32)
    dcache = KVCache.create(cfg, batch=1, dtype=jnp.float32)
    got, rounds, accepted = generate_speculative_draft(
        params, cfg, params, cfg, jnp.asarray(prompt_ids, jnp.int32), steps,
        len(prompt_ids), 0.0, 0.9, key, cache, dcache, k=k)
    want = sequential_reference(params, cfg, prompt_ids, steps, 0.0, 0.9, key)
    assert np.asarray(got).tolist() == want
    gen = steps - len(prompt_ids) - 1     # tokens produced by spec rounds
    assert int(accepted) == int(rounds) * (k - 1), \
        "identical draft model must have every draft accepted"
    assert int(rounds) <= gen // k + 2


def test_ngram_spec_no_repetition_still_correct(model):
    """Acceptance ~0 (random weights, non-repetitive prompt) must still
    yield the exact sequential stream."""
    cfg, params = model
    prompt_ids = [11, 3, 17, 9]
    steps = 16
    key = jax.random.PRNGKey(2)
    cache = KVCache.create(cfg, batch=1, dtype=jnp.float32)
    got, rounds, accepted = generate_speculative_ngram(
        params, cfg, jnp.asarray(prompt_ids, jnp.int32), steps,
        len(prompt_ids), 0.0, 0.9, key, cache, k=4)
    want = sequential_reference(params, cfg, prompt_ids, steps, 0.0, 0.9, key)
    assert np.asarray(got).tolist() == want
