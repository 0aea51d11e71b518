"""Speculative decoding: n-gram (prompt-lookup) and draft-model drafting.

Decode is HBM-bound — one token costs a full weight stream (~90 ms of HBM
time at 7B int8 per 8 tokens). Verifying k drafted tokens in ONE chunked
forward streams the weights once for up to k+1 emitted tokens, so accepted
drafts are nearly free. The reference has no speculative path (its loop is
strictly one forward per token, engine/src/transformer/mod.rs:169-248); this
is a beyond-parity capability.

Acceptance uses **sample-then-compare**: every chunk position samples (or
argmaxes) from the *target* distribution with a key derived only from the
stream position (`fold_in(key, pos)`); drafts are accepted while they equal
those samples. Because the sample at each position is a deterministic
function of (key, position, accepted prefix), the emitted stream is
IDENTICAL to the one ordinary sequential decoding would produce with the
same per-position keys — speculation changes latency, never the output.
(Exact in fp32; under bf16 a chunked forward may reduce in a different
order than a T=1 step and flip an argmax near-tie — the stream is still
a valid sample of the same model, just as with any batch-size change.)
(This sidesteps the draft-distribution bookkeeping of classic speculative
sampling; a deterministic proposer needs no q-probabilities.)

Cache discipline: the chunk forward writes K/V rows pos..pos+k-1; rows past
the accepted prefix hold rejected-draft garbage, but every later query at
position p attends row r<=p only after row r has been rewritten by the step
that processes position r (write-before-attend), so stale rows are never
read. The draft model's private cache follows the same argument — each
round's draft scan starts by re-processing the last *emitted* token at its
true position.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rama_tpu.config import ModelConfig
from rama_tpu.models.llama import (KVCache, decode_step, forward_chunk,
                                   prefill)
from rama_tpu.runtime.sampler import sample_top_p
from rama_tpu.tokenizer import BOS_ID, Tokenizer


def ngram_propose(toks: jax.Array, n: jax.Array, k: int,
                  gram: int = 2) -> jax.Array:
    """Draft k tokens by prompt lookup: find the most recent earlier
    occurrence of the trailing `gram`-gram of toks[:n] and propose the
    tokens that followed it. Falls back to repeating the last token.

    toks: (cap,) int32 stream buffer (index p = input token at position p);
    n: () int32 count of valid tokens. O(cap * gram) vector compares.
    """
    cap = toks.shape[0]
    tail = jax.lax.dynamic_slice(
        toks, (jnp.maximum(n - gram, 0),), (gram,))          # (gram,)
    match = jnp.ones((cap,), bool)
    for i in range(gram):
        # toks[j + i] aligned at index j (static roll; tail wraps are
        # masked off by the validity window below)
        match &= jnp.roll(toks, -i) == tail[i]
    idx = jnp.arange(cap)
    # window [j, j+gram) must lie strictly before the current tail, and its
    # continuation toks[j+gram] must be a real token (< n)
    match &= idx + gram < n
    found = jnp.any(match) & (n > gram)
    j = jnp.argmax(jnp.where(match, idx, -1))                # most recent
    cont = jax.lax.dynamic_slice(
        jnp.concatenate([toks, jnp.zeros((k,), toks.dtype)]),
        (jnp.where(found, j + gram, 0),), (k,))
    last = toks[jnp.maximum(n - 1, 0)]
    return jnp.where(found, cont, jnp.full((k,), last))


class _SpecState(NamedTuple):
    toks: jax.Array          # (cap,) stream buffer incl BOS at index 0
    n: jax.Array             # () valid tokens in toks
    cache: KVCache
    dcache: KVCache | None   # draft model cache (draft mode) or None-like
    rounds: jax.Array        # () verification rounds executed
    accepted: jax.Array      # () total accepted draft tokens


def _sample_positions(logits: jax.Array, pos0: jax.Array, key: jax.Array,
                      temperature: float, top_p: float) -> jax.Array:
    """Target token for each chunk row i, keyed ONLY by stream position
    pos0+i — so speculative and sequential decoding sample identically."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    k = logits.shape[0]

    def one(lg, i):
        sub = jax.random.fold_in(key, pos0 + i)
        return sample_top_p(lg[None], sub, temperature, top_p)[0]

    return jax.vmap(one)(logits, jnp.arange(k))


def _make_body(params, cfg, steps, k, temperature, top_p, key, proposer):
    cap_sentinel = None  # closed over via toks shape

    def body(st: _SpecState) -> _SpecState:
        cap = st.toks.shape[0]
        pos = st.n - 1                       # position of the current token
        cur = st.toks[pos]
        drafts, dcache = proposer(st, cur, pos)          # (k-1,), new dcache
        chunk = jnp.concatenate([cur[None], drafts])     # (k,)
        logits, cache = forward_chunk(params, cfg, chunk[None],
                                      pos[None], st.cache)
        t = _sample_positions(logits[0], pos + 1, key, temperature, top_p)
        m = (drafts == t[:-1]).astype(jnp.int32)         # (k-1,)
        a = jnp.sum(jnp.cumprod(m))                      # leading accepts
        ii = jnp.arange(k)
        widx = jnp.where(ii <= a, st.n + ii, cap)        # OOB rows dropped
        toks = st.toks.at[widx].set(t, mode="drop")
        return _SpecState(toks=toks, n=st.n + a + 1, cache=cache,
                          dcache=dcache, rounds=st.rounds + 1,
                          accepted=st.accepted + a)

    def cond(st: _SpecState):
        return st.n - 1 < steps

    return cond, body


def _spec_generate(params, cfg, prompt, steps, prompt_len, temperature,
                   top_p, key, cache, proposer, dcache0, k):
    cap = steps + k + 2
    inputs = jnp.concatenate([jnp.full((1,), BOS_ID, jnp.int32), prompt])
    logits, cache = prefill(params, cfg, inputs[None, :], cache,
                            last_only=True)
    first = _sample_positions(logits[0, -1:], jnp.int32(prompt_len + 1), key,
                              temperature, top_p)[0]
    toks = jnp.zeros((cap,), jnp.int32)
    toks = jax.lax.dynamic_update_slice(toks, inputs, (0,))
    toks = toks.at[prompt_len + 1].set(first)
    st = _SpecState(toks=toks, n=jnp.int32(prompt_len + 2), cache=cache,
                    dcache=dcache0, rounds=jnp.int32(0),
                    accepted=jnp.int32(0))
    cond, body = _make_body(params, cfg, steps, k, temperature, top_p, key,
                            proposer)
    st = jax.lax.while_loop(cond, body, st)
    out = jax.lax.dynamic_slice(st.toks, (1,), (steps,))
    return out, st.rounds, st.accepted


@partial(jax.jit, static_argnames=("cfg", "steps", "prompt_len", "k", "gram",
                                   "temperature", "top_p"),
         donate_argnames=("cache",))
def generate_speculative_ngram(params, cfg: ModelConfig, prompt: jax.Array,
                               steps: int, prompt_len: int,
                               temperature: float, top_p: float,
                               key: jax.Array, cache: KVCache, *, k: int = 8,
                               gram: int = 2):
    """Prompt-lookup speculative generation, fully on device.

    Same contract as generate_prefill_decode (returns (steps,) emitted ids,
    prompt echoed first) plus (rounds, accepted) stats. k = chunk size
    (1 current + k-1 drafted); gram = match length for the lookup.
    """

    def proposer(st: _SpecState, cur, pos):
        return ngram_propose(st.toks, st.n, k - 1, gram), st.dcache

    out, rounds, accepted = _spec_generate(
        params, cfg, prompt, steps, prompt_len, temperature, top_p, key,
        cache, proposer, None, k)
    return out, rounds, accepted


@partial(jax.jit, static_argnames=("cfg", "dcfg", "steps", "prompt_len", "k",
                                   "temperature", "top_p"),
         donate_argnames=("cache", "dcache"))
def generate_speculative_draft(params, cfg: ModelConfig, dparams,
                               dcfg: ModelConfig, prompt: jax.Array,
                               steps: int, prompt_len: int,
                               temperature: float, top_p: float,
                               key: jax.Array, cache: KVCache,
                               dcache: KVCache, *, k: int = 8):
    """Draft-model speculative generation: a small model proposes k-1 greedy
    tokens per round; the target model verifies them in one chunked forward.

    The draft model maintains its own KV cache over the SAME stream: each
    round's draft scan first re-processes the last emitted token at its true
    position, so rejected-draft rows are rewritten before any query can
    attend them.
    """
    # draft model must see the prompt too
    inputs = jnp.concatenate([jnp.full((1,), BOS_ID, jnp.int32), prompt])
    _, dcache = prefill(dparams, dcfg, inputs[None, :], dcache,
                        last_only=True)

    def proposer(st: _SpecState, cur, pos):
        def stp(carry, _):
            tok, p, dc = carry
            lg, dc = decode_step(dparams, dcfg, tok[None], p[None], dc)
            nt = jnp.argmax(lg[0]).astype(jnp.int32)
            return (nt, p + 1, dc), nt

        (_, _, dc), drafts = jax.lax.scan(
            stp, (cur, pos, st.dcache), None, length=k - 1)
        return drafts, dc

    out, rounds, accepted = _spec_generate(
        params, cfg, prompt, steps, prompt_len, temperature, top_p, key,
        cache, proposer, dcache, k)
    return out, rounds, accepted


def generate_text_speculative(params, cfg: ModelConfig, tokenizer: Tokenizer,
                              prompt: str, steps: int | None = None,
                              temperature: float = 1.0, top_p: float = 0.9,
                              seed: int = 100, cache_dtype=jnp.bfloat16,
                              k: int = 8, gram: int = 2, draft=None
                              ) -> tuple[str, list[int], dict]:
    """Encode, speculatively generate, decode.

    draft: optional (draft_params, draft_cfg) for draft-model mode; None
    uses n-gram prompt lookup. Returns (text, ids, stats).
    """
    steps = min(steps or 255, cfg.seq_len)
    prompt_ids = tokenizer.encode(prompt) if prompt else [BOS_ID]
    if len(prompt_ids) >= steps:
        prompt_ids = prompt_ids[: steps - 1]
    key = jax.random.PRNGKey(seed)
    cache = KVCache.create(cfg, batch=1, dtype=cache_dtype)
    pids = jnp.asarray(prompt_ids, jnp.int32)
    if draft is None:
        ids, rounds, accepted = generate_speculative_ngram(
            params, cfg, pids, steps, len(prompt_ids), temperature, top_p,
            key, cache, k=k, gram=gram)
    else:
        dparams, dcfg = draft
        dcache = KVCache.create(dcfg, batch=1, dtype=cache_dtype)
        ids, rounds, accepted = generate_speculative_draft(
            params, cfg, dparams, dcfg, pids, steps, len(prompt_ids),
            temperature, top_p, key, cache, dcache, k=k)
    ids = np.asarray(jax.device_get(ids)).tolist()
    stats = {"rounds": int(rounds), "accepted_drafts": int(accepted),
             "tokens": steps,
             "tokens_per_round": steps / max(int(rounds), 1)}
    return tokenizer.decode_ids(ids), ids, stats
