"""Continuous-batching inference engine — the framework's L5.

The reference's EngineService (engine/src/lib.rs:56-160) spawns one async task
per request, each with a freshly allocated KV cache, and every request decodes
alone (batch=1). Its `batcher.rs` sketched request batching but was never
wired (SURVEY §2 #20). This engine finishes that thought the TPU way:

- a fixed pool of **slots** in one batched KV cache (the jit-compiled decode
  step always runs at the same (max_batch,) shape — no recompiles);
- **continuous batching**: requests join mid-flight at their own position
  (the forward pass takes a per-slot position vector), finished slots free
  immediately for the admission queue;
- **bucketed prefill**: prompts prefill in one batched pass (padded to a
  power-of-two bucket to bound compile count), the resulting K/V inserted
  into the slot with one dynamic_update_slice;
- per-slot sampling parameters, sampled *inside* the compiled step;
- **pipelined + chained ticks** (device-resident sampled feedback, depth-3
  dispatch pipeline), **async-firsts admission** (prefill dispatch overlaps
  the in-flight pipeline; first tokens fetched after the drain), **chunked
  prefill** riding the pipeline, **speculative serving** (n-gram or a
  resident draft model, adaptive dormancy + draft-cache resync), paged or
  sequence-sharded caches, tp/dp meshes, multi-host lockstep replay.

Threading: one engine thread owns the device loop (JAX calls block); request
queues bridge to async servers. Tokens stream per-request through
`Request.queue`. This is the seam the SSE server sits on, mirroring the
bounded(30) admission channel of the reference (server/src/main.rs:68).
"""

from __future__ import annotations

import queue
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rama_tpu.config import EngineConfig, ModelConfig
from rama_tpu.models.llama import (KVCache, decode_step, forward,
                                   forward_chunk)
from rama_tpu.runtime.sampler import (fold_in_pos, sample_batched,
                                      sample_batched_keyed)
from rama_tpu.tokenizer import BOS_ID, EOS_ID, Tokenizer


@dataclass
class Request:
    prompt: str
    steps: int
    temperature: float = 1.0
    top_p: float = 0.9
    stop_at_eos: bool = True
    echo_prompt: bool = False
    queue: "queue.Queue[Optional[str]]" = field(default_factory=lambda: queue.Queue())
    cancelled: bool = False  # set by the server on client disconnect
    error: str | None = None  # set when the stream ended due to a failure
    truncated: int = 0  # prompt tokens dropped to fit the cache (0 = none)
    submitted_at: float = field(default_factory=time.time)
    first_token_at: float | None = None
    tokens_out: int = 0
    # filled by the engine
    prompt_ids: list[int] = field(default_factory=list)


class _Slot:
    __slots__ = ("request", "pos", "generated", "last_token",
                 "hist", "hist_len", "prefilling", "draft_pos")

    def __init__(self):
        self.request: Request | None = None
        self.pos = 0
        self.generated = 0
        self.last_token = 0
        # token history (prompt + emitted), the n-gram draft source
        self.hist: np.ndarray | None = None
        self.hist_len = 0
        # owned by a chunked-prefill job; excluded from decode ticks until
        # the job's finisher activates it
        self.prefilling = False
        # draft-mode speculation: positions < draft_pos have correct rows in
        # the DRAFT model's cache; plain (dormant) ticks advance pos without
        # it, and _maybe_draft_resync replays the gap before the next probe
        self.draft_pos = 0

    @property
    def free(self) -> bool:
        return self.request is None


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def _bucket_k(n: int, dp: int = 1, b: int = 1, t_pad: int = 16) -> int:
    """Prefill batch bucket for n admitted requests (b slots, T bucket t_pad).

    In the weight-stream-bound regime (k*T small — the (k, T) forward costs
    one weight stream regardless of k) pad straight to the full slot count:
    ONE compiled shape per T bucket, so trailing single-slot admissions
    reuse the program the first burst compiled instead of paying a fresh
    multi-second XLA compile mid-serving. For long prompts (compute-bound)
    fall back to dp * 2^j >= n so padding waste stays bounded. Both choices
    divide the data-parallel axis (b % dp is enforced at Engine init)."""
    if b * t_pad <= 4096:
        return max(b, n)
    return min(_bucket(n, lo=max(dp, 1)), _prefill_k_cap(t_pad, dp))


# Prefill bucket AREA cap (k_pad * t_pad tokens): the prefill scratch is a
# bf16 (L, k_pad, nkv, t_pad, hd) cache — ~1.05 MB per token-row at 7B, so
# a (8, 1024) bucket is 4.3 GB, which OOMs a 16 GB chip next to 6.9 GB of
# int8 weights and a 5.4 GB S=2048 int8 slot cache (the flagship serving
# envelope). 4096 tokens caps the scratch at ~2.2 GB. Admission bursts
# whose bucket would exceed the cap split into sequential dispatches
# (_start_requests / _pf_maybe_start slice with the same cap, so
# _pad_entries never sees more rows than its bucket).
_PREFILL_AREA = 4096


def _prefill_k_cap(t_pad: int, dp: int = 1) -> int:
    """Largest k bucket (dp * 2^j form) whose (k, t_pad) area stays under
    _PREFILL_AREA — at least one row per data replica."""
    dp = max(dp, 1)
    per_replica = max(1, _PREFILL_AREA // max(t_pad, 1) // dp)
    return dp * (1 << (per_replica.bit_length() - 1))


# Multi-host control ops, broadcast host-0 -> followers before each device
# call (parallel.distributed.broadcast_step). Header: int64[4]
# [op, arg0, arg1, arg2].
(_OP_TICK, _OP_PREFILL, _OP_RESET, _OP_STOP, _OP_SPEC,
 _OP_PFSTART, _OP_PFCHUNK, _OP_PFDONE, _OP_DRSYNC) = range(9)

# adaptive speculation (EngineConfig.spec_min_accept): plain ticks served
# while spec is dormant, and the minimum rolling-window size before a
# dormancy decision
_SPEC_DORMANT_TICKS = 64
_SPEC_PROBE_ROUNDS = 8

# Dispatched-but-unfetched ticks kept in flight (the chain depth). One tick
# in flight only hides the ~25 ms host round-trip when a dispatch's device
# time exceeds it; short ticks / small batches starve the device in the
# dispatch gap (measured: b=1 int4 spec dispatches at ~33 ms device lost to
# plain, b=8 plain at ~87 ms did not). Three keeps the device fed through
# one full round-trip of jitter either side.
_PIPELINE_DEPTH = 3


@partial(jax.jit, static_argnames=("cfg", "n"), donate_argnames=("cache",))
def _decode_tick(params, cfg: ModelConfig, tokens, pos, temps, top_ps,
                 slot_keys, cache: KVCache, n: int = 1):
    """n sampled decode steps for all slots in ONE device dispatch.

    The scan feeds each sampled token back as the next input, so a single
    host round-trip yields n tokens per slot (out: (n, B)). Slots that
    logically finish mid-scan keep decoding speculatively — their extra
    tokens are discarded by the host emit loop, and the speculative KV
    writes land at positions the attention mask never reads before they
    are overwritten (decode writes position p before any query attends it).

    Sampling is keyed by (slot key, query position) — fold_in_pos — so a
    slot's stream is one deterministic sequence regardless of tick size or
    speculative grouping.
    """
    def body(carry, _):
        tokens, pos, cache = carry
        logits, cache = decode_step(params, cfg, tokens, pos, cache)
        nxt = sample_batched_keyed(logits, fold_in_pos(slot_keys, pos),
                                   temps, top_ps)
        return (nxt, pos + 1, cache), nxt

    (_, _, cache), out = jax.lax.scan(body, (tokens, pos, cache), None,
                                      length=n)
    return out, cache


@partial(jax.jit, static_argnames=("cfg", "n"), donate_argnames=("cache",))
def _decode_tick_paged(params, cfg: ModelConfig, tokens, pos, temps, top_ps,
                       slot_keys, cache, page_tables, n: int = 1):
    """Paged multi-token tick; page tables must cover pos+n (reserved by the
    host loop before dispatch)."""
    from rama_tpu.runtime.paged import _decode_step_paged_impl

    def body(carry, _):
        tokens, pos, cache = carry
        logits, cache = _decode_step_paged_impl(params, cfg, tokens, pos,
                                                cache, page_tables)
        nxt = sample_batched_keyed(logits, fold_in_pos(slot_keys, pos),
                                   temps, top_ps)
        return (nxt, pos + 1, cache), nxt

    (_, _, cache), out = jax.lax.scan(body, (tokens, pos, cache), None,
                                      length=n)
    return out, cache


def _spec_round(params, cfg: ModelConfig, carry, temps, top_ps, slot_keys,
                k: int, forward_fn, draft=None):
    """One on-device speculative round: draft k tokens per slot, verify the
    (B, k+1) chunk in one fused chunk forward, sample-then-compare accept.

    Drafting: with draft=None, the vmapped n-gram proposer over the device
    history matrix; with draft=(dparams, dcfg), a k-step greedy scan of the
    small DRAFT model over its own per-slot cache (carry gains a 5th
    element). The draft cache follows write-before-attend like the target's:
    each round's first draft step re-processes the last emitted token at its
    true position, rewriting any rejected-draft rows before a query can
    attend them (speculative.py:183-205 is the offline single-stream
    counterpart of the same discipline).

    carry = (tokens (B,), pos (B,), cache, hist (B, cap)[, dcache]); hist
    row b holds the input token at each position p <= pos[b] (prompt +
    emitted). Every chunk position samples from the *target* distribution
    with a key derived only from (slot key, position) — fold_in_pos — so
    the served stream is IDENTICAL to the plain-tick stream at any
    temperature whichever proposer runs (speculation is purely a latency
    knob; drafts affect throughput, never the stream). Rejected positions'
    KV rows AND hist rows hold garbage that the next round rewrites before
    anything reads it (write-before-attend for KV; the proposer's validity
    window idx < pos+1 for hist).

    Returns (new carry, (samples (k+1, B), accept (B,)))."""
    from rama_tpu.runtime.speculative import ngram_propose

    if draft is None:
        tokens, pos, cache, hist = carry
        drafts = jax.vmap(lambda h, n: ngram_propose(h, n, k))(hist, pos + 1)
    else:
        dparams, dcfg = draft
        tokens, pos, cache, hist, dcache = carry

        def _draft_step(c, _):
            tok, p, dc = c
            lg, dc = decode_step(dparams, dcfg, tok, p, dc)
            nt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            return (nt, p + 1, dc), nt

        (_, _, dcache), dts = jax.lax.scan(
            _draft_step, (tokens, pos, dcache), None, length=k)
        drafts = dts.T                                           # (B, k)
    b = tokens.shape[0]
    bi = jnp.arange(b)
    chunk = jnp.concatenate([tokens[:, None], drafts], axis=1)   # (B, k+1)
    logits, cache = forward_fn(params, cfg, chunk, pos, cache)   # (B,T,V)
    # all k+1 positions sample in ONE batched top-p call (one (B*(k+1), V)
    # sort instead of k+1 (B, V) sorts; identical keys -> identical stream)
    pos_mat = pos[:, None] + jnp.arange(k + 1, dtype=jnp.int32)[None, :]
    keys_flat = fold_in_pos(jnp.repeat(slot_keys, k + 1, axis=0),
                            pos_mat.reshape(-1))
    flat = sample_batched_keyed(logits.reshape(b * (k + 1), -1), keys_flat,
                                jnp.repeat(temps, k + 1),
                                jnp.repeat(top_ps, k + 1))
    samples = flat.reshape(b, k + 1).T                           # (k+1, B)
    ok = (chunk[:, 1:].T == samples[:k])                         # (k, B)
    accept = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=0), axis=0)
    # samples[j] becomes the input at position pos+1+j once accepted; write
    # all k+1 optimistically (rejected rows sit above the validity window
    # and are overwritten by the next round's writes at its pos+1..)
    cols = pos[None, :] + 1 + jnp.arange(k + 1, dtype=jnp.int32)[:, None]
    hist = hist.at[bi[None, :], cols].set(samples, mode="drop")
    new_tokens = samples[accept, bi]
    new_pos = pos + accept + 1
    if draft is None:
        return (new_tokens, new_pos, cache, hist), (samples, accept)
    return (new_tokens, new_pos, cache, hist, dcache), (samples, accept)


@partial(jax.jit, static_argnames=("cfg", "k", "m"),
         donate_argnames=("cache", "hist"))
def _spec_scan_tick(params, cfg: ModelConfig, tokens, pos, temps, top_ps,
                    slot_keys, cache: KVCache, hist, k: int, m: int):
    """m speculative rounds in ONE device dispatch (draft -> verify ->
    accept entirely on-device, lax.scan over rounds), so the fixed host
    round-trip amortizes over up to m*(k+1) emitted tokens per slot — the
    speculative analogue of the multi-token decode tick. The host loop
    guarantees pos + m*(k+1) <= max_len before dispatch.

    Returns (samples (m, k+1, B), accepts (m, B), tokens (B,), pos (B,),
    cache, hist) — the final tokens/pos/hist carries stay device-resident so
    a chained successor spec tick can dispatch from them before this tick's
    samples are fetched (the speculative analogue of _dispatch_chained)."""

    def body(carry, _):
        return _spec_round(params, cfg, carry, temps, top_ps, slot_keys, k,
                           forward_chunk)

    (tokens, pos, cache, hist), (samples, accepts) = jax.lax.scan(
        body, (tokens, pos, cache, hist), None, length=m)
    return samples, accepts, tokens, pos, cache, hist


@partial(jax.jit, static_argnames=("cfg", "k", "m"),
         donate_argnames=("cache", "hist"))
def _spec_scan_tick_paged(params, cfg: ModelConfig, tokens, pos, temps,
                          top_ps, slot_keys, cache, page_tables, hist,
                          k: int, m: int):
    """_spec_scan_tick against the page pool: every round verifies through
    the ragged paged chunk-attention kernel (runtime.paged.forward_paged's
    fused T<=8 path). Page tables must cover pos + m*(k+1) (reserved by the
    host loop before dispatch); rejected positions' pool rows hold garbage
    that is rewritten before any query attends them (write-before-attend,
    same as the dense tick)."""
    from rama_tpu.runtime.paged import forward_paged

    def fwd(params, cfg, chunk, pos0, cache):
        t = chunk.shape[1]
        pos_index = pos0[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
        return forward_paged(params, cfg, chunk, pos_index, cache,
                             page_tables)

    def body(carry, _):
        return _spec_round(params, cfg, carry, temps, top_ps, slot_keys, k,
                           fwd)

    (tokens, pos, cache, hist), (samples, accepts) = jax.lax.scan(
        body, (tokens, pos, cache, hist), None, length=m)
    return samples, accepts, tokens, pos, cache, hist


@partial(jax.jit, static_argnames=("cfg", "dcfg", "k", "m"),
         donate_argnames=("cache", "dcache", "hist"))
def _spec_scan_tick_draft(params, dparams, cfg: ModelConfig,
                          dcfg: ModelConfig, tokens, pos, temps, top_ps,
                          slot_keys, cache: KVCache, dcache: KVCache, hist,
                          k: int, m: int):
    """_spec_scan_tick with DRAFT-MODEL drafting: each round scans k greedy
    steps of the small model (its per-slot cache rides in the carry) and
    verifies against the target in one chunk forward. Same chaining
    contract — tokens/pos/hist stay device-resident; dcache is an engine
    member rebound per dispatch like the target cache."""

    def body(carry, _):
        return _spec_round(params, cfg, carry, temps, top_ps, slot_keys, k,
                           forward_chunk, draft=(dparams, dcfg))

    (tokens, pos, cache, hist, dcache), (samples, accepts) = jax.lax.scan(
        body, (tokens, pos, cache, hist, dcache), None, length=m)
    return samples, accepts, tokens, pos, cache, dcache, hist


@partial(jax.jit, static_argnames=("cfg", "dcfg", "k", "m"),
         donate_argnames=("cache", "dcache", "hist"))
def _spec_scan_tick_paged_draft(params, dparams, cfg: ModelConfig,
                                dcfg: ModelConfig, tokens, pos, temps,
                                top_ps, slot_keys, cache, page_tables,
                                dcache: KVCache, hist, k: int, m: int):
    """Draft-model spec scan verifying against the PAGED target pool; the
    draft model keeps a dense per-slot cache (tiny next to the pool)."""
    from rama_tpu.runtime.paged import forward_paged

    def fwd(params, cfg_, chunk, pos0, cache_):
        t = chunk.shape[1]
        pos_index = pos0[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
        return forward_paged(params, cfg_, chunk, pos_index, cache_,
                             page_tables)

    def body(carry, _):
        return _spec_round(params, cfg, carry, temps, top_ps, slot_keys, k,
                           fwd, draft=(dparams, dcfg))

    (tokens, pos, cache, hist, dcache), (samples, accepts) = jax.lax.scan(
        body, (tokens, pos, cache, hist, dcache), None, length=m)
    return samples, accepts, tokens, pos, cache, dcache, hist


@partial(jax.jit, static_argnames=("dcfg", "use_kernel"),
         donate_argnames=("dcache",))
def _draft_prefill_insert(dparams, dcfg: ModelConfig, tokens, true_lens,
                          slots_arr, dcache: KVCache,
                          use_kernel: bool | None = None):
    """Prefill the DRAFT model over an admission's padded (k, T) prompts and
    scatter the K/V strips into the per-slot draft cache — the draft-mode
    companion dispatch to _prefill_insert (the draft model must see the
    prompt before it can propose continuations; speculative.py:191-194)."""
    k, t_pad = tokens.shape
    scratch = KVCache.create(dcfg, batch=k, max_len=t_pad)
    idx = jnp.arange(t_pad)[None, :]
    pos_index = jnp.where(idx < true_lens[:, None], idx, t_pad - 1)
    _, scratch = forward(dparams, dcfg, tokens, pos_index, scratch,
                         plen=true_lens, logit_rows=true_lens - 1)
    return _insert_body(dcache, scratch.k, scratch.v, slots_arr,
                        use_kernel=use_kernel)


@partial(jax.jit, static_argnames=("dcfg",), donate_argnames=("dcache",))
def _draft_resync(dparams, dcfg: ModelConfig, tokens, pos_index, dcache):
    """Replay a (B, T) span of already-emitted tokens through the DRAFT
    model, rewriting its per-slot cache rows at `pos_index` — how draft-mode
    speculation recovers from a dormant stretch of plain ticks (which
    advance the stream without touching the draft cache). Rows are the true
    historical inputs, so rewrites are idempotent; padding clamps to each
    slot's last position (identical content, harmless duplicate write)."""
    _, dcache = forward(dparams, dcfg, tokens, pos_index, dcache,
                        logit_rows=jnp.zeros((tokens.shape[0],), jnp.int32))
    return dcache


def _prefill_body(params, cfg: ModelConfig, tokens, true_lens, temps, top_ps,
                  slot_keys):
    """Prefill k prompts (padded to one (k, T) bucket) in one batched pass.

    A burst of admissions costs one batched weight stream instead of k
    sequential ones (VERDICT r2 #2: serial prefill admission stalled decode
    and dominated TTFT under load). Per-row padded positions write to the
    last scratch row and are never attended by real queries. Returns
    (first tokens (k,), k strips (L,k,kv,T,hd), v strips). Row j's first
    token is sampled from the query at position true_lens[j]-1 with key
    fold_in(slot_keys[j], true_lens[j]-1), consistent with the tick keying.
    """
    k, t_pad = tokens.shape
    scratch = KVCache.create(cfg, batch=k, max_len=t_pad)
    idx = jnp.arange(t_pad)[None, :]
    pos_index = jnp.where(idx < true_lens[:, None], idx, t_pad - 1)
    # logit_rows: the classifier runs only on each row's last real query —
    # full (k, T, V) fp32 logits OOM'd 7B prefill at the (8, 2048) bucket
    last, scratch = forward(params, cfg, tokens, pos_index, scratch,
                            plen=true_lens, logit_rows=true_lens - 1)
    keys = fold_in_pos(slot_keys, true_lens - 1)
    firsts = sample_batched_keyed(last[:, 0], keys, temps, top_ps)
    return firsts, scratch.k, scratch.v


def _insert_body(cache, k_new, v_new, slots, use_kernel: bool | None = None,
                 _interpret: bool = False):
    """Scatter k prefilled (L, k, kv, T, hd) K/V strips into their slots at
    pos 0. Duplicate slot entries (batch padding) carry identical strips,
    so scatter order is immaterial.

    With an int8 cache (QuantKVCache) the bf16 prefill strips are quantized
    row-wise on insert — prefill always runs in a dense bf16 scratch. On
    TPU the write goes through the in-place Pallas strip writer: the XLA
    int8 scatter materializes the whole cache (broadcast+select — ~4 GB of
    temps at 7B b=8 S=2048, an admission-time OOM next to weights +
    scratch). `use_kernel` must be False under a GSPMD mesh (the pallas
    call is opaque to the partitioner; the tp path keeps the scatter)."""
    from rama_tpu.models.llama import QuantKVCache, kv_quant_rows

    t = k_new.shape[3]
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    if isinstance(cache, QuantKVCache):
        kq, ks = kv_quant_rows(k_new)
        vq, vs = kv_quant_rows(v_new)
        if use_kernel or _interpret:
            from rama_tpu.ops.pallas.kv_write import write_kv_strips_q8

            k8, v8, kss, vss = write_kv_strips_q8(
                cache.k, cache.v, cache.ks, cache.vs, kq, vq, ks, vs,
                slots, interpret=_interpret)
            return QuantKVCache(k=k8, v=v8, ks=kss, vs=vss)
        return QuantKVCache(
            k=cache.k.at[:, slots, :, :t].set(kq),
            v=cache.v.at[:, slots, :, :t].set(vq),
            ks=cache.ks.at[:, slots, :, :t].set(ks),
            vs=cache.vs.at[:, slots, :, :t].set(vs))
    return KVCache(
        k=cache.k.at[:, slots, :, :t].set(k_new.astype(cache.k.dtype)),
        v=cache.v.at[:, slots, :, :t].set(v_new.astype(cache.v.dtype)))


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def _prefill_insert(params, cfg: ModelConfig, tokens, true_lens, temps,
                    top_ps, slot_keys, slots, cache):
    """The ENTIRE device half of admission in ONE dispatch: batched prefill,
    first-token sampling, and the slot-cache insert. Separate
    prefill/insert/fetch dispatches paid ~3 serialized host round-trips per
    admission over a remote-TPU tunnel (measured: 58 ms mean prefill phase
    for a (8, 16) bucket whose compute is ~10 ms)."""
    firsts, k_new, v_new = _prefill_body(params, cfg, tokens, true_lens,
                                         temps, top_ps, slot_keys)
    t_ins = min(tokens.shape[1], cache.k.shape[3])
    cache = _insert_body(cache, k_new[:, :, :, :t_ins],
                         v_new[:, :, :, :t_ins], slots)
    return firsts, cache


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def _prefill_insert_gspmd(params, cfg: ModelConfig, tokens, true_lens, temps,
                          top_ps, slot_keys, slots, cache):
    """_prefill_insert for the seq_par engine: params replicated, cache
    S-sharded — GSPMD partitions the scatter onto the sharded sequence dim
    (each shard masks rows it doesn't own; the replicated prefill compute is
    redundant across `model`, which is fine — admission is rare next to
    decode and the weights are already everywhere). The Pallas strip writer
    can't run under GSPMD, hence use_kernel=False."""
    firsts, k_new, v_new = _prefill_body(params, cfg, tokens, true_lens,
                                         temps, top_ps, slot_keys)
    t_ins = min(tokens.shape[1], cache.k.shape[3])
    cache = _insert_body(cache, k_new[:, :, :, :t_ins],
                         v_new[:, :, :, :t_ins], slots, use_kernel=False)
    return firsts, cache


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("scratch", "last"))
def _prefill_chunk_step(params, cfg: ModelConfig, tokens_chunk, true_lens,
                        off, scratch, last):
    """ONE chunk of a background prefill job (EngineConfig.prefill_chunk):
    forward (k, C) prompt columns [off, off+C) into the job's persistent
    scratch cache (attending all previously prefilled columns) and capture
    each row's true-last logits into the (k, V) `last` buffer when its
    plen-1 falls inside this chunk. `off` is traced — one compiled program
    per (k, C) shape serves every chunk of every prompt length.

    Interleaved with decode ticks by the host loop, so a long admission
    stalls active streams by one chunk forward (~35 ms at 7B, C=256)
    instead of one whole-prompt dispatch (~280 ms at T=2048): the
    decode-stall fix VERDICT r3 item 6 asked for. Row positions past plen
    clamp to the last scratch row (write-before-attend, as in
    _prefill_body); rows whose prefill already completed compute clamped
    garbage that nothing reads."""
    k, c = tokens_chunk.shape
    t_pad = scratch.k.shape[3]
    idx = off + jnp.arange(c, dtype=jnp.int32)[None, :]
    pos_index = jnp.where(idx < true_lens[:, None], idx, t_pad - 1)
    sel = true_lens - 1 - off
    # classifier only at the candidate last row of this chunk (logit_rows):
    # the full (k, C, V) fp32 chunk logits are admission-discarded weight
    take, scratch = forward(params, cfg, tokens_chunk, pos_index, scratch,
                            logit_rows=jnp.clip(sel, 0, c - 1))
    last = jnp.where(((sel >= 0) & (sel < c))[:, None], take[:, 0], last)
    return scratch, last


@partial(jax.jit, donate_argnames=("cache", "scratch"))
def _prefill_finish(last, true_lens, temps, top_ps, slot_keys, slots,
                    scratch, cache):
    """Complete a chunked-prefill job: sample each row's first token from
    the captured last-position logits (same (slot key, position) keying as
    every other sampling site) and insert the scratch strips into the slot
    cache — one dispatch, one blocking fetch (the firsts)."""
    keys = fold_in_pos(slot_keys, true_lens - 1)
    firsts = sample_batched_keyed(last, keys, temps, top_ps)
    t_ins = min(scratch.k.shape[3], cache.k.shape[3])
    cache = _insert_body(cache, scratch.k[:, :, :, :t_ins],
                         scratch.v[:, :, :, :t_ins], slots)
    return firsts, cache


@partial(jax.jit, donate_argnames=("cache", "scratch"))
def _prefill_finish_paged(last, true_lens, temps, top_ps, slot_keys, rows,
                          scratch, cache):
    """_prefill_finish against the page pool (per-slot scatters unrolled,
    as in _prefill_insert_paged)."""
    from rama_tpu.runtime.paged import _insert_prefill_paged_impl

    keys = fold_in_pos(slot_keys, true_lens - 1)
    firsts = sample_batched_keyed(last, keys, temps, top_ps)
    ps = cache.page_size
    t_ins = min(scratch.k.shape[3], rows.shape[1] * ps)
    for j in range(rows.shape[0]):
        cache = _insert_prefill_paged_impl(
            cache, scratch.k[:, j, :, :t_ins], scratch.v[:, j, :, :t_ins],
            rows[j])
    return firsts, cache


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def _prefill_insert_paged(params, cfg: ModelConfig, tokens, true_lens, temps,
                          top_ps, slot_keys, rows, cache):
    """_prefill_insert against the page pool: the k per-slot page scatters
    unroll inside the same program (k is the static batch bucket). Pad rows
    duplicate the last real row — identical strips into identical pages."""
    from rama_tpu.runtime.paged import _insert_prefill_paged_impl

    firsts, k_new, v_new = _prefill_body(params, cfg, tokens, true_lens,
                                         temps, top_ps, slot_keys)
    ps = cache.page_size
    t_ins = min(tokens.shape[1], rows.shape[1] * ps)
    for j in range(tokens.shape[0]):
        cache = _insert_prefill_paged_impl(
            cache, k_new[:, j, :, :t_ins], v_new[:, j, :, :t_ins], rows[j])
    return firsts, cache


class Engine:
    """Owns the model, the slot pool, and the device loop thread.

    With EngineConfig.tp_size > 1 the engine runs tensor-parallel: params and
    the KV cache (dense slots or the paged pool, whose KV heads shard over
    `model`) live on the ("data", "model") mesh and every tick executes the
    shard_mapped decode step (BASELINE config #4: tensor-sharded serving
    with continuous batching).
    """

    def __init__(self, cfg: ModelConfig, params, tokenizer: Tokenizer,
                 engine_config: EngineConfig | None = None, draft=None):
        """draft: optional (draft_cfg, draft_params) for
        EngineConfig.spec_mode == "draft" — a small resident model that
        proposes tokens inside the speculative scan instead of the n-gram
        prompt-lookup."""
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.ecfg = engine_config or EngineConfig()
        if self.ecfg.compile_cache:
            from rama_tpu.utils.platform import enable_compile_cache

            enable_compile_cache(self.ecfg.compile_cache)
        b = self.ecfg.max_batch_size
        # max_seq_len may EXCEED the checkpoint's seq_len (long-context
        # serving): the cache and RoPE tables are sized to it below. The
        # S-tiled decode-attention and ragged paged kernels exist precisely
        # so long caches stream only the rows below each slot's position.
        self.max_len = self.ecfg.max_seq_len or cfg.seq_len
        self.paged = self.ecfg.paged_kv
        self.tp = self.ecfg.tp_size
        self.dp = self.ecfg.dp_size
        # any non-trivial mesh routes through the shard_mapped builders;
        # dp shards the slot batch over `data`, tp shards weights/KV heads
        # over `model`
        self.use_mesh = self.tp > 1 or self.dp > 1
        if self.dp > 1 and b % self.dp:
            raise ValueError(f"dp_size {self.dp} does not divide "
                             f"max_batch_size {b}")
        self.kv_quant = self.ecfg.kv_quant
        if self.kv_quant not in (None, "int8"):
            raise ValueError(f"unsupported kv_quant {self.kv_quant!r}")
        self.seq_par = self.ecfg.seq_par
        if self.seq_par:
            if self.tp <= 1:
                raise ValueError("seq_par requires tp_size > 1 (the model "
                                 "axis shards the sequence)")
            if self.paged or self.ecfg.spec_tick or self.ecfg.prefill_chunk:
                raise ValueError("seq_par composes with dp and kv_quant "
                                 "only (no paged/spec/chunked prefill yet)")
            if self.max_len % self.tp:
                raise ValueError(f"tp_size {self.tp} does not divide "
                                 f"max_seq_len {self.max_len}")
        self.spec = self.ecfg.spec_tick
        # rounds per spec dispatch, clamped down to a power of two (each
        # distinct m is one compiled program; the shrink ladder halves it)
        r = max(1, self.ecfg.spec_rounds)
        self.spec_rounds = 1 << (r.bit_length() - 1)
        self.spec_mode = self.ecfg.spec_mode
        if self.spec_mode not in ("ngram", "draft"):
            raise ValueError(f"unknown spec_mode {self.spec_mode!r}")
        self.draft_mode = bool(self.spec) and self.spec_mode == "draft"
        if self.draft_mode and draft is None:
            raise ValueError("spec_mode='draft' requires "
                             "draft=(draft_cfg, draft_params)")
        self.pf_chunk = self.ecfg.prefill_chunk
        if self.pf_chunk and (self.pf_chunk < 16
                              or self.pf_chunk & (self.pf_chunk - 1)):
            raise ValueError(f"prefill_chunk {self.pf_chunk} must be a "
                             f"power of two >= 16")
        # prompts LONGER than pf_engage route through the chunked job;
        # shorter ones take the direct single-dispatch prefill
        self.pf_engage = (self.ecfg.prefill_chunk_min
                          if self.ecfg.prefill_chunk_min is not None
                          else 4 * self.pf_chunk)
        if self.pf_chunk and self.pf_engage < self.pf_chunk:
            raise ValueError("prefill_chunk_min must be >= prefill_chunk")
        if self.tp > 1 and not self.seq_par:
            from rama_tpu.parallel.tp import validate_tp

            validate_tp(cfg, self.tp)
        # Multi-host: host 0 fronts scheduling/IO; every other process runs
        # follow(), replaying the broadcast device-call sequence in lockstep.
        self.multihost = jax.process_count() > 1
        if self.multihost and not self.use_mesh:
            raise ValueError("multi-host serving requires tp_size > 1 or "
                             "dp_size > 1 (a global mesh to shard over)")
        if params["rope_cos"].shape[0] < self.max_len:
            # long-context serving: retabulate RoPE out to the cache length
            # (exact rotation, no rescaling — see checkpoint.compute_freqs)
            from rama_tpu.checkpoint import compute_freqs

            cos, sin = compute_freqs(cfg, seq_len=self.max_len)
            params = dict(params)
            params["rope_cos"] = jnp.asarray(cos, jnp.float32)
            params["rope_sin"] = jnp.asarray(sin, jnp.float32)
        if "wqkv" in params:
            if self.tp > 1 and not self.seq_par:
                # fused column layout is tp-specific; a tp=1 fusion sharded
                # over tp>1 would split mid-projection
                raise ValueError("pass unfused params to a tensor-parallel "
                                 "Engine; it fuses with the right tp layout")
        else:
            from rama_tpu.models.llama import fuse_params

            # seq_par replicates weights on every chip, so its fused layout
            # is always the tp=1 one
            params = fuse_params(params, cfg,
                                 tp_size=1 if self.seq_par else self.tp)
        if self.ecfg.scale_dtype:
            if self.ecfg.scale_dtype != "bf16":
                raise ValueError(f"unsupported scale_dtype "
                                 f"{self.ecfg.scale_dtype!r}")
            from rama_tpu.ops.quant import cast_scales

            params = cast_scales(params, jnp.bfloat16)
        if self.use_mesh and self.seq_par:
            from rama_tpu.parallel.mesh import make_mesh
            from rama_tpu.parallel import seqpar

            self.mesh = make_mesh(tp_size=self.tp, dp_size=self.dp,
                                  devices=jax.devices()[: self.tp * self.dp])
            params = seqpar.replicate_params(params, self.mesh)
            self._tp_tick = seqpar.make_seqpar_decode_tick(
                cfg, self.mesh, params, kv_quant=self.kv_quant == "int8")
        elif self.use_mesh:
            from rama_tpu.parallel.mesh import make_mesh
            from rama_tpu.parallel import tp as tp_mod

            self.mesh = make_mesh(tp_size=self.tp, dp_size=self.dp,
                                  devices=jax.devices()[: self.tp * self.dp])
            params = tp_mod.shard_params(params, self.mesh)
            if self.paged:
                self._tp_paged_tick = tp_mod.make_paged_decode_tick(
                    cfg, self.mesh, params,
                    kv_quant=self.kv_quant == "int8")
                self._tp_prefill_insert = tp_mod.make_paged_prefill_insert(
                    cfg, self.mesh, params,
                    kv_quant=self.kv_quant == "int8")
                if self.spec:
                    self._tp_paged_spec = tp_mod.make_paged_spec_scan_tick(
                        cfg, self.mesh, params, self.spec,
                        kv_quant=self.kv_quant == "int8",
                        draft_cfg=draft[0] if self.draft_mode else None)
            else:
                self._tp_tick = tp_mod.make_decode_tick(
                    cfg, self.mesh, params,
                    kv_quant=self.kv_quant == "int8")
                self._tp_prefill_insert = tp_mod.make_prefill_insert(
                    cfg, self.mesh, params,
                    kv_quant=self.kv_quant == "int8")
                if self.spec:
                    self._tp_spec = tp_mod.make_spec_scan_tick(
                        cfg, self.mesh, params, self.spec,
                        kv_quant=self.kv_quant == "int8",
                        draft_cfg=draft[0] if self.draft_mode else None)
            if self.pf_chunk:
                self._tp_pf_chunk = tp_mod.make_prefill_chunk_step(
                    cfg, self.mesh, params)
                if self.paged:
                    self._tp_pf_finish = tp_mod.make_paged_prefill_finish(
                        cfg, self.mesh,
                        kv_quant=self.kv_quant == "int8")
        self.params = params
        self.dcfg = self.dparams = self.dcache = None
        if self.draft_mode:
            dcfg, dparams = draft
            self.dcfg = dcfg
            if dparams["rope_cos"].shape[0] < self.max_len:
                from rama_tpu.checkpoint import compute_freqs

                cos, sin = compute_freqs(dcfg, seq_len=self.max_len)
                dparams = dict(dparams)
                dparams["rope_cos"] = jnp.asarray(cos, jnp.float32)
                dparams["rope_sin"] = jnp.asarray(sin, jnp.float32)
            if "wqkv" not in dparams:
                from rama_tpu.models.llama import fuse_params

                # the draft model runs REPLICATED on every chip (it is tiny
                # next to the target; sharding it would trade one psum per
                # draft step for negligible FLOP savings), so its fused
                # layout is always the tp=1 one
                dparams = fuse_params(dparams, dcfg, tp_size=1)
            self.dcache = KVCache.create(dcfg, batch=b, max_len=self.max_len)
            if self.use_mesh:
                from rama_tpu.parallel.distributed import make_global
                from rama_tpu.parallel.tp import draft_cache_spec

                dparams = jax.tree_util.tree_map(
                    lambda x: make_global(jnp.asarray(x), self.mesh,
                                          jax.sharding.PartitionSpec()),
                    dparams)
                self.dcache = jax.tree_util.tree_map(
                    lambda x, s: make_global(x, self.mesh, s),
                    self.dcache, draft_cache_spec())
            self.dparams = dparams
        if self.paged:
            from rama_tpu.native import PageAllocator

            ps = self.ecfg.kv_page_size
            self.pages_per_slot = -(-self.max_len // ps)
            num_pages = self.ecfg.kv_num_pages or b * self.pages_per_slot
            if num_pages % self.dp:
                raise ValueError(f"kv_num_pages {num_pages} not divisible "
                                 f"by dp_size {self.dp}")
            # dp > 1: pages shard over `data` — each replica owns a private
            # sub-pool, its own allocator, and LOCAL page-table indices
            # (parallel.tp.paged_cache_spec). dp=1 degenerates to one pool.
            local_pages = num_pages // self.dp
            # one extra "trash" page per replica absorbs the unconditional
            # KV writes of free slots, so stale page-table rows can never
            # corrupt pages the allocator has handed to live requests
            self.trash_page = local_pages
            self.allocators = [PageAllocator(local_pages, ps, b)
                               for _ in range(self.dp)]
            self.cache = self._create_paged_cache(
                self.dp * (local_pages + 1), ps)
            if self.use_mesh:
                from rama_tpu.parallel.tp import shard_paged_cache

                self.cache = shard_paged_cache(self.cache, self.mesh)
            self.page_tables = np.full((b, self.pages_per_slot),
                                       self.trash_page, np.int32)
        else:
            self.cache = self._create_slot_cache(b)
            if self.use_mesh:
                self.cache = self._shard_slot_cache(self.cache)
        self.slots = [_Slot() for _ in range(b)]
        # per-slot token-history capacity (index p = input token at position
        # p): sized so spec-scan hist writes (<= max_len) always fit
        self._hist_cap = self.max_len + max(self.spec, 1) + 1
        # bounded admission queue — reference uses bounded(30), main.rs:68
        self.admission: "queue.Queue[Request]" = queue.Queue(maxsize=30)
        # Per-slot stream keys: request r gets a host-derived uint32[2] raw
        # key from (seed, r) — any deterministic unique pair is a valid raw
        # key; deriving it with jax.random.fold_in dispatched a device op
        # per admitted request (~25-50 ms of idle device over a remote-TPU
        # tunnel, measured as most of the serving admit phase). Every sample
        # for the request is then keyed by fold_in(slot_key, position)
        # INSIDE the compiled step, so its stream is one deterministic
        # sequence however the engine groups steps into dispatches (tick
        # size, speculation, chaining).
        self.slot_keys = np.zeros((b, 2), np.uint32)
        self.req_counter = 0
        # pipelined-tick state: the dispatched-but-unfetched tick (primary)
        # and the last device token matrix (both hosts; feeds chained ticks)
        self._inflight_q: "deque[dict]" = deque()
        self._last_out = None
        # pipelined SPEC state: the dispatched-but-unfetched spec scan and
        # the device-resident (tokens, pos, hist) carries that seed a
        # chained successor (followers keep their own copy via
        # _dev_spec_scan; identical on every host)
        self._spec_inflight_q: "deque[dict]" = deque()
        self._last_spec: tuple | None = None
        # adaptive speculation (EngineConfig.spec_min_accept): rolling
        # per-round accept fractions; when their mean stays below the
        # threshold, spec goes dormant for _SPEC_DORMANT_TICKS plain
        # (chained) ticks, then probes again
        self._spec_window: "deque[float]" = deque(maxlen=64)
        self._spec_dormant = 0
        # chunked-prefill state: the single active job and entries waiting
        # for it to finish (their slots already assigned, prefilling=True)
        self._pf_job: dict | None = None
        self._pf_pending: list = []
        # async-admit state: prefill groups dispatched while decode ticks
        # were still in flight, their first tokens not yet fetched. Each is
        # {"entries": [...], "firsts": device (k,) array}. While non-empty,
        # chaining is blocked (a chained tick dispatched AFTER the prefill
        # would stomp the admitted slots' fresh KV rows) and the firsts are
        # fetched+emitted once the pipeline drains (VERDICT r4 next #2).
        self._admit_jobs: list = []
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._wake = threading.Event()
        # metrics
        from rama_tpu.utils.profiling import PhaseTimer

        self.phases = PhaseTimer()
        self.metrics = {
            "tokens_generated": 0,
            "tick_tokens": 0,       # emitted by decode/spec ticks only
            "requests_completed": 0,
            "engine_errors": 0,
            "ttft_ms": [],          # recent TTFTs
            "decode_ticks": 0,
            "decode_s": 0.0,
            "spec_drafted": 0,
            "spec_accepted": 0,
        }

    def _create_slot_cache(self, batch: int):
        if self.kv_quant == "int8":
            from rama_tpu.models.llama import QuantKVCache

            return QuantKVCache.create(self.cfg, batch=batch,
                                       max_len=self.max_len)
        return KVCache.create(self.cfg, batch=batch, max_len=self.max_len)

    def _shard_slot_cache(self, cache):
        """Dense slot cache onto the mesh: KV heads over `model` (tp) or —
        seq_par — the SEQUENCE dim over `model` (parallel/seqpar.py)."""
        if self.seq_par:
            from rama_tpu.parallel.seqpar import shard_seqpar_cache

            return shard_seqpar_cache(cache, self.mesh)
        from rama_tpu.parallel.tp import shard_cache

        return shard_cache(cache, self.mesh)

    def _create_paged_cache(self, num_pages: int, page_size: int):
        from rama_tpu.runtime.paged import PagedKVCache, QuantPagedKVCache

        cls = QuantPagedKVCache if self.kv_quant == "int8" else PagedKVCache
        return cls.create(self.cfg, num_pages, page_size)

    def _alloc(self, slot_idx: int):
        """The page allocator owning slot_idx (slots split into dp contiguous
        replica blocks, matching the batch's `data` sharding)."""
        return self.allocators[slot_idx * self.dp // len(self.slots)]

    # -- public API ---------------------------------------------------------

    def submit(self, req: Request, timeout: float | None = None) -> Request:
        req.prompt_ids = (self.tokenizer.encode(req.prompt, strict=False)
                          if req.prompt else [])
        # leave room for BOS and at least one generated token; record how
        # many tokens were dropped so the server can tell the client (the
        # reference streams garbage in this case — silent truncation is
        # better, signalled truncation is best)
        req.truncated = max(0, len(req.prompt_ids) - (self.max_len - 2))
        req.prompt_ids = req.prompt_ids[: self.max_len - 2]
        max_new = self.max_len - len(req.prompt_ids) - 1
        req.steps = max(1, min(req.steps, max_new))
        self.admission.put(req, timeout=timeout)
        self._wake.set()
        return req

    def start(self):
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="rama-engine")
        self._thread.start()

    def stop(self):
        self._stop.set()
        self._wake.set()
        if self._thread:
            self._thread.join(timeout=30)
        if self.multihost:
            from rama_tpu.parallel.distributed import broadcast_step

            broadcast_step([np.asarray([_OP_STOP, 0, 0, 0], np.int64)])

    def warmup(self, max_prompt: int | None = None) -> dict:
        """Precompile every device program the serving loop can dispatch.

        XLA compiles each distinct program (shape x static args) on first
        use — several seconds each at 7B — and without warmup those compiles
        land mid-serving: one cold (k, T) prefill bucket stalls every active
        stream for the full compile (measured on the round-3 serving bench:
        mid-stream prefill compiles cost ~45% of aggregate throughput).
        Runs the real tick/spec/prefill code paths on zeroed dummy batches.
        Dummy traffic writes cache rows only at slot 0 / position 0 (paged:
        the trash page), so call this BEFORE submitting traffic — typically
        right before start(). With EngineConfig.compile_cache set, later
        processes reload these programs from disk instead of recompiling.

        max_prompt bounds the prefill T buckets (default: every bucket up
        to max_seq_len). Returns {"programs": count, "seconds": wall}.
        """
        b = len(self.slots)
        t0 = time.time()
        count = 0
        zb = np.zeros(b, np.int32)
        zt = np.zeros(b, np.float32)
        zp = np.full(b, 0.9, np.float32)
        # decode ticks: the budget-shrink loop emits powers of two <= tick
        n = max(1, self.ecfg.decode_tick)
        while True:
            self._broadcast_tick(n, zb, zb, zt, zp, chained=False)
            self._dev_tick(zb, zb, zt, zp, self.slot_keys, n)
            count += 1
            if n == 1:
                break
            n //= 2
        if self.spec:
            # the m-shrink ladder: every power of two <= spec_rounds
            m = self.spec_rounds
            while True:
                hist = self._hist_matrix()
                self._broadcast_spec(zb, zb, zt, zp, hist, m)
                s_, _ = self._dev_spec_scan(zb, zb, zt, zp, self.slot_keys,
                                            hist, self.spec, m)
                np.asarray(s_)  # completion barrier (warmup is blocking)
                count += 1
                if m == 1:
                    break
                m //= 2
        # prefill (k, T) buckets: exactly the shapes _start_requests can emit
        # (power-of-two buckets capped at the cache length)
        hi = min((max_prompt or self.max_len) + 1, self.max_len)
        ts, t = [], 16
        while True:
            ts.append(min(t, self.max_len))
            if t >= hi:
                break
            t *= 2
        for t_pad in ts:
            if self.pf_chunk and t_pad > _bucket(self.pf_engage):
                continue  # routed through the chunked job, warmed below
            kset = sorted({_bucket_k(nn, self.dp, b, t_pad)
                           for nn in range(1, b + 1)})
            for k_pad in kset:
                tokens = np.zeros((k_pad, t_pad), np.int32)
                true_lens = np.ones(k_pad, np.int32)
                slots_arr = np.zeros(k_pad, np.int32)
                temps = np.zeros(k_pad, np.float32)
                top_ps = np.full(k_pad, 0.9, np.float32)
                keys = np.zeros((k_pad, 2), np.uint32)
                rows = (np.full((k_pad, self.pages_per_slot), self.trash_page,
                                np.int32) if self.paged else None)
                if self.multihost:
                    from rama_tpu.parallel.distributed import broadcast_step

                    broadcast_step([np.asarray([_OP_PREFILL, k_pad, t_pad, 1],
                                               np.int64)])
                    payload = [tokens, true_lens, slots_arr, temps, top_ps,
                               keys]
                    if self.paged:
                        payload.append(rows)
                    broadcast_step(payload)
                np.asarray(  # warmup is blocking: barrier each compile
                    self._dev_prefill_insert(tokens, true_lens, slots_arr,
                                             temps, top_ps, keys, rows, 1))
                count += 1
                if self.draft_mode:
                    self._dev_draft_prefill(tokens, true_lens, slots_arr)
                    count += 1
        if self.pf_chunk:
            # chunked-prefill job programs: the chunk step is ONE program per
            # (k_pad, C) batch bucket (off is traced); the finisher one per
            # (k_pad, t_pad) bucket above the chunk size
            from rama_tpu.parallel.distributed import broadcast_step

            for t_pad in [t for t in ts if t >= _bucket(self.pf_engage)]:
                kset = sorted({_bucket_k(nn, self.dp, b, t_pad)
                               for nn in range(1, b + 1)})
                for k_pad in kset:
                    if self.multihost:
                        broadcast_step([np.asarray(
                            [_OP_PFSTART, k_pad, t_pad, 0], np.int64)])
                    scratch = KVCache.create(self.cfg, batch=k_pad,
                                             max_len=t_pad)
                    if self.use_mesh:
                        from rama_tpu.parallel.tp import shard_cache

                        scratch = shard_cache(scratch, self.mesh)
                    job = {
                        "tokens": np.zeros((k_pad, t_pad), np.int32),
                        "true_lens": np.ones(k_pad, np.int32),
                        "slots_arr": np.zeros(k_pad, np.int32),
                        "temps": np.zeros(k_pad, np.float32),
                        "top_ps": np.full(k_pad, 0.9, np.float32),
                        "keys": np.zeros((k_pad, 2), np.uint32),
                        "rows": (np.full((k_pad, self.pages_per_slot),
                                         self.trash_page, np.int32)
                                 if self.paged else None),
                        "scratch": scratch,
                        "last": jnp.zeros((k_pad, self.cfg.vocab_size),
                                          jnp.float32),
                        "n_real": 1,
                    }
                    chunk = np.zeros((k_pad, self.pf_chunk), np.int32)
                    if self.multihost:
                        broadcast_step([np.asarray(
                            [_OP_PFCHUNK, k_pad, self.pf_chunk, 0],
                            np.int64)])
                        broadcast_step([chunk, job["true_lens"].copy()])
                    job["scratch"], job["last"] = self._dev_pf_chunk(
                        chunk, job["true_lens"], 0, job["scratch"],
                        job["last"])
                    if self.multihost:
                        broadcast_step([np.asarray(
                            [_OP_PFDONE, k_pad, 1, 0], np.int64)])
                        payload = [job["true_lens"], job["slots_arr"],
                                   job["temps"], job["top_ps"], job["keys"]]
                        if self.paged:
                            payload.append(job["rows"])
                        broadcast_step(payload)
                    self._dev_pf_finish(job)
                    count += 2
                    if self.draft_mode:
                        self._dev_draft_prefill(job["tokens"],
                                                job["true_lens"],
                                                job["slots_arr"])
                        count += 1
        return {"programs": count, "seconds": time.time() - t0}

    def follow(self):
        """Run this process as a multi-host follower (host != 0): replay the
        primary's device-call sequence from the broadcast protocol so every
        process issues identical computations on identical global values.
        Blocks until the primary broadcasts stop."""
        from rama_tpu.parallel.distributed import broadcast_step

        b = len(self.slots)
        while True:
            (header,) = broadcast_step([np.zeros(4, np.int64)])
            op, a0, a1, a2 = (int(v) for v in header)
            if op == _OP_STOP:
                return
            if op == _OP_RESET:
                self._reset_cache()
            elif op == _OP_TICK:
                n, chained = a0, bool(a1)
                tmpl = ([] if chained else [np.zeros(b, np.int32)]) + [
                    np.zeros(b, np.int32),
                    np.zeros(b, np.float32), np.zeros(b, np.float32),
                    np.zeros((b, 2), np.uint32)]
                if self.paged:
                    tmpl.append(np.zeros_like(self.page_tables))
                got = broadcast_step(tmpl)
                if chained:
                    # chained tick: tokens are this host's own device copy of
                    # the previous tick's output (identical on every host)
                    tokens = self._last_out[-1]
                    pos, temps, tps, slot_keys = got[:4]
                    if self.paged:
                        self.page_tables = got[4]
                else:
                    tokens, pos, temps, tps, slot_keys = got[:5]
                    if self.paged:
                        self.page_tables = got[5]
                self._dev_tick_async(tokens, pos, temps, tps, slot_keys, n)
            elif op == _OP_PREFILL:
                k_pad, t_pad, n_real = a0, a1, a2
                tmpl = [np.zeros((k_pad, t_pad), np.int32),
                        np.zeros(k_pad, np.int32), np.zeros(k_pad, np.int32),
                        np.zeros(k_pad, np.float32),
                        np.zeros(k_pad, np.float32),
                        np.zeros((k_pad, 2), np.uint32)]
                if self.paged:
                    tmpl.append(np.zeros((k_pad, self.pages_per_slot),
                                         np.int32))
                got = broadcast_step(tmpl)
                tokens, true_lens, slots_arr, temps, top_ps, keys = got[:6]
                rows = got[6] if self.paged else None
                for j in range(n_real):
                    self.slot_keys[slots_arr[j]] = keys[j]
                    if self.paged:
                        self.page_tables[slots_arr[j]] = rows[j]
                self._dev_prefill_insert(tokens, true_lens, slots_arr, temps,
                                         top_ps, keys, rows, n_real)
                if self.draft_mode:
                    self._dev_draft_prefill(tokens, true_lens, slots_arr)
            elif op == _OP_SPEC:
                k, m, chained = a0, a1, bool(a2)
                tmpl = ([np.zeros(b, np.float32), np.zeros(b, np.float32),
                         np.zeros((b, 2), np.uint32)] if chained else
                        [np.zeros(b, np.int32), np.zeros(b, np.int32),
                         np.zeros(b, np.float32), np.zeros(b, np.float32),
                         np.zeros((b, 2), np.uint32),
                         np.zeros((b, self._hist_cap), np.int32)])
                if self.paged:
                    tmpl.append(np.zeros_like(self.page_tables))
                got = broadcast_step(tmpl)
                if chained:
                    # chained spec tick: tokens/pos/hist are this host's own
                    # device copies of the previous spec scan's carries
                    tokens, pos, hist = self._last_spec
                    temps, tps, slot_keys = got[:3]
                    if self.paged:
                        self.page_tables = got[3]
                else:
                    tokens, pos, temps, tps, slot_keys, hist = got[:6]
                    if self.paged:
                        self.page_tables = got[6]
                self._dev_spec_scan(tokens, pos, temps, tps, slot_keys,
                                    hist, k, m)
            elif op == _OP_DRSYNC:
                t_pad = a0
                tokens, pos_index = broadcast_step([
                    np.zeros((b, t_pad), np.int32),
                    np.zeros((b, t_pad), np.int32)])
                self.dcache = _draft_resync(self.dparams, self.dcfg,
                                            jnp.asarray(tokens),
                                            jnp.asarray(pos_index),
                                            self.dcache)
            elif op == _OP_PFSTART:
                k_pad, t_pad = a0, a1
                scratch = KVCache.create(self.cfg, batch=k_pad,
                                         max_len=t_pad)
                if self.use_mesh:
                    from rama_tpu.parallel.tp import shard_cache

                    scratch = shard_cache(scratch, self.mesh)
                self._pf_job = {
                    "scratch": scratch,
                    "last": jnp.zeros((k_pad, self.cfg.vocab_size),
                                      jnp.float32),
                    # draft mode: chunks re-assemble the prompt so the
                    # draft prefill at _OP_PFDONE sees the same (k, T)
                    # tokens the primary dispatches
                    "tokens": np.zeros((k_pad, t_pad), np.int32),
                }
            elif op == _OP_PFCHUNK:
                k_pad, c, off = a0, a1, a2
                chunk, true_lens = broadcast_step([
                    np.zeros((k_pad, c), np.int32),
                    np.zeros(k_pad, np.int32)])
                job = self._pf_job
                w = job["tokens"][:, off:off + c]
                w[:] = chunk[:, : w.shape[1]]
                job["scratch"], job["last"] = self._dev_pf_chunk(
                    chunk, true_lens, off, job["scratch"], job["last"])
            elif op == _OP_PFDONE:
                k_pad, n_real = a0, a1
                tmpl = [np.zeros(k_pad, np.int32), np.zeros(k_pad, np.int32),
                        np.zeros(k_pad, np.float32),
                        np.zeros(k_pad, np.float32),
                        np.zeros((k_pad, 2), np.uint32)]
                if self.paged:
                    tmpl.append(np.zeros((k_pad, self.pages_per_slot),
                                         np.int32))
                got = broadcast_step(tmpl)
                job = self._pf_job
                job.update(true_lens=got[0], slots_arr=got[1], temps=got[2],
                           top_ps=got[3], keys=got[4],
                           rows=got[5] if self.paged else None,
                           n_real=n_real)
                for j in range(n_real):
                    self.slot_keys[got[1][j]] = got[4][j]
                    if self.paged:
                        self.page_tables[got[1][j]] = got[5][j]
                self._dev_pf_finish(job)
                if self.draft_mode:
                    self._dev_draft_prefill(job["tokens"], got[0], got[1])
                self._pf_job = None
            else:
                raise RuntimeError(f"unknown multihost op {op}")

    # -- device loop --------------------------------------------------------

    def _admit(self):
        """Admit every queued request a free slot exists for, prefilling the
        whole batch in ONE padded (k, T) dispatch (serial per-request
        prefills stalled decode for N weight streams on a burst)."""
        self._admit_dispatch()
        self._complete_admit_jobs()

    def _admit_dispatch(self):
        """Dispatch-side half of admission: grab free slots, dispatch the
        batched prefill(s). First tokens stay ON DEVICE in self._admit_jobs
        until _complete_admit_jobs fetches and emits them — so the dispatch
        can overlap an in-flight decode pipeline (async-firsts admission)."""
        batch: list[tuple[int, _Slot, Request]] = []
        for i, slot in enumerate(self.slots):
            if not slot.free:
                continue
            try:
                req = self.admission.get_nowait()
            except queue.Empty:
                break
            batch.append((i, slot, req))
        if not batch:
            return
        try:
            self._start_requests(batch)
        except Exception:  # noqa: BLE001 — a failed admit must not lose the client
            import traceback

            traceback.print_exc()
            self.metrics["engine_errors"] += 1
            for i, slot, req in batch:
                if self.paged:
                    self._alloc(i).release(i)
                    self.page_tables[i, :] = self.trash_page
                slot.request = None
                slot.prefilling = False
                if req.error is None:
                    req.error = "engine error during prefill"
                    req.queue.put(None)

    def _complete_admit_jobs(self):
        """Fetch the first tokens of every dispatched-but-unfetched prefill
        group (blocks until the device reaches them) and emit. Entries whose
        slot was reassigned/errored since dispatch are skipped."""
        while self._admit_jobs:
            job = self._admit_jobs.pop(0)
            firsts = np.asarray(job["firsts"])
            for j, (slot_idx, slot, req, ids, key, row) in enumerate(
                    job["entries"]):
                if slot.request is not req:
                    continue
                first = int(firsts[j])
                slot.prefilling = False
                slot.last_token = first
                if req.echo_prompt:
                    # the reference stream re-emits prompt tokens while
                    # force-feeding them (mod.rs:227-241); serving callers
                    # usually don't want that
                    for t in req.prompt_ids:
                        req.queue.put(self.tokenizer.decode_token(t))
                self._emit(slot, first)

    def _start_requests(self, batch: list[tuple[int, _Slot, "Request"]]):
        # page bookkeeping first: a failed reserve rejects that request
        # alone, and the (broadcast) device call carries final table rows
        entries = []
        for slot_idx, slot, req in batch:
            ids = [BOS_ID] + req.prompt_ids
            key = np.random.default_rng(
                (self.ecfg.seed, self.req_counter)).integers(
                    0, 1 << 32, size=2, dtype=np.uint32)
            self.req_counter += 1
            row = None
            if self.paged:
                t_ins = min(_bucket(len(ids)), self.max_len)
                if self._alloc(slot_idx).reserve(slot_idx, t_ins) < 0:
                    # out of KV pages: reject as an error, not a silent
                    # empty stream (the server turns req.error into an SSE
                    # error event)
                    req.error = "out of KV cache pages"
                    req.queue.put(None)
                    continue
                table = self._alloc(slot_idx).table(slot_idx)
                self.page_tables[slot_idx, : len(table)] = table
                row = self.page_tables[slot_idx].copy()
            entries.append((slot_idx, slot, req, ids, key, row))
        if self.pf_chunk:
            # long prompts route through the background chunked-prefill job
            # (one chunk forward per loop iteration, interleaved with decode
            # ticks) instead of stalling every stream for one whole-prompt
            # dispatch; their slots are assigned now (prefilling=True) so
            # capacity bookkeeping is unchanged. Only prompts beyond the
            # engage threshold chunk — mid-size prompts are cheaper as one
            # direct dispatch (r4 A/B: threshold==chunk tripled their TTFT)
            long_entries = [e for e in entries
                            if len(e[3]) > self.pf_engage]
            entries = [e for e in entries if len(e[3]) <= self.pf_engage]
            for entry in long_entries:
                entry[1].request = entry[2]
                entry[1].prefilling = True
                self._pf_pending.append(entry)
            if long_entries:
                self._pf_maybe_start()
        if not entries:
            return
        # split bursts whose padded bucket would exceed the prefill AREA cap
        # (the bf16 scratch at (8, 2048) OOMs a 16 GB chip) into sequential
        # dispatches, each under the cap
        t_all = min(_bucket(max(len(e[3]) for e in entries)), self.max_len)
        c = _prefill_k_cap(t_all, self.dp)
        for i in range(0, len(entries), c):
            self._dispatch_prefill_group(entries[i:i + c])

    def _dispatch_prefill_group(self, entries):
        n_real = len(entries)
        (tokens, true_lens, slots_arr, temps, top_ps, keys,
         rows) = self._pad_entries(entries)
        k_pad, t_pad = tokens.shape
        if self.multihost:
            from rama_tpu.parallel.distributed import broadcast_step

            broadcast_step([np.asarray([_OP_PREFILL, k_pad, t_pad, n_real],
                                       np.int64)])
            payload = [tokens, true_lens, slots_arr, temps, top_ps, keys]
            if self.paged:
                payload.append(rows)
            broadcast_step(payload)
        with self.phases.phase("prefill"):
            firsts = self._dev_prefill_insert(tokens, true_lens, slots_arr,
                                              temps, top_ps, keys, rows,
                                              n_real)
            if self.draft_mode:
                self._dev_draft_prefill(tokens, true_lens, slots_arr)
        for slot_idx, slot, req, ids, key, row in entries:
            self.slot_keys[slot_idx] = key
            # slot assigned at DISPATCH (prefilling until the firsts fetch
            # in _complete_admit_jobs) so a second dispatch cannot grab it
            slot.request = req
            slot.prefilling = True
            slot.pos = len(ids)            # next decode position
            slot.draft_pos = len(ids)      # draft cache rows 0..len-1 synced
            slot.generated = 0
            # history buffer seeds the n-gram drafter; _emit appends each
            # emitted token (including `first`, at completion)
            slot.hist = np.zeros(self._hist_cap, np.int32)
            slot.hist[: len(ids)] = ids
            slot.hist_len = len(ids)
        self._admit_jobs.append({"entries": entries, "firsts": firsts})

    def _pad_entries(self, entries):
        """Pad admission entries to one (k_pad, t_pad) bucket. Pad rows
        duplicate the last real request: identical dispatch values,
        duplicate-but-identical cache writes. The T bucket caps at the cache
        length: rows above max_len are cropped at insert anyway, and
        positions >= the RoPE table length would gather garbage (jnp.take
        clips, but why compute the rows)."""
        n_real = len(entries)
        t_pad = min(_bucket(max(len(e[3]) for e in entries)), self.max_len)
        k_pad = _bucket_k(n_real, self.dp, len(self.slots), t_pad)
        tokens = np.zeros((k_pad, t_pad), np.int32)
        true_lens = np.ones(k_pad, np.int32)
        slots_arr = np.zeros(k_pad, np.int32)
        temps = np.zeros(k_pad, np.float32)
        top_ps = np.full(k_pad, 0.9, np.float32)
        keys = np.zeros((k_pad, 2), np.uint32)
        rows = (np.full((k_pad, self.pages_per_slot), self.trash_page,
                        np.int32) if self.paged else None)
        for j in range(k_pad):
            slot_idx, slot, req, ids, key, row = entries[min(j, n_real - 1)]
            tokens[j, : len(ids)] = ids
            true_lens[j] = len(ids)
            slots_arr[j] = slot_idx
            temps[j] = req.temperature
            top_ps[j] = req.top_p
            keys[j] = key
            if self.paged:
                rows[j] = row
        return tokens, true_lens, slots_arr, temps, top_ps, keys, rows

    # -- chunked prefill (background job interleaved with decode ticks) -----

    def _pf_maybe_start(self):
        if self._pf_job is not None or not self._pf_pending:
            return
        # same AREA cap as direct admission: oversized pendings wait for the
        # next job (started when this one finishes)
        t_all = min(_bucket(max(len(e[3]) for e in self._pf_pending)),
                    self.max_len)
        c = _prefill_k_cap(t_all, self.dp)
        entries = self._pf_pending[:c]
        self._pf_pending = self._pf_pending[c:]
        (tokens, true_lens, slots_arr, temps, top_ps, keys,
         rows) = self._pad_entries(entries)
        k_pad, t_pad = tokens.shape
        if self.multihost:
            from rama_tpu.parallel.distributed import broadcast_step

            broadcast_step([np.asarray([_OP_PFSTART, k_pad, t_pad, 0],
                                       np.int64)])
        scratch = KVCache.create(self.cfg, batch=k_pad, max_len=t_pad)
        if self.use_mesh:
            from rama_tpu.parallel.tp import shard_cache

            scratch = shard_cache(scratch, self.mesh)
        self._pf_job = {
            "entries": entries, "n_real": len(entries), "tokens": tokens,
            "true_lens": true_lens, "slots_arr": slots_arr, "temps": temps,
            "top_ps": top_ps, "keys": keys, "rows": rows, "scratch": scratch,
            "last": jnp.zeros((k_pad, self.cfg.vocab_size), jnp.float32),
            "off": 0,
        }

    def _pf_step(self):
        """Dispatch ONE chunk of the active prefill job (non-blocking: the
        chunk step returns device arrays, no fetch) and finish the job when
        every row's prompt is covered."""
        job = self._pf_job
        c = self.pf_chunk
        off = job["off"]
        k_pad = job["tokens"].shape[0]
        chunk = np.zeros((k_pad, c), np.int32)
        w = job["tokens"][:, off:off + c]
        chunk[:, : w.shape[1]] = w
        if self.multihost:
            from rama_tpu.parallel.distributed import broadcast_step

            broadcast_step([np.asarray([_OP_PFCHUNK, k_pad, c, off],
                                       np.int64)])
            broadcast_step([chunk, job["true_lens"].copy()])
        job["scratch"], job["last"] = self._dev_pf_chunk(
            chunk, job["true_lens"], off, job["scratch"], job["last"])
        job["off"] = off + c
        if job["off"] >= int(job["true_lens"].max()):
            self._pf_finish_job()

    def _dev_pf_chunk(self, chunk, true_lens, off, scratch, last):
        if self.use_mesh:
            return self._tp_pf_chunk(self.params, jnp.asarray(chunk),
                                     jnp.asarray(true_lens), jnp.int32(off),
                                     scratch, last)
        return _prefill_chunk_step(self.params, self.cfg, jnp.asarray(chunk),
                                   jnp.asarray(true_lens), jnp.int32(off),
                                   scratch, last)

    def _pf_finish_job(self):
        job = self._pf_job
        k_pad = job["tokens"].shape[0]
        if self.multihost:
            from rama_tpu.parallel.distributed import broadcast_step

            broadcast_step([np.asarray([_OP_PFDONE, k_pad, job["n_real"], 0],
                                       np.int64)])
            payload = [job["true_lens"], job["slots_arr"], job["temps"],
                       job["top_ps"], job["keys"]]
            if self.paged:
                payload.append(job["rows"])
            broadcast_step(payload)
        firsts = self._dev_pf_finish(job)
        if self.draft_mode:
            # the draft model sees the whole prompt in ONE dispatch at job
            # finish (the draft forward is a small fraction of one target
            # chunk; chunking it too would buy nothing)
            self._dev_draft_prefill(job["tokens"], job["true_lens"],
                                    job["slots_arr"])
        for j, entry in enumerate(job["entries"]):
            slot_idx, slot, req, ids, key, row = entry
            if slot.request is not req:
                continue  # failed/errored while prefilling
            self.slot_keys[slot_idx] = key
            slot.prefilling = False
            slot.pos = len(ids)
            slot.draft_pos = len(ids)
            slot.generated = 0
            slot.last_token = int(firsts[j])
            slot.hist = np.zeros(self._hist_cap, np.int32)
            slot.hist[: len(ids)] = ids
            slot.hist_len = len(ids)
            if req.echo_prompt:
                for t in req.prompt_ids:
                    req.queue.put(self.tokenizer.decode_token(t))
            self._emit(slot, int(firsts[j]))
        self._pf_job = None
        self._pf_maybe_start()

    def _rows_dp(self, slots_arr, rows, n_real: int) -> np.ndarray:
        """(k_pad, dp, max_pages) LOCAL page-table rows: the owner replica
        gets each slot's row, everyone else (and pad rows) the trash page —
        how inserts compose with a data-sharded pool collective-free."""
        out = np.full((rows.shape[0], self.dp, rows.shape[1]),
                      self.trash_page, np.int32)
        for j in range(n_real):
            owner = int(slots_arr[j]) * self.dp // len(self.slots)
            out[j, owner] = rows[j]
        return out

    def _dev_pf_finish(self, job) -> np.ndarray:
        args = (job["last"], jnp.asarray(job["true_lens"]),
                jnp.asarray(job["temps"]), jnp.asarray(job["top_ps"]),
                jnp.asarray(job["keys"], jnp.uint32))
        if self.paged:
            if self.use_mesh:
                rows_dp = self._rows_dp(job["slots_arr"], job["rows"],
                                        job["n_real"])
                firsts, self.cache = self._tp_pf_finish(
                    *args, jnp.asarray(rows_dp), job["scratch"], self.cache)
            else:
                firsts, self.cache = _prefill_finish_paged(
                    *args, jnp.asarray(job["rows"]), job["scratch"],
                    self.cache)
        else:
            firsts, self.cache = _prefill_finish(
                *args, jnp.asarray(job["slots_arr"]), job["scratch"],
                self.cache)
        return np.asarray(firsts)

    def _dev_prefill_insert(self, tokens, true_lens, slots_arr, temps,
                            top_ps, keys, rows, n_real: int) -> np.ndarray:
        """The device-side half of request admission — ONE dispatch: batched
        (k, T) prefill + first-token sampling + cache inserts for the k
        admitted slots. Fused because each extra dispatch costs a serialized
        host round-trip (~25 ms over a remote-TPU tunnel) that stalls every
        active stream: the split prefill/insert/fetch sequence measured
        58 ms mean for a (8, 16) bucket whose compute is ~10 ms.

        Executed identically on the primary and (replayed from the broadcast
        payload) on every follower host, so the multi-host jit contract —
        same computation sequence, same global values — holds.
        """
        args = (jnp.asarray(tokens), jnp.asarray(true_lens),
                jnp.asarray(temps), jnp.asarray(top_ps),
                jnp.asarray(keys, jnp.uint32))
        if self.paged:
            if self.use_mesh:
                rows_dp = self._rows_dp(slots_arr, rows, n_real)
                firsts, self.cache = self._tp_prefill_insert(
                    self.params, *args, jnp.asarray(rows_dp), self.cache)
            else:
                firsts, self.cache = _prefill_insert_paged(
                    self.params, self.cfg, *args, jnp.asarray(rows),
                    self.cache)
        elif self.use_mesh and self.seq_par:
            firsts, self.cache = _prefill_insert_gspmd(
                self.params, self.cfg, *args, jnp.asarray(slots_arr),
                self.cache)
        elif self.use_mesh:
            firsts, self.cache = self._tp_prefill_insert(
                self.params, *args, jnp.asarray(slots_arr), self.cache)
        else:
            firsts, self.cache = _prefill_insert(
                self.params, self.cfg, *args, jnp.asarray(slots_arr),
                self.cache)
        return firsts  # DEVICE array — callers fetch when they need values

    def _maybe_draft_resync(self):
        """Bring every stale slot's draft-cache rows up to its position by
        replaying the emitted gap through the draft model (one padded (B, T)
        dispatch). Non-stale active slots idempotently rewrite their last
        row; free/prefilling slots are untouched-equivalent (their rows get
        overwritten at admission / are already synced)."""
        stale = [s for s in self.slots
                 if not s.free and not s.prefilling and s.hist is not None
                 and s.draft_pos < s.pos]
        if not stale:
            return
        b = len(self.slots)
        span = max(s.pos - s.draft_pos for s in stale)
        t_pad = min(_bucket(span), self.max_len)
        tokens = np.zeros((b, t_pad), np.int32)
        pos_index = np.zeros((b, t_pad), np.int32)
        for i, s in enumerate(self.slots):
            if s.free or s.prefilling or s.hist is None or s.pos <= 0:
                continue
            idx = np.minimum(s.draft_pos + np.arange(t_pad), s.pos - 1)
            tokens[i] = s.hist[idx]
            pos_index[i] = idx
            s.draft_pos = s.pos
        if self.multihost:
            from rama_tpu.parallel.distributed import broadcast_step

            broadcast_step([np.asarray([_OP_DRSYNC, t_pad, 0, 0], np.int64)])
            broadcast_step([tokens, pos_index])
        self.dcache = _draft_resync(self.dparams, self.dcfg,
                                    jnp.asarray(tokens),
                                    jnp.asarray(pos_index), self.dcache)

    def _dev_draft_prefill(self, tokens, true_lens, slots_arr):
        """Draft-mode companion to _dev_prefill_insert: run the (replicated)
        draft model over the same padded prompts and insert its K/V strips
        into the per-slot draft cache. Dispatched on both the primary and
        (from the same _OP_PREFILL payload) every follower, so the jit
        contract holds. The Pallas strip writer cannot run under a GSPMD
        mesh — the XLA scatter path is used there (see _insert_body)."""
        self.dcache = _draft_prefill_insert(
            self.dparams, self.dcfg, jnp.asarray(tokens),
            jnp.asarray(true_lens), jnp.asarray(slots_arr), self.dcache,
            use_kernel=False if self.use_mesh else None)

    def _emit(self, slot: _Slot, token: int):
        req = slot.request
        if req.first_token_at is None:
            req.first_token_at = time.time()
            self.metrics["ttft_ms"].append(
                (req.first_token_at - req.submitted_at) * 1000.0)
            del self.metrics["ttft_ms"][:-256]
        slot.generated += 1
        req.tokens_out += 1
        if slot.hist is not None and slot.hist_len < len(slot.hist):
            slot.hist[slot.hist_len] = token
            slot.hist_len += 1
        self.metrics["tokens_generated"] += 1
        text = self.tokenizer.decode_token(token)
        req.queue.put(text)
        if (req.cancelled
                or (req.stop_at_eos and token == EOS_ID)
                or slot.generated >= req.steps
                or slot.pos >= self.max_len):
            self._finish(slot)

    def _finish(self, slot: _Slot):
        slot.request.queue.put(None)  # end-of-stream sentinel
        slot.request = None
        slot.prefilling = False
        if self.paged:
            i = self.slots.index(slot)
            self._alloc(i).release(i)
            self.page_tables[i, :] = self.trash_page
        self.metrics["requests_completed"] += 1

    def _loop(self):
        # The reference unwrap()s everywhere (SURVEY §5 "failure detection:
        # none"); here a device-loop error fails the in-flight requests,
        # rebuilds the (donated, possibly poisoned) cache, and keeps serving.
        while not self._stop.is_set():
            try:
                self._loop_once()
            except Exception:  # noqa: BLE001 — engine thread must survive
                import traceback

                traceback.print_exc()
                self.metrics["engine_errors"] += 1
                self._inflight_q.clear()  # their buffers may be poisoned
                self._spec_inflight_q.clear()
                self._admit_jobs.clear()  # slots finish via the loop below
                self._last_spec = None
                self._pf_job = None
                self._pf_pending = []
                for s in self.slots:
                    if not s.free:
                        s.prefilling = False
                        s.request.error = "engine error during decode"
                        self._finish(s)
                if self.multihost:
                    from rama_tpu.parallel.distributed import broadcast_step

                    broadcast_step([np.asarray([_OP_RESET, 0, 0, 0], np.int64)])
                self._reset_cache()
        # graceful stop: drain the in-flight tick so its tokens reach the
        # streams instead of vanishing with the thread
        while self._inflight_q:
            try:
                self._process_inflight(self._inflight_q.popleft())
            except Exception:  # noqa: BLE001
                self._inflight_q.clear()
        while self._spec_inflight_q:
            try:
                self._process_spec_inflight(self._spec_inflight_q.popleft())
            except Exception:  # noqa: BLE001
                self._spec_inflight_q.clear()
        try:  # async-admitted firsts reach their streams too
            self._complete_admit_jobs()
        except Exception:  # noqa: BLE001
            self._admit_jobs.clear()

    def _reset_cache(self):
        if self.paged:
            ps = self.ecfg.kv_page_size
            self.cache = self._create_paged_cache(
                self.dp * (self.trash_page + 1), ps)
            if self.use_mesh:
                from rama_tpu.parallel.tp import shard_paged_cache

                self.cache = shard_paged_cache(self.cache, self.mesh)
            self.page_tables[:] = self.trash_page
            from rama_tpu.native import PageAllocator

            self.allocators = [
                PageAllocator(self.trash_page, ps, len(self.slots))
                for _ in range(self.dp)]
        else:
            self.cache = self._create_slot_cache(len(self.slots))
            if self.use_mesh:
                self.cache = self._shard_slot_cache(self.cache)
        if self.draft_mode:
            self.dcache = KVCache.create(self.dcfg, batch=len(self.slots),
                                         max_len=self.max_len)
            if self.use_mesh:
                from rama_tpu.parallel.distributed import make_global
                from rama_tpu.parallel.tp import draft_cache_spec

                self.dcache = jax.tree_util.tree_map(
                    lambda x, s: make_global(x, self.mesh, s),
                    self.dcache, draft_cache_spec())

    def _loop_once(self):
        # Pipelined decode: while tick k's results are still on the device,
        # ticks k+1..k+D are dispatched from the device-resident output
        # tokens (the sampled feedback never leaves the device), THEN k's
        # tokens are fetched and emitted — so the per-dispatch host
        # round-trip (fetch + emit + dispatch, ~25 ms fixed over a
        # remote-TPU tunnel) overlaps device compute instead of serializing
        # with it. Depth > 1 matters when one dispatch's device time is
        # comparable to the round-trip (short ticks, small batches): with a
        # single tick in flight the device starves for the dispatch gap
        # whenever device_time < RTT. The chain breaks whenever host state
        # must influence the next tick (a queued admission, engine stop).
        if self._inflight_q or self._spec_inflight_q:
            # Async-firsts admission (VERDICT r4 next #2): dispatch queued
            # admissions' prefill NOW — the device executes it after the
            # in-flight ticks, so prefill device time overlaps the pipeline
            # drain instead of following it. The first tokens stay on device
            # (self._admit_jobs) until the drain completes; chaining is
            # blocked meanwhile (_chain_ok) so no stale tick lands after
            # the insert.
            if (self.admission.qsize() > 0 and not self._admit_jobs
                    and not self._stop.is_set()):
                with self.phases.phase("admit"):
                    self._admit_dispatch()
            # Chunked-prefill overlap: one chunk dispatch rides along with
            # the chained ticks each iteration (the chunk touches only the
            # job's scratch cache — no dependency on the decode stream).
            # The FINAL chunk is held back: its finisher inserts into the
            # main cache and must not be followed by stale chained ticks,
            # so it waits for the drain (_chain_ok breaks the chain once
            # the job is one chunk from done).
            if (self._pf_job is not None
                    and not self._pf_final_chunk_pending()):
                with self.phases.phase("pf_chunk"):
                    self._pf_step()
        if self._inflight_q:
            while (len(self._inflight_q) < _PIPELINE_DEPTH
                   and self._chain_ok()):
                nxt = self._dispatch_chained(self._inflight_q[-1])
                if nxt is None:
                    break
                self._inflight_q.append(nxt)
            self._process_inflight(self._inflight_q.popleft())
            if self._inflight_q:
                return
        if self._spec_inflight_q:
            while (len(self._spec_inflight_q) < _PIPELINE_DEPTH
                   and self._spec_chain_ok()):
                nxt = self._dispatch_spec_chained(self._spec_inflight_q[-1])
                if nxt is None:
                    break
                self._spec_inflight_q.append(nxt)
            self._process_spec_inflight(self._spec_inflight_q.popleft())
            if self._spec_inflight_q:
                return
        with self.phases.phase("admit"):
            self._admit()
        if self._pf_job is not None:
            # one chunk of the background prefill job per loop iteration:
            # active streams stall one chunk forward, not a whole prompt
            with self.phases.phase("pf_chunk"):
                self._pf_step()
        active = [s for s in self.slots if not s.free and not s.prefilling]
        if not active:
            if self._pf_job is None:
                self._wake.wait(timeout=0.05)
                self._wake.clear()
            return

        b = len(self.slots)
        tokens = np.zeros(b, np.int32)
        pos = np.zeros(b, np.int32)
        temps = np.zeros(b, np.float32)
        tps = np.full(b, 0.9, np.float32)
        for i, s in enumerate(self.slots):
            if s.free or s.prefilling:
                continue
            tokens[i] = s.last_token
            pos[i] = s.pos
            temps[i] = s.request.temperature
            tps[i] = s.request.top_p
        # Speculative dispatch: m on-device draft->verify rounds per host
        # round-trip (_spec_scan_tick). m shrinks (powers of two) near token
        # budgets and the cache end; m=0 falls back to the plain scan tick
        # (also taken while adaptive speculation is dormant — see
        # _process_spec_inflight's accept-rate evaluation).
        k = self.spec
        m = self.spec_rounds if (self.spec and not self._spec_dormant) else 0
        if m:
            # each round advances a slot's position by at most k+1; every
            # chunk position must stay < max_len
            worst = max(s.pos for s in active)
            while m and worst + m * (k + 1) > self.max_len:
                m //= 2
            # each round emits at least 1 token; don't scan far past the
            # tightest remaining budget (same rule as the plain-tick shrink)
            remaining = min(s.request.steps - s.generated for s in active)
            while m > 1 and m // 2 >= remaining:
                m //= 2
        if m:
            self._reserve_tick_pages(pos, m * (k + 1), finish_on_fail=True)
            if self.draft_mode:
                self._maybe_draft_resync()
            hist = self._hist_matrix()
            self._broadcast_spec(tokens, pos, temps, tps, hist, m)
            with self.phases.phase("dispatch"):
                samples, accepts = self._dev_spec_scan(
                    tokens, pos, temps, tps, self.slot_keys, hist, k, m)
            self._spec_inflight_q.append(
                {"samples": samples, "accepts": accepts, "pos": pos,
                 "m": m, "k": k, "temps": temps, "tps": tps,
                 "carry": self._last_spec, "gen_ahead": m * (k + 1),
                 "reqs": [None if s.prefilling else s.request
                          for s in self.slots]})
            return
        # Shrink the tick so no slot overshoots its remaining token budget by
        # much: one dispatch still yields up to decode_tick tokens, but a tick
        # that would be >50% speculative waste drops to the tightest need.
        # (Each distinct n compiles once; n is clamped to powers of two to
        # bound the compile count.)
        n = self.ecfg.decode_tick
        remaining = min(s.request.steps - s.generated for s in active)
        while n > 1 and n // 2 >= remaining:
            n //= 2
        self._reserve_tick_pages(pos, n, finish_on_fail=True)
        self._broadcast_tick(n, tokens, pos, temps, tps, chained=False)
        with self.phases.phase("dispatch"):
            out = self._dev_tick_async(tokens, pos, temps, tps,
                                       self.slot_keys, n)
        self._inflight_q.append(
            {"out": out, "n": n, "pos": pos, "temps": temps, "tps": tps,
             "gen_ahead": n,
             "reqs": [None if s.prefilling else s.request
                      for s in self.slots]})

    def _chain_ok(self) -> bool:
        """Dispatch tick k+1 from tick k's device-resident tokens?

        Only when no host-side state change is pending: the admission queue
        is empty and no async-admitted prefill is unfetched (a chained tick
        dispatched after the prefill-insert would stomp the new slot's KV
        rows), speculation is off (spec mode pipelines through
        _dispatch_spec_chained instead), any chunked-prefill job is not on
        its final chunk (the finisher inserts into the main cache — same
        stomping hazard; NON-final chunks ride along, dispatched from the
        overlap path in _loop_once), and the engine is not stopping."""
        return ((not self.spec or self._spec_dormant > 0)
                and self.admission.qsize() == 0
                and not self._admit_jobs
                and not self._pf_final_chunk_pending()
                and not self._stop.is_set())

    def _pf_final_chunk_pending(self) -> bool:
        """True when the active chunked-prefill job's NEXT chunk dispatch
        completes its coverage (so _pf_step would run the finisher)."""
        job = self._pf_job
        return (job is not None
                and job["off"] + self.pf_chunk >= int(job["true_lens"].max()))

    def _dispatch_chained(self, inf):
        """Dispatch the successor of in-flight tick `inf` (the NEWEST
        dispatched) before fetching results. Tokens come straight from the
        in-flight tick's device output (out[-1]); positions/temps are host
        bookkeeping, unchanged since no admission happened. Slots that
        finish inside an in-flight tick waste their chained rows (discarded
        at emit, KV writes land above any attended position) — the standard
        speculative-overshoot trade."""
        b = len(self.slots)
        pos = np.zeros(b, np.int32)
        act = []
        for i, s in enumerate(self.slots):
            if not s.free and s.request is inf["reqs"][i]:
                pos[i] = inf["pos"][i] + inf["n"]
                act.append(s)
        if not act:
            return None
        # assume every in-flight tick emits fully; if that exhausts every
        # budget there is nothing worth chaining (gen_ahead accumulates the
        # whole unfetched pipeline, not just the immediate predecessor)
        remaining = min(s.request.steps - (s.generated + inf["gen_ahead"])
                        for s in act)
        if remaining <= 0:
            return None
        n = self.ecfg.decode_tick
        while n > 1 and n // 2 >= remaining:
            n //= 2
        if not self._reserve_tick_pages(pos, n, finish_on_fail=False):
            return None
        self._broadcast_tick(n, None, pos, inf["temps"], inf["tps"],
                             chained=True)
        with self.phases.phase("dispatch"):
            out = self._dev_tick_async(inf["out"][-1], pos, inf["temps"],
                                       inf["tps"], self.slot_keys, n)
        return {"out": out, "n": n, "pos": pos, "temps": inf["temps"],
                "tps": inf["tps"], "reqs": inf["reqs"],
                "gen_ahead": inf["gen_ahead"] + n}

    def _spec_chain_ok(self) -> bool:
        """Dispatch spec tick k+1 from tick k's device carries? Same host-
        state conditions as _chain_ok, minus the speculation exclusion: with
        the scan tick's (tokens, pos, hist) carries device-resident, a
        successor needs nothing from the host fetch."""
        return (self.spec and self.admission.qsize() == 0
                and not self._admit_jobs
                and not self._pf_final_chunk_pending()
                and not self._stop.is_set())

    def _dispatch_spec_chained(self, inf):
        """Dispatch the successor of in-flight spec scan `inf` (the NEWEST
        dispatched) before fetching results. Tokens/positions/history come
        from the in-flight tick's device carries; the host only knows the
        worst-case positions (every round fully accepted), so the m-shrink
        and page reservation use those — conservative, never unsafe. Slots
        that finish inside an in-flight tick waste their chained rows
        (discarded at emit)."""
        if inf["carry"] is None:
            return None
        k = inf["k"]
        b = len(self.slots)
        act = [(i, s) for i, s in enumerate(self.slots)
               if not s.free and s.request is inf["reqs"][i]]
        if not act:
            return None
        # worst-case position after the in-flight tick
        pos_wc = np.zeros(b, np.int32)
        for i, _ in act:
            pos_wc[i] = inf["pos"][i] + inf["m"] * (k + 1)
        m = self.spec_rounds
        worst = max(pos_wc[i] for i, _ in act)
        while m and worst + m * (k + 1) > self.max_len:
            m //= 2
        if not m:
            return None
        # assume the in-flight tick emitted fully; if that exhausts every
        # budget there is nothing worth chaining
        remaining = min(s.request.steps - (s.generated + inf["gen_ahead"])
                        for _, s in act)
        if remaining <= 0:
            return None
        while m > 1 and m // 2 >= remaining:
            m //= 2
        if not self._reserve_tick_pages(pos_wc, m * (k + 1),
                                        finish_on_fail=False):
            return None
        toks_d, pos_d, hist_d = inf["carry"]
        self._broadcast_spec(None, None, inf["temps"], inf["tps"], None, m,
                             chained=True)
        with self.phases.phase("dispatch"):
            samples, accepts = self._dev_spec_scan(
                toks_d, pos_d, inf["temps"], inf["tps"], self.slot_keys,
                hist_d, k, m)
        return {"samples": samples, "accepts": accepts, "pos": pos_wc,
                "m": m, "k": k, "temps": inf["temps"], "tps": inf["tps"],
                "carry": self._last_spec, "reqs": inf["reqs"],
                "gen_ahead": inf["gen_ahead"] + m * (k + 1)}

    def _process_spec_inflight(self, inf):
        """Fetch in-flight spec scan `inf`'s samples/accepts (blocks until
        the device finishes) and emit them. Slots whose request changed
        since dispatch discard their rows."""
        k = inf["k"]
        t0 = time.time()
        with self.phases.phase("fetch"):
            samples = np.asarray(inf["samples"])            # (m, k+1, B)
            accepts = np.asarray(inf["accepts"])            # (m, B)
        self.metrics["decode_ticks"] += 1
        self.metrics["decode_s"] += time.time() - t0
        with self.phases.phase("emit"):
            for r in range(inf["m"]):
                drafted = accepted = 0
                for i, s in enumerate(self.slots):
                    if s.free or s.request is not inf["reqs"][i]:
                        continue
                    self.metrics["spec_drafted"] += k
                    a = int(accepts[r, i])
                    self.metrics["spec_accepted"] += a
                    drafted += k
                    accepted += a
                    for j in range(a + 1):
                        s.pos += 1
                        s.last_token = int(samples[r, j, i])
                        self.metrics["tick_tokens"] += 1
                        self._emit(s, s.last_token)
                        if s.free:  # finished mid-chunk; drop the rest
                            break
                if drafted:
                    self._spec_window.append(accepted / drafted)
        if self.draft_mode:
            # the scan's draft steps rewrote rows through each accepted
            # position; record the sync point for dormant-stretch resyncs
            for i, s in enumerate(self.slots):
                if not s.free and s.request is inf["reqs"][i]:
                    s.draft_pos = s.pos
        # adaptive speculation: a spec round costs ~1.15x a plain step and
        # emits 1 + frac*k tokens vs the step's 1 — below spec_min_accept,
        # plain chained ticks serve faster, so go dormant and re-probe later.
        # Draft mode: plain (dormant) ticks bypass the draft model, so its
        # cache goes stale over the dormant stretch; _maybe_draft_resync
        # replays the emitted gap through the draft model before the next
        # probe (the hist matrix holds every input by position), so dormancy
        # is safe here too — it bounds the accept~0 draft overhead (measured
        # 2.2x per token, int4_b1_draft256 row) at plain-tick speed.
        thr = self.ecfg.spec_min_accept
        if (thr > 0 and len(self._spec_window) >= _SPEC_PROBE_ROUNDS
                and sum(self._spec_window) / len(self._spec_window) < thr):
            self._spec_dormant = _SPEC_DORMANT_TICKS
            self._spec_window.clear()

    def _process_inflight(self, inf):
        """Fetch in-flight tick `inf`'s tokens (blocks until the device
        finishes) and emit them. Slots whose request changed since dispatch
        discard their rows."""
        t0 = time.time()
        with self.phases.phase("fetch"):
            nxt = np.asarray(inf["out"])                       # (n, B)
        self.metrics["decode_ticks"] += 1
        self.metrics["decode_s"] += time.time() - t0
        if self._spec_dormant > 0:
            self._spec_dormant -= 1  # count down to the next spec probe
        with self.phases.phase("emit"):
            for i, s in enumerate(self.slots):
                if s.free or s.request is not inf["reqs"][i]:
                    continue
                for j in range(nxt.shape[0]):
                    s.pos += 1
                    s.last_token = int(nxt[j, i])
                    self.metrics["tick_tokens"] += 1
                    self._emit(s, s.last_token)
                    if s.free:  # finished mid-tick; drop speculative tokens
                        break

    def _reserve_tick_pages(self, pos, n: int, finish_on_fail: bool) -> bool:
        """Grow page tables to cover all n positions a tick writes. Returns
        False if any active slot cannot be grown; with finish_on_fail that
        slot's request is failed (the fresh-dispatch path), otherwise the
        caller declines to chain and the failure is handled next loop."""
        if not self.paged:
            return True
        ok = True
        for i, s in enumerate(self.slots):
            if s.free:
                continue
            if self._alloc(i).reserve(
                    i, min(int(pos[i]) + n, self.max_len)) < 0:
                ok = False
                if finish_on_fail:
                    s.request.error = "out of KV cache pages"
                    self._finish(s)
                continue
            table = self._alloc(i).table(i)
            self.page_tables[i, : len(table)] = table
        return ok

    def _broadcast_tick(self, n: int, tokens, pos, temps, tps, chained: bool):
        if not self.multihost:
            return
        from rama_tpu.parallel.distributed import broadcast_step

        broadcast_step([np.asarray([_OP_TICK, n, int(chained), 0], np.int64)])
        payload = ([] if chained else [tokens]) + [pos, temps, tps,
                                                   self.slot_keys.copy()]
        if self.paged:
            payload.append(self.page_tables.copy())
        broadcast_step(payload)

    def _hist_matrix(self) -> np.ndarray:
        """(B, cap) int32 token-history matrix, row i = slot i's prompt +
        emitted inputs by position (zeros for free slots) — the on-device
        n-gram drafter's source. Built from host bookkeeping at each spec
        dispatch: B * cap int32s, a negligible async upload next to the
        chunk forward it feeds."""
        return np.stack([
            s.hist if s.hist is not None and not s.free
            else np.zeros(self._hist_cap, np.int32)
            for s in self.slots])

    def _broadcast_spec(self, tokens, pos, temps, tps, hist, m: int,
                        chained: bool = False):
        """chained=True omits tokens/pos/hist from the payload — followers
        use their own device copies of the previous spec tick's carries
        (identical on every host, retained by _dev_spec_scan)."""
        if not self.multihost:
            return
        from rama_tpu.parallel.distributed import broadcast_step

        broadcast_step([np.asarray([_OP_SPEC, self.spec, m, int(chained)],
                                   np.int64)])
        payload = ([temps, tps, self.slot_keys.copy()] if chained else
                   [tokens, pos, temps, tps, self.slot_keys.copy(), hist])
        if self.paged:
            payload.append(self.page_tables.copy())
        broadcast_step(payload)

    def _dev_spec_scan(self, tokens, pos, temps, tps, slot_keys, hist,
                       k: int, m: int):
        """The device-side speculative scan (m draft->verify rounds),
        executed identically on every host. Returns DEVICE arrays
        (samples (m, k+1, B), accepts (m, B)) without blocking; the final
        (tokens, pos, hist) carries are retained in self._last_spec so a
        chained successor spec tick (this host or a follower) dispatches
        from them without fetching. `tokens`/`pos`/`hist` may be host
        arrays or the previous tick's device carries."""
        keys = jnp.asarray(slot_keys, jnp.uint32)
        jh = jnp.asarray(hist)
        if self.draft_mode:
            if self.use_mesh and self.paged:
                (samples, accepts, toks, posn, self.cache, self.dcache,
                 jh) = self._tp_paged_spec(
                    self.params, self.dparams, jnp.asarray(tokens),
                    jnp.asarray(pos), jnp.asarray(temps), jnp.asarray(tps),
                    keys, self.cache, jnp.asarray(self.page_tables),
                    self.dcache, jh, m=m)
            elif self.use_mesh:
                (samples, accepts, toks, posn, self.cache, self.dcache,
                 jh) = self._tp_spec(
                    self.params, self.dparams, jnp.asarray(tokens),
                    jnp.asarray(pos), jnp.asarray(temps), jnp.asarray(tps),
                    keys, self.cache, self.dcache, jh, m=m)
            elif self.paged:
                (samples, accepts, toks, posn, self.cache, self.dcache,
                 jh) = _spec_scan_tick_paged_draft(
                    self.params, self.dparams, self.cfg, self.dcfg,
                    jnp.asarray(tokens), jnp.asarray(pos),
                    jnp.asarray(temps), jnp.asarray(tps), keys, self.cache,
                    jnp.asarray(self.page_tables), self.dcache, jh, k, m)
            else:
                (samples, accepts, toks, posn, self.cache, self.dcache,
                 jh) = _spec_scan_tick_draft(
                    self.params, self.dparams, self.cfg, self.dcfg,
                    jnp.asarray(tokens), jnp.asarray(pos),
                    jnp.asarray(temps), jnp.asarray(tps), keys, self.cache,
                    self.dcache, jh, k, m)
        elif self.use_mesh and self.paged:
            samples, accepts, toks, posn, self.cache, jh = self._tp_paged_spec(
                self.params, jnp.asarray(tokens), jnp.asarray(pos),
                jnp.asarray(temps), jnp.asarray(tps), keys, self.cache,
                jnp.asarray(self.page_tables), jh, m=m)
        elif self.use_mesh:
            samples, accepts, toks, posn, self.cache, jh = self._tp_spec(
                self.params, jnp.asarray(tokens), jnp.asarray(pos),
                jnp.asarray(temps), jnp.asarray(tps), keys, self.cache,
                jh, m=m)
        elif self.paged:
            samples, accepts, toks, posn, self.cache, jh = _spec_scan_tick_paged(
                self.params, self.cfg, jnp.asarray(tokens), jnp.asarray(pos),
                jnp.asarray(temps), jnp.asarray(tps), keys, self.cache,
                jnp.asarray(self.page_tables), jh, k, m)
        else:
            samples, accepts, toks, posn, self.cache, jh = _spec_scan_tick(
                self.params, self.cfg, jnp.asarray(tokens), jnp.asarray(pos),
                jnp.asarray(temps), jnp.asarray(tps), keys, self.cache,
                jh, k, m)
        self._last_spec = (toks, posn, jh)
        return samples, accepts

    def _dev_tick(self, tokens, pos, temps, tps, slot_keys, n: int) -> np.ndarray:
        """Blocking decode tick (fetches the sampled tokens)."""
        return np.asarray(self._dev_tick_async(tokens, pos, temps, tps,
                                               slot_keys, n))

    def _dev_tick_async(self, tokens, pos, temps, tps, slot_keys, n: int):
        """The device-side decode tick, executed identically on every host
        (the follower replays it from the broadcast payload). Returns the
        DEVICE (n, B) token array without blocking; the last row feeds a
        chained successor tick without a host round-trip (kept in
        self._last_out so followers can chain from their own device copy).
        `tokens` may be a host array or a device slice of a previous out."""
        cfg = self.cfg
        keys = jnp.asarray(slot_keys, jnp.uint32)
        if self.paged:
            if self.use_mesh:
                nxt, self.cache = self._tp_paged_tick(
                    self.params, jnp.asarray(tokens), jnp.asarray(pos),
                    jnp.asarray(temps), jnp.asarray(tps), keys, self.cache,
                    jnp.asarray(self.page_tables), n=n)
            else:
                nxt, self.cache = _decode_tick_paged(
                    self.params, cfg, jnp.asarray(tokens), jnp.asarray(pos),
                    jnp.asarray(temps), jnp.asarray(tps), keys, self.cache,
                    jnp.asarray(self.page_tables), n)
        elif self.use_mesh:
            nxt, self.cache = self._tp_tick(
                self.params, jnp.asarray(tokens), jnp.asarray(pos),
                jnp.asarray(temps), jnp.asarray(tps), keys, self.cache, n=n)
        else:
            nxt, self.cache = _decode_tick(
                self.params, cfg, jnp.asarray(tokens), jnp.asarray(pos),
                jnp.asarray(temps), jnp.asarray(tps), keys, self.cache, n)
        self._last_out = nxt
        return nxt

    # -- observability ------------------------------------------------------

    def stats(self) -> dict:
        m = self.metrics
        ttfts = sorted(m["ttft_ms"])
        act = sum(1 for s in self.slots if not s.free)
        return {
            "tokens_generated": m["tokens_generated"],
            "requests_completed": m["requests_completed"],
            "engine_errors": m["engine_errors"],
            "active_slots": act,
            "max_slots": len(self.slots),
            "queue_depth": self.admission.qsize(),
            "decode_ticks": m["decode_ticks"],
            # tick-emitted tokens over tick device time only: excluding
            # prefill-sampled first tokens keeps this honest at high
            # admission rates (VERDICT r3 weak #6)
            "decode_tok_per_s": (m["tick_tokens"] / m["decode_s"]
                                 if m["decode_s"] else 0.0),
            "spec_accept_rate": (m["spec_accepted"] / m["spec_drafted"]
                                 if m["spec_drafted"] else None),
            "spec_dormant_ticks": self._spec_dormant if self.spec else None,
            "ttft_p50_ms": ttfts[len(ttfts) // 2] if ttfts else None,
            "ttft_p95_ms": ttfts[int(len(ttfts) * 0.95)] if ttfts else None,
            "phases": self.phases.stats(),
        }
