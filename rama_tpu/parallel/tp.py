"""Tensor + data parallelism via shard_map over the ("data", "model") mesh.

The Megatron-style layout for the Llama block, applied to dense *and*
group-quantized weights (int8/int4 values and their scales shard together):

    wq/wk/wv/w1/w3 : column-sharded  (L, K, N/tp)   -> no collective
    wo/w2          : row-sharded     (L, K/tp, N)   -> psum after (in _layer)
    wcls           : vocab-sharded   (D, V/tp)      -> all_gather logits
    KV cache       : (L, B/dp, S, n_kv/tp, hd)      -> heads follow wk/wv
    norms, rope, embedding : replicated

Activations stay replicated across `model` (x is full-dim on every chip);
batch shards across `data`. The only per-layer collectives are the two psums,
riding ICI inside the compiled step — the scaling-book recipe, explicit here
because the Pallas dequant kernels are opaque to GSPMD (shard_map hands them
the local shard shapes directly).

Constraints: tp must divide n_heads, n_kv_heads, hidden_dim and vocab_size;
dp must divide the engine batch. (7B: 32 heads / v5e-8 tp=8 -> 4 heads/chip.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from rama_tpu.config import ModelConfig
from rama_tpu.models.llama import KVCache, forward
from rama_tpu.ops.quant import QuantizedEmbedding, QuantizedTensor
from rama_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from rama_tpu.runtime.sampler import (fold_in_pos, sample_batched,
                                      sample_batched_keyed)

# column-sharded: output dim over the model axis (fused weights are laid out
# per-shard by _concat_weights, so contiguous column shards stay correct)
_COL = ("wq", "wk", "wv", "w1", "w3", "wqkv", "w13")
# row-sharded: input dim over the model axis (psum restores the sum)
_ROW = ("wo", "w2")


def _spec_for(name: str, leaf) -> P:
    if name in _COL:
        return P(None, None, MODEL_AXIS)
    if name in _ROW:
        return P(None, MODEL_AXIS, None)
    if name == "wcls":
        return P(None, MODEL_AXIS)
    # norms, rope tables, embedding: replicated
    return P(*([None] * leaf.ndim))


def param_specs(params) -> dict:
    """PartitionSpec pytree matching the params pytree (incl. quant leaves)."""
    specs = {}
    for name, p in params.items():
        if isinstance(p, QuantizedTensor):
            specs[name] = QuantizedTensor(
                q=_spec_for(name, p.q), scales=_spec_for(name, p.scales),
                group_size=p.group_size, bits=p.bits, il=p.il)
        elif isinstance(p, QuantizedEmbedding):
            specs[name] = QuantizedEmbedding(
                q=P(None, None), scales=P(None, None), group_size=p.group_size)
        else:
            specs[name] = _spec_for(name, p)
    return specs


def cache_spec() -> KVCache:
    # (L, B, n_kv, S, hd): batch over data, KV heads over model
    s = P(None, DATA_AXIS, MODEL_AXIS, None, None)
    return KVCache(k=s, v=s)


def draft_cache_spec() -> KVCache:
    """Draft-model per-slot cache (L, B, n_kv, S, hd): batch over `data`,
    everything else REPLICATED. The draft model's weights are replicated on
    every chip (tiny next to the target — sharding them would trade a psum
    per draft step for negligible savings), so its decode runs without
    collectives inside the outer jit under GSPMD; only the batch follows the
    slot sharding."""
    s = P(None, DATA_AXIS, None, None, None)
    return KVCache(k=s, v=s)


def quant_cache_spec():
    """Spec pytree for the INT8 KV cache: the per-row scales (L, B, n_kv, S)
    shard with the same (data, model) axes as their int8 rows, so attention's
    post-matmul dequant is shard-local (no collective touches the scales)."""
    from rama_tpu.models.llama import QuantKVCache

    s = P(None, DATA_AXIS, MODEL_AXIS, None, None)
    sc = P(None, DATA_AXIS, MODEL_AXIS, None)
    return QuantKVCache(k=s, v=s, ks=sc, vs=sc)


def _cache_spec_for(cache_or_flag):
    """Accepts a cache instance or a kv_quant bool."""
    from rama_tpu.models.llama import QuantKVCache

    quant = (isinstance(cache_or_flag, QuantKVCache)
             if not isinstance(cache_or_flag, bool) else cache_or_flag)
    return quant_cache_spec() if quant else cache_spec()


def validate_tp(cfg: ModelConfig, tp: int) -> None:
    """Enforce the docstring's divisibility constraints up front: a tp that
    does not divide these dims would otherwise silently drop columns (in
    _concat_weights) or fail deep inside shard_map with a shape error."""
    for label, n in (("n_heads", cfg.n_heads), ("n_kv_heads", cfg.n_kv_heads),
                     ("hidden_dim", cfg.hidden_dim), ("vocab_size", cfg.vocab_size),
                     ("dim", cfg.dim)):
        if n % tp != 0:
            raise ValueError(f"tp_size {tp} does not divide {label}={n}")


def shard_params(params, mesh: Mesh):
    """device_put the params pytree with the TP layout.

    Row-sharded quantized weights need their scale rows to split evenly at
    shard boundaries. INT8 tensors are exactly regrouped to a finer group
    size when needed (split_groups — bit-identical); INT4 packing blocks are
    chosen at quantize time to align for tp <= 8 (pick_int4_group_size).
    """
    import math

    from rama_tpu.ops.quant import split_groups

    tp = mesh.shape[MODEL_AXIS]
    params = dict(params)
    for name in _ROW:
        p = params.get(name)
        if isinstance(p, QuantizedTensor) and tp > 1:
            k_local = p.k_dim // tp
            if p.k_dim % tp:
                raise ValueError(f"{name}: K={p.k_dim} not divisible by tp={tp}")
            if k_local % p.group_size:
                if p.bits == 4:
                    raise ValueError(
                        f"{name}: int4 packing blocks (2*{p.group_size}) do not "
                        f"align with tp={tp} shards of K={p.k_dim}")
                params[name] = split_groups(p, math.gcd(p.group_size, k_local))
            elif p.bits == 4 and k_local % (2 * p.group_size):
                raise ValueError(
                    f"{name}: int4 shard K={k_local} not a multiple of the "
                    f"2*gs={2 * p.group_size} packing block")
    from rama_tpu.parallel.distributed import make_global

    specs = param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: make_global(x, mesh, s), params, specs)


def shard_cache(cache, mesh: Mesh):
    """device_put a (dense or int8-quantized) slot cache with the TP layout."""
    from rama_tpu.parallel.distributed import make_global

    spec = _cache_spec_for(cache)
    return jax.tree_util.tree_map(
        lambda x, s: make_global(x, mesh, s), cache, spec)


def make_decode_step(cfg: ModelConfig, mesh: Mesh, params_example,
                     kv_quant: bool = False):
    """Build the jitted TP+DP batched decode step (with in-graph sampling).

    Returns step(params, tokens (B,), pos (B,), temps, top_ps, key, cache)
    -> (next_tokens (B,), full logits (B, V), cache).
    """
    pspecs = param_specs(params_example)
    cspec = _cache_spec_for(kv_quant)

    def inner(params, tokens, pos, cache):
        logits, cache = forward(params, cfg, tokens[:, None], pos[:, None],
                                cache, tp_axis=MODEL_AXIS)
        return logits[:, 0], cache

    mapped = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(pspecs, P(DATA_AXIS), P(DATA_AXIS), cspec),
        out_specs=(P(DATA_AXIS, None), cspec),
        check_vma=False)

    @partial(jax.jit, donate_argnames=("cache",))
    def step(params, tokens, pos, temps, top_ps, key, cache):
        logits, cache = mapped(params, tokens, pos, cache)
        nxt = sample_batched(logits, key, temps, top_ps)
        return nxt, logits, cache

    return step


def make_decode_tick(cfg: ModelConfig, mesh: Mesh, params_example,
                     kv_quant: bool = False):
    """Build the jitted TP+DP multi-token tick: n sampled decode steps in one
    dispatch (an on-device scan whose body is the shard_mapped step), so the
    serving loop pays one host round-trip per n tokens.

    Returns tick(params, tokens (B,), pos (B,), temps, top_ps,
    slot_keys (B, 2), cache, n=) -> (tokens (n, B), cache). `n` is static
    per jit cache entry — the host loop shrinks it near slot budgets, so
    TP tail ticks no longer waste full weight streams (each distinct n
    compiles once; the engine clamps n to powers of two)."""
    pspecs = param_specs(params_example)
    cspec = _cache_spec_for(kv_quant)

    def inner(params, tokens, pos, cache):
        logits, cache = forward(params, cfg, tokens[:, None], pos[:, None],
                                cache, tp_axis=MODEL_AXIS)
        return logits[:, 0], cache

    mapped = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(pspecs, P(DATA_AXIS), P(DATA_AXIS), cspec),
        out_specs=(P(DATA_AXIS, None), cspec),
        check_vma=False)

    @partial(jax.jit, static_argnames=("n",), donate_argnames=("cache",))
    def tick(params, tokens, pos, temps, top_ps, slot_keys, cache, n=1):
        def body(carry, _):
            tokens, pos, cache = carry
            logits, cache = mapped(params, tokens, pos, cache)
            nxt = sample_batched_keyed(logits, fold_in_pos(slot_keys, pos),
                                       temps, top_ps)
            return (nxt, pos + 1, cache), nxt

        (_, _, cache), out = jax.lax.scan(body, (tokens, pos, cache), None,
                                          length=n)
        return out, cache

    return tick


def make_spec_scan_tick(cfg: ModelConfig, mesh: Mesh, params_example, k: int,
                        kv_quant: bool = False,
                        draft_cfg: ModelConfig | None = None):
    """TP+DP speculative scan tick: m on-device draft->verify->accept rounds
    per dispatch (the mesh counterpart of runtime.engine._spec_scan_tick).
    The chunk forward is shard_mapped (weights/KV heads over `model`, slots
    over `data`); drafting (vmapped n-gram over the history matrix),
    sampling, and acceptance run in the outer jit under GSPMD — per-slot
    elementwise work that shards trivially with the batch.

    Returns spec(params, tokens (B,), pos (B,), temps, top_ps,
    slot_keys (B, 2), cache, hist (B, cap), m=) ->
    (samples (m, k+1, B), accepts (m, B), tokens (B,), pos (B,), cache,
    hist) — final carries stay device-resident for chained spec ticks."""
    from rama_tpu.models.llama import forward_chunk
    from rama_tpu.runtime.engine import _spec_round

    pspecs = param_specs(params_example)
    cspec = _cache_spec_for(kv_quant)

    def inner(params, chunk, pos0, cache):
        return forward_chunk(params, cfg, chunk, pos0, cache,
                             tp_axis=MODEL_AXIS)

    mapped = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(pspecs, P(DATA_AXIS, None), P(DATA_AXIS), cspec),
        out_specs=(P(DATA_AXIS, None, None), cspec),
        check_vma=False)

    def fwd(params, _cfg, chunk, pos0, cache):
        return mapped(params, chunk, pos0, cache)

    if draft_cfg is not None:
        # Draft-model proposer: drafting runs in the OUTER jit under GSPMD
        # (replicated draft weights + data-sharded draft cache — no
        # collectives), only the target chunk-verify is shard_mapped.
        @partial(jax.jit, static_argnames=("m",),
                 donate_argnames=("cache", "dcache", "hist"))
        def spec_draft(params, dparams, tokens, pos, temps, top_ps,
                       slot_keys, cache, dcache, hist, m=1):
            def body(carry, _):
                return _spec_round(params, cfg, carry, temps, top_ps,
                                   slot_keys, k, fwd,
                                   draft=(dparams, draft_cfg))

            (tokens, pos, cache, hist, dcache), (samples, accepts) = \
                jax.lax.scan(body, (tokens, pos, cache, hist, dcache),
                             None, length=m)
            return samples, accepts, tokens, pos, cache, dcache, hist

        return spec_draft

    @partial(jax.jit, static_argnames=("m",),
             donate_argnames=("cache", "hist"))
    def spec(params, tokens, pos, temps, top_ps, slot_keys, cache, hist,
             m=1):
        def body(carry, _):
            return _spec_round(params, cfg, carry, temps, top_ps, slot_keys,
                               k, fwd)

        (tokens, pos, cache, hist), (samples, accepts) = jax.lax.scan(
            body, (tokens, pos, cache, hist), None, length=m)
        return samples, accepts, tokens, pos, cache, hist

    return spec


def paged_cache_spec(kv_quant: bool = False):
    """Page pool (L, P, n_kv, ps, hd): KV heads shard over `model`, pages
    shard over `data` — each data replica owns a private sub-pool and its
    page-table entries are LOCAL page indices into that sub-pool (the engine
    runs one allocator per replica). At dp=1 this degenerates to one shared
    pool, identical to the round-3 layout. Page tables shard with the slot
    batch over `data`. With an int8 pool the per-row scales (L, P, n_kv, ps)
    shard with their rows."""
    from rama_tpu.runtime.paged import PagedKVCache, QuantPagedKVCache

    s = P(None, DATA_AXIS, MODEL_AXIS, None, None)
    if kv_quant:
        sc = P(None, DATA_AXIS, MODEL_AXIS, None)
        return QuantPagedKVCache(k=s, v=s, ks=sc, vs=sc)
    return PagedKVCache(k=s, v=s)


def shard_paged_cache(cache, mesh: Mesh):
    from rama_tpu.parallel.distributed import make_global
    from rama_tpu.runtime.paged import QuantPagedKVCache

    spec = paged_cache_spec(isinstance(cache, QuantPagedKVCache))
    return jax.tree_util.tree_map(
        lambda x, s: make_global(x, mesh, s), cache, spec)


def make_paged_decode_tick(cfg: ModelConfig, mesh: Mesh, params_example,
                           kv_quant: bool = False):
    """TP multi-token tick against the paged pool: n sampled decode steps per
    dispatch, attention reading each chip's KV-head slice of the page pool in
    place (ragged paged kernel on TPU, gather view elsewhere).

    Returns tick(params, tokens (B,), pos (B,), temps, top_ps,
    slot_keys (B, 2), cache, page_tables (B, max_pages), n=)
    -> (tokens (n, B), cache). `n` is static per jit cache entry (see
    make_decode_tick)."""
    from rama_tpu.runtime.paged import forward_paged

    pspecs = param_specs(params_example)
    cspec = paged_cache_spec(kv_quant)

    def inner(params, tokens, pos, cache, tables):
        logits, cache = forward_paged(params, cfg, tokens[:, None],
                                      pos[:, None], cache, tables,
                                      tp_axis=MODEL_AXIS)
        return logits[:, 0], cache

    mapped = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(pspecs, P(DATA_AXIS), P(DATA_AXIS), cspec, P(DATA_AXIS, None)),
        out_specs=(P(DATA_AXIS, None), cspec),
        check_vma=False)

    @partial(jax.jit, static_argnames=("n",), donate_argnames=("cache",))
    def tick(params, tokens, pos, temps, top_ps, slot_keys, cache, tables,
             n=1):
        def body(carry, _):
            tokens, pos, cache = carry
            logits, cache = mapped(params, tokens, pos, cache, tables)
            nxt = sample_batched_keyed(logits, fold_in_pos(slot_keys, pos),
                                       temps, top_ps)
            return (nxt, pos + 1, cache), nxt

        (_, _, cache), out = jax.lax.scan(body, (tokens, pos, cache), None,
                                          length=n)
        return out, cache

    return tick


def make_paged_spec_scan_tick(cfg: ModelConfig, mesh: Mesh, params_example,
                              k: int, kv_quant: bool = False,
                              draft_cfg: ModelConfig | None = None):
    """make_spec_scan_tick against the page pool: every round's chunk
    verifies through the shard_mapped ragged paged chunk forward (pages over
    `data`, KV heads over `model` — the spec x paged x mesh cell).

    Returns spec(params, tokens (B,), pos (B,), temps, top_ps,
    slot_keys (B, 2), cache, page_tables (B, max_pages), hist (B, cap), m=)
    -> (samples (m, k+1, B), accepts (m, B), tokens (B,), pos (B,), cache,
    hist). Page tables must cover pos + m*(k+1) (reserved by the host loop
    before dispatch)."""
    from rama_tpu.runtime.engine import _spec_round

    pspecs = param_specs(params_example)
    cspec = paged_cache_spec(kv_quant)

    def inner(params, chunk, pos0, cache, tables):
        from rama_tpu.runtime.paged import forward_paged

        t = chunk.shape[1]
        pos_index = pos0[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
        return forward_paged(params, cfg, chunk, pos_index, cache, tables,
                             tp_axis=MODEL_AXIS)

    mapped = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(pspecs, P(DATA_AXIS, None), P(DATA_AXIS), cspec,
                  P(DATA_AXIS, None)),
        out_specs=(P(DATA_AXIS, None, None), cspec),
        check_vma=False)

    if draft_cfg is not None:
        @partial(jax.jit, static_argnames=("m",),
                 donate_argnames=("cache", "dcache", "hist"))
        def spec_draft(params, dparams, tokens, pos, temps, top_ps,
                       slot_keys, cache, tables, dcache, hist, m=1):
            def fwd(params, _cfg, chunk, pos0, cache):
                return mapped(params, chunk, pos0, cache, tables)

            def body(carry, _):
                return _spec_round(params, cfg, carry, temps, top_ps,
                                   slot_keys, k, fwd,
                                   draft=(dparams, draft_cfg))

            (tokens, pos, cache, hist, dcache), (samples, accepts) = \
                jax.lax.scan(body, (tokens, pos, cache, hist, dcache),
                             None, length=m)
            return samples, accepts, tokens, pos, cache, dcache, hist

        return spec_draft

    @partial(jax.jit, static_argnames=("m",),
             donate_argnames=("cache", "hist"))
    def spec(params, tokens, pos, temps, top_ps, slot_keys, cache, tables,
             hist, m=1):
        def fwd(params, _cfg, chunk, pos0, cache):
            return mapped(params, chunk, pos0, cache, tables)

        def body(carry, _):
            return _spec_round(params, cfg, carry, temps, top_ps, slot_keys,
                               k, fwd)

        (tokens, pos, cache, hist), (samples, accepts) = jax.lax.scan(
            body, (tokens, pos, cache, hist), None, length=m)
        return samples, accepts, tokens, pos, cache, hist

    return spec


def _mapped_prefill(cfg: ModelConfig, mesh: Mesh, pspecs):
    """shard_mapped (B, T) from-position-0 prefill into a dense bf16 scratch
    (batch over `data`, weights/KV heads over `model`)."""
    cspec = cache_spec()

    def inner(params, tokens, true_lens, cache):
        b, t = tokens.shape
        pos = jnp.arange(t)[None, :].repeat(b, 0)
        # classifier only at each row's last real query (logit_rows): the
        # full (k, T, V) fp32 logits OOM admission at large T buckets
        return forward(params, cfg, tokens, pos, cache, tp_axis=MODEL_AXIS,
                       plen=jnp.full((b,), t, jnp.int32),
                       logit_rows=true_lens - 1)

    return jax.shard_map(
        inner, mesh=mesh,
        in_specs=(pspecs, P(DATA_AXIS, None), P(DATA_AXIS), cspec),
        out_specs=(P(DATA_AXIS, None, None), cspec),
        check_vma=False)


def _prefill_firsts(mapped, cfg, params, tokens, true_lens, temps, top_ps,
                    slot_keys):
    """Run the shard_mapped prefill over an in-jit scratch and sample each
    row's first token at its true last position (same contract as
    runtime.engine._prefill_body: padded positions write the last scratch
    row, keys fold in the position)."""
    k_pad, t_pad = tokens.shape
    scratch = KVCache.create(cfg, batch=k_pad, max_len=t_pad)
    last, scratch = mapped(params, tokens, true_lens, scratch)   # (k, 1, V)
    firsts = sample_batched_keyed(last[:, 0],
                                  fold_in_pos(slot_keys, true_lens - 1),
                                  temps, top_ps)
    return firsts, scratch


def make_prefill_insert(cfg: ModelConfig, mesh: Mesh, params_example,
                        kv_quant: bool = False):
    """TP+DP admission in ONE dispatch: shard_mapped batched prefill into an
    in-jit scratch, first-token sampling, and the slot-cache insert (the
    mesh counterpart of runtime.engine._prefill_insert — split dispatches
    each paid a serialized host round-trip that stalled every stream).

    Prefill always runs against a dense bf16 scratch; with an int8 slot
    cache the strips quantize at insert (engine._insert_body). The insert
    scatter runs in the outer jit under GSPMD.

    Returns pfi(params, tokens (k, T), true_lens (k,), temps, top_ps,
    slot_keys (k, 2), slots (k,), cache) -> (firsts (k,), cache)."""
    from rama_tpu.runtime.engine import _insert_body

    pspecs = param_specs(params_example)
    mapped = _mapped_prefill(cfg, mesh, pspecs)

    @partial(jax.jit, donate_argnames=("cache",))
    def pfi(params, tokens, true_lens, temps, top_ps, slot_keys, slots,
            cache):
        firsts, scratch = _prefill_firsts(mapped, cfg, params, tokens,
                                          true_lens, temps, top_ps,
                                          slot_keys)
        t_ins = min(tokens.shape[1], cache.k.shape[3])
        # use_kernel=False: the pallas strip writer is opaque to the GSPMD
        # partitioner; under the mesh the scatter stays
        cache = _insert_body(cache, scratch.k[:, :, :, :t_ins],
                             scratch.v[:, :, :, :t_ins], slots,
                             use_kernel=False)
        return firsts, cache

    return pfi


def make_paged_prefill_insert(cfg: ModelConfig, mesh: Mesh, params_example,
                              kv_quant: bool = False):
    """make_prefill_insert against the page pool: the per-slot page scatters
    are shard_mapped (pages over `data`, KV heads over `model`) and unroll
    inside the same program.

    rows_dp: (k, dp, max_pages) int32 — one LOCAL page-table row per
    (admitted slot, data replica): the owning replica's row for the slot,
    every other replica's row all trash-page, so the (replicated-over-data)
    strip lands in the owner's pages and harmlessly in everyone else's
    trash page. This is how inserts compose with a data-sharded pool
    without any cross-replica collective.

    Returns pfi(params, tokens (k, T), true_lens (k,), temps, top_ps,
    slot_keys (k, 2), rows_dp, cache) -> (firsts (k,), cache)."""
    from rama_tpu.runtime.paged import _insert_prefill_paged_impl

    pspecs = param_specs(params_example)
    mapped = _mapped_prefill(cfg, mesh, pspecs)
    cspec = paged_cache_spec(kv_quant)
    strip = P(None, MODEL_AXIS, None, None)

    def inner_ins(cache, k_strip, v_strip, rows):
        return _insert_prefill_paged_impl(cache, k_strip, v_strip, rows[0])

    mapped_ins = jax.shard_map(
        inner_ins, mesh=mesh,
        in_specs=(cspec, strip, strip, P(DATA_AXIS, None)),
        out_specs=cspec, check_vma=False)

    @partial(jax.jit, donate_argnames=("cache",))
    def pfi(params, tokens, true_lens, temps, top_ps, slot_keys, rows_dp,
            cache):
        firsts, scratch = _prefill_firsts(mapped, cfg, params, tokens,
                                          true_lens, temps, top_ps,
                                          slot_keys)
        ps = cache.page_size
        t_ins = min(tokens.shape[1], rows_dp.shape[2] * ps)
        for j in range(tokens.shape[0]):
            cache = mapped_ins(cache, scratch.k[:, j, :, :t_ins],
                               scratch.v[:, j, :, :t_ins], rows_dp[j])
        return firsts, cache

    return pfi


def make_prefill_chunk_step(cfg: ModelConfig, mesh: Mesh, params_example):
    """TP+DP chunk step of a background prefill job (the mesh counterpart
    of runtime.engine._prefill_chunk_step): forward (k, C) prompt columns
    [off, off+C) through the shard_mapped forward into the job's persistent
    sharded scratch, capturing true-last logits into the (k, V) buffer.
    `off` is traced — one compiled program per (k, C).

    Returns step(params, tokens_chunk (k, C), true_lens (k,), off (),
    scratch, last (k, V)) -> (scratch, last)."""
    pspecs = param_specs(params_example)
    cspec = cache_spec()

    def inner(params, tokens, pos_index, rows, cache):
        # classifier only at the candidate last row (see the single-host
        # _prefill_chunk_step): full chunk logits are admission-discarded
        return forward(params, cfg, tokens, pos_index, cache,
                       tp_axis=MODEL_AXIS, logit_rows=rows)

    mapped = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(pspecs, P(DATA_AXIS, None), P(DATA_AXIS, None),
                  P(DATA_AXIS), cspec),
        out_specs=(P(DATA_AXIS, None, None), cspec),
        check_vma=False)

    @partial(jax.jit, donate_argnames=("scratch", "last"))
    def step(params, tokens_chunk, true_lens, off, scratch, last):
        k, c = tokens_chunk.shape
        t_pad = scratch.k.shape[3]
        idx = off + jnp.arange(c, dtype=jnp.int32)[None, :]
        pos_index = jnp.where(idx < true_lens[:, None], idx, t_pad - 1)
        sel = true_lens - 1 - off
        take, scratch = mapped(params, tokens_chunk, pos_index,
                               jnp.clip(sel, 0, c - 1), scratch)
        last = jnp.where(((sel >= 0) & (sel < c))[:, None], take[:, 0], last)
        return scratch, last

    return step


def make_paged_prefill_finish(cfg: ModelConfig, mesh: Mesh,
                              kv_quant: bool = False):
    """Finish a chunked-prefill job against the data-sharded page pool:
    sample firsts from the captured last-position logits and shard_map the
    per-slot page scatters (rows_dp: (k, dp, max_pages) LOCAL rows, see
    make_paged_prefill_insert).

    Returns fin(last (k, V), true_lens, temps, top_ps, slot_keys (k, 2),
    rows_dp, scratch, cache) -> (firsts (k,), cache)."""
    from rama_tpu.runtime.paged import _insert_prefill_paged_impl

    cspec = paged_cache_spec(kv_quant)
    strip = P(None, MODEL_AXIS, None, None)

    def inner_ins(cache, k_strip, v_strip, rows):
        return _insert_prefill_paged_impl(cache, k_strip, v_strip, rows[0])

    mapped_ins = jax.shard_map(
        inner_ins, mesh=mesh,
        in_specs=(cspec, strip, strip, P(DATA_AXIS, None)),
        out_specs=cspec, check_vma=False)

    @partial(jax.jit, donate_argnames=("cache", "scratch"))
    def fin(last, true_lens, temps, top_ps, slot_keys, rows_dp, scratch,
            cache):
        keys = fold_in_pos(slot_keys, true_lens - 1)
        firsts = sample_batched_keyed(last, keys, temps, top_ps)
        ps = cache.page_size
        t_ins = min(scratch.k.shape[3], rows_dp.shape[2] * ps)
        for j in range(rows_dp.shape[0]):
            cache = mapped_ins(cache, scratch.k[:, j, :, :t_ins],
                               scratch.v[:, j, :, :t_ins], rows_dp[j])
        return firsts, cache

    return fin


def make_prefill(cfg: ModelConfig, mesh: Mesh, params_example,
                 kv_quant: bool = False):
    """Build the jitted TP prefill over a (B, T) prompt chunk from pos 0.

    Returns prefill(params, tokens (B, T), cache) -> (logits (B, T, V), cache).
    The batch shards over `data`, so B must be a multiple of dp.
    """
    pspecs = param_specs(params_example)
    cspec = _cache_spec_for(kv_quant)

    def inner(params, tokens, cache):
        b, t = tokens.shape
        pos = jnp.arange(t)[None, :].repeat(b, 0)
        return forward(params, cfg, tokens, pos, cache, tp_axis=MODEL_AXIS,
                       plen=jnp.full((b,), t, jnp.int32))

    mapped = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(pspecs, P(DATA_AXIS, None), cspec),
        out_specs=(P(DATA_AXIS, None, None), cspec),
        check_vma=False)

    @partial(jax.jit, donate_argnames=("cache",))
    def prefill(params, tokens, cache):
        return mapped(params, tokens, cache)

    return prefill
