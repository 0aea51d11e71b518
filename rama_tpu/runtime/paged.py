"""Paged KV cache: a shared page pool + per-slot page tables.

The reference allocates a dense [n_layers x seq_len x dim] cache per request
at admission (engine/src/lib.rs:134, ram.rs:20-21) — memory scales with
max_seq_len x concurrent requests no matter how short the requests are. Here
cache storage is a pool of fixed-size pages (L, P, page_size, n_kv, hd);
slots map positions to pages through a page table, so memory scales with
*live tokens* and short requests don't reserve long-context room.

Compute paths:
- **TPU decode (T=1)**: `_forward_decode_fused_paged` — layer-indexed quant
  matmuls plus the ragged paged-attention Pallas kernel
  (ops/pallas/paged_attention.py), which reads K/V straight from the page
  pool via page-table scalar prefetch. No dense view is ever materialized,
  and each slot streams only the pages it uses.
- **Generic (prefill, CPU, odd shapes)**: per layer, the slot's pages are
  gathered into a (B, S) view for attention and the new K/V is
  scatter-written through the table.

The page-table bookkeeping (free lists, reserve/release) lives in the native
allocator (rama_tpu.native.PageAllocator).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rama_tpu.config import ModelConfig
from rama_tpu.models.llama import (_LAYER_KEYS, KVCache, _embed, _layer,
                                   _linear, rmsnorm)


@jax.tree_util.register_dataclass
@dataclass
class PagedKVCache:
    """k/v pools: (L, num_pages, n_kv_heads, page_size, head_dim)."""

    k: jax.Array
    v: jax.Array

    @staticmethod
    def create(cfg: ModelConfig, num_pages: int, page_size: int = 128,
               dtype=jnp.bfloat16) -> "PagedKVCache":
        shape = (cfg.n_layers, num_pages, cfg.n_kv_heads, page_size, cfg.head_dim)
        return PagedKVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def num_pages(self) -> int:
        return self.k.shape[1]


@jax.tree_util.register_dataclass
@dataclass
class QuantPagedKVCache:
    """INT8 page pool: k/v (L, P, n_kv, ps, hd) int8 with per-row absmax
    scales ks/vs (L, P, n_kv, ps) f32 — the paged counterpart of
    models.llama.QuantKVCache (half the page-stream bytes, double the pages
    per GB of pool)."""

    k: jax.Array
    v: jax.Array
    ks: jax.Array
    vs: jax.Array

    @staticmethod
    def create(cfg: ModelConfig, num_pages: int,
               page_size: int = 128) -> "QuantPagedKVCache":
        shape = (cfg.n_layers, num_pages, cfg.n_kv_heads, page_size,
                 cfg.head_dim)
        return QuantPagedKVCache(k=jnp.zeros(shape, jnp.int8),
                                 v=jnp.zeros(shape, jnp.int8),
                                 ks=jnp.zeros(shape[:-1], jnp.float32),
                                 vs=jnp.zeros(shape[:-1], jnp.float32))

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def num_pages(self) -> int:
        return self.k.shape[1]


def _forward_decode_fused_paged(params, cfg: ModelConfig, tokens: jax.Array,
                                pos_index: jax.Array, cache: PagedKVCache,
                                page_tables: jax.Array,
                                tp_axis: str | None = None):
    """Decode-step (T=1) forward against the page pool, all reads in place.

    Mirrors llama._forward_decode_fused: the pools are scan carries written
    by a row scatter, weights stream through the layer-indexed quant kernels,
    and attention reads the pool directly via the ragged paged kernel — no
    per-layer dense view (the gather materialized 3x the cache traffic and
    made paged mode lose to dense slots in round 1).
    """
    from rama_tpu.models.llama import (_linear, _linear_layered, apply_rope,
                                       kv_quant_rows, rmsnorm, split_h13)
    from rama_tpu.ops.pallas.paged_attention import (
        paged_decode_attention_layer, paged_decode_attention_layer_q8)

    kv_quant = isinstance(cache, QuantPagedKVCache)
    b = tokens.shape[0]
    dtype = params["final_norm"].dtype
    x = _embed(params["tok_embedding"], tokens, dtype)           # (B, 1, D)
    cos = jnp.take(params["rope_cos"], pos_index, axis=0)
    sin = jnp.take(params["rope_sin"], pos_index, axis=0)
    pos = pos_index[:, 0]                                        # (B,)
    hd = cfg.head_dim
    ps = cache.page_size
    fused = "wqkv" in params
    tables = jnp.maximum(page_tables, 0)
    mp = tables.shape[1]
    # Write target per slot. Speculative multi-token ticks may run pos past
    # the reserved range; the clip keeps the write inside the slot's own
    # pages, and such tokens are discarded host-side before anything attends
    # the clobbered rows (see engine._decode_tick).
    write_page = jnp.take_along_axis(
        tables, jnp.minimum(pos // ps, mp - 1)[:, None], axis=1)[:, 0]
    write_off = pos % ps

    def body(carry, l):
        x, pools = carry
        k_pool, v_pool = pools[0], pools[1]
        nkv_local = k_pool.shape[2]

        xb = rmsnorm(x, jnp.take(params["attn_norm"], l, axis=0), cfg.norm_eps)
        if fused:
            heads_total = cfg.n_heads + 2 * cfg.n_kv_heads
            heads_local = params["wqkv"].shape[-1] // hd
            nh = heads_local * cfg.n_heads // heads_total
            nkv = heads_local * cfg.n_kv_heads // heads_total
            qkv = _linear_layered(xb, params["wqkv"], l)
            q = qkv[..., : nh * hd].reshape(b, 1, nh, hd)
            k = qkv[..., nh * hd : (nh + nkv) * hd].reshape(b, 1, nkv, hd)
            v = qkv[..., (nh + nkv) * hd :].reshape(b, 1, nkv, hd)
        else:
            nh = params["wq"].shape[-1] // hd
            nkv = params["wk"].shape[-1] // hd
            q = _linear_layered(xb, params["wq"], l).reshape(b, 1, nh, hd)
            k = _linear_layered(xb, params["wk"], l).reshape(b, 1, nkv, hd)
            v = _linear_layered(xb, params["wv"], l).reshape(b, 1, nkv, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        pg = write_page[:, None]                      # (B, 1)
        hi = jnp.arange(nkv_local)[None, :]           # (1, nkv)
        off = write_off[:, None]
        if kv_quant:
            ks_pool, vs_pool = pools[2], pools[3]
            kq, ksc = kv_quant_rows(k[:, 0])          # (B,nkv,hd), (B,nkv)
            vq, vsc = kv_quant_rows(v[:, 0])
            # XLA materializes the whole pool layer for the int8 scatter
            # (same story as the dense cache, but the pool is sized for the
            # long-context working set); the Pallas writer DMAs one stripe
            from rama_tpu.ops.pallas.kv_write import write_kv_paged_q8

            k_pool, v_pool, ks_pool, vs_pool = write_kv_paged_q8(
                k_pool, v_pool, ks_pool, vs_pool, kq[:, None], vq[:, None],
                ksc[:, None], vsc[:, None], pos, tables, l)
            pools_out = (k_pool, v_pool, ks_pool, vs_pool)
            att = paged_decode_attention_layer_q8(
                q[:, 0], k_pool, v_pool, ks_pool, vs_pool, pos, tables, l)
        else:
            k_pool = k_pool.at[l, pg, hi, off].set(k[:, 0].astype(k_pool.dtype))
            v_pool = v_pool.at[l, pg, hi, off].set(v[:, 0].astype(v_pool.dtype))
            pools_out = (k_pool, v_pool)
            att = paged_decode_attention_layer(q[:, 0], k_pool, v_pool, pos,
                                               tables, l)
        attn_out = _linear_layered(att, params["wo"], l)
        if tp_axis is not None:
            attn_out = jax.lax.psum(attn_out, tp_axis)
        x = x + attn_out[:, None]

        xb = rmsnorm(x, jnp.take(params["ffn_norm"], l, axis=0), cfg.norm_eps)
        if fused:
            h13 = _linear_layered(xb, params["w13"], l)
            h1, h3 = split_h13(h13, params["w13"])
        else:
            h1 = _linear_layered(xb, params["w1"], l)
            h3 = _linear_layered(xb, params["w3"], l)
        ffn_out = _linear_layered(jax.nn.silu(h1) * h3, params["w2"], l)
        if tp_axis is not None:
            ffn_out = jax.lax.psum(ffn_out, tp_axis)
        x = x + ffn_out
        return (x, pools_out), None

    pools0 = ((cache.k, cache.v, cache.ks, cache.vs) if kv_quant
              else (cache.k, cache.v))
    (x, pools), _ = jax.lax.scan(
        body, (x, pools0), jnp.arange(cfg.n_layers, dtype=jnp.int32))

    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    logits = _linear(x, params["wcls"]).astype(jnp.float32)
    if tp_axis is not None:
        logits = jax.lax.all_gather(logits, tp_axis, axis=logits.ndim - 1,
                                    tiled=True)
    new_cache = (QuantPagedKVCache(*pools) if kv_quant
                 else PagedKVCache(*pools))
    return logits, new_cache


def _forward_chunk_fused_paged(params, cfg: ModelConfig, tokens: jax.Array,
                               pos_index: jax.Array, cache: PagedKVCache,
                               page_tables: jax.Array,
                               tp_axis: str | None = None,
                               _interpret: bool = False):
    """Chunk forward (2 <= T <= 8, consecutive positions) against the page
    pool — the paged speculative-verification path.

    Same structure as llama._forward_chunk_fused (write the chunk's own K/V
    rows, then attend in place), but the rows scatter through the page table
    and attention reads the pool via the ragged paged CHUNK kernel — so
    spec_tick composes with paged_kv without ever materializing a dense
    view. Page tables must cover pos_index's last column (the host loop
    reserves pages before dispatch, engine._reserve_tick_pages)."""
    from rama_tpu.models.llama import (_linear_layered, apply_rope,
                                       kv_quant_rows, split_h13)
    from rama_tpu.ops.pallas.paged_attention import (
        paged_chunk_attention_layer, paged_chunk_attention_layer_q8)

    kv_quant = isinstance(cache, QuantPagedKVCache)
    b, t = tokens.shape
    dtype = params["final_norm"].dtype
    x = _embed(params["tok_embedding"], tokens, dtype)           # (B, T, D)
    cos = jnp.take(params["rope_cos"], pos_index, axis=0, mode="clip")
    sin = jnp.take(params["rope_sin"], pos_index, axis=0, mode="clip")
    pos0 = pos_index[:, 0]                                       # (B,)
    hd = cfg.head_dim
    ps = cache.page_size
    fused = "wqkv" in params
    tables = jnp.maximum(page_tables, 0)
    mp = tables.shape[1]
    # per-(slot, column) write targets; clip keeps speculative overshoot
    # inside the slot's own pages (same argument as the decode path)
    write_page = jnp.take_along_axis(
        tables, jnp.minimum(pos_index // ps, mp - 1), axis=1)    # (B, T)
    write_off = pos_index % ps

    def body(carry, l):
        x, pools = carry
        k_pool, v_pool = pools[0], pools[1]
        nkv_local = k_pool.shape[2]

        xb = rmsnorm(x, jnp.take(params["attn_norm"], l, axis=0), cfg.norm_eps)
        if fused:
            heads_total = cfg.n_heads + 2 * cfg.n_kv_heads
            heads_local = params["wqkv"].shape[-1] // hd
            nh = heads_local * cfg.n_heads // heads_total
            nkv = heads_local * cfg.n_kv_heads // heads_total
            qkv = _linear_layered(xb, params["wqkv"], l)
            q = qkv[..., : nh * hd].reshape(b, t, nh, hd)
            k = qkv[..., nh * hd : (nh + nkv) * hd].reshape(b, t, nkv, hd)
            v = qkv[..., (nh + nkv) * hd :].reshape(b, t, nkv, hd)
        else:
            nh = params["wq"].shape[-1] // hd
            nkv = params["wk"].shape[-1] // hd
            q = _linear_layered(xb, params["wq"], l).reshape(b, t, nh, hd)
            k = _linear_layered(xb, params["wk"], l).reshape(b, t, nkv, hd)
            v = _linear_layered(xb, params["wv"], l).reshape(b, t, nkv, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        pg = write_page[:, :, None]                   # (B, T, 1)
        hi = jnp.arange(nkv_local)[None, None, :]     # (1, 1, nkv)
        off = write_off[:, :, None]
        if kv_quant:
            ks_pool, vs_pool = pools[2], pools[3]
            kq, ksc = kv_quant_rows(k)                # (B,T,nkv,hd), (B,T,nkv)
            vq, vsc = kv_quant_rows(v)
            # in-place stripe writes instead of the whole-pool-layer int8
            # scatter (see _forward_decode_fused_paged)
            from rama_tpu.ops.pallas.kv_write import write_kv_paged_q8

            k_pool, v_pool, ks_pool, vs_pool = write_kv_paged_q8(
                k_pool, v_pool, ks_pool, vs_pool, kq, vq, ksc, vsc, pos0,
                tables, l, interpret=_interpret)
            pools_out = (k_pool, v_pool, ks_pool, vs_pool)
            att = paged_chunk_attention_layer_q8(
                q, k_pool, v_pool, ks_pool, vs_pool, pos0, tables, l,
                interpret=_interpret)
        else:
            k_pool = k_pool.at[l, pg, hi, off].set(k.astype(k_pool.dtype))
            v_pool = v_pool.at[l, pg, hi, off].set(v.astype(v_pool.dtype))
            pools_out = (k_pool, v_pool)
            att = paged_chunk_attention_layer(q, k_pool, v_pool, pos0,
                                              tables, l, interpret=_interpret)
        attn_out = _linear_layered(att, params["wo"], l)          # (B, T, D)
        if tp_axis is not None:
            attn_out = jax.lax.psum(attn_out, tp_axis)
        x = x + attn_out

        xb = rmsnorm(x, jnp.take(params["ffn_norm"], l, axis=0), cfg.norm_eps)
        if fused:
            h13 = _linear_layered(xb, params["w13"], l)
            h1, h3 = split_h13(h13, params["w13"])
        else:
            h1 = _linear_layered(xb, params["w1"], l)
            h3 = _linear_layered(xb, params["w3"], l)
        ffn_out = _linear_layered(jax.nn.silu(h1) * h3, params["w2"], l)
        if tp_axis is not None:
            ffn_out = jax.lax.psum(ffn_out, tp_axis)
        x = x + ffn_out
        return (x, pools_out), None

    pools0 = ((cache.k, cache.v, cache.ks, cache.vs) if kv_quant
              else (cache.k, cache.v))
    (x, pools), _ = jax.lax.scan(
        body, (x, pools0), jnp.arange(cfg.n_layers, dtype=jnp.int32))

    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    logits = _linear(x, params["wcls"]).astype(jnp.float32)
    if tp_axis is not None:
        logits = jax.lax.all_gather(logits, tp_axis, axis=logits.ndim - 1,
                                    tiled=True)
    new_cache = (QuantPagedKVCache(*pools) if kv_quant
                 else PagedKVCache(*pools))
    return logits, new_cache


def forward_paged(params, cfg: ModelConfig, tokens: jax.Array,
                  pos_index: jax.Array, cache: PagedKVCache,
                  page_tables: jax.Array, tp_axis: str | None = None):
    """Forward a (B, T) chunk against the paged cache.

    page_tables: (B, max_pages) int32 page ids (unused entries may hold any
    valid id — their positions are masked). Visibility: position s of slot b
    is attended iff s <= pos_index[b, t]. Returns (logits, new cache).

    On TPU, 1 <= T <= 8 takes the fused in-place path, which requires each
    slot's columns to be CONSECUTIVE positions (pos_index[b] = pos0[b] +
    arange(T) — true for every engine call site); the generic gather path
    handles arbitrary pos_index.
    """
    b, t = tokens.shape
    if (t == 1 and jax.default_backend() == "tpu"
            and _paged_fused_supported(cfg, cache.page_size)):
        return _forward_decode_fused_paged(params, cfg, tokens, pos_index,
                                           cache, page_tables, tp_axis)
    if (2 <= t <= 8 and jax.default_backend() == "tpu"
            and _paged_fused_supported(cfg, cache.page_size)):
        # chunk columns must be consecutive per slot for the fused path
        return _forward_chunk_fused_paged(params, cfg, tokens, pos_index,
                                          cache, page_tables, tp_axis)
    ps = cache.page_size
    max_pages = page_tables.shape[1]
    s_max = max_pages * ps

    dtype = params["final_norm"].dtype
    x = _embed(params["tok_embedding"], tokens, dtype)
    cos = jnp.take(params["rope_cos"], pos_index, axis=0)
    sin = jnp.take(params["rope_sin"], pos_index, axis=0)
    pos_mask = jnp.arange(s_max)[None, None, :] <= pos_index[:, :, None]

    tables = jnp.maximum(page_tables, 0)
    write_page = jnp.take_along_axis(tables, pos_index // ps, axis=1)  # (B, T)
    write_off = pos_index % ps

    layer_params = {k: params[k] for k in _LAYER_KEYS if k in params}
    nkv = cache.k.shape[2]  # local KV head count (sharded under TP)
    kv_quant = isinstance(cache, QuantPagedKVCache)

    def body(x, xs):
        lp, pools = xs                               # each (P, nkv, ps, ..)
        # gathered head-major dense view for this layer: (B, nkv, S, ..)
        def view(pages):
            g = jnp.take(pages, tables, axis=0)      # (B, npages, nkv, ps, ..)
            lead = (0, 2, 1, 3) + ((4,) if pages.ndim == 4 else ())
            g = g.transpose(*lead)
            return g.reshape(b, nkv, s_max, *pages.shape[3:])

        if kv_quant:
            from rama_tpu.models.llama import _dequant_kv, kv_quant_rows

            k_pages, v_pages, ks_pages, vs_pages = pools
            k_view, v_view = _dequant_kv(view(k_pages), view(v_pages),
                                         view(ks_pages), view(vs_pages))
        else:
            k_pages, v_pages = pools
            k_view, v_view = view(k_pages), view(v_pages)
        x, (k_view2, v_view2) = _layer(x, lp, (k_view, v_view), cos, sin,
                                       pos_index, pos_mask, cfg, tp_axis)
        # extract the newly written rows and scatter them into the pool
        bi = jnp.arange(b)[:, None, None]
        hi = jnp.arange(nkv)[None, None, :]
        pi = pos_index[:, :, None]
        k_new = k_view2[bi, hi, pi]                  # (B, T, nkv, hd)
        v_new = v_view2[bi, hi, pi]
        pg = write_page[:, :, None]                  # (B, T, 1)
        off = write_off[:, :, None]
        if kv_quant:
            kq, ksc = kv_quant_rows(k_new)
            vq, vsc = kv_quant_rows(v_new)
            k_pages = k_pages.at[pg, hi, off].set(kq)
            v_pages = v_pages.at[pg, hi, off].set(vq)
            ks_pages = ks_pages.at[pg, hi, off].set(ksc)
            vs_pages = vs_pages.at[pg, hi, off].set(vsc)
            return x, (k_pages, v_pages, ks_pages, vs_pages)
        k_pages = k_pages.at[pg, hi, off].set(k_new.astype(k_pages.dtype))
        v_pages = v_pages.at[pg, hi, off].set(v_new.astype(v_pages.dtype))
        return x, (k_pages, v_pages)

    pools0 = ((cache.k, cache.v, cache.ks, cache.vs) if kv_quant
              else (cache.k, cache.v))
    x, pools = jax.lax.scan(body, x, (layer_params, pools0))
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    logits = _linear(x, params["wcls"]).astype(jnp.float32)
    if tp_axis is not None:
        logits = jax.lax.all_gather(logits, tp_axis, axis=logits.ndim - 1,
                                    tiled=True)
    new_cache = (QuantPagedKVCache(*pools) if kv_quant
                 else PagedKVCache(*pools))
    return logits, new_cache


def _paged_fused_supported(cfg: ModelConfig, page_size: int) -> bool:
    from rama_tpu.ops.pallas.paged_attention import paged_attn_supported

    return paged_attn_supported(cfg, page_size)


def _decode_step_paged_impl(params, cfg: ModelConfig, token: jax.Array,
                            pos: jax.Array, cache: PagedKVCache,
                            page_tables: jax.Array):
    logits, cache = forward_paged(params, cfg, token[:, None], pos[:, None],
                                  cache, page_tables)
    return logits[:, 0], cache


decode_step_paged = partial(jax.jit, static_argnames=("cfg",),
                            donate_argnames=("cache",))(_decode_step_paged_impl)


def _insert_prefill_paged_impl(cache: PagedKVCache, k_strip, v_strip,
                               page_table_row: jax.Array,
                               _interpret: bool = False):
    """Write a prefilled (L, n_kv, T, hd) strip into one slot's pages.

    T must be <= the slot's reserved pages * page_size; position i maps to
    (page_table_row[i // ps], i % ps). Shapes may be the local TP shards
    (called inside shard_map by parallel.tp.make_paged_prefill_insert).
    """
    l, nkv, t_len, hd = k_strip.shape
    ps = cache.page_size
    pos = jnp.arange(t_len)
    pg = jnp.take(jnp.maximum(page_table_row, 0), pos // ps)[:, None]  # (T, 1)
    off = (pos % ps)[:, None]
    hi = jnp.arange(nkv)[None, :]                                      # (1, nkv)
    # cache[l, pg, h, off] = strip[l, h, t]  -> value layout (L, T, nkv, hd)
    val_k = k_strip.transpose(0, 2, 1, 3)
    val_v = v_strip.transpose(0, 2, 1, 3)
    if isinstance(cache, QuantPagedKVCache):
        from rama_tpu.models.llama import kv_quant_rows

        if jax.default_backend() == "tpu" or _interpret:
            # in-place page writes: the XLA int8 pool scatter materializes
            # the whole pool per slot insert (see kv_write)
            from rama_tpu.ops.pallas.kv_write import write_kv_prefill_paged_q8

            kq, ksc = kv_quant_rows(k_strip)          # (L, nkv, T, hd/.)
            vq, vsc = kv_quant_rows(v_strip)
            k8, v8, kss, vss = write_kv_prefill_paged_q8(
                cache.k, cache.v, cache.ks, cache.vs, kq, vq, ksc, vsc,
                page_table_row, interpret=_interpret)
            return QuantPagedKVCache(k=k8, v=v8, ks=kss, vs=vss)
        kq, ksc = kv_quant_rows(val_k)
        vq, vsc = kv_quant_rows(val_v)
        return QuantPagedKVCache(
            k=cache.k.at[:, pg, hi, off].set(kq),
            v=cache.v.at[:, pg, hi, off].set(vq),
            ks=cache.ks.at[:, pg, hi, off].set(ksc),
            vs=cache.vs.at[:, pg, hi, off].set(vsc))
    k = cache.k.at[:, pg, hi, off].set(val_k.astype(cache.k.dtype))
    v = cache.v.at[:, pg, hi, off].set(val_v.astype(cache.v.dtype))
    return PagedKVCache(k=k, v=v)


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def insert_prefill_paged(cfg: ModelConfig, cache: PagedKVCache, k_strip,
                         v_strip, page_table_row: jax.Array):
    return _insert_prefill_paged_impl(cache, k_strip, v_strip, page_table_row)
