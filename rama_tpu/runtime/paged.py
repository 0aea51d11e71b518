"""Paged KV cache: a shared page pool + per-slot page tables.

The reference allocates a dense [n_layers x seq_len x dim] cache per request
at admission (engine/src/lib.rs:134, ram.rs:20-21) — memory scales with
max_seq_len x concurrent requests no matter how short the requests are. Here
cache storage is a pool of fixed-size pages (L, P, page_size, n_kv, hd);
slots map positions to pages through a page table, so memory scales with
*live tokens* and short requests don't reserve long-context room.

Compute path (XLA): per layer, the slot's pages are gathered into a (B, S)
view for attention and the new K/V is scatter-written through the table —
the same single-program decode step as the dense path, just with one extra
gather. The page-table bookkeeping (free lists, reserve/release) lives in
the native allocator (rama_tpu.native.PageAllocator). A Pallas
ragged-paged-attention kernel that skips the gather is the planned follow-up
(PAPERS.md: Ragged Paged Attention).
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
    """k/v pools: (L, num_pages, page_size, n_kv_heads, head_dim)."""

    k: jax.Array
    v: jax.Array

    @staticmethod
    def create(cfg: ModelConfig, num_pages: int, page_size: int = 128,
               dtype=jnp.bfloat16) -> "PagedKVCache":
        shape = (cfg.n_layers, num_pages, page_size, cfg.n_kv_heads, cfg.head_dim)
        return PagedKVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def page_size(self) -> int:
        return self.k.shape[2]

    @property
    def num_pages(self) -> int:
        return self.k.shape[1]


def forward_paged(params, cfg: ModelConfig, tokens: jax.Array,
                  pos_index: jax.Array, cache: PagedKVCache,
                  page_tables: jax.Array):
    """Forward a (B, T) chunk against the paged cache.

    page_tables: (B, max_pages) int32 page ids (unused entries may hold any
    valid id — their positions are masked). Visibility: position s of slot b
    is attended iff s <= pos_index[b, t]. Returns (logits, new cache).
    """
    b, t = tokens.shape
    ps = cache.page_size
    max_pages = page_tables.shape[1]
    s_max = max_pages * ps

    dtype = params["final_norm"].dtype
    x = _embed(params["tok_embedding"], tokens, dtype)
    cos = jnp.take(params["rope_cos"], pos_index, axis=0)
    sin = jnp.take(params["rope_sin"], pos_index, axis=0)
    pos_mask = jnp.arange(s_max)[None, None, :] <= pos_index[:, :, None]

    tables = jnp.maximum(page_tables, 0)
    # flat view indices: slot b position s lives at table[b, s//ps]*ps + s%ps
    gather_idx = (tables[:, :, None] * ps
                  + jnp.arange(ps)[None, None, :]).reshape(b, s_max)   # (B, S)
    write_idx = (jnp.take_along_axis(tables, pos_index // ps, axis=1) * ps
                 + pos_index % ps)                                     # (B, T)

    layer_params = {k: params[k] for k in _LAYER_KEYS if k in params}

    def body(x, xs):
        lp, k_pages, v_pages = xs
        npg = k_pages.shape[0]
        k_flat = k_pages.reshape(npg * ps, *k_pages.shape[2:])
        v_flat = v_pages.reshape(npg * ps, *v_pages.shape[2:])
        # gathered dense view for this layer only: (B, S, n_kv, hd)
        k_view = jnp.take(k_flat, gather_idx, axis=0)
        v_view = jnp.take(v_flat, gather_idx, axis=0)

        # run the standard layer against the view, with the cache write
        # redirected into the flat pool afterwards
        x, k_view2, v_view2 = _layer(x, lp, k_view, v_view, cos, sin,
                                     pos_index, pos_mask, cfg)
        # extract the newly written rows and scatter them into the pool
        bt = jnp.arange(b)[:, None].repeat(t, 1)
        k_new = k_view2[bt, pos_index]          # (B, T, n_kv, hd)
        v_new = v_view2[bt, pos_index]
        k_flat = k_flat.at[write_idx].set(k_new.astype(k_flat.dtype))
        v_flat = v_flat.at[write_idx].set(v_new.astype(v_flat.dtype))
        return x, (k_flat.reshape(k_pages.shape), v_flat.reshape(v_pages.shape))

    x, (k_new, v_new) = jax.lax.scan(body, x, (layer_params, cache.k, cache.v))
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    logits = _linear(x, params["wcls"]).astype(jnp.float32)
    return logits, PagedKVCache(k=k_new, v=v_new)


def _decode_step_paged_impl(params, cfg: ModelConfig, token: jax.Array,
                            pos: jax.Array, cache: PagedKVCache,
                            page_tables: jax.Array):
    logits, cache = forward_paged(params, cfg, token[:, None], pos[:, None],
                                  cache, page_tables)
    return logits[:, 0], cache


decode_step_paged = partial(jax.jit, static_argnames=("cfg",),
                            donate_argnames=("cache",))(_decode_step_paged_impl)


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def insert_prefill_paged(cfg: ModelConfig, cache: PagedKVCache, k_strip,
                         v_strip, page_table_row: jax.Array):
    """Write a prefilled (L, T, n_kv, hd) strip into one slot's pages.

    T must be <= the slot's reserved pages * page_size; positions map to
    page_table_row[i // ps] * ps + i % ps.
    """
    l, t_len, nkv, hd = k_strip.shape
    ps = cache.page_size
    idx = (jnp.take(jnp.maximum(page_table_row, 0),
                    jnp.arange(t_len) // ps) * ps + jnp.arange(t_len) % ps)
    k_flat = cache.k.reshape(l, cache.num_pages * ps, nkv, hd)
    v_flat = cache.v.reshape(l, cache.num_pages * ps, nkv, hd)
    k_flat = k_flat.at[:, idx].set(k_strip.astype(k_flat.dtype))
    v_flat = v_flat.at[:, idx].set(v_strip.astype(v_flat.dtype))
    return PagedKVCache(k=k_flat.reshape(cache.k.shape),
                        v=v_flat.reshape(cache.v.shape))
