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
    write_page = jnp.take_along_axis(tables, pos_index // ps, axis=1)  # (B, T)
    write_off = pos_index % ps

    layer_params = {k: params[k] for k in _LAYER_KEYS if k in params}
    nkv = cfg.n_kv_heads

    def body(x, xs):
        lp, k_pages, v_pages = xs                    # (P, nkv, ps, hd)
        # gathered head-major dense view for this layer: (B, nkv, S, hd)
        def view(pages):
            g = jnp.take(pages, tables, axis=0)      # (B, npages, nkv, ps, hd)
            return g.transpose(0, 2, 1, 3, 4).reshape(b, nkv, s_max, -1)

        k_view, v_view = view(k_pages), view(v_pages)
        x, k_view2, v_view2 = _layer(x, lp, k_view, v_view, cos, sin,
                                     pos_index, pos_mask, cfg)
        # extract the newly written rows and scatter them into the pool
        bi = jnp.arange(b)[:, None, None]
        hi = jnp.arange(nkv)[None, None, :]
        pi = pos_index[:, :, None]
        k_new = k_view2[bi, hi, pi]                  # (B, T, nkv, hd)
        v_new = v_view2[bi, hi, pi]
        pg = write_page[:, :, None]                  # (B, T, 1)
        off = write_off[:, :, None]
        k_pages = k_pages.at[pg, hi, off].set(k_new.astype(k_pages.dtype))
        v_pages = v_pages.at[pg, hi, off].set(v_new.astype(v_pages.dtype))
        return x, (k_pages, v_pages)

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
    """Write a prefilled (L, n_kv, T, hd) strip into one slot's pages.

    T must be <= the slot's reserved pages * page_size; position i maps to
    (page_table_row[i // ps], i % ps).
    """
    l, nkv, t_len, hd = k_strip.shape
    ps = cache.page_size
    pos = jnp.arange(t_len)
    pg = jnp.take(jnp.maximum(page_table_row, 0), pos // ps)[:, None]  # (T, 1)
    off = (pos % ps)[:, None]
    hi = jnp.arange(nkv)[None, :]                                      # (1, nkv)
    # cache[l, pg, h, off] = strip[l, h, t]  -> value layout (L, T, nkv, hd)
    val_k = k_strip.transpose(0, 2, 1, 3).astype(cache.k.dtype)
    val_v = v_strip.transpose(0, 2, 1, 3).astype(cache.v.dtype)
    k = cache.k.at[:, pg, hi, off].set(val_k)
    v = cache.v.at[:, pg, hi, off].set(val_v)
    return PagedKVCache(k=k, v=v)
