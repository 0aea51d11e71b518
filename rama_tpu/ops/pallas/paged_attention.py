"""Ragged paged decode attention over the shared page pool (Pallas TPU).

The XLA paged path gathers each layer's pages into a dense (B, nkv, S, hd)
view before attention — materializing the whole window to HBM and reading it
back (3x the traffic of the dense-slot path, and the reason paged mode lost
to dense slots in round 1). This kernel reads K/V *straight from the page
pool* via page-table scalar prefetch: the block index maps translate
(slot, page-step) -> physical page id, so no dense view ever exists.

Ragged: each slot only pays for the pages it actually uses. The page-step
grid dimension is innermost, and for steps past the slot's last used page
the index map repeats the last page — Pallas elides the DMA when the block
index is unchanged between consecutive grid steps, and `pl.when` skips the
compute, so a slot at pos=130 with page_size=128 streams 2 pages out of
max_pages regardless of the pool-wide maximum.

A paged kernel is an S-tiled kernel whose tile index goes through the page
table: the kernel BODIES are decode_attention's _kernel_tiled /
_kernel_tiled_q8 (online softmax across page steps, hb KV heads per
program), invoked here with c=page_size, nc=max_pages and page-translated
index maps. Scale blocks ride hb in the sublane position (_pick_heads_q8),
so the f32 pool scales stream in their storage layout — no per-layer
relayout of the whole pool.

Reference context: the reference has no paged cache at all (it allocates a
dense per-request [L x S x dim] cache, engine/src/ram.rs:20-21); this is the
repo's own parity bar for long-context serving (SURVEY.md §5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rama_tpu.ops.pallas.decode_attention import (_chunk_rows, _chunk_unrows,
                                                  _kernel_tiled,
                                                  _kernel_tiled_q8,
                                                  _pick_heads, _pick_heads_q8)


def _paged_call(qg, pools, pos, page_tables, layer, kernel, hb: int,
                quant: bool, t: int, interpret: bool):
    """Shared pallas_call builder for the paged attention variants.

    qg: (B, nkv, tr, hd) grouped queries; pools: (k, v[, ks, vs]) with
    k/v (L, P, nkv, ps, hd) and ks/vs (L, P, nkv, ps); pos (B,) the position
    of each slot's chunk column 0. Scalar layout: [pos (B,) | page tables
    flat (B*mp,) | layer (1,)].
    """
    b, nkv, tr, hd = qg.shape
    ps = pools[0].shape[3]
    mp = page_tables.shape[1]

    scalars = jnp.concatenate([
        pos.astype(jnp.int32),
        jnp.maximum(page_tables, 0).reshape(-1).astype(jnp.int32),
        layer.reshape(1).astype(jnp.int32)])

    def page_index(bi, p, sc):
        # repeat the last used page for steps past it -> DMA elided
        last = jnp.minimum((sc[bi] + t - 1) // ps, mp - 1)
        return sc[b + bi * mp + jnp.minimum(p, last)]

    kv_spec = pl.BlockSpec(
        (1, 1, hb, ps, hd),
        lambda bi, j, p, sc: (sc[sc.shape[0] - 1], page_index(bi, p, sc),
                              j, 0, 0))
    sc_spec = pl.BlockSpec(
        (1, 1, hb, ps),
        lambda bi, j, p, sc: (sc[sc.shape[0] - 1], page_index(bi, p, sc),
                              j, 0))
    in_specs = [pl.BlockSpec((1, hb, tr, hd),
                             lambda bi, j, p, sc: (bi, j, 0, 0)),
                kv_spec, kv_spec]
    if quant:
        in_specs += [sc_spec, sc_spec]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nkv // hb, mp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hb, tr, hd),
                               lambda bi, j, p, sc: (bi, j, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hb, tr, hd), jnp.float32),    # acc
            pltpu.VMEM((hb, tr, 128), jnp.float32),   # running max
            pltpu.VMEM((hb, tr, 128), jnp.float32),   # running normalizer
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nkv, tr, hd), qg.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(scalars, qg, *pools)


def paged_decode_attention_layer(q: jax.Array, k_pool: jax.Array,
                                 v_pool: jax.Array, pos: jax.Array,
                                 page_tables: jax.Array, layer: jax.Array,
                                 interpret: bool = False) -> jax.Array:
    """Decode attention for layer `layer`, reading K/V in place from the pool.

    q:           (B, nh, hd)
    k/v_pool:    (L, P, nkv, ps, hd) — the shared page pool
    pos:         (B,) int32 current positions (mask: s <= pos[b])
    page_tables: (B, max_pages) int32 physical page ids; rows past the
                 slot's last used page may hold any valid id
    layer:       () int32 — traced layer index (used inside the layer scan)

    Returns (B, nh*hd). Requires hd % 128 == 0 and ps % 8 == 0.
    """
    b, nh, hd = q.shape
    nkv, ps = k_pool.shape[2], k_pool.shape[3]
    mp = page_tables.shape[1]
    rep = nh // nkv
    hb = _pick_heads(nkv, 2 * ps * hd * k_pool.dtype.itemsize)
    qg = q.reshape(b, nkv, rep, hd)
    out = _paged_call(
        qg, (k_pool, v_pool), pos, page_tables, layer,
        partial(_kernel_tiled, c=ps, nc=mp, hb=hb),
        hb, quant=False, t=1, interpret=interpret)
    return out.reshape(b, nh * hd)


def paged_decode_attention_layer_q8(q: jax.Array, k_pool: jax.Array,
                                    v_pool: jax.Array, ks_pool: jax.Array,
                                    vs_pool: jax.Array, pos: jax.Array,
                                    page_tables: jax.Array, layer: jax.Array,
                                    interpret: bool = False) -> jax.Array:
    """paged_decode_attention_layer over an INT8 page pool.

    k/v_pool (L, P, nkv, ps, hd) int8; ks/vs_pool (L, P, nkv, ps) f32 row
    scales (absmax/127 per written row, models.llama.kv_quant_rows).
    """
    b, nh, hd = q.shape
    nkv, ps = k_pool.shape[2], k_pool.shape[3]
    mp = page_tables.shape[1]
    rep = nh // nkv
    hb = _pick_heads_q8(nkv, ps * (2 * hd + 8))
    qg = q.reshape(b, nkv, rep, hd)
    out = _paged_call(
        qg, (k_pool, v_pool, ks_pool, vs_pool), pos, page_tables, layer,
        partial(_kernel_tiled_q8, c=ps, nc=mp, hb=hb),
        hb, quant=True, t=1, interpret=interpret)
    return out.reshape(b, nh * hd)


def paged_chunk_attention_layer(q: jax.Array, k_pool: jax.Array,
                                v_pool: jax.Array, pos0: jax.Array,
                                page_tables: jax.Array, layer: jax.Array,
                                interpret: bool = False) -> jax.Array:
    """paged_decode_attention_layer for a (B, T, nh, hd) chunk of consecutive
    queries per slot; pos0 (B,) is the position of chunk column 0. Pool rows
    for the chunk's own positions must already be written (write-before-
    attend, as in the fused chunk forward). The speculative engine tick
    verifies its drafts through this kernel, so spec_tick composes with the
    paged pool (the reference has neither paging nor speculation). Returns
    (B, T, nh*hd)."""
    b, t, nh, hd = q.shape
    nkv, ps = k_pool.shape[2], k_pool.shape[3]
    rep = nh // nkv
    hb = _pick_heads(nkv, 2 * ps * hd * k_pool.dtype.itemsize)
    qg = _chunk_rows(q, nkv)                       # (B, nkv, t*rep, hd)
    out = _paged_call(
        qg, (k_pool, v_pool), pos0, page_tables, layer,
        partial(_kernel_tiled, c=ps, nc=page_tables.shape[1], hb=hb, t=t),
        hb, quant=False, t=t, interpret=interpret)
    return _chunk_unrows(out, b, t, nh, hd)


def paged_chunk_attention_layer_q8(q: jax.Array, k_pool: jax.Array,
                                   v_pool: jax.Array, ks_pool: jax.Array,
                                   vs_pool: jax.Array, pos0: jax.Array,
                                   page_tables: jax.Array, layer: jax.Array,
                                   interpret: bool = False) -> jax.Array:
    """paged_chunk_attention_layer over an INT8 page pool."""
    b, t, nh, hd = q.shape
    nkv, ps = k_pool.shape[2], k_pool.shape[3]
    rep = nh // nkv
    hb = _pick_heads_q8(nkv, ps * (2 * hd + 8))
    qg = _chunk_rows(q, nkv)
    out = _paged_call(
        qg, (k_pool, v_pool, ks_pool, vs_pool), pos0, page_tables, layer,
        partial(_kernel_tiled_q8, c=ps, nc=page_tables.shape[1], hb=hb, t=t),
        hb, quant=True, t=t, interpret=interpret)
    return _chunk_unrows(out, b, t, nh, hd)


def paged_attn_supported(cfg, page_size: int) -> bool:
    """Kernel shape constraints: 128-lane head dim, 8-sublane page stripes,
    whole GQA groups."""
    return (cfg.head_dim % 128 == 0 and page_size % 8 == 0
            and cfg.n_heads % cfg.n_kv_heads == 0)
