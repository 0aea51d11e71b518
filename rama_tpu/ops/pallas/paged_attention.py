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

Per (slot b, kv head j) the softmax runs online (flash-style) across pages:
running max / normalizer / accumulator live in VMEM scratch and the output
is finalized on the last page step.

Reference context: the reference has no paged cache at all (it allocates a
dense per-request [L x S x dim] cache, engine/src/ram.rs:20-21); this is the
repo's own parity bar for long-context serving (SURVEY.md §5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chunk_mask(pos, base: int, ps: int, tr: int, rep: int):
    """(tr, ps) causal mask for a chunk of consecutive queries against page
    rows [base, base+ps): row r is query position pos + r // rep (rows are
    t-major within a kv group, decode_attention._chunk_rows)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (tr, ps), 0) // rep
    g = base + jax.lax.broadcasted_iota(jnp.int32, (tr, ps), 1)
    return g <= pos + row


def _kernel(sc_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
            ps: int, mp: int, nb: int, t: int = 1):
    b = pl.program_id(0)
    p = pl.program_id(2)
    pos = sc_ref[b]
    # index of the slot's last used page (chunk rows run to pos + t - 1)
    last = jnp.minimum((pos + t - 1) // ps, mp - 1)

    @pl.when(p == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(p <= last)
    def _():
        q = q_ref[0, 0]                    # (tr, hd); tr = t*rep
        k = k_ref[0, 0, 0]                 # (ps, hd)
        v = v_ref[0, 0, 0]
        tr, hd = q.shape

        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) / np.sqrt(hd)   # (tr, ps)
        if t == 1:
            g = p * ps + jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)
            mask = g <= pos
        else:
            mask = _chunk_mask(pos, p * ps, ps, tr, tr // t)
        scores = jnp.where(mask, scores, -1e30)

        m_prev = m_ref[:, :1]                                   # (rep, 1)
        l_prev = l_ref[:, :1]
        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        e = jnp.exp(scores - m_new)                             # (rep, ps)
        l_new = alpha * l_prev + jnp.sum(e, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (rep, hd)
        acc_ref[...] = alpha * acc_ref[...] + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(p == nb - 1)
    def _():
        o_ref[0, 0] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)


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
    qg = q.reshape(b, nkv, rep, hd)

    # scalars: [pos (B,) | tables flat (B*mp,) | layer (1,)]
    scalars = jnp.concatenate([
        pos.astype(jnp.int32),
        jnp.maximum(page_tables, 0).reshape(-1).astype(jnp.int32),
        layer.reshape(1).astype(jnp.int32)])

    def page_index(bi, j, p, sc):
        # repeat the last used page for steps past it -> DMA elided
        last = jnp.minimum(sc[bi] // ps, mp - 1)
        pp = jnp.minimum(p, last)
        return sc[b + bi * mp + pp]

    def kv_spec():
        return pl.BlockSpec(
            (1, 1, 1, ps, hd),
            lambda bi, j, p, sc: (sc[sc.shape[0] - 1], page_index(bi, j, p, sc),
                                  j, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nkv, mp),
        in_specs=[
            pl.BlockSpec((1, 1, rep, hd), lambda bi, j, p, sc: (bi, j, 0, 0)),
            kv_spec(),
            kv_spec(),
        ],
        out_specs=pl.BlockSpec((1, 1, rep, hd),
                               lambda bi, j, p, sc: (bi, j, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((rep, hd), jnp.float32),    # acc
            pltpu.VMEM((rep, 128), jnp.float32),   # running max (broadcast)
            pltpu.VMEM((rep, 128), jnp.float32),   # running normalizer
        ],
    )
    out = pl.pallas_call(
        partial(_kernel, ps=ps, mp=mp, nb=mp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nkv, rep, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(scalars, qg, k_pool, v_pool)
    return out.reshape(b, nh * hd)


def _kernel_q8(sc_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
               acc_ref, m_ref, l_ref, *, ps: int, mp: int, nb: int,
               t: int = 1):
    """INT8-pool variant: K/V pages stream as int8 (half the HBM bytes) with
    per-row f32 scales applied after the matmuls — per score column for K,
    per probability column for V (same scheme as decode_attention_q8)."""
    b = pl.program_id(0)
    p = pl.program_id(2)
    pos = sc_ref[b]
    last = jnp.minimum((pos + t - 1) // ps, mp - 1)

    @pl.when(p == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(p <= last)
    def _():
        q = q_ref[0, 0]                    # (tr, hd); tr = t*rep
        k = k_ref[0, 0, 0]                 # (ps, hd) int8
        v = v_ref[0, 0, 0]
        ks = ks_ref[0, 0, 0]               # (1, ps) f32
        vs = vs_ref[0, 0, 0]
        tr, hd = q.shape

        scores = jax.lax.dot_general(
            q, k.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * (ks / np.sqrt(hd))
        if t == 1:
            g = p * ps + jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)
            mask = g <= pos
        else:
            mask = _chunk_mask(pos, p * ps, ps, tr, tr // t)
        scores = jnp.where(mask, scores, -1e30)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        e = jnp.exp(scores - m_new)
        l_new = alpha * l_prev + jnp.sum(e, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            (e * vs).astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc_ref[...] = alpha * acc_ref[...] + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(p == nb - 1)
    def _():
        o_ref[0, 0] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)


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
    qg = q.reshape(b, nkv, rep, hd)

    scalars = jnp.concatenate([
        pos.astype(jnp.int32),
        jnp.maximum(page_tables, 0).reshape(-1).astype(jnp.int32),
        layer.reshape(1).astype(jnp.int32)])

    def page_index(bi, j, p, sc):
        last = jnp.minimum(sc[bi] // ps, mp - 1)
        pp = jnp.minimum(p, last)
        return sc[b + bi * mp + pp]

    def kv_spec():
        return pl.BlockSpec(
            (1, 1, 1, ps, hd),
            lambda bi, j, p, sc: (sc[sc.shape[0] - 1], page_index(bi, j, p, sc),
                                  j, 0, 0))

    def sc_spec():
        return pl.BlockSpec(
            (1, 1, 1, 1, ps),
            lambda bi, j, p, sc: (sc[sc.shape[0] - 1], page_index(bi, j, p, sc),
                                  j, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nkv, mp),
        in_specs=[
            pl.BlockSpec((1, 1, rep, hd), lambda bi, j, p, sc: (bi, j, 0, 0)),
            kv_spec(),
            kv_spec(),
            sc_spec(),
            sc_spec(),
        ],
        out_specs=pl.BlockSpec((1, 1, rep, hd),
                               lambda bi, j, p, sc: (bi, j, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((rep, hd), jnp.float32),
            pltpu.VMEM((rep, 128), jnp.float32),
            pltpu.VMEM((rep, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel_q8, ps=ps, mp=mp, nb=mp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nkv, rep, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(scalars, qg, k_pool, v_pool,
      ks_pool[:, :, :, None, :], vs_pool[:, :, :, None, :])
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
    from rama_tpu.ops.pallas.decode_attention import _chunk_rows, _chunk_unrows

    b, t, nh, hd = q.shape
    nkv, ps = k_pool.shape[2], k_pool.shape[3]
    mp = page_tables.shape[1]
    rep = nh // nkv
    tr = t * rep
    qg = _chunk_rows(q, nkv)                       # (B, nkv, tr, hd)

    scalars = jnp.concatenate([
        pos0.astype(jnp.int32),
        jnp.maximum(page_tables, 0).reshape(-1).astype(jnp.int32),
        layer.reshape(1).astype(jnp.int32)])

    def page_index(bi, j, p, sc):
        last = jnp.minimum((sc[bi] + t - 1) // ps, mp - 1)
        pp = jnp.minimum(p, last)
        return sc[b + bi * mp + pp]

    def kv_spec():
        return pl.BlockSpec(
            (1, 1, 1, ps, hd),
            lambda bi, j, p, sc: (sc[sc.shape[0] - 1], page_index(bi, j, p, sc),
                                  j, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nkv, mp),
        in_specs=[
            pl.BlockSpec((1, 1, tr, hd), lambda bi, j, p, sc: (bi, j, 0, 0)),
            kv_spec(),
            kv_spec(),
        ],
        out_specs=pl.BlockSpec((1, 1, tr, hd),
                               lambda bi, j, p, sc: (bi, j, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((tr, hd), jnp.float32),
            pltpu.VMEM((tr, 128), jnp.float32),
            pltpu.VMEM((tr, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel, ps=ps, mp=mp, nb=mp, t=t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nkv, tr, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(scalars, qg, k_pool, v_pool)
    return _chunk_unrows(out, b, t, nh, hd)


def paged_chunk_attention_layer_q8(q: jax.Array, k_pool: jax.Array,
                                   v_pool: jax.Array, ks_pool: jax.Array,
                                   vs_pool: jax.Array, pos0: jax.Array,
                                   page_tables: jax.Array, layer: jax.Array,
                                   interpret: bool = False) -> jax.Array:
    """paged_chunk_attention_layer over an INT8 page pool."""
    from rama_tpu.ops.pallas.decode_attention import _chunk_rows, _chunk_unrows

    b, t, nh, hd = q.shape
    nkv, ps = k_pool.shape[2], k_pool.shape[3]
    mp = page_tables.shape[1]
    rep = nh // nkv
    tr = t * rep
    qg = _chunk_rows(q, nkv)

    scalars = jnp.concatenate([
        pos0.astype(jnp.int32),
        jnp.maximum(page_tables, 0).reshape(-1).astype(jnp.int32),
        layer.reshape(1).astype(jnp.int32)])

    def page_index(bi, j, p, sc):
        last = jnp.minimum((sc[bi] + t - 1) // ps, mp - 1)
        pp = jnp.minimum(p, last)
        return sc[b + bi * mp + pp]

    def kv_spec():
        return pl.BlockSpec(
            (1, 1, 1, ps, hd),
            lambda bi, j, p, sc: (sc[sc.shape[0] - 1], page_index(bi, j, p, sc),
                                  j, 0, 0))

    def sc_spec():
        return pl.BlockSpec(
            (1, 1, 1, 1, ps),
            lambda bi, j, p, sc: (sc[sc.shape[0] - 1], page_index(bi, j, p, sc),
                                  j, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nkv, mp),
        in_specs=[
            pl.BlockSpec((1, 1, tr, hd), lambda bi, j, p, sc: (bi, j, 0, 0)),
            kv_spec(),
            kv_spec(),
            sc_spec(),
            sc_spec(),
        ],
        out_specs=pl.BlockSpec((1, 1, tr, hd),
                               lambda bi, j, p, sc: (bi, j, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((tr, hd), jnp.float32),
            pltpu.VMEM((tr, 128), jnp.float32),
            pltpu.VMEM((tr, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel_q8, ps=ps, mp=mp, nb=mp, t=t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nkv, tr, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(scalars, qg, k_pool, v_pool,
      ks_pool[:, :, :, None, :], vs_pool[:, :, :, None, :])
    return _chunk_unrows(out, b, t, nh, hd)


def paged_attn_supported(cfg, page_size: int) -> bool:
    """Kernel shape constraints: 128-lane head dim, 8-sublane page stripes,
    whole GQA groups."""
    return (cfg.head_dim % 128 == 0 and page_size % 8 == 0
            and cfg.n_heads % cfg.n_kv_heads == 0)
