"""In-place KV-cache row write (Pallas TPU, aliased outputs).

XLA lowers the quantized cache's per-slot row update
(`cache.at[l, b, h, pos_b].set(row)`) to a broadcast+select over the whole
(B, nkv, S, hd) int8 layer slice — measured 1.7 ms/step at 7B b=8 S=512
(8 × ~215 us `broadcast_in_dim` ops on the device timeline), dwarfing the
32 KB actually written. The bf16 cache scatter updates in place, but int8
scatters don't. This kernel writes row pos[b] of layer `layer` through
ALIASED input/output windows: per slot, only the 32-row stripe containing
pos (int8 sublane tile) and the 128-column scale window are DMA'd —
~0.5 MB/layer for the whole batch instead of ~34 MB.

The reference appends to its dense cache with a strided copy_from_slice per
layer per token (engine/src/transformer/infer.rs:31-33); this is the batched,
quantized, in-place TPU equivalent.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(sc_ref, kq_ref, vq_ref, ksc_ref, vsc_ref,
            kin_ref, vin_ref, ksin_ref, vsin_ref,
            ko_ref, vo_ref, kso_ref, vso_ref, *, r: int, cs: int):
    bi = pl.program_id(0)
    pos = sc_ref[bi]
    nkv, hd = kq_ref.shape[1], kq_ref.shape[2]

    # cache rows: window row pos % r gets the new (nkv, hd) slab
    ri = jax.lax.broadcasted_iota(jnp.int32, (nkv, r, hd), 1)
    sel = ri == pos % r
    ko_ref[0, 0] = jnp.where(sel, kq_ref[0][:, None, :], kin_ref[0, 0])
    vo_ref[0, 0] = jnp.where(sel, vq_ref[0][:, None, :], vin_ref[0, 0])

    # row scales: window column pos % cs
    ci = jax.lax.broadcasted_iota(jnp.int32, (nkv, cs), 1)
    selc = ci == pos % cs
    kso_ref[0, 0] = jnp.where(selc, ksc_ref[0], ksin_ref[0, 0])
    vso_ref[0, 0] = jnp.where(selc, vsc_ref[0], vsin_ref[0, 0])


@partial(jax.jit, static_argnames=("interpret",))
def write_kv_rows_q8(k8, v8, ks, vs, kq, vq, ksc, vsc, pos, layer, *,
                     interpret: bool = False):
    """Write the current decode rows into the stacked int8 cache in place.

    k8/v8 (L, B, nkv, S, hd) int8 and ks/vs (L, B, nkv, S) f32 are DONATED
    and updated at [layer, b, :, pos[b]] for every slot b. kq/vq (B, nkv, hd)
    int8 rows; ksc/vsc (B, nkv) f32 row scales (see kv_quant_rows). Returns
    the four updated arrays.
    """
    L, B, nkv, S, hd = k8.shape
    r = 32 if S % 32 == 0 else S     # int8 sublane tile is 32 rows
    cs = 128 if S % 128 == 0 else S
    scalars = jnp.concatenate([pos.astype(jnp.int32),
                               layer.reshape(1).astype(jnp.int32)])
    li = lambda sc: sc[sc.shape[0] - 1]

    def row_idx(bi, sc):
        return (li(sc), bi, 0, sc[bi] // r, 0)

    def col_idx(bi, sc):
        return (li(sc), bi, 0, sc[bi] // cs)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, nkv, hd), lambda bi, sc: (bi, 0, 0)),
            pl.BlockSpec((1, nkv, hd), lambda bi, sc: (bi, 0, 0)),
            pl.BlockSpec((1, nkv, 1), lambda bi, sc: (bi, 0, 0)),
            pl.BlockSpec((1, nkv, 1), lambda bi, sc: (bi, 0, 0)),
            pl.BlockSpec((1, 1, nkv, r, hd), row_idx),
            pl.BlockSpec((1, 1, nkv, r, hd), row_idx),
            pl.BlockSpec((1, 1, nkv, cs), col_idx),
            pl.BlockSpec((1, 1, nkv, cs), col_idx),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, nkv, r, hd), row_idx),
            pl.BlockSpec((1, 1, nkv, r, hd), row_idx),
            pl.BlockSpec((1, 1, nkv, cs), col_idx),
            pl.BlockSpec((1, 1, nkv, cs), col_idx),
        ],
    )
    # flattened inputs: 0 scalars, 1 kq, 2 vq, 3 ksc, 4 vsc,
    # 5 k8, 6 v8, 7 ks, 8 vs — caches donated to outputs 0-3
    return pl.pallas_call(
        partial(_kernel, r=r, cs=cs),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k8.shape, k8.dtype),
            jax.ShapeDtypeStruct(v8.shape, v8.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ],
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        interpret=interpret,
    )(scalars, kq, vq, ksc[:, :, None], vsc[:, :, None], k8, v8, ks, vs)


def _chunk_kernel(sc_ref, kq_ref, vq_ref, ksc_ref, vsc_ref,
                  kin_ref, vin_ref, ksin_ref, vsin_ref,
                  ko_ref, vo_ref, kso_ref, vso_ref,
                  *, t: int, r: int, cs: int):
    bi = pl.program_id(0)
    j = pl.program_id(1)
    pos = sc_ref[bi]
    nkv, hd = kq_ref.shape[2], kq_ref.shape[3]
    tile = (pos + j * (t - 1)) // r
    ctile = (pos + j * (t - 1)) // cs

    ri = jax.lax.broadcasted_iota(jnp.int32, (nkv, r, hd), 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, (nkv, cs), 1)
    ko, vo = kin_ref[0, 0], vin_ref[0, 0]
    kso, vso = ksin_ref[0, 0], vsin_ref[0, 0]
    for q in range(t):
        # chunk row q lands at global row pos+q; rows outside this j-window
        # produce no iota match and fall through to the carried window
        sel = ri == pos + q - tile * r
        ko = jnp.where(sel, kq_ref[0, q][:, None, :], ko)
        vo = jnp.where(sel, vq_ref[0, q][:, None, :], vo)
        selc = ci == pos + q - ctile * cs
        kso = jnp.where(selc, ksc_ref[0, q], kso)
        vso = jnp.where(selc, vsc_ref[0, q], vso)
    ko_ref[0, 0], vo_ref[0, 0] = ko, vo
    kso_ref[0, 0], vso_ref[0, 0] = kso, vso


@partial(jax.jit, static_argnames=("interpret",))
def write_kv_chunk_q8(k8, v8, ks, vs, kq, vq, ksc, vsc, pos0, layer, *,
                      interpret: bool = False):
    """Write a T-row chunk (T <= 8 consecutive positions per slot) into the
    stacked int8 cache in place — the speculative-verification companion of
    `write_kv_rows_q8`.

    k8/v8 (L, B, nkv, S, hd) int8 and ks/vs (L, B, nkv, S) f32 are DONATED
    and updated at [layer, b, :, pos0[b]+q] for q in [0, T). kq/vq
    (B, T, nkv, hd) int8 rows; ksc/vsc (B, T, nkv) f32 row scales. The
    T rows may straddle one 32-row sublane-tile (or 128-col scale-tile)
    boundary, so the grid visits two windows per slot — the window holding
    pos0 and the one holding pos0+T-1 (the same window twice when no
    straddle; the second visit rewrites identical bytes). XLA lowers the
    equivalent `.at[l, bi, hi, pi].set(...)` int8 scatter to a whole-layer
    broadcast+select (~34 MB materialized per layer at 7B b=8 S=512); this
    writes ~2x 32-row stripes per slot instead.
    """
    L, B, nkv, S, hd = k8.shape
    t = kq.shape[1]
    r = 32 if S % 32 == 0 else S
    cs = 128 if S % 128 == 0 else S
    scalars = jnp.concatenate([pos0.astype(jnp.int32),
                               layer.reshape(1).astype(jnp.int32)])
    li = lambda sc: sc[sc.shape[0] - 1]

    def row_idx(bi, j, sc):
        return (li(sc), bi, 0, (sc[bi] + j * (t - 1)) // r, 0)

    def col_idx(bi, j, sc):
        return (li(sc), bi, 0, (sc[bi] + j * (t - 1)) // cs)

    new_idx = lambda bi, j, sc: (bi, 0, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, 2),
        in_specs=[
            pl.BlockSpec((1, t, nkv, hd), new_idx),
            pl.BlockSpec((1, t, nkv, hd), new_idx),
            pl.BlockSpec((1, t, nkv, 1), new_idx),
            pl.BlockSpec((1, t, nkv, 1), new_idx),
            pl.BlockSpec((1, 1, nkv, r, hd), row_idx),
            pl.BlockSpec((1, 1, nkv, r, hd), row_idx),
            pl.BlockSpec((1, 1, nkv, cs), col_idx),
            pl.BlockSpec((1, 1, nkv, cs), col_idx),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, nkv, r, hd), row_idx),
            pl.BlockSpec((1, 1, nkv, r, hd), row_idx),
            pl.BlockSpec((1, 1, nkv, cs), col_idx),
            pl.BlockSpec((1, 1, nkv, cs), col_idx),
        ],
    )
    return pl.pallas_call(
        partial(_chunk_kernel, t=t, r=r, cs=cs),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k8.shape, k8.dtype),
            jax.ShapeDtypeStruct(v8.shape, v8.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ],
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        interpret=interpret,
    )(scalars, kq, vq, ksc[..., None], vsc[..., None], k8, v8, ks, vs)


def _strips_kernel(sc_ref, kq_ref, vq_ref, ksc_ref, vsc_ref,
                   kin_ref, vin_ref, ksin_ref, vsin_ref,
                   ko_ref, vo_ref, kso_ref, vso_ref,
                   *, t: int, rtile: int):
    w = pl.program_id(2)
    rt_, cs = kin_ref.shape[3], ksin_ref.shape[3]
    # row mask kept (rtile, 1) — a full (nkv, rtile, hd) iota temp blew the
    # scoped-vmem budget at large windows
    rows = w * rtile + jax.lax.broadcasted_iota(jnp.int32, (rtile, 1), 0)
    sel = (rows < t)[None]                                # (1, rtile, 1)
    ko_ref[0, 0] = jnp.where(sel, kq_ref[0, 0], kin_ref[0, 0])
    vo_ref[0, 0] = jnp.where(sel, vq_ref[0, 0], vin_ref[0, 0])
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, cs), 1)
    selc = ci < t
    kso_ref[0, 0] = jnp.where(selc, ksc_ref[0, 0], ksin_ref[0, 0])
    vso_ref[0, 0] = jnp.where(selc, vsc_ref[0, 0], vsin_ref[0, 0])


@partial(jax.jit, static_argnames=("interpret",))
def write_kv_strips_q8(k8, v8, ks, vs, kq, vq, ksc, vsc, slots, *,
                       interpret: bool = False):
    """Insert prefilled strips into the int8 cache in place — the admission
    companion of write_kv_rows_q8 (engine._insert_body's device half).

    k8/v8 (L, B, nkv, S, hd) int8 and ks/vs (L, B, nkv, S) f32 are DONATED;
    strip j — kq/vq (L, K, nkv, T, hd) int8, ksc/vsc (L, K, nkv, T) f32 —
    lands at [:, slots[j], :, 0:T]. Duplicate slots[j] entries (batch
    padding) must carry identical strips (engine._pad_entries guarantees
    it). XLA lowers the equivalent `.at[:, slots, :, :T].set(...)` int8
    scatter to a whole-cache broadcast+select — ~4 GB of temps and ~8 GB of
    HBM traffic per admission at 7B b=8 S=2048 (an OOM next to the weights
    + slot cache); this DMAs one tile-rounded window per (slot, layer).
    """
    L, B, nkv, S, hd = k8.shape
    K, t = kq.shape[1], kq.shape[3]
    rt = min(-(-t // 32) * 32, S) if S % 32 == 0 else S
    cs = min(-(-t // 128) * 128, S) if S % 128 == 0 else S
    # tile the row window (a whole 2048-row block is 8 MB in VMEM — x6
    # blocks blew the 16 MB scoped budget); scale windows stay whole (f32
    # (nkv, cs) is small)
    rtile = 256 if rt % 256 == 0 else (32 if rt % 32 == 0 else rt)
    nw = rt // rtile
    kq = jnp.pad(kq, ((0, 0), (0, 0), (0, 0), (0, rt - t), (0, 0)))
    vq = jnp.pad(vq, ((0, 0), (0, 0), (0, 0), (0, rt - t), (0, 0)))
    ksc = jnp.pad(ksc, ((0, 0), (0, 0), (0, 0), (0, cs - t)))
    vsc = jnp.pad(vsc, ((0, 0), (0, 0), (0, 0), (0, cs - t)))
    scalars = slots.astype(jnp.int32)

    strip_idx = lambda j, l, w, sc: (l, j, 0, w, 0)
    stripc_idx = lambda j, l, w, sc: (l, j, 0, 0)
    row_idx = lambda j, l, w, sc: (l, sc[j], 0, w, 0)
    col_idx = lambda j, l, w, sc: (l, sc[j], 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K, L, nw),
        in_specs=[
            pl.BlockSpec((1, 1, nkv, rtile, hd), strip_idx),
            pl.BlockSpec((1, 1, nkv, rtile, hd), strip_idx),
            pl.BlockSpec((1, 1, nkv, cs), stripc_idx),
            pl.BlockSpec((1, 1, nkv, cs), stripc_idx),
            pl.BlockSpec((1, 1, nkv, rtile, hd), row_idx),
            pl.BlockSpec((1, 1, nkv, rtile, hd), row_idx),
            pl.BlockSpec((1, 1, nkv, cs), col_idx),
            pl.BlockSpec((1, 1, nkv, cs), col_idx),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, nkv, rtile, hd), row_idx),
            pl.BlockSpec((1, 1, nkv, rtile, hd), row_idx),
            pl.BlockSpec((1, 1, nkv, cs), col_idx),
            pl.BlockSpec((1, 1, nkv, cs), col_idx),
        ],
    )
    return pl.pallas_call(
        partial(_strips_kernel, t=t, rtile=rtile),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k8.shape, k8.dtype),
            jax.ShapeDtypeStruct(v8.shape, v8.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ],
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        interpret=interpret,
    )(scalars, kq, vq, ksc, vsc, k8, v8, ks, vs)


def _paged_strip_kernel(sc_ref, kq_ref, vq_ref, ksc_ref, vsc_ref,
                        kin_ref, vin_ref, ksin_ref, vsin_ref,
                        ko_ref, vo_ref, kso_ref, vso_ref, *, t: int, ps: int):
    p = pl.program_id(1)
    rows = p * ps + jax.lax.broadcasted_iota(jnp.int32, (ps, 1), 0)
    sel = (rows < t)[None]                                 # (1, ps, 1)
    ko_ref[0, 0] = jnp.where(sel, kq_ref[0], kin_ref[0, 0])
    vo_ref[0, 0] = jnp.where(sel, vq_ref[0], vin_ref[0, 0])
    ci = p * ps + jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)
    selc = ci < t
    kso_ref[0, 0] = jnp.where(selc, ksc_ref[0], ksin_ref[0, 0])
    vso_ref[0, 0] = jnp.where(selc, vsc_ref[0], vsin_ref[0, 0])


@partial(jax.jit, static_argnames=("interpret",))
def write_kv_prefill_paged_q8(k8, v8, ks, vs, kq, vq, ksc, vsc,
                              page_table_row, *, interpret: bool = False):
    """Write ONE slot's prefilled strip into the int8 page pool in place —
    the paged companion of write_kv_strips_q8 (paged._insert_prefill_paged's
    device half; called per admitted slot, also from inside shard_map on
    the local TP shard).

    k8/v8 (L, P, nkv, ps, hd) int8 pools and ks/vs (L, P, nkv, ps) f32 are
    DONATED; strip row i of kq/vq (L, nkv, T, hd) int8 (ksc/vsc (L, nkv, T)
    f32) lands in physical page page_table_row[i // ps] at offset i % ps.
    The XLA int8 pool scatter materializes the whole pool per slot insert;
    this DMAs exactly the ceil(T / ps) pages the strip occupies.
    """
    L, P, nkv, ps, hd = k8.shape
    t = kq.shape[2]
    np_ = -(-t // ps)
    pad = np_ * ps - t
    kq = jnp.pad(kq, ((0, 0), (0, 0), (0, pad), (0, 0)))
    vq = jnp.pad(vq, ((0, 0), (0, 0), (0, pad), (0, 0)))
    ksc = jnp.pad(ksc, ((0, 0), (0, 0), (0, pad)))
    vsc = jnp.pad(vsc, ((0, 0), (0, 0), (0, pad)))
    scalars = jnp.maximum(page_table_row[:np_], 0).astype(jnp.int32)

    strip_idx = lambda l, p, sc: (l, 0, p, 0)
    stripc_idx = lambda l, p, sc: (l, 0, p)
    row_idx = lambda l, p, sc: (l, sc[p], 0, 0, 0)
    col_idx = lambda l, p, sc: (l, sc[p], 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, np_),
        in_specs=[
            pl.BlockSpec((1, nkv, ps, hd), strip_idx),
            pl.BlockSpec((1, nkv, ps, hd), strip_idx),
            pl.BlockSpec((1, nkv, ps), stripc_idx),
            pl.BlockSpec((1, nkv, ps), stripc_idx),
            pl.BlockSpec((1, 1, nkv, ps, hd), row_idx),
            pl.BlockSpec((1, 1, nkv, ps, hd), row_idx),
            pl.BlockSpec((1, 1, nkv, ps), col_idx),
            pl.BlockSpec((1, 1, nkv, ps), col_idx),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, nkv, ps, hd), row_idx),
            pl.BlockSpec((1, 1, nkv, ps, hd), row_idx),
            pl.BlockSpec((1, 1, nkv, ps), col_idx),
            pl.BlockSpec((1, 1, nkv, ps), col_idx),
        ],
    )
    return pl.pallas_call(
        partial(_paged_strip_kernel, t=t, ps=ps),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k8.shape, k8.dtype),
            jax.ShapeDtypeStruct(v8.shape, v8.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ],
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        interpret=interpret,
    )(scalars, kq, vq, ksc, vsc, k8, v8, ks, vs)


def _paged_kernel(sc_ref, kq_ref, vq_ref, ksc_ref, vsc_ref,
                  kin_ref, vin_ref, ksin_ref, vsin_ref,
                  ko_ref, vo_ref, kso_ref, vso_ref,
                  *, b: int, t: int, r: int, cs: int):
    bi = pl.program_id(0)
    j = pl.program_id(1)
    pos = sc_ref[2 * b + bi]
    nkv, hd = kq_ref.shape[2], kq_ref.shape[3]
    # window j covers the position-space stripe holding anchor pos+j*(t-1);
    # r | page_size, so a stripe never crosses a page boundary and its rows
    # are contiguous within the physical page the index map selected
    anchor = pos + j * (t - 1)
    base = (anchor // r) * r
    cbase = (anchor // cs) * cs

    ri = jax.lax.broadcasted_iota(jnp.int32, (nkv, r, hd), 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, (nkv, cs), 1)
    ko, vo = kin_ref[0, 0], vin_ref[0, 0]
    kso, vso = ksin_ref[0, 0], vsin_ref[0, 0]
    for q in range(t):
        sel = ri == pos + q - base
        ko = jnp.where(sel, kq_ref[0, q][:, None, :], ko)
        vo = jnp.where(sel, vq_ref[0, q][:, None, :], vo)
        selc = ci == pos + q - cbase
        kso = jnp.where(selc, ksc_ref[0, q], kso)
        vso = jnp.where(selc, vsc_ref[0, q], vso)
    ko_ref[0, 0], vo_ref[0, 0] = ko, vo
    kso_ref[0, 0], vso_ref[0, 0] = kso, vso


@partial(jax.jit, static_argnames=("interpret",))
def write_kv_paged_q8(k8, v8, ks, vs, kq, vq, ksc, vsc, pos0, page_tables,
                      layer, *, interpret: bool = False):
    """Write a T-row chunk (1 <= T <= 8 consecutive positions per slot) into
    the int8 PAGE POOL in place — the paged companion of write_kv_chunk_q8.

    k8/v8 (L, P, nkv, ps, hd) int8 pools and ks/vs (L, P, nkv, ps) f32 scale
    pools are DONATED; row pos0[b]+q of slot b lands in physical page
    page_tables[b, (pos0[b]+q) // ps] at offset (pos0[b]+q) % ps. kq/vq
    (B, T, nkv, hd) int8; ksc/vsc (B, T, nkv) f32. Requires T <= ps (the
    chunk then spans at most two logical pages, and the two windows anchored
    at pos0 and pos0+T-1 — each a 32-row sublane stripe when 32 | ps, else
    the whole page — jointly cover every chunk row, whether the straddle is
    across pages or across stripes). XLA lowers the equivalent int8 pool
    scatter to a whole-pool-layer broadcast+select (the pool is sized for
    the long-context working set, so that is strictly worse than the dense
    cache's); this DMAs ~2 stripes per slot.
    """
    L, P, nkv, ps, hd = k8.shape
    B, t = kq.shape[:2]
    if t > ps:
        raise ValueError(f"chunk T={t} must be <= page_size={ps}")
    r = 32 if ps % 32 == 0 else ps
    cs = 128 if ps % 128 == 0 else ps
    tables = jnp.maximum(page_tables, 0)
    mp = tables.shape[1]
    # physical page of each window anchor, precomputed so the index maps
    # stay scalar reads (clip mirrors the forward paths' speculative-
    # overshoot clamp)
    anchors = pos0[:, None] + jnp.asarray([0, t - 1], jnp.int32)[None, :]
    phys = jnp.take_along_axis(tables, jnp.minimum(anchors // ps, mp - 1),
                               axis=1)                          # (B, 2)
    scalars = jnp.concatenate([phys.T.reshape(-1).astype(jnp.int32),
                               pos0.astype(jnp.int32),
                               layer.reshape(1).astype(jnp.int32)])
    li = lambda sc: sc[sc.shape[0] - 1]

    def row_idx(bi, j, sc):
        a = sc[2 * B + bi] + j * (t - 1)
        return (li(sc), sc[j * B + bi], 0, (a % ps) // r, 0)

    def col_idx(bi, j, sc):
        a = sc[2 * B + bi] + j * (t - 1)
        return (li(sc), sc[j * B + bi], 0, (a % ps) // cs)

    new_idx = lambda bi, j, sc: (bi, 0, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, 2),
        in_specs=[
            pl.BlockSpec((1, t, nkv, hd), new_idx),
            pl.BlockSpec((1, t, nkv, hd), new_idx),
            pl.BlockSpec((1, t, nkv, 1), new_idx),
            pl.BlockSpec((1, t, nkv, 1), new_idx),
            pl.BlockSpec((1, 1, nkv, r, hd), row_idx),
            pl.BlockSpec((1, 1, nkv, r, hd), row_idx),
            pl.BlockSpec((1, 1, nkv, cs), col_idx),
            pl.BlockSpec((1, 1, nkv, cs), col_idx),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, nkv, r, hd), row_idx),
            pl.BlockSpec((1, 1, nkv, r, hd), row_idx),
            pl.BlockSpec((1, 1, nkv, cs), col_idx),
            pl.BlockSpec((1, 1, nkv, cs), col_idx),
        ],
    )
    return pl.pallas_call(
        partial(_paged_kernel, b=B, t=t, r=r, cs=cs),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k8.shape, k8.dtype),
            jax.ShapeDtypeStruct(v8.shape, v8.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ],
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        interpret=interpret,
    )(scalars, kq, vq, ksc[..., None], vsc[..., None], k8, v8, ks, vs)
