"""Fused batched decode attention over the KV cache (Pallas TPU).

XLA's einsum path for decode attention materializes a per-layer dense view
of the cache plus layout transposes — at batch 8 that's gigabytes of copies
per step (measured: the b=8 decode step spent ~3x the weight-streaming time
in attention copies). This kernel reads each (slot, kv-head) cache stripe
(S, hd) straight from HBM into VMEM once, computes masked softmax(QK^T)V for
that head group, and writes (rep, hd) — no dense-view copy, no transposes.

Grid: (B, n_kv_heads); per program:
    q    (rep, hd)   — the GQA query group for this kv head
    k, v (S, hd)     — the cache stripe
    pos  scalar      — this slot's current position (mask: s <= pos)
Cost per program: 2*S*hd reads; compute is tiny (decode is bandwidth-bound).

Used for T=1 decode steps; prefill keeps the XLA einsum (it's MXU-bound and
fuses well there).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_heads(nkv: int, bytes_per_head: int, budget: int = 12 << 20,
                cap: int = 32) -> int:
    """KV heads per grid step: the per-step fixed cost (~1.3 us) dominates
    decode attention at 7B (rep=1, tiny matmuls), so grouping heads into one
    step with an unrolled loop cuts the call's grid from b*nkv[*nc] to
    b*nkv/hb[*nc] — at hb=nkv one grid step per (slot, S-tile). hb must
    divide nkv; K+V VMEM for the group (x2 double-buffer) stays under
    `budget` (scoped VMEM is 16 MB; 12 leaves room for q/out/acc blocks)."""
    hb = 1
    for h in (2, 4, 8, 16, 32):
        if h <= cap and nkv % h == 0 and 2 * h * bytes_per_head <= budget:
            hb = h
    return hb


def _pick_heads_q8(nkv: int, bytes_per_head: int,
                   budget: int = 12 << 20) -> int:
    """_pick_heads for the int8-cache kernels, whose (…, hb, S-tile) scale
    blocks put hb in the SUBLANE position: Mosaic requires the block's
    second-minor dim to be 8-aligned or cover the array dim fully. (The
    alternative — a dummy unit dim so the sublane block is trivially "full"
    — forces a (nkv, S) -> (1, S) relayout of the whole f32 scale array at
    every layer call: 268 MB materialized per layer at S=16K, measured
    ~16 ms/step of the 26 ms long-context decode step.) Always satisfiable:
    any nkv <= 88 fits the full-nkv block in the VMEM budget."""
    cands = [h for h in (8, 16, 32) if h < nkv and nkv % h == 0
             and 2 * h * bytes_per_head <= budget]
    if 2 * nkv * bytes_per_head <= budget or not cands:
        cands.append(nkv)
    return max(cands)


def _one_head(q, k, v, visible, out_dtype):
    """softmax(q k^T / sqrt(hd)) v for one (rep, hd) query group against one
    (S, hd) cache stripe, masked to `visible` (1, S)."""
    s, hd = k.shape
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) / np.sqrt(hd)      # (rep, S)
    scores = jnp.where(visible, scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                    # (rep, hd)
    return out.astype(out_dtype)


def _heads_vectorized(q, k, v, visible, out_dtype):
    """MHA (rep=1) all-heads path: q (hb, hd), k/v (hb, S, hd) -> (hb, hd).
    One hb-batched MXU dot_general per matmul: measured 91.0 us/layer
    (737 GB/s) at 7B b=8 S=512 vs 117.1 for the f32 product/reduce body and
    ~2x that for 2*hb tiny per-head dots. bf16 x bf16 products accumulate
    exactly in f32 on the MXU, so scores match the f32 elementwise path;
    only the probs round to bf16 (as the per-head path already does). f32
    caches (tests, debug) keep f32 dots so the kernel stays bit-comparable
    to the XLA reference there."""
    hd = q.shape[-1]
    dd = jnp.float32 if k.dtype == jnp.float32 else jnp.bfloat16
    qb = q.astype(dd)[:, None, :]                                  # (hb,1,hd)
    scores = jax.lax.dot_general(
        qb, k.astype(dd), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :] / np.sqrt(hd)  # (hb, S)
    scores = jnp.where(visible, scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        probs.astype(dd)[:, None, :], v.astype(dd),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]               # (hb, hd)
    return out.astype(out_dtype)


def _kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, *, hb: int):
    s, hd = k_ref.shape[-2:]
    pos = pos_ref[pl.program_id(0)]
    visible = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1) <= pos
    if q_ref.shape[2] == 1:
        o_ref[0, :, 0, :] = _heads_vectorized(
            q_ref[0, :, 0, :], k_ref[0], v_ref[0], visible, o_ref.dtype)
        return
    for h in range(hb):
        o_ref[0, h] = _one_head(q_ref[0, h], k_ref[0, h], v_ref[0, h],
                                visible, o_ref.dtype)


def decode_attention_layer(q: jax.Array, k_full: jax.Array, v_full: jax.Array,
                           pos: jax.Array, layer: jax.Array,
                           interpret: bool = False) -> jax.Array:
    """Like decode_attention, but reads layer `layer` of the full stacked
    cache (L, B, nkv, S, hd) directly — no per-layer slice materialization.
    Called inside the layer scan with a traced layer index."""
    b, nh, hd = q.shape
    nkv, s = k_full.shape[2], k_full.shape[3]
    rep = nh // nkv
    hb = _pick_heads(nkv, 2 * s * hd * k_full.dtype.itemsize)
    qg = q.reshape(b, nkv, rep, hd)
    scalars = jnp.concatenate([pos.astype(jnp.int32),
                               layer.reshape(1).astype(jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nkv // hb),
        in_specs=[
            pl.BlockSpec((1, hb, rep, hd), lambda i, j, sc: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, hb, s, hd), lambda i, j, sc: (sc[sc.shape[0] - 1], i, j, 0, 0)),
            pl.BlockSpec((1, 1, hb, s, hd), lambda i, j, sc: (sc[sc.shape[0] - 1], i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hb, rep, hd), lambda i, j, sc: (i, j, 0, 0)),
    )
    out = pl.pallas_call(
        partial(_kernel_layered, hb=hb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nkv, rep, hd), q.dtype),
        interpret=interpret,
    )(scalars, qg, k_full, v_full)
    return out.reshape(b, nh * hd)


def _row_mask(pos, s: int, tr: int, rep: int):
    """(tr, s) causal mask for a chunk of consecutive queries: row r is
    query position pos + r // rep (rows are t-major within a kv group)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (tr, s), 0) // rep
    return jax.lax.broadcasted_iota(jnp.int32, (tr, s), 1) <= pos + row


def _kernel_layered(sc_ref, q_ref, k_ref, v_ref, o_ref, *, hb: int,
                    t: int = 1):
    s, hd = k_ref.shape[-2:]
    pos = sc_ref[pl.program_id(0)]
    tr = q_ref.shape[2]
    if t == 1:
        visible = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1) <= pos
    else:
        visible = _row_mask(pos, s, tr, tr // t)
    if tr == 1:
        o_ref[0, :, 0, :] = _heads_vectorized(
            q_ref[0, :, 0, :], k_ref[0, 0], v_ref[0, 0], visible,
            o_ref.dtype)
        return
    for h in range(hb):
        o_ref[0, h] = _one_head(q_ref[0, h], k_ref[0, 0, h], v_ref[0, 0, h],
                                visible, o_ref.dtype)


def _kernel_tiled(sc_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                  *, c: int, nc: int, hb: int, t: int = 1):
    """Online-softmax accumulation over S chunks (flash-style): scratch holds
    the running max / normalizer / output; chunks past the slot's position
    are skipped (their DMA is elided by the repeated block index)."""
    b = pl.program_id(0)
    p = pl.program_id(2)
    pos = sc_ref[b]
    last = jnp.minimum((pos + t - 1) // c, nc - 1)

    @pl.when(p == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)

    rep = q_ref.shape[2]

    @pl.when(p <= last)
    def _():
        if t == 1:
            g = p * c + jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
            mask = g <= pos
        else:
            mask = _row_mask(pos - p * c, c, rep, rep // t)
        if rep == 1:
            # MHA fast path: hb-batched MXU dots (see _heads_vectorized —
            # 91.0 vs 117.1 us/layer for the f32 product/reduce body)
            dd = (jnp.float32 if k_ref.dtype == jnp.float32
                  else jnp.bfloat16)
            q = q_ref[0, :, :, :].astype(dd)               # (hb, 1, hd)
            k = k_ref[0, 0].astype(dd)                     # (hb, c, hd)
            v = v_ref[0, 0].astype(dd)
            hd = q.shape[-1]
            scores = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)[:, 0, :] / np.sqrt(hd)
            scores = jnp.where(mask, scores, -1e30)        # (hb, c)

            m_prev = m_ref[:, 0, :1]                       # (hb, 1)
            l_prev = l_ref[:, 0, :1]
            m_new = jnp.maximum(m_prev,
                                jnp.max(scores, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)                # (hb, 1)
            e = jnp.exp(scores - m_new)                    # (hb, c)
            l_new = alpha * l_prev + jnp.sum(e, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                e.astype(dd)[:, None, :], v,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)[:, 0, :]  # (hb, hd)
            acc_ref[:, 0, :] = alpha * acc_ref[:, 0, :] + pv
            m_ref[...] = jnp.broadcast_to(m_new[:, None], m_ref.shape)
            l_ref[...] = jnp.broadcast_to(l_new[:, None], l_ref.shape)
            return
        # batched GQA/chunk path: ONE (hb)-batched MXU dot per matmul over
        # all tr = t*rep query rows (hb per-head (tr, c) dots measured ~3x
        # slower at 7B shapes — the _heads_vectorized lesson, generalized)
        dd = jnp.float32 if k_ref.dtype == jnp.float32 else jnp.bfloat16
        q = q_ref[0].astype(dd)                        # (hb, tr, hd)
        k = k_ref[0, 0].astype(dd)                     # (hb, c, hd)
        v = v_ref[0, 0].astype(dd)
        hd = q.shape[-1]
        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) / np.sqrt(hd)   # (hb, tr, c)
        scores = jnp.where(mask[None], scores, -1e30)
        m_prev = m_ref[:, :, :1]                       # (hb, tr, 1)
        l_prev = l_ref[:, :, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        e = jnp.exp(scores - m_new)
        l_new = alpha * l_prev + jnp.sum(e, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            e.astype(dd), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # (hb, tr, hd)
        acc_ref[...] = alpha * acc_ref[...] + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(p == nc - 1)
    def _():
        o_ref[0] = (acc_ref[...] / l_ref[:, :, :1]).astype(o_ref.dtype)


def decode_attention_layer_tiled(q: jax.Array, k_full: jax.Array,
                                 v_full: jax.Array, pos: jax.Array,
                                 layer: jax.Array, *, chunk: int = 256,
                                 interpret: bool = False) -> jax.Array:
    """S-tiled ragged variant of decode_attention_layer.

    The non-tiled kernel streams the full (S, hd) stripe per program — VMEM
    residency scales with max_len (breaks past ~8-16K) and every decode step
    reads all S positions even at pos=3. Here the sequence is processed in
    `chunk`-row tiles with an online softmax; tiles past pos[b] repeat the
    previous block index, so their DMA is elided and a slot at pos=130 reads
    one 512-tile of a 16K cache. Preferred whenever S > chunk.
    """
    b, nh, hd = q.shape
    nkv, s = k_full.shape[2], k_full.shape[3]
    rep = nh // nkv
    # largest 8-sublane-aligned divisor of S up to `chunk` (full S fallback)
    c = max([d for d in range(8, min(chunk, s) + 1, 8) if s % d == 0],
            default=s)
    nc = s // c
    hb = _pick_heads(nkv, 2 * c * hd * k_full.dtype.itemsize)
    qg = q.reshape(b, nkv, rep, hd)
    scalars = jnp.concatenate([pos.astype(jnp.int32),
                               layer.reshape(1).astype(jnp.int32)])

    def kv_spec():
        def idx(bi, j, p, sc):
            last = jnp.minimum(sc[bi] // c, nc - 1)
            return (sc[sc.shape[0] - 1], bi, j, jnp.minimum(p, last), 0)

        return pl.BlockSpec((1, 1, hb, c, hd), idx)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nkv // hb, nc),
        in_specs=[
            pl.BlockSpec((1, hb, rep, hd), lambda bi, j, p, sc: (bi, j, 0, 0)),
            kv_spec(),
            kv_spec(),
        ],
        out_specs=pl.BlockSpec((1, hb, rep, hd),
                               lambda bi, j, p, sc: (bi, j, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hb, rep, hd), jnp.float32),
            pltpu.VMEM((hb, rep, 128), jnp.float32),
            pltpu.VMEM((hb, rep, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel_tiled, c=c, nc=nc, hb=hb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nkv, rep, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(scalars, qg, k_full, v_full)
    return out.reshape(b, nh * hd)


def _one_head_q8(q, k, v, ks, vs, visible, out_dtype):
    """INT8-cache attention for one query group: q (rep, hd) bf16 against
    k/v (S, hd) int8 with row scales ks/vs (1, S) f32. Scales are applied
    AFTER the matmuls — per score column for K, per probability column for
    V — so the stripes stream as int8 (half the HBM bytes of bf16) and
    dequantization costs O(S) multiplies."""
    s, hd = k.shape
    scores = jax.lax.dot_general(
        q, k.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * (ks / np.sqrt(hd))   # (rep, S)
    scores = jnp.where(visible, scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        (probs * vs).astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return out.astype(out_dtype)


def _heads_batched_q8(q, k8, v8, ks, vs, visible, out_dtype):
    """INT8-cache MHA all-heads path: one hb-batched MXU dot_general per
    matmul instead of hb tiny per-head dots or a VPU product/reduce. The
    elementwise-f32 path (see _heads_vectorized) is compute-bound on the
    int8->f32 converts — measured 220 us/layer at 7B b=8 S=512 vs 48.6 us
    (712 GB/s, near the ~795 GB/s DMA wall) for this body; the per-head MXU
    loop measured 143.8. q (hb, 1, hd) bf16; k8/v8 (hb, S, hd) int8;
    ks/vs (hb, S) f32 row scales. Returns (hb, hd)."""
    hd = q.shape[-1]
    scores = jax.lax.dot_general(
        q.astype(jnp.bfloat16), k8.astype(jnp.bfloat16),
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]            # (hb, S)
    scores = scores * ks / np.sqrt(hd)
    scores = jnp.where(visible, scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        (probs * vs).astype(jnp.bfloat16)[:, None, :],
        v8.astype(jnp.bfloat16), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]            # (hb, hd)
    return out.astype(out_dtype)


def _kernel_q8(sc_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
               *, layered: bool, hb: int, t: int = 1):
    s = k_ref.shape[-2]
    pos = sc_ref[pl.program_id(0)]
    if t == 1:
        visible = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1) <= pos
    else:
        tr = q_ref.shape[2]
        visible = _row_mask(pos, s, tr, tr // t)
    # scale blocks are 4-D (.., hb, S): hb rides the sublane dim (see
    # _pick_heads_q8) so the f32 scale arrays stream in their storage layout
    ksb = ks_ref[0, 0] if layered else ks_ref[0]         # (hb, S) f32
    vsb = vs_ref[0, 0] if layered else vs_ref[0]
    if q_ref.shape[2] == 1:
        if layered:
            k, v = k_ref[0, 0], v_ref[0, 0]
        else:
            k, v = k_ref[0], v_ref[0]
        o_ref[0, :, 0, :] = _heads_batched_q8(
            q_ref[0], k, v, ksb, vsb, visible, o_ref.dtype)
        return
    for h in range(hb):
        if layered:
            k, v = k_ref[0, 0, h], v_ref[0, 0, h]        # (S, hd) int8
        else:
            k, v = k_ref[0, h], v_ref[0, h]
        o_ref[0, h] = _one_head_q8(q_ref[0, h], k, v, ksb[h:h + 1],
                                   vsb[h:h + 1], visible, o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def decode_attention_q8(q: jax.Array, k8: jax.Array, v8: jax.Array,
                        ks: jax.Array, vs: jax.Array, pos: jax.Array,
                        *, interpret: bool = False) -> jax.Array:
    """decode_attention over an int8 cache: k8/v8 (B, nkv, S, hd) int8,
    ks/vs (B, nkv, S) f32 row scales (see models.llama.QuantKVCache)."""
    b, nh, hd = q.shape
    nkv, s = k8.shape[1], k8.shape[2]
    rep = nh // nkv
    hb = _pick_heads_q8(nkv, s * (2 * hd + 8))
    qg = q.reshape(b, nkv, rep, hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nkv // hb),
        in_specs=[
            pl.BlockSpec((1, hb, rep, hd), lambda i, j, sc: (i, j, 0, 0)),
            pl.BlockSpec((1, hb, s, hd), lambda i, j, sc: (i, j, 0, 0)),
            pl.BlockSpec((1, hb, s, hd), lambda i, j, sc: (i, j, 0, 0)),
            pl.BlockSpec((1, hb, s), lambda i, j, sc: (i, j, 0)),
            pl.BlockSpec((1, hb, s), lambda i, j, sc: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, hb, rep, hd), lambda i, j, sc: (i, j, 0, 0)),
    )
    out = pl.pallas_call(
        partial(_kernel_q8, layered=False, hb=hb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nkv, rep, hd), q.dtype),
        interpret=interpret,
    )(pos.astype(jnp.int32), qg, k8, v8, ks, vs)
    return out.reshape(b, nh * hd)


def decode_attention_layer_q8(q: jax.Array, k8_full: jax.Array,
                              v8_full: jax.Array, ks_full: jax.Array,
                              vs_full: jax.Array, pos: jax.Array,
                              layer: jax.Array,
                              interpret: bool = False) -> jax.Array:
    """Layer-indexed int8-cache decode attention over the stacked cache
    (L, B, nkv, S, hd) int8 + (L, B, nkv, S) scales."""
    b, nh, hd = q.shape
    nkv, s = k8_full.shape[2], k8_full.shape[3]
    rep = nh // nkv
    hb = _pick_heads_q8(nkv, s * (2 * hd + 8))
    qg = q.reshape(b, nkv, rep, hd)
    scalars = jnp.concatenate([pos.astype(jnp.int32),
                               layer.reshape(1).astype(jnp.int32)])

    def li(sc):
        return sc[sc.shape[0] - 1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nkv // hb),
        in_specs=[
            pl.BlockSpec((1, hb, rep, hd), lambda i, j, sc: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, hb, s, hd), lambda i, j, sc: (li(sc), i, j, 0, 0)),
            pl.BlockSpec((1, 1, hb, s, hd), lambda i, j, sc: (li(sc), i, j, 0, 0)),
            pl.BlockSpec((1, 1, hb, s), lambda i, j, sc: (li(sc), i, j, 0)),
            pl.BlockSpec((1, 1, hb, s), lambda i, j, sc: (li(sc), i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, hb, rep, hd), lambda i, j, sc: (i, j, 0, 0)),
    )
    out = pl.pallas_call(
        partial(_kernel_q8, layered=True, hb=hb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nkv, rep, hd), q.dtype),
        interpret=interpret,
    )(scalars, qg, k8_full, v8_full, ks_full, vs_full)
    return out.reshape(b, nh * hd)


def _kernel_tiled_q8(sc_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
                     acc_ref, m_ref, l_ref, *, c: int, nc: int, hb: int,
                     t: int = 1):
    """S-tiled int8-cache variant of _kernel_tiled (online softmax)."""
    b = pl.program_id(0)
    p = pl.program_id(2)
    pos = sc_ref[b]
    last = jnp.minimum((pos + t - 1) // c, nc - 1)

    @pl.when(p == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)

    rep = q_ref.shape[2]

    @pl.when(p <= last)
    def _():
        if t == 1:
            g = p * c + jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
            mask = g <= pos
        else:
            mask = _row_mask(pos - p * c, c, rep, rep // t)
        if rep == 1:
            # MHA fast path: hb-batched MXU dots on the raw int8 stripes
            # (see _heads_batched_q8 — the f32 product/reduce body was
            # compute-bound on the int8->f32 converts, 220 vs 48.6 us/layer)
            q = q_ref[0, :, :, :].astype(jnp.bfloat16)     # (hb, 1, hd)
            k = k_ref[0, 0].astype(jnp.bfloat16)           # (hb, c, hd)
            v = v_ref[0, 0].astype(jnp.bfloat16)
            ks = ks_ref[0, 0]                              # (hb, c)
            vs = vs_ref[0, 0]
            hd = q.shape[-1]
            scores = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)[:, 0, :]  # (hb, c)
            scores = scores * ks / np.sqrt(hd)
            scores = jnp.where(mask, scores, -1e30)

            m_prev = m_ref[:, 0, :1]
            l_prev = l_ref[:, 0, :1]
            m_new = jnp.maximum(m_prev,
                                jnp.max(scores, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            e = jnp.exp(scores - m_new)                    # (hb, c)
            l_new = alpha * l_prev + jnp.sum(e, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                (e * vs).astype(jnp.bfloat16)[:, None, :], v,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)[:, 0, :]  # (hb, hd)
            acc_ref[:, 0, :] = alpha * acc_ref[:, 0, :] + pv
            m_ref[...] = jnp.broadcast_to(m_new[:, None], m_ref.shape)
            l_ref[...] = jnp.broadcast_to(l_new[:, None], l_ref.shape)
            return
        # batched GQA/chunk path (see _kernel_tiled): one hb-batched MXU dot
        # per matmul over all tr rows, scales applied per score/prob column
        q = q_ref[0].astype(jnp.bfloat16)              # (hb, tr, hd)
        k = k_ref[0, 0].astype(jnp.bfloat16)           # (hb, c, hd)
        v = v_ref[0, 0].astype(jnp.bfloat16)
        ks = ks_ref[0, 0]                              # (hb, c)
        vs = vs_ref[0, 0]
        hd = q.shape[-1]
        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * (ks[:, None, :]
                                                   / np.sqrt(hd))
        scores = jnp.where(mask[None], scores, -1e30)  # (hb, tr, c)
        m_prev = m_ref[:, :, :1]
        l_prev = l_ref[:, :, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        e = jnp.exp(scores - m_new)
        l_new = alpha * l_prev + jnp.sum(e, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            (e * vs[:, None, :]).astype(jnp.bfloat16), v,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # (hb, tr, hd)
        acc_ref[...] = alpha * acc_ref[...] + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(p == nc - 1)
    def _():
        o_ref[0] = (acc_ref[...] / l_ref[:, :, :1]).astype(o_ref.dtype)


def decode_attention_layer_tiled_q8(q: jax.Array, k8_full: jax.Array,
                                    v8_full: jax.Array, ks_full: jax.Array,
                                    vs_full: jax.Array, pos: jax.Array,
                                    layer: jax.Array, *, chunk: int = 256,
                                    interpret: bool = False) -> jax.Array:
    """S-tiled ragged int8-cache decode attention (bounded VMEM; tiles past
    pos[b] elide their DMAs) — see decode_attention_layer_tiled."""
    b, nh, hd = q.shape
    nkv, s = k8_full.shape[2], k8_full.shape[3]
    rep = nh // nkv
    c = max([d for d in range(8, min(chunk, s) + 1, 8) if s % d == 0],
            default=s)
    nc = s // c
    hb = _pick_heads_q8(nkv, c * (2 * hd + 8))
    qg = q.reshape(b, nkv, rep, hd)
    scalars = jnp.concatenate([pos.astype(jnp.int32),
                               layer.reshape(1).astype(jnp.int32)])

    def kv_idx(bi, j, p, sc):
        last = jnp.minimum(sc[bi] // c, nc - 1)
        return (sc[sc.shape[0] - 1], bi, j, jnp.minimum(p, last), 0)

    def sc_idx(bi, j, p, sc):
        last = jnp.minimum(sc[bi] // c, nc - 1)
        return (sc[sc.shape[0] - 1], bi, j, jnp.minimum(p, last))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nkv // hb, nc),
        in_specs=[
            pl.BlockSpec((1, hb, rep, hd), lambda bi, j, p, sc: (bi, j, 0, 0)),
            pl.BlockSpec((1, 1, hb, c, hd), kv_idx),
            pl.BlockSpec((1, 1, hb, c, hd), kv_idx),
            pl.BlockSpec((1, 1, hb, c), sc_idx),
            pl.BlockSpec((1, 1, hb, c), sc_idx),
        ],
        out_specs=pl.BlockSpec((1, hb, rep, hd),
                               lambda bi, j, p, sc: (bi, j, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hb, rep, hd), jnp.float32),
            pltpu.VMEM((hb, rep, 128), jnp.float32),
            pltpu.VMEM((hb, rep, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel_tiled_q8, c=c, nc=nc, hb=hb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nkv, rep, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(scalars, qg, k8_full, v8_full, ks_full, vs_full)
    return out.reshape(b, nh * hd)


# ---------------------------------------------------------------------------
# Chunked-query (T<=8) variants for speculative verification
#
# Same kernels as the T=1 layer-indexed paths, but each slot carries T
# consecutive queries at positions pos0[b]..pos0[b]+T-1 (a draft chunk being
# verified in one pass). Query rows are t-major within a kv group
# (row r = t*rep + g), masked per row by _row_mask. One weight/cache stream
# serves up to T emitted tokens per slot.
# ---------------------------------------------------------------------------


def _chunk_rows(q: jax.Array, nkv: int) -> jax.Array:
    """(B, T, nh, hd) -> (B, nkv, T*rep, hd), rows t-major per kv group."""
    b, t, nh, hd = q.shape
    rep = nh // nkv
    qh = q.transpose(0, 2, 1, 3).reshape(b, nkv, rep, t, hd)
    return qh.transpose(0, 1, 3, 2, 4).reshape(b, nkv, t * rep, hd)


def _chunk_unrows(out: jax.Array, b: int, t: int, nh: int,
                  hd: int) -> jax.Array:
    """(B, nkv, T*rep, hd) -> (B, T, nh*hd)."""
    nkv = out.shape[1]
    rep = nh // nkv
    oh = out.reshape(b, nkv, t, rep, hd).transpose(0, 2, 1, 3, 4)
    return oh.reshape(b, t, nh * hd)


def chunk_attention_layer(q: jax.Array, k_full: jax.Array, v_full: jax.Array,
                          pos0: jax.Array, layer: jax.Array,
                          interpret: bool = False) -> jax.Array:
    """decode_attention_layer for a (B, T, nh, hd) chunk of consecutive
    queries; pos0 (B,) is the position of chunk column 0. Cache rows at
    pos0+t must already hold the chunk's own K/V (written before the call,
    as in the decode path). Returns (B, T, nh*hd)."""
    b, t, nh, hd = q.shape
    nkv, s = k_full.shape[2], k_full.shape[3]
    rep = nh // nkv
    hb = _pick_heads(nkv, 2 * s * hd * k_full.dtype.itemsize)
    qg = _chunk_rows(q, nkv)
    scalars = jnp.concatenate([pos0.astype(jnp.int32),
                               layer.reshape(1).astype(jnp.int32)])
    tr = t * rep

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nkv // hb),
        in_specs=[
            pl.BlockSpec((1, hb, tr, hd), lambda i, j, sc: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, hb, s, hd),
                         lambda i, j, sc: (sc[sc.shape[0] - 1], i, j, 0, 0)),
            pl.BlockSpec((1, 1, hb, s, hd),
                         lambda i, j, sc: (sc[sc.shape[0] - 1], i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hb, tr, hd), lambda i, j, sc: (i, j, 0, 0)),
    )
    out = pl.pallas_call(
        partial(_kernel_layered, hb=hb, t=t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nkv, tr, hd), q.dtype),
        interpret=interpret,
    )(scalars, qg, k_full, v_full)
    return _chunk_unrows(out, b, t, nh, hd)


def chunk_attention_layer_tiled(q: jax.Array, k_full: jax.Array,
                                v_full: jax.Array, pos0: jax.Array,
                                layer: jax.Array, *, chunk: int = 256,
                                interpret: bool = False) -> jax.Array:
    """S-tiled ragged chunk attention (see decode_attention_layer_tiled);
    tiles past pos0[b]+T-1 elide their DMAs."""
    b, t, nh, hd = q.shape
    nkv, s = k_full.shape[2], k_full.shape[3]
    rep = nh // nkv
    c = max([d for d in range(8, min(chunk, s) + 1, 8) if s % d == 0],
            default=s)
    nc = s // c
    hb = _pick_heads(nkv, 2 * c * hd * k_full.dtype.itemsize)
    qg = _chunk_rows(q, nkv)
    scalars = jnp.concatenate([pos0.astype(jnp.int32),
                               layer.reshape(1).astype(jnp.int32)])
    tr = t * rep

    def kv_spec():
        def idx(bi, j, p, sc):
            last = jnp.minimum((sc[bi] + t - 1) // c, nc - 1)
            return (sc[sc.shape[0] - 1], bi, j, jnp.minimum(p, last), 0)

        return pl.BlockSpec((1, 1, hb, c, hd), idx)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nkv // hb, nc),
        in_specs=[
            pl.BlockSpec((1, hb, tr, hd), lambda bi, j, p, sc: (bi, j, 0, 0)),
            kv_spec(),
            kv_spec(),
        ],
        out_specs=pl.BlockSpec((1, hb, tr, hd),
                               lambda bi, j, p, sc: (bi, j, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hb, tr, hd), jnp.float32),
            pltpu.VMEM((hb, tr, 128), jnp.float32),
            pltpu.VMEM((hb, tr, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel_tiled, c=c, nc=nc, hb=hb, t=t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nkv, tr, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(scalars, qg, k_full, v_full)
    return _chunk_unrows(out, b, t, nh, hd)


def chunk_attention_layer_q8(q: jax.Array, k8_full: jax.Array,
                             v8_full: jax.Array, ks_full: jax.Array,
                             vs_full: jax.Array, pos0: jax.Array,
                             layer: jax.Array,
                             interpret: bool = False) -> jax.Array:
    """Chunked-query decode_attention_layer_q8 (int8 cache + row scales)."""
    b, t, nh, hd = q.shape
    nkv, s = k8_full.shape[2], k8_full.shape[3]
    rep = nh // nkv
    hb = _pick_heads_q8(nkv, s * (2 * hd + 8))
    qg = _chunk_rows(q, nkv)
    scalars = jnp.concatenate([pos0.astype(jnp.int32),
                               layer.reshape(1).astype(jnp.int32)])
    tr = t * rep

    def li(sc):
        return sc[sc.shape[0] - 1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nkv // hb),
        in_specs=[
            pl.BlockSpec((1, hb, tr, hd), lambda i, j, sc: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, hb, s, hd),
                         lambda i, j, sc: (li(sc), i, j, 0, 0)),
            pl.BlockSpec((1, 1, hb, s, hd),
                         lambda i, j, sc: (li(sc), i, j, 0, 0)),
            pl.BlockSpec((1, 1, hb, s),
                         lambda i, j, sc: (li(sc), i, j, 0)),
            pl.BlockSpec((1, 1, hb, s),
                         lambda i, j, sc: (li(sc), i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, hb, tr, hd), lambda i, j, sc: (i, j, 0, 0)),
    )
    out = pl.pallas_call(
        partial(_kernel_q8, layered=True, hb=hb, t=t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nkv, tr, hd), q.dtype),
        interpret=interpret,
    )(scalars, qg, k8_full, v8_full, ks_full, vs_full)
    return _chunk_unrows(out, b, t, nh, hd)


def chunk_attention_layer_tiled_q8(q: jax.Array, k8_full: jax.Array,
                                   v8_full: jax.Array, ks_full: jax.Array,
                                   vs_full: jax.Array, pos0: jax.Array,
                                   layer: jax.Array, *, chunk: int = 256,
                                   interpret: bool = False) -> jax.Array:
    """S-tiled ragged chunk attention over an int8 cache."""
    b, t, nh, hd = q.shape
    nkv, s = k8_full.shape[2], k8_full.shape[3]
    rep = nh // nkv
    c = max([d for d in range(8, min(chunk, s) + 1, 8) if s % d == 0],
            default=s)
    nc = s // c
    hb = _pick_heads_q8(nkv, c * (2 * hd + 8))
    qg = _chunk_rows(q, nkv)
    scalars = jnp.concatenate([pos0.astype(jnp.int32),
                               layer.reshape(1).astype(jnp.int32)])
    tr = t * rep

    def kv_idx(bi, j, p, sc):
        last = jnp.minimum((sc[bi] + t - 1) // c, nc - 1)
        return (sc[sc.shape[0] - 1], bi, j, jnp.minimum(p, last), 0)

    def sc_idx(bi, j, p, sc):
        last = jnp.minimum((sc[bi] + t - 1) // c, nc - 1)
        return (sc[sc.shape[0] - 1], bi, j, jnp.minimum(p, last))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nkv // hb, nc),
        in_specs=[
            pl.BlockSpec((1, hb, tr, hd), lambda bi, j, p, sc: (bi, j, 0, 0)),
            pl.BlockSpec((1, 1, hb, c, hd), kv_idx),
            pl.BlockSpec((1, 1, hb, c, hd), kv_idx),
            pl.BlockSpec((1, 1, hb, c), sc_idx),
            pl.BlockSpec((1, 1, hb, c), sc_idx),
        ],
        out_specs=pl.BlockSpec((1, hb, tr, hd),
                               lambda bi, j, p, sc: (bi, j, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hb, tr, hd), jnp.float32),
            pltpu.VMEM((hb, tr, 128), jnp.float32),
            pltpu.VMEM((hb, tr, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel_tiled_q8, c=c, nc=nc, hb=hb, t=t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nkv, tr, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(scalars, qg, k8_full, v8_full, ks_full, vs_full)
    return _chunk_unrows(out, b, t, nh, hd)


@partial(jax.jit, static_argnames=("interpret",))
def decode_attention(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                     pos: jax.Array, *, interpret: bool = False) -> jax.Array:
    """q (B, nh, hd); caches (B, nkv, S, hd); pos (B,) int32.

    Returns (B, nh*hd) — softmax(QK^T/sqrt(hd)) V per head, causal to pos[b].
    """
    b, nh, hd = q.shape
    nkv, s = k_cache.shape[1], k_cache.shape[2]
    rep = nh // nkv
    hb = _pick_heads(nkv, 2 * s * hd * k_cache.dtype.itemsize)
    qg = q.reshape(b, nkv, rep, hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nkv // hb),
        in_specs=[
            pl.BlockSpec((1, hb, rep, hd), lambda i, j, pos_ref: (i, j, 0, 0)),
            pl.BlockSpec((1, hb, s, hd), lambda i, j, pos_ref: (i, j, 0, 0)),
            pl.BlockSpec((1, hb, s, hd), lambda i, j, pos_ref: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hb, rep, hd),
                               lambda i, j, pos_ref: (i, j, 0, 0)),
    )
    out = pl.pallas_call(
        partial(_kernel, hb=hb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nkv, rep, hd), q.dtype),
        interpret=interpret,
    )(pos, qg, k_cache, v_cache)
    return out.reshape(b, nh * hd)
