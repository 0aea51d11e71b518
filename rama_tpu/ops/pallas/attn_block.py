"""Fused per-layer attention block: RoPE + KV-cache write + attention + Wo
in ONE layer-indexed pallas_call (Pallas TPU).

At batch 1 the decode step's attention block runs as ~5 device ops per layer
(rope, two cache scatters, the attention kernel, the wo matmul) whose
per-op fixed costs dominate: the device timeline shows ~15 us/layer for
attention against ~1.3 us of cache DMA, ~7 us of wo overhead over its weight
stream, and ~11 us of XLA glue (NEXT.md step breakdown). This kernel folds
them into one call with two phases over a 1-D grid:

  phase B (b * n_groups * nS steps): for each (slot, kv-head group), an
      online-softmax flash loop over S tiles of the cache stripes — tiles
      past pos elide their DMAs by repeating the previous block index. RoPE
      is applied IN KERNEL to the q group and the new k row (interleaved
      pairs via two lane rotations + select — no lane reshape, see
      _rope_lanes); the current position's contribution comes from the
      in-register k/v rows, and the 8-row cache window containing pos is
      rewritten with the new row through the ALIASED cache output (the
      stripe input buffer is donated to the cache output, so the cache is
      updated in place — no scatter op, no copy).
  phase C (nC steps): att @ Wo[layer], streaming quantized wo tiles with
      scales applied to the accumulator partials (transposed-h group dots,
      same scheme as ffn._PHASE_B_ACC's int8/int4 paths).

Numerics match the composed ops exactly up to reduction order (fp32
accumulation throughout; RoPE in fp32).

Parity note: the reference issues rope / cache append / attention / wo as
four separate device ops per layer per token (engine/src/transformer/
infer.rs:25-37); this is their TPU-native fusion.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rama_tpu.ops.quant import QuantizedTensor


def rope_lane_tables(cos_rows: jax.Array, sin_rows: jax.Array):
    """(B, hd/2) cos/sin rows -> (c2, s2s), each (B, hd) f32, the expanded
    lane tables _rope_lanes consumes: c2[2i] = c2[2i+1] = cos[i];
    s2s[2i] = -sin[i], s2s[2i+1] = +sin[i]."""
    b, half = cos_rows.shape
    c2 = jnp.repeat(cos_rows.astype(jnp.float32), 2, axis=-1)
    s2 = jnp.repeat(sin_rows.astype(jnp.float32), 2, axis=-1)
    sign = jnp.tile(jnp.asarray([-1.0, 1.0], jnp.float32), half)
    return c2, s2 * sign


def _rope_lanes(x, c2, s2s):
    """Interleaved-pair RoPE on the 128-lane head dim without any lane
    reshape: out[2i] = x[2i] c[i] - x[2i+1] s[i]; out[2i+1] = x[2i] s[i] +
    x[2i+1] c[i]  ==  x * c2 + swap_adjacent_lanes(x) * s2s, where the lane
    swap is select(even, rotate_left, rotate_right). x (..., hd) f32."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    hd = x.shape[-1]
    xl = pltpu.roll(x, hd - 1, x.ndim - 1)   # y[j] = x[(j+1) % hd]
    xr = pltpu.roll(x, 1, x.ndim - 1)        # y[j] = x[(j-1) % hd]
    swap = jnp.where(lanes % 2 == 0, xl, xr)
    return x * c2 + swap * s2s


def _decode_grid(p, nS: int, gh: int, nB: int):
    """1-D grid position -> (slot, head group, S tile), clamped into phase B."""
    pb = jnp.minimum(p, nB - 1)
    return pb // (gh * nS), (pb // nS) % gh, pb % nS


def _kernel(sc_ref, q_ref, kn_ref, vn_ref, c2_ref, s2s_ref, kc_ref, vc_ref,
            woq_ref, wos_ref, o_ref, kout_ref, vout_ref,
            att_ref, qs_ref, kns_ref, acc_ref, m_ref, l_ref, *,
            b: int, gh: int, nS: int, c: int, hb: int, rep: int, hd: int,
            nB: int, nC: int, gs: int, bits: int, acc_c: bool):
    p = pl.program_id(0)
    bi, j, t = _decode_grid(p, nS, gh, nB)
    pos = sc_ref[bi]
    pt = jnp.minimum(pos // c, nS - 1)     # tile holding the current row
    scale = 1.0 / np.sqrt(hd)

    @pl.when(p < nB)
    def _phase_b():
        # ---- t == 0: rope q and the new k row ONCE into scratch, and fold
        # the current position's (in-register) row into the online softmax
        # as its own chunk, initializing the running state.
        @pl.when(t == 0)
        def _():
            kn = _rope_lanes(kn_ref[0].astype(jnp.float32), c2_ref[0],
                             s2s_ref[0])                         # (hb, hd)
            kns_ref[...] = kn
            vn = vn_ref[0].astype(jnp.float32)                   # (hb, hd)
            for h in range(hb):
                qs_ref[h] = _rope_lanes(q_ref[0, h].astype(jnp.float32),
                                        c2_ref[0], s2s_ref[0])
            if rep == 1:
                q2 = qs_ref[:, 0, :]                             # (hb, hd)
                s_cur = jnp.sum(q2 * kn, axis=-1,
                                keepdims=True) * scale           # (hb, 1)
                m_ref[...] = jnp.broadcast_to(s_cur[:, None], m_ref.shape)
                l_ref[...] = jnp.ones_like(l_ref)
                acc_ref[...] = vn[:, None, :]
            else:
                for h in range(hb):
                    s_cur = jnp.sum(qs_ref[h] * kn[h][None, :], axis=-1,
                                    keepdims=True) * scale       # (rep, 1)
                    m_ref[h] = jnp.broadcast_to(s_cur, m_ref.shape[1:])
                    l_ref[h] = jnp.ones_like(l_ref[h])
                    acc_ref[h] = jnp.broadcast_to(vn[h][None, :],
                                                  acc_ref.shape[1:])

        # ---- masked flash step over this S tile (rows s < pos only; rows
        # >= pos are the stale/garbage region, and steps with t > pt see a
        # repeated (clamped) block whose mask zeroes every contribution)
        if rep == 1:
            # MHA fast path: all hb heads in one 3-D product/reduce (the
            # per-head MXU dots cost more in launch latency at decode sizes)
            g = t * c + jax.lax.broadcasted_iota(jnp.int32, (hb, c), 1)
            mask = g < pos
            q2 = qs_ref[:, 0, :]                                 # (hb, hd)
            k3 = kc_ref[0, 0].astype(jnp.float32)                # (hb, c, hd)
            v3 = vc_ref[0, 0].astype(jnp.float32)
            scores = jnp.sum(q2[:, None, :] * k3, axis=-1) * scale
            scores = jnp.where(mask, scores, -1e30)              # (hb, c)
            m_prev = m_ref[:, 0, :1]
            l_prev = l_ref[:, 0, :1]
            m_new = jnp.maximum(m_prev,
                                jnp.max(scores, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            e = jnp.exp(scores - m_new)                          # (hb, c)
            l_new = alpha * l_prev + jnp.sum(e, axis=-1, keepdims=True)
            pv = jnp.sum(e[:, :, None] * v3, axis=1)             # (hb, hd)
            acc_ref[:, 0, :] = alpha * acc_ref[:, 0, :] + pv
            m_ref[...] = jnp.broadcast_to(m_new[:, None], m_ref.shape)
            l_ref[...] = jnp.broadcast_to(l_new[:, None], l_ref.shape)
        else:
            g = t * c + jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
            mask = g < pos                                       # (1, c)
            for h in range(hb):
                qh = qs_ref[h]                                   # (rep, hd)
                k = kc_ref[0, 0, h].astype(jnp.float32)          # (c, hd)
                v = vc_ref[0, 0, h].astype(jnp.float32)
                scores = jax.lax.dot_general(
                    qh, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale  # (rep, c)
                scores = jnp.where(mask, scores, -1e30)
                m_prev = m_ref[h][:, :1]
                l_prev = l_ref[h][:, :1]
                m_new = jnp.maximum(m_prev,
                                    jnp.max(scores, axis=-1, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)
                e = jnp.exp(scores - m_new)                      # (rep, c)
                l_new = alpha * l_prev + jnp.sum(e, axis=-1, keepdims=True)
                pv = jax.lax.dot_general(
                    e, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_ref[h] = alpha * acc_ref[h] + pv
                m_ref[h] = jnp.broadcast_to(m_new, m_ref.shape[1:])
                l_ref[h] = jnp.broadcast_to(l_new, l_ref.shape[1:])

        # ---- t == pt: rewrite the 8-row cache window holding position pos
        # (the aliased cache output) with the roped k / raw v rows
        @pl.when(t == pt)
        def _():
            w0 = (pos % c) // 8 * 8          # window start inside this tile
            ri = jax.lax.broadcasted_iota(jnp.int32, (8, hd), 0)
            sel = ri == pos % 8
            for h in range(hb):
                oldk = kc_ref[0, 0, h, pl.ds(w0, 8), :]
                oldv = vc_ref[0, 0, h, pl.ds(w0, 8), :]
                kout_ref[0, 0, h] = jnp.where(
                    sel, kns_ref[h][None, :], oldk.astype(jnp.float32)
                ).astype(kout_ref.dtype)
                vout_ref[0, 0, h] = jnp.where(
                    sel, vn_ref[0, h].astype(jnp.float32)[None, :],
                    oldv.astype(jnp.float32)).astype(vout_ref.dtype)

        # ---- t == nS-1 (the group's final step — always runs): normalize
        # and park this group's output in the att scratch for phase C
        @pl.when(t == nS - 1)
        def _():
            for h in range(hb):
                out = (acc_ref[h] / l_ref[h][:, :1])             # (rep, hd)
                base = (j * hb + h) * rep * hd
                for r in range(rep):
                    row = out[r:r + 1].astype(att_ref.dtype)     # (1, hd)
                    if acc_c:
                        # acc_c implies b == 1: the lane index must be a
                        # static multiple of 128 (Mosaic), so only slot 0
                        att_ref[pl.ds(base + r * hd, hd), 0:1] = row.T
                    else:
                        # dynamic sublane stores must be aligned; select the
                        # slot row instead (read-modify-write over all b)
                        old = att_ref[:, pl.ds(base + r * hd, hd)]
                        ri = jax.lax.broadcasted_iota(
                            jnp.int32, (b, hd), 0)
                        att_ref[:, pl.ds(base + r * hd, hd)] = jnp.where(
                            ri == bi, jnp.broadcast_to(row, (b, hd)), old)

    @pl.when(p >= nB)
    def _phase_c():
        jc = p - nB
        woq = woq_ref[0]                    # (D/kp, bn)
        wos = wos_ref[0].astype(jnp.float32)  # (D/gs, bn)
        bn = woq.shape[-1]
        d = att_ref.shape[0] if acc_c else att_ref.shape[1]
        acc = jnp.zeros((b, bn), jnp.float32)
        # weights convert to f32 PER GROUP: a whole-block (d, bn) f32
        # temp is a 16 MB scoped-VMEM stack allocation at 7B shapes
        if acc_c and bits == 8:
            for gidx in range(d // gs):
                r = slice(gidx * gs, (gidx + 1) * gs)
                hj = att_ref[r, :].astype(jnp.float32)           # (gs, B)
                acc += jax.lax.dot_general(
                    hj, woq[r].astype(jnp.float32), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * wos[gidx]
        elif acc_c:
            for b2 in range(d // (2 * gs)):
                p32 = woq[b2 * gs:(b2 + 1) * gs].astype(jnp.int32)  # (gs, bn)
                lo = ((p32 << 28) >> 28).astype(jnp.float32)
                hi = (p32 >> 4).astype(jnp.float32)
                hlo = att_ref[pl.ds(2 * b2 * gs, gs), :].astype(jnp.float32)
                hhi = att_ref[pl.ds((2 * b2 + 1) * gs, gs), :].astype(jnp.float32)
                acc += jax.lax.dot_general(
                    hlo, lo, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * wos[2 * b2]
                acc += jax.lax.dot_general(
                    hhi, hi, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * wos[2 * b2 + 1]
        else:
            # plain layout: dequantize the wo tile in VMEM and dot
            from rama_tpu.ops.pallas.quant_matmul import dequant_int8

            x = att_ref[...].astype(jnp.float32)                 # (B, D)
            if bits == 8:
                w = dequant_int8(woq, wos, gs)
                acc += jnp.dot(x, w, preferred_element_type=jnp.float32)
            else:
                # value-side lane reshapes don't legalize, so the planes are
                # re-interleaved weight-side (dequant-in-VMEM, _dequant4)
                from rama_tpu.ops.pallas.ffn import _dequant4

                w = _dequant4(woq, wos, gs, jnp.float32)
                acc += jnp.dot(x, w, preferred_element_type=jnp.float32)
        o_ref[...] = acc.astype(o_ref.dtype)


def _kernel_aw(sc_ref, q_ref, kn_ref, vn_ref, c2_ref, s2s_ref, kc_ref,
               vc_ref, o_ref, kout_ref, vout_ref,
               qs_ref, kns_ref, acc_ref, m_ref, l_ref, *,
               nS: int, c: int, hb: int, rep: int, hd: int):
    """Light fusion: rope + cache-window write + flash attention (no wo).

    Same phase-B math as _kernel, but on a 3-D (b, head group, S tile) grid
    with the full standalone-attention head budget (the wo fusion's tighter
    VMEM budget forced hb=8 and measured ~5% SLOWER end-to-end than unfused;
    see attn_block_layered's docstring). Output is the (1, hb, rep, hd)
    attention block per group — no att scratch, no dynamic stores.
    """
    bi = pl.program_id(0)
    t = pl.program_id(2)
    pos = sc_ref[bi]
    pt = jnp.minimum(pos // c, nS - 1)
    scale = 1.0 / np.sqrt(hd)

    @pl.when(t == 0)
    def _():
        kn = _rope_lanes(kn_ref[0].astype(jnp.float32), c2_ref[0],
                         s2s_ref[0])                         # (hb, hd)
        kns_ref[...] = kn
        vn = vn_ref[0].astype(jnp.float32)                   # (hb, hd)
        if rep == 1:
            # rope ALL heads in one vectorized pass (a per-head loop of
            # roll/select chains measured as real per-layer overhead)
            q2 = _rope_lanes(q_ref[0, :, 0, :].astype(jnp.float32),
                             c2_ref[0], s2s_ref[0])          # (hb, hd)
            qs_ref[:, 0, :] = q2
            s_cur = jnp.sum(q2 * kn, axis=-1, keepdims=True) * scale
            m_ref[...] = jnp.broadcast_to(s_cur[:, None], m_ref.shape)
            l_ref[...] = jnp.ones_like(l_ref)
            acc_ref[...] = vn[:, None, :]
        else:
            for h in range(hb):
                qs_ref[h] = _rope_lanes(q_ref[0, h].astype(jnp.float32),
                                        c2_ref[0], s2s_ref[0])
                s_cur = jnp.sum(qs_ref[h] * kn[h][None, :], axis=-1,
                                keepdims=True) * scale
                m_ref[h] = jnp.broadcast_to(s_cur, m_ref.shape[1:])
                l_ref[h] = jnp.ones_like(l_ref[h])
                acc_ref[h] = jnp.broadcast_to(vn[h][None, :],
                                              acc_ref.shape[1:])

    if rep == 1:
        g = t * c + jax.lax.broadcasted_iota(jnp.int32, (hb, c), 1)
        mask = g < pos
        q2 = qs_ref[:, 0, :]
        k3 = kc_ref[0, 0].astype(jnp.float32)
        v3 = vc_ref[0, 0].astype(jnp.float32)
        scores = jnp.sum(q2[:, None, :] * k3, axis=-1) * scale
        scores = jnp.where(mask, scores, -1e30)
        m_prev = m_ref[:, 0, :1]
        l_prev = l_ref[:, 0, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        e = jnp.exp(scores - m_new)
        l_new = alpha * l_prev + jnp.sum(e, axis=-1, keepdims=True)
        pv = jnp.sum(e[:, :, None] * v3, axis=1)
        acc_ref[:, 0, :] = alpha * acc_ref[:, 0, :] + pv
        m_ref[...] = jnp.broadcast_to(m_new[:, None], m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new[:, None], l_ref.shape)
    else:
        g = t * c + jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
        mask = g < pos
        for h in range(hb):
            qh = qs_ref[h]
            k = kc_ref[0, 0, h].astype(jnp.float32)
            v = vc_ref[0, 0, h].astype(jnp.float32)
            scores = jax.lax.dot_general(
                qh, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            scores = jnp.where(mask, scores, -1e30)
            m_prev = m_ref[h][:, :1]
            l_prev = l_ref[h][:, :1]
            m_new = jnp.maximum(m_prev,
                                jnp.max(scores, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            e = jnp.exp(scores - m_new)
            l_new = alpha * l_prev + jnp.sum(e, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                e, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[h] = alpha * acc_ref[h] + pv
            m_ref[h] = jnp.broadcast_to(m_new, m_ref.shape[1:])
            l_ref[h] = jnp.broadcast_to(l_new, l_ref.shape[1:])

    @pl.when(t == pt)
    def _():
        w0 = (pos % c) // 8 * 8
        ri = jax.lax.broadcasted_iota(jnp.int32, (1, 8, hd), 1)
        sel = ri == pos % 8
        oldk = kc_ref[0, 0, :, pl.ds(w0, 8), :].astype(jnp.float32)
        oldv = vc_ref[0, 0, :, pl.ds(w0, 8), :].astype(jnp.float32)
        kout_ref[0, 0] = jnp.where(sel, kns_ref[...][:, None, :],
                                   oldk).astype(kout_ref.dtype)
        vout_ref[0, 0] = jnp.where(
            sel, vn_ref[0].astype(jnp.float32)[:, None, :],
            oldv).astype(vout_ref.dtype)

    @pl.when(t == nS - 1)
    def _():
        o_ref[0] = (acc_ref[...] / l_ref[:, :, :1]).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("chunk", "interpret"))
def attn_rope_write_layered(q: jax.Array, k_new: jax.Array, v_new: jax.Array,
                            cos_rows: jax.Array, sin_rows: jax.Array,
                            k_full: jax.Array, v_full: jax.Array,
                            pos: jax.Array, layer: jax.Array, *,
                            chunk: int = 256, interpret: bool = False):
    """RoPE + in-place cache write + flash decode attention in one call.

    q (B, nh, hd), k_new/v_new (B, nkv, hd) UN-roped; cos_rows/sin_rows
    (B, hd/2) RoPE rows at pos. k_full/v_full (L, B, nkv, S, hd) are donated
    and updated in place at row pos. Returns (att (B, nh*hd), k_full',
    v_full'). The caller applies wo (the standalone quant matmul keeps its
    full tiling budget — fusing it in measured slower, see _kernel_aw).
    """
    b, nh, hd = q.shape
    nkv, s = k_full.shape[2], k_full.shape[3]
    rep = nh // nkv
    c = max([x for x in range(8, min(chunk, s) + 1, 8) if s % x == 0],
            default=s)
    nS = s // c
    from rama_tpu.ops.pallas.decode_attention import _pick_heads

    hb = _pick_heads(nkv, 2 * c * hd * k_full.dtype.itemsize)
    gh = nkv // hb
    qg = q.reshape(b, nkv, rep, hd)
    c2, s2s = rope_lane_tables(cos_rows, sin_rows)
    scalars = jnp.concatenate([pos.astype(jnp.int32),
                               layer.reshape(1).astype(jnp.int32)])
    li = lambda sc: sc[sc.shape[0] - 1]

    def stripe_idx(bi, j, t, sc):
        pt = jnp.minimum(sc[bi] // c, nS - 1)
        return (li(sc), bi, j, jnp.minimum(t, pt), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, gh, nS),
        in_specs=[
            pl.BlockSpec((1, hb, rep, hd), lambda bi, j, t, sc: (bi, j, 0, 0)),
            pl.BlockSpec((1, hb, hd), lambda bi, j, t, sc: (bi, j, 0)),
            pl.BlockSpec((1, hb, hd), lambda bi, j, t, sc: (bi, j, 0)),
            pl.BlockSpec((1, 1, hd), lambda bi, j, t, sc: (bi, 0, 0)),
            pl.BlockSpec((1, 1, hd), lambda bi, j, t, sc: (bi, 0, 0)),
            pl.BlockSpec((1, 1, hb, c, hd), stripe_idx),
            pl.BlockSpec((1, 1, hb, c, hd), stripe_idx),
        ],
        out_specs=[
            pl.BlockSpec((1, hb, rep, hd),
                         lambda bi, j, t, sc: (bi, j, 0, 0)),
            pl.BlockSpec((1, 1, hb, 8, hd),
                         lambda bi, j, t, sc: (li(sc), bi, j, sc[bi] // 8, 0)),
            pl.BlockSpec((1, 1, hb, 8, hd),
                         lambda bi, j, t, sc: (li(sc), bi, j, sc[bi] // 8, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((hb, rep, hd), jnp.float32),                 # roped q
            pltpu.VMEM((hb, hd), jnp.float32),                      # roped k
            pltpu.VMEM((hb, rep, hd), jnp.float32),                 # acc
            pltpu.VMEM((hb, rep, 128), jnp.float32),                # m
            pltpu.VMEM((hb, rep, 128), jnp.float32),                # l
        ],
    )
    # flattened operands: 0 scalars, 1 q, 2 kn, 3 vn, 4 c2, 5 s2s,
    # 6 k_full, 7 v_full; cache donated to outputs 1/2
    att, k_out, v_out = pl.pallas_call(
        partial(_kernel_aw, nS=nS, c=c, hb=hb, rep=rep, hd=hd),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, nkv, rep, hd), q.dtype),
            jax.ShapeDtypeStruct(k_full.shape, k_full.dtype),
            jax.ShapeDtypeStruct(v_full.shape, v_full.dtype),
        ],
        input_output_aliases={6: 1, 7: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(scalars, qg, k_new, v_new, c2[:, None], s2s[:, None], k_full, v_full)
    return att.reshape(b, nh * hd), k_out, v_out


def attn_block_supported(cfg_like, wo, s: int, b: int) -> bool:
    """Whether the fused block applies: quantized wo with lane-aligned
    tiles, 128-lane head dim, 8-aligned cache, int8/int4."""
    if not isinstance(wo, QuantizedTensor):
        return False
    d, n = wo.shape[-2], wo.shape[-1]
    if n % 128 or d % (2 * wo.group_size if wo.bits == 4 else wo.group_size):
        return False
    return s % 8 == 0 and b <= 32


@partial(jax.jit, static_argnames=("chunk", "acc_c", "interpret"))
def attn_block_layered(q: jax.Array, k_new: jax.Array, v_new: jax.Array,
                       cos_rows: jax.Array, sin_rows: jax.Array,
                       k_full: jax.Array, v_full: jax.Array,
                       wo: QuantizedTensor, pos: jax.Array, layer: jax.Array,
                       *, chunk: int = 256, acc_c: bool = True,
                       interpret: bool = False):
    """One fused attention block for layer `layer` of the stacked caches.

    q (B, nh, hd) and k_new/v_new (B, nkv, hd) are the UN-roped projection
    outputs; cos_rows/sin_rows (B, hd/2) are the RoPE table rows at pos.
    k_full/v_full (L, B, nkv, S, hd) are DONATED and updated in place
    (row pos of each (slot, head) stripe). Returns
    (attn_out (B, nh*hd) = attention @ wo[layer], k_full', v_full').
    Under TP, operands are the local shard and the caller psums attn_out.
    """
    b, nh, hd = q.shape
    # the transposed-att phase C needs a static 128-aligned lane index for
    # its per-head stores — only provable at b == 1 (slot column 0)
    acc_c = acc_c and b == 1
    nkv, s = k_full.shape[2], k_full.shape[3]
    rep = nh // nkv
    d, n = wo.shape[-2], wo.shape[-1]
    gs = wo.group_size
    kp = 1 if wo.bits == 8 else 2
    c = max([x for x in range(8, min(chunk, s) + 1, 8) if s % x == 0],
            default=s)
    nS = s // c
    from rama_tpu.ops.pallas.decode_attention import _pick_heads

    # tighter head budget than the standalone attention kernels: this call
    # also double-buffers wo tiles and holds the att scratch + f32 stripe
    # temps (16.14 MB scoped-VMEM OOM at hb=16 with 7B shapes)
    hb = _pick_heads(nkv, 2 * c * hd * k_full.dtype.itemsize,
                     budget=3 << 20)
    gh = nkv // hb
    # bn bounds phase C's stack temps (per-group f32 converts ~ gs*bn;
    # the dequant fallback materializes a (d, bn) f32 block)
    bn_cap = 512 if acc_c else 256
    bn = max([x for x in range(128, min(bn_cap, n) + 1, 128) if n % x == 0],
             default=n)
    nC = n // bn
    nB = b * gh * nS
    qg = q.reshape(b, nkv, rep, hd)
    c2, s2s = rope_lane_tables(cos_rows, sin_rows)
    scalars = jnp.concatenate([pos.astype(jnp.int32),
                               layer.reshape(1).astype(jnp.int32)])
    li = lambda sc: sc[sc.shape[0] - 1]

    def bjt(p, sc):
        return _decode_grid(p, nS, gh, nB)

    def q_idx(p, sc):
        bi, j, _ = bjt(p, sc)
        return (bi, j, 0, 0)

    def kn_idx(p, sc):
        bi, j, _ = bjt(p, sc)
        return (bi, j, 0)

    def rope_idx(p, sc):
        bi, _, _ = bjt(p, sc)
        return (bi, 0, 0)

    def stripe_idx(p, sc):
        bi, j, t = bjt(p, sc)
        pt = jnp.minimum(sc[bi] // c, nS - 1)
        return (li(sc), bi, j, jnp.minimum(t, pt), 0)

    def win_idx(p, sc):
        bi, j, _ = bjt(p, sc)
        return (li(sc), bi, j, sc[bi] // 8, 0)

    def wo_idx(p, sc):
        return (li(sc), 0, jnp.clip(p - nB, 0, nC - 1))

    def out_idx(p, sc):
        return (0, jnp.clip(p - nB, 0, nC - 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nB + nC,),
        in_specs=[
            pl.BlockSpec((1, hb, rep, hd), q_idx),
            pl.BlockSpec((1, hb, hd), kn_idx),
            pl.BlockSpec((1, hb, hd), kn_idx),
            # (B, 1, hd) so the block's last two dims equal the array's
            # (Mosaic requires (8, 128)-divisible or full trailing dims)
            pl.BlockSpec((1, 1, hd), rope_idx),
            pl.BlockSpec((1, 1, hd), rope_idx),
            pl.BlockSpec((1, 1, hb, c, hd), stripe_idx),
            pl.BlockSpec((1, 1, hb, c, hd), stripe_idx),
            pl.BlockSpec((1, d // kp, bn), wo_idx),
            pl.BlockSpec((1, d // gs, bn), wo_idx),
        ],
        out_specs=[
            pl.BlockSpec((b, bn), out_idx),
            pl.BlockSpec((1, 1, hb, 8, hd), win_idx),
            pl.BlockSpec((1, 1, hb, 8, hd), win_idx),
        ],
        scratch_shapes=[
            # att parks in f32: bf16's (2, 1) sublane packing makes the
            # per-slot dynamic sublane store unprovable for Mosaic, and the
            # extra read in phase C is b*d*2 bytes — noise
            pltpu.VMEM((d, b) if acc_c else (b, d), jnp.float32),   # att
            pltpu.VMEM((hb, rep, hd), jnp.float32),                 # roped q
            pltpu.VMEM((hb, hd), jnp.float32),                      # roped k
            pltpu.VMEM((hb, rep, hd), jnp.float32),                 # acc
            pltpu.VMEM((hb, rep, 128), jnp.float32),                # m
            pltpu.VMEM((hb, rep, 128), jnp.float32),                # l
        ],
    )
    # operand order (flattened, incl. the scalar-prefetch array at 0):
    # 1 q, 2 kn, 3 vn, 4 c2, 5 s2s, 6 k_full, 7 v_full, 8 woq, 9 wos.
    # The cache operands are donated to outputs 1/2 — updated in place.
    attn_out, k_out, v_out = pl.pallas_call(
        partial(_kernel, b=b, gh=gh, nS=nS, c=c, hb=hb, rep=rep, hd=hd,
                nB=nB, nC=nC, gs=gs, bits=wo.bits, acc_c=acc_c),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, n), q.dtype),
            jax.ShapeDtypeStruct(k_full.shape, k_full.dtype),
            jax.ShapeDtypeStruct(v_full.shape, v_full.dtype),
        ],
        input_output_aliases={6: 1, 7: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(scalars, qg, k_new, v_new, c2[:, None], s2s[:, None], k_full, v_full,
      wo.q, wo.scales)
    return attn_out, k_out, v_out
