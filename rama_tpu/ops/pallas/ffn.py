"""Fused SwiGLU FFN Pallas kernel: (silu(x@W1) * (x@W3)) @ W2 in ONE dispatch.

The decode step is HBM-bound and pays a fixed kernel-boundary cost per op
(profiled ~23 us at batch 1); the reference pays the same shape of cost as
three separate cuBLAS/CUDA launches per FFN (engine/src/device/gpu.rs:175-189
issues w1, w3, w2 as independent matmuls with host-side silu glue). Here the
whole FFN is one pallas_call over stacked per-layer quantized weights:

  phase A (steps 0..nh-1):  h[:, j*bh:(j+1)*bh] = silu(x@W1_j) * (x@W3_j)
                            with the hidden activation resident in VMEM
                            scratch -- never written to HBM;
  phase B (steps nh..nh+nn-1): out[:, t] = h @ W2[:, t], contracting the
                            full hidden dim from scratch.

Weight blocks are selected by scalar-prefetched index maps (layer straight
from HBM, no per-layer copy); phase-A blocks repeat their last index during
phase B (and vice versa), so their DMAs are elided and every weight byte is
streamed exactly once per step.

Two w13 column layouts are supported (QuantizedTensor.il):
  plain  [W1 | W3]: W1_j and W3_j are nh*bh columns apart — two (K, bh)
         weight DMAs per phase-A step;
  interleaved [W1_0 W3_0 W1_1 W3_1 ...] (il == bh): one contiguous
         (K, 2*bh) DMA per step — twice the DMA grain, same bytes (HBM
         streams run measurably closer to the copy floor at >=1 MB blocks).
fuse_params interleaves automatically when the fused kernel applies.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rama_tpu.ops.pallas.quant_matmul import (_dot_dtype, dequant_int8,
                                              dequant_int4_planes)
from rama_tpu.ops.quant import QuantizedTensor

# Benchmark hook: force the dequant-in-VMEM phase A even at decode M
# (tools/bench_ffn.py measures accscale vs dequant on the device timeline).
_FORCE_DEQUANT = False

# Accscale phase B: phase A stores the hidden activation TRANSPOSED
# ((bh, M) tiles), so phase B can slice whole scale groups on the sublane
# dim and apply w2's scales to the (M, bn) partials — no dequantized w2
# tile and, for int4, no nibble-interleave concat. Costs one (M, bh)
# transpose per phase-A step and a lane-padded scratch ((bh, M) tiles pad
# M up to a 128-lane tile). Measured on v5e (tools/bench_ffn.py, 7B decode
# shapes): neutral for int8 (183.4 vs 183.3 us), ~2% WORSE for int4
# (116.0 vs 113.9 us — the transpose costs more than the concat saves), so
# it stays off. Phase-A accscale itself is the win: int4 126.5 -> 114.2 us.
_PHASE_B_ACC = False


def phase_a_tile(h: int, bits: int, gs2: int) -> int | None:
    """The phase-A hidden tile bh — shared between the kernel and
    fuse_params' interleaved-w13 layout so the two always agree."""
    mult = 2 * gs2 if bits == 4 else gs2
    return _pick_tile(h, 256, int(np.lcm(mult, 128)))


def _dequant4(packed, scales, gs: int, dot_dtype):
    """Block-local packed int4 (K//2, N) + (K//gs, N) f32 -> (K, N), planes
    interleaved back into logical row order (phase B's h scratch is in
    natural hidden order, so the plane-dot trick doesn't apply there)."""
    k2, n = packed.shape
    nb = k2 // gs
    wlo, whi = dequant_int4_planes(packed, scales, gs, jnp.float32)
    w = jnp.concatenate(
        [wlo.reshape(nb, 1, gs, n), whi.reshape(nb, 1, gs, n)], axis=1)
    w = w.reshape(k2 * 2, n)
    return w if dot_dtype == jnp.float32 else w.astype(dot_dtype)


def _acc_dots(xlo_ref, xhi_ref, q, s, gs: int):
    """Accscale matmul for one packed-int4 weight block q (bk2, bn): per-group
    dots of raw nibbles, scales applied to the (M, bn) partials (exact
    numerics; see quant_matmul._kernel_int4_acc). x planes arrive pre-grouped
    (groups, M, gs)."""
    p32 = q.astype(jnp.int32)
    bk2, bn = p32.shape
    nb = bk2 // gs
    lo = ((p32 << 28) >> 28).astype(jnp.float32)
    hi = (p32 >> 4).astype(jnp.float32)
    # bf16-stored scales upcast in VMEM (same convention as dequant_int8)
    sg = s.astype(jnp.float32).reshape(nb, 2, bn)
    acc = jnp.zeros((xlo_ref.shape[1], bn), jnp.float32)
    for g in range(nb):
        rows = slice(g * gs, (g + 1) * gs)
        plo = jnp.dot(xlo_ref[g].astype(jnp.float32), lo[rows],
                      preferred_element_type=jnp.float32)
        phi = jnp.dot(xhi_ref[g].astype(jnp.float32), hi[rows],
                      preferred_element_type=jnp.float32)
        acc += plo * sg[g, 0] + phi * sg[g, 1]
    return acc


def _acc_dots8(xg_ref, q, s, gs: int):
    """Accscale matmul for one int8 weight block q (bk, bn): per-group dots
    of raw (converted, unscaled) int8 rows, scales applied to the (M, bn)
    partials (exact numerics; see quant_matmul._kernel_int8_acc). x arrives
    pre-grouped (groups, M, gs)."""
    w = q.astype(jnp.float32)
    s = s.astype(jnp.float32)  # bf16-stored scales upcast in VMEM
    nb = w.shape[0] // gs
    acc = jnp.zeros((xg_ref.shape[1], q.shape[-1]), jnp.float32)
    for g in range(nb):
        acc += jnp.dot(xg_ref[g].astype(jnp.float32),
                       w[g * gs:(g + 1) * gs],
                       preferred_element_type=jnp.float32) * s[g]
    return acc


def _dotg0(a, b):
    """(gs, M) x (gs, bn) -> (M, bn): contract dim 0 of both (the MXU takes
    the lhs transpose for free via dot_general dimension numbers)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel(l_ref, *refs, gs13: int, gs2: int, nh: int, nn: int, bh: int,
            bits: int, out_dtype, dot_dtype, acc_mode: bool, il: bool,
            acc_b: bool):
    nx = 1 if bits == 8 else 2
    xrefs = refs[:nx]
    if il:
        q13_ref, s13_ref, q2_ref, s2_ref, o_ref, h_ref = refs[nx:]
    else:
        (q1_ref, s1_ref, q3_ref, s3_ref, q2_ref, s2_ref,
         o_ref, h_ref) = refs[nx:]
    p = pl.program_id(0)
    kpack = 1 if bits == 8 else 2

    @pl.when(p < nh)
    def _():
        if il:
            q13, s13 = q13_ref[0], s13_ref[0]
            q1, q3 = q13[:, :bh], q13[:, bh:]
            s1, s3 = s13[:, :bh], s13[:, bh:]
        else:
            q1, q3 = q1_ref[0], q3_ref[0]
            s1, s3 = s1_ref[0], s3_ref[0]
        if bits == 8 and acc_mode:
            # decode: x pre-grouped (nb, M, gs); scales on partials
            a = _acc_dots8(xrefs[0], q1, s1, gs13)
            c = _acc_dots8(xrefs[0], q3, s3, gs13)
        elif bits == 8:
            x = xrefs[0][...].astype(dot_dtype)         # (M, K)
            a = jnp.dot(x, dequant_int8(q1, s1, gs13, dot_dtype),
                        preferred_element_type=jnp.float32)  # (M, bh)
            c = jnp.dot(x, dequant_int8(q3, s3, gs13, dot_dtype),
                        preferred_element_type=jnp.float32)
        elif acc_mode:
            # decode: x planes pre-grouped (nb, M, gs); scales on partials
            a = _acc_dots(xrefs[0], xrefs[1], q1, s1, gs13)
            c = _acc_dots(xrefs[0], xrefs[1], q3, s3, gs13)
        else:
            xlo = xrefs[0][...].astype(dot_dtype)       # (M, K//2)
            xhi = xrefs[1][...].astype(dot_dtype)
            w1lo, w1hi = dequant_int4_planes(q1, s1, gs13, dot_dtype)
            w3lo, w3hi = dequant_int4_planes(q3, s3, gs13, dot_dtype)
            a = (jnp.dot(xlo, w1lo, preferred_element_type=jnp.float32)
                 + jnp.dot(xhi, w1hi, preferred_element_type=jnp.float32))
            c = (jnp.dot(xlo, w3lo, preferred_element_type=jnp.float32)
                 + jnp.dot(xhi, w3hi, preferred_element_type=jnp.float32))
        o = (a * jax.lax.logistic(a) * c).astype(jnp.bfloat16)
        h_ref[p] = o.T if acc_b else o

    @pl.when(p >= nh)
    def _():
        acc = jnp.zeros(o_ref.shape, jnp.float32)
        # static unroll over the hidden tiles resident in scratch: static
        # slice offsets keep Mosaic's sublane alignment rules trivially met
        for j in range(nh):
            qs = q2_ref[0, j * (bh // kpack):(j + 1) * (bh // kpack)]
            ss = s2_ref[0, j * (bh // gs2):(j + 1) * (bh // gs2)]
            if acc_b and bits == 8:
                # h is transposed (bh, M): per-group dots of raw int8 rows,
                # scales applied to the (M, bn) partials
                hj = h_ref[j].astype(jnp.float32)
                w = qs.astype(jnp.float32)
                for g in range(bh // gs2):
                    r = slice(g * gs2, (g + 1) * gs2)
                    acc += _dotg0(hj[r], w[r]) * ss[g]
            elif acc_b:
                # int4: the two nibble planes of a 2*gs packing block dot
                # against their contiguous gs-run of transposed h rows —
                # no interleave concat, scales on the partials
                hj = h_ref[j].astype(jnp.float32)
                p32 = qs.astype(jnp.int32)
                lo = ((p32 << 28) >> 28).astype(jnp.float32)
                hi = (p32 >> 4).astype(jnp.float32)
                for b2 in range(bh // (2 * gs2)):
                    br = slice(b2 * gs2, (b2 + 1) * gs2)
                    acc += _dotg0(hj[2 * b2 * gs2:(2 * b2 + 1) * gs2],
                                  lo[br]) * ss[2 * b2]
                    acc += _dotg0(hj[(2 * b2 + 1) * gs2:(2 * b2 + 2) * gs2],
                                  hi[br]) * ss[2 * b2 + 1]
            else:
                w2j = (dequant_int8(qs, ss, gs2, dot_dtype) if bits == 8
                       else _dequant4(qs, ss, gs2, dot_dtype))
                acc += jnp.dot(h_ref[j].astype(dot_dtype), w2j,
                               preferred_element_type=jnp.float32)
        o_ref[...] = acc.astype(out_dtype)


def _pick_tile(dim: int, target: int, multiple: int) -> int | None:
    best = None
    b = multiple
    while b <= min(dim, target):
        if dim % b == 0:
            best = b
        b += multiple
    return best


def ffn_tileable(w13: QuantizedTensor, w2: QuantizedTensor,
                 max_m: int = 64) -> bool:
    """Whether the fused kernel supports these stacked (L, K, 2H)/(L, H, N)
    quantized weights (tiles exist, packing blocks align, VMEM fits)."""
    if not (isinstance(w13, QuantizedTensor) and isinstance(w2, QuantizedTensor)):
        return False
    if w13.bits != w2.bits:
        return False
    h2, n = w13.shape[-1], w2.shape[-1]
    k, h = w13.shape[-2], w2.shape[-2]
    if h2 != 2 * h:
        return False
    gs13, gs2 = w13.group_size, w2.group_size
    bh = phase_a_tile(h, w13.bits, gs2)
    bn = _pick_tile(n, 512 if w13.bits == 4 else 256, 128)
    if bh is None or bn is None:
        return False
    if w13.il and w13.il != bh:
        return False
    if k % gs13 or h % gs2:
        return False
    # VMEM: double-buffered weight blocks + h scratch + x, under ~12 MB
    wbytes = 1 if w13.bits == 8 else 0.5
    vmem = (4 * k * bh * wbytes            # q1 + q3, double buffered
            + 2 * h * bn * wbytes          # q2, double buffered
            + 4 * (k // gs13) * bh * 4 + 2 * (h // gs2) * bn * 4
            + (h // bh) * max(16, max_m) * bh * 2
            + max_m * k * 2)
    return vmem < 12 * 1024 * 1024


def ffn_fused_layered(x: jax.Array, w13: QuantizedTensor, w2: QuantizedTensor,
                      layer: jax.Array, *, interpret: bool = False) -> jax.Array:
    """x (M, K) -> (silu(x@W1[l]) * (x@W3[l])) @ W2[l], one pallas_call.

    w13: stacked fused up-projection (L, K, 2H) — plain [W1 | W3] columns or
    the tile-interleaved layout (w13.il == bh, the layout fuse_params
    produces when this kernel applies); w2: (L, H, N).
    """
    m, k = x.shape
    # the variant flags resolve OUTSIDE the jitted impl (a module global
    # read inside a traced body would be baked into a stale jit cache)
    acc_mode = m <= 32 and (k // w13.group_size) <= 96 and not _FORCE_DEQUANT
    acc_b = _PHASE_B_ACC and m <= 32
    return _ffn_fused_impl(x, w13, w2, layer, interpret=interpret,
                           acc_mode=acc_mode, acc_b=acc_b)


@partial(jax.jit, static_argnames=("interpret", "acc_mode", "acc_b"))
def _ffn_fused_impl(x: jax.Array, w13: QuantizedTensor, w2: QuantizedTensor,
                    layer: jax.Array, *, interpret: bool, acc_mode: bool,
                    acc_b: bool) -> jax.Array:
    m, k = x.shape
    h = w2.shape[-2]
    n = w2.shape[-1]
    gs13, gs2 = w13.group_size, w2.group_size
    bits = w13.bits
    kpack = 1 if bits == 8 else 2
    bh = phase_a_tile(h, bits, gs2)
    assert bh is not None, \
        "ffn_fused_layered called on untileable shapes (use ffn_tileable)"
    assert not w13.il or w13.il == bh, \
        f"w13 interleave tile {w13.il} != kernel phase-A tile {bh}"
    il = bool(w13.il)
    bn = _pick_tile(n, 512 if bits == 4 else 256, 128)
    nh, nn = h // bh, n // bn    # w13 column blocks: W3 starts at block nh
    if bits == 8 and acc_mode:
        from rama_tpu.ops.pallas.quant_matmul import _group_x

        nbt = k // gs13
        x_specs = [pl.BlockSpec((nbt, m, gs13), lambda p, sc: (0, 0, 0))]
        x_ops = (_group_x(x, gs13),)
    elif bits == 8:
        x_specs = [pl.BlockSpec((m, k), lambda p, sc: (0, 0))]
        x_ops = (x,)
    elif acc_mode:
        from rama_tpu.ops.pallas.quant_matmul import _group_x_planes

        nbt = k // (2 * gs13)
        x_specs = [pl.BlockSpec((nbt, m, gs13), lambda p, sc: (0, 0, 0)),
                   pl.BlockSpec((nbt, m, gs13), lambda p, sc: (0, 0, 0))]
        x_ops = _group_x_planes(x, gs13)
    else:
        from rama_tpu.ops.pallas.quant_matmul import _split_x_planes

        x_specs = [pl.BlockSpec((m, k // 2), lambda p, sc: (0, 0)),
                   pl.BlockSpec((m, k // 2), lambda p, sc: (0, 0))]
        x_ops = _split_x_planes(x, gs13)

    if il:
        # one contiguous (K, 2*bh) w13 block per phase-A step
        w_specs = [
            pl.BlockSpec((1, k // kpack, 2 * bh),
                         lambda p, sc: (sc[0], 0, jnp.minimum(p, nh - 1))),
            pl.BlockSpec((1, k // gs13, 2 * bh),
                         lambda p, sc: (sc[0], 0, jnp.minimum(p, nh - 1))),
        ]
        w_ops = (w13.q, w13.scales)
    else:
        w_specs = [
            pl.BlockSpec((1, k // kpack, bh),
                         lambda p, sc: (sc[0], 0, jnp.minimum(p, nh - 1))),
            pl.BlockSpec((1, k // gs13, bh),
                         lambda p, sc: (sc[0], 0, jnp.minimum(p, nh - 1))),
            pl.BlockSpec((1, k // kpack, bh),
                         lambda p, sc: (sc[0], 0,
                                        nh + jnp.minimum(p, nh - 1))),
            pl.BlockSpec((1, k // gs13, bh),
                         lambda p, sc: (sc[0], 0,
                                        nh + jnp.minimum(p, nh - 1))),
        ]
        w_ops = (w13.q, w13.scales, w13.q, w13.scales)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nh + nn,),
        in_specs=x_specs + w_specs + [
            pl.BlockSpec((1, h // kpack, bn),
                         lambda p, sc: (sc[0], 0,
                                        jnp.clip(p - nh, 0, nn - 1))),
            pl.BlockSpec((1, h // gs2, bn),
                         lambda p, sc: (sc[0], 0,
                                        jnp.clip(p - nh, 0, nn - 1))),
        ],
        out_specs=pl.BlockSpec((m, bn),
                               lambda p, sc: (0, jnp.maximum(p - nh, 0))),
        scratch_shapes=[pltpu.VMEM((nh, bh, m) if acc_b else (nh, m, bh),
                                   jnp.bfloat16)],
    )
    return pl.pallas_call(
        partial(_kernel, gs13=gs13, gs2=gs2, nh=nh, nn=nn, bh=bh, bits=bits,
                out_dtype=x.dtype, dot_dtype=_dot_dtype(m),
                acc_mode=acc_mode, il=il, acc_b=acc_b),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(layer.reshape(1).astype(jnp.int32), *x_ops, *w_ops, w2.q, w2.scales)
