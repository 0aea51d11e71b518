"""Fused dequantize + matmul Pallas TPU kernel (INT8 / packed INT4).

The hot op of the quantized engine — the TPU-native answer to the role the
reference's cuBLAS SGEMM + naive CUDA matmul played (engine/src/device/
gpu.rs:175-189, math.cu:3-15), except the weights stream from HBM as int8/int4
and are expanded to bf16 *in VMEM on the way into the MXU*, never materialized
dequantized in HBM. Decode is HBM-bandwidth-bound, so the 2-4x byte reduction
is the speedup.

Layout (see rama_tpu.ops.quant): x (M, K) bf16; q (K, N) int8 (int4: (K//2, N)
two K-adjacent nibbles per byte); scales (K//gs, N) fp32. Output (M, N) in the
activation dtype, fp32 accumulation across K tiles.

Tiling: grid (N//bn, K//bk), K innermost so the fp32 accumulator scratch
carries partial sums across K steps (revisiting the same output tile), per the
Pallas TPU matmul pattern. bk is a multiple of the quant group size so each
scale block covers whole groups.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rama_tpu.ops.quant import QuantizedTensor

def _dot_dtype(bm: int):
    """Dot input dtype: f32 at decode block sizes (the MXU is idle at small M
    and skipping the f32->bf16 cast of the dequantized weight block measures
    faster); bf16 at prefill sizes where the dot itself is the bottleneck."""
    return jnp.bfloat16 if bm >= 64 else jnp.float32


def dequant_int8(w8, scales, gs: int, dot_dtype=jnp.float32):
    """(bk, bn) int8 + (bk//gs, bn) f32 scales -> (bk, bn) dot_dtype.

    Plain convert-then-scale: for whole bytes one i8->f32 convert beats the
    magic-bias bit trick (which needs xor+and+or per byte — measured 547 vs
    628 GB/s, tools/bench_quant_variants.py); for nibbles the trick wins,
    see dequant_int4_planes.

    (pltpu.repeat tiles rather than element-repeats, so the per-group scale
    broadcast goes through reshape instead.)
    """
    k, n = w8.shape
    scales = scales.astype(jnp.float32)  # bf16-stored scales upcast in VMEM
    w = (w8.astype(jnp.float32).reshape(k // gs, gs, n)
         * scales[:, None, :]).reshape(k, n)
    return w if dot_dtype == jnp.float32 else w.astype(dot_dtype)


def dequant_int4_planes(packed, scales, gs: int, dot_dtype=jnp.float32):
    """Block-local packed int4 (bk//2, bn) -> (wlo, whi) nibble planes, each
    (bk//2, bn) dot_dtype and scaled.

    Byte row j of block b carries logical rows (2b*gs + j) [low nibble] and
    (2b*gs + gs + j) [high nibble] — ops.quant.quantize_int4's layout. Each
    plane covers CONTIGUOUS gs-row runs of x, so callers dot the planes
    against pre-split x columns instead of paying an interleaving concat.

    Mosaic can't legalize shifts on int8 vectors, so unpack happens in i32.
    (A magic-bias mantissa-splice variant measured slightly SLOWER on the
    device timeline — i32->f32 convert is single-cycle on v5e, so trading it
    for xor/and/or bit ops loses; tools/bench_quant_variants.py.)
    """
    p32 = packed.astype(jnp.int32)
    k2, n = p32.shape
    nb = k2 // gs
    lo = ((p32 << 28) >> 28).astype(jnp.float32)     # sign-extended low nibble
    hi = (p32 >> 4).astype(jnp.float32)              # int8 sign == nibble sign
    s = scales.astype(jnp.float32).reshape(nb, 2, n)
    wlo = (lo.reshape(nb, gs, n) * s[:, 0:1, :]).reshape(k2, n)
    whi = (hi.reshape(nb, gs, n) * s[:, 1:2, :]).reshape(k2, n)
    if dot_dtype != jnp.float32:
        wlo, whi = wlo.astype(dot_dtype), whi.astype(dot_dtype)
    return wlo, whi


def _kernel_int8(x_ref, q_ref, s_ref, o_ref, acc_ref, *, gs: int, out_dtype,
                 dot_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = dequant_int8(q_ref[...], s_ref[...], gs, dot_dtype)
    acc_ref[...] += jnp.dot(x_ref[...].astype(dot_dtype), w,
                            preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


def _kernel_int4(xlo_ref, xhi_ref, q_ref, s_ref, o_ref, acc_ref, *, gs: int,
                 out_dtype, dot_dtype):
    """Two plane dots against x's lo/hi column planes (precomputed outside
    the kernel — x is tiny next to w); see dequant_int4_planes."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    wlo, whi = dequant_int4_planes(q_ref[...], s_ref[...], gs, dot_dtype)
    acc_ref[...] += jnp.dot(xlo_ref[...].astype(dot_dtype), wlo,
                            preferred_element_type=jnp.float32)
    acc_ref[...] += jnp.dot(xhi_ref[...].astype(dot_dtype), whi,
                            preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


def _kernel_int4_acc(xlo_ref, xhi_ref, q_ref, s_ref, o_ref, acc_ref, *,
                     gs: int, out_dtype):
    """Decode-path int4 kernel: per-group dots of RAW nibbles with the scales
    applied to the (M, bn) group partials — the scale multiply moves off the
    weight-sized tensor onto the accumulator (exact numerics, associativity
    aside). x planes arrive pre-grouped as (groups, M, gs) so the kernel
    never reshapes across the lane dim. Measured 690 GB/s effective at
    bk=4096/bn=1024 vs 402 for dequant-in-VMEM (tools/bench_int4_blocks.py);
    only worthwhile at small M (the per-group depth-gs dots underfill the
    MXU, which is idle at decode anyway)."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p32 = q_ref[...].astype(jnp.int32)
    bk2, bn = p32.shape
    nb = bk2 // gs
    lo = ((p32 << 28) >> 28).astype(jnp.float32)
    hi = (p32 >> 4).astype(jnp.float32)
    s = s_ref[...].astype(jnp.float32).reshape(nb, 2, bn)
    acc = acc_ref[...]
    for g in range(nb):
        rows = slice(g * gs, (g + 1) * gs)
        plo = jnp.dot(xlo_ref[g].astype(jnp.float32), lo[rows],
                      preferred_element_type=jnp.float32)
        phi = jnp.dot(xhi_ref[g].astype(jnp.float32), hi[rows],
                      preferred_element_type=jnp.float32)
        acc += plo * s[g, 0] + phi * s[g, 1]
    acc_ref[...] = acc

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


def _kernel_int4_acc_layered(l_ref, xlo_ref, xhi_ref, q_ref, s_ref, o_ref,
                             acc_ref, *, gs: int, out_dtype):
    """Layer-indexed _kernel_int4_acc (stacked (L, K//2, N) weights)."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p32 = q_ref[0].astype(jnp.int32)
    bk2, bn = p32.shape
    nb = bk2 // gs
    lo = ((p32 << 28) >> 28).astype(jnp.float32)
    hi = (p32 >> 4).astype(jnp.float32)
    s = s_ref[0].astype(jnp.float32).reshape(nb, 2, bn)
    acc = acc_ref[...]
    for g in range(nb):
        rows = slice(g * gs, (g + 1) * gs)
        plo = jnp.dot(xlo_ref[g].astype(jnp.float32), lo[rows],
                      preferred_element_type=jnp.float32)
        phi = jnp.dot(xhi_ref[g].astype(jnp.float32), hi[rows],
                      preferred_element_type=jnp.float32)
        acc += plo * s[g, 0] + phi * s[g, 1]
    acc_ref[...] = acc

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


def _kernel_int8_acc(x_ref, q_ref, s_ref, o_ref, acc_ref, *, gs: int,
                     out_dtype):
    """Decode-path int8 kernel: per-group dots of raw (converted, unscaled)
    int8 rows, scales applied to the (M, bn) partials. Device-timeline:
    72.3us vs 86.4 for dequant-in-VMEM at 4096x12288 (739 vs 619 GB/s);
    most of the win is the bk=2048 blocks, the accumulator scaling adds
    ~3% (tools/bench_int4_blocks.py)."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = q_ref[...].astype(jnp.float32)
    s = s_ref[...].astype(jnp.float32)
    nb = w.shape[0] // gs
    acc = acc_ref[...]
    for g in range(nb):
        acc += jnp.dot(x_ref[g].astype(jnp.float32),
                       w[g * gs:(g + 1) * gs],
                       preferred_element_type=jnp.float32) * s[g]
    acc_ref[...] = acc

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


def _kernel_int8_acc_layered(l_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *,
                             gs: int, out_dtype):
    """Layer-indexed _kernel_int8_acc (stacked (L, K, N) weights)."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = q_ref[0].astype(jnp.float32)
    s = s_ref[0].astype(jnp.float32)
    nb = w.shape[0] // gs
    acc = acc_ref[...]
    for g in range(nb):
        acc += jnp.dot(x_ref[g].astype(jnp.float32),
                       w[g * gs:(g + 1) * gs],
                       preferred_element_type=jnp.float32) * s[g]
    acc_ref[...] = acc

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


def _kernel_int8_layered(l_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *,
                         gs: int, out_dtype, dot_dtype):
    """int8 kernel over stacked (L, K, N) weights: the grid's index maps pick
    layer l_ref[0] directly out of HBM, so the layer scan never materializes
    a per-layer weight copy (profiled at >50% of decode step time)."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = dequant_int8(q_ref[0], s_ref[0], gs, dot_dtype)
    acc_ref[...] += jnp.dot(x_ref[...].astype(dot_dtype), w,
                            preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


def _kernel_int4_layered(l_ref, xlo_ref, xhi_ref, q_ref, s_ref, o_ref,
                         acc_ref, *, gs: int, out_dtype, dot_dtype):
    """Layer-indexed variant of _kernel_int4 (same two-plane-dot scheme)."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    wlo, whi = dequant_int4_planes(q_ref[0], s_ref[0], gs, dot_dtype)
    acc_ref[...] += jnp.dot(xlo_ref[...].astype(dot_dtype), wlo,
                            preferred_element_type=jnp.float32)
    acc_ref[...] += jnp.dot(xhi_ref[...].astype(dot_dtype), whi,
                            preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@partial(jax.jit, static_argnames=("block_m", "block_k", "block_n", "interpret"))
def quant_matmul_layered(x: jax.Array, qt: QuantizedTensor, layer: jax.Array,
                         *, block_m: int = 256, block_k: int = 1024,
                         block_n: int = 512, interpret: bool = False) -> jax.Array:
    """x (M, K) @ dequant(qt[layer]) for stacked qt (L, K, N) — the weight
    layer is selected by the kernel's block index maps (scalar prefetch), not
    by an XLA dynamic-slice copy."""
    m, k = x.shape
    kq, n = qt.shape[-2], qt.shape[-1]
    assert k == kq, f"K mismatch: x {k} vs qt {kq}"
    gs = qt.group_size

    srm = _srow_mult(qt.scales)
    acc_bk = None
    if m <= 32:
        if qt.bits == 4:
            bn_acc = _pick_block(n, 1024, 128)
            acc_bk = _pick_k_block_int4_acc(k, bn_acc, gs, srm=srm)
        else:
            # 640 only kicks in for vocab-ish N (32000); 512 otherwise
            bn_acc = _pick_block(n, 640, 128)
            acc_bk = _pick_k_block_int8_acc(k, gs, srm=srm)
    if acc_bk is not None:
        # decode path: accscale kernels, big blocks (see _kernel_int4_acc /
        # _kernel_int8_acc)
        bn = bn_acc
        bk = acc_bk
        bm = m
        mp = m
        if qt.bits == 4:
            nbt = bk // (2 * gs)
            x_specs = [
                pl.BlockSpec((nbt, bm, gs), lambda i, j, kk, l: (kk, 0, 0)),
                pl.BlockSpec((nbt, bm, gs), lambda i, j, kk, l: (kk, 0, 0))]
            x_ops = _group_x_planes(x, gs)
            kernel = partial(_kernel_int4_acc_layered, gs=gs,
                             out_dtype=x.dtype)
            k_pack = 2
        else:
            nbt = bk // gs
            x_specs = [
                pl.BlockSpec((nbt, bm, gs), lambda i, j, kk, l: (kk, 0, 0))]
            x_ops = (_group_x(x, gs),)
            kernel = partial(_kernel_int8_acc_layered, gs=gs,
                             out_dtype=x.dtype)
            k_pack = 1
    else:
        bk = (_pick_k_block(k, block_k, gs, srm=srm) if qt.bits == 8
              else _pick_k_block_int4(k, block_k, gs, srm=srm))
        bn = _pick_block(n, block_n, 128)
        bm = min(m, block_m)
        if qt.bits == 4:
            bn = _shrink_bn_int4(bk, bn, n)
        if bn is None:
            # no tiling fits scoped VMEM: XLA dynamic-slice + dequant path
            from rama_tpu.ops.quant import matmul_xla
            wl = QuantizedTensor(q=jnp.take(qt.q, layer, axis=0),
                                 scales=jnp.take(qt.scales, layer, axis=0),
                                 group_size=gs, bits=qt.bits)
            return matmul_xla(x, wl, dtype=x.dtype)
        if m % bm:
            x = jnp.pad(x, ((0, bm - m % bm), (0, 0)))
        mp = x.shape[0]

        if qt.bits == 4:
            x_specs = [pl.BlockSpec((bm, bk // 2), lambda i, j, kk, l: (i, kk)),
                       pl.BlockSpec((bm, bk // 2), lambda i, j, kk, l: (i, kk))]
            x_ops = _split_x_planes(x, gs)
            kernel = partial(_kernel_int4_layered, gs=gs, out_dtype=x.dtype,
                             dot_dtype=_dot_dtype(bm))
            k_pack = 2
        else:
            x_specs = [pl.BlockSpec((bm, bk), lambda i, j, kk, l: (i, kk))]
            x_ops = (x,)
            kernel = partial(_kernel_int8_layered, gs=gs, out_dtype=x.dtype,
                             dot_dtype=_dot_dtype(bm))
            k_pack = 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mp // bm, n // bn, k // bk),
        in_specs=x_specs + [
            pl.BlockSpec((1, bk // k_pack, bn), lambda i, j, kk, l: (l[0], kk, j)),
            pl.BlockSpec((1, bk // gs, bn), lambda i, j, kk, l: (l[0], kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(layer.reshape(1).astype(jnp.int32), *x_ops, qt.q, qt.scales)
    return out[:m] if mp != m else out


def _split_x_planes(x: jax.Array, gs: int):
    """x (M, K) -> (x_lo, x_hi), each (M, K//2): the activation columns that
    contract with the int4 low/high nibble planes. Block b's low nibbles hold
    logical rows [2b*gs, 2b*gs+gs) — contiguous runs — so each plane is a
    gather of whole gs-column runs, done once per call by XLA (x is orders of
    magnitude smaller than the weights the kernel streams)."""
    m, k = x.shape
    xr = x.reshape(m, k // (2 * gs), 2, gs)
    return (xr[:, :, 0, :].reshape(m, k // 2),
            xr[:, :, 1, :].reshape(m, k // 2))


# Mosaic's scoped-VMEM stack limit is 16 MB. The int4 dequant-in-VMEM kernel
# (_kernel_int4{,_layered}) needs ~6 bytes of stack temps per weight-block
# element (calibrated: a (5504, 512) block's nibble unpack OOMed at a
# measured 17.16 MB — i32 unpack plus the scaled planes). K=11008 is the
# shape that gets here: 2^8 * 43 has no multiple-of-512 divisor, so no legal
# K tile exists and bk falls back to full K.
_INT4_STACK_BUDGET = 14 * 1024 * 1024


def _shrink_bn_int4(bk: int, bn: int, n: int) -> int | None:
    """Halve bn (to a >=128 divisor of n) until the int4 kernel's dequant
    temporaries fit Mosaic's scoped-VMEM stack; None when even bn=128 does
    not fit (callers take the XLA path instead of a compile-time OOM)."""
    while (bk // 2) * bn * 6 > _INT4_STACK_BUDGET:
        nxt = _pick_block(n, bn // 2, 128)
        if nxt >= bn or bn <= 128:
            return None
        bn = nxt
    return bn


def _pick_block(dim: int, target: int, multiple: int) -> int:
    """Largest divisor of `dim` that is <= target and a multiple of `multiple`;
    falls back to the full dim when no such divisor exists."""
    best = dim
    b = multiple
    while b <= min(dim, target):
        if dim % b == 0:
            best = b
        b += multiple
    return best if dim % best == 0 else dim


def _pick_k_block(k: int, target: int, gs: int, srm: int = 8) -> int:
    """K-tile size: a divisor of k, whole scale groups per tile, and Mosaic
    block-shape legal — bk%128 lanes for the x block and (bk//gs)%srm sublanes
    for the scales block (srm from _srow_mult) — or the full K (always legal)."""
    cands = [d for d in range(gs, min(k, target) + 1, gs)
             if k % d == 0 and (d // gs) % srm == 0 and d % 128 == 0]
    return max(cands) if cands else k


def _srow_mult(scales) -> int:
    """Sublane multiple a non-full scale BLOCK's row count must honor:
    16 for bf16-stored scales (two rows per packed sublane), 8 for f32."""
    return 16 if scales.dtype == jnp.bfloat16 else 8


def _pick_k_block_int4(k: int, target: int, gs: int, srm: int = 8) -> int:
    """int4 K tile: additionally whole 2*gs packing blocks and a byte-row
    count (bk/2) on 8-sublane boundaries; full K is always legal."""
    cands = [d for d in range(2 * gs, min(k, target) + 1, 2 * gs)
             if k % d == 0 and (d // gs) % srm == 0 and d % 256 == 0]
    return max(cands) if cands else k


def _pick_k_block_int8_acc(k: int, gs: int, max_groups: int = 96,
                           srm: int = 8) -> int | None:
    """K tile for the int8 accscale decode kernel: bk=2048 measured best
    (719-739 GB/s vs 619-658 at 1024; 4096 slightly worse), bounded by the
    static per-group unroll. None when no legal tile exists."""
    limit = min(k, 2048, max_groups * gs)
    cands = [d for d in range(gs, limit + 1, gs)
             if k % d == 0 and (d // gs) % srm == 0 and d % 128 == 0]
    return max(cands) if cands else None


def _group_x(x: jax.Array, gs: int):
    """x (M, K) -> (K//gs, M, gs) group slabs for the int8 accscale kernel."""
    m, k = x.shape
    return x.reshape(m, k // gs, gs).transpose(1, 0, 2)


def _pick_k_block_int4_acc(k: int, bn: int, gs: int,
                           max_groups: int = 96, srm: int = 8) -> int | None:
    """K tile for the accscale decode kernel: big blocks win (the DMA floor
    at 256 KB blocks is ~620 GB/s vs ~746 at 2 MB), bounded by ~6 MB of
    VMEM per packed block and by the static per-group dot unroll
    (2*max_groups dots). None when no legal tile exists (callers fall back
    to the dequant-in-VMEM kernel)."""
    limit = min(k, (6 * 1024 * 1024) // bn * 2, max_groups * 2 * gs)
    cands = [d for d in range(2 * gs, limit + 1, 2 * gs)
             if k % d == 0 and (d // gs) % srm == 0 and d % 256 == 0]
    return max(cands) if cands else None


def _group_x_planes(x: jax.Array, gs: int):
    """x (M, K) -> (xlo_g, xhi_g), each (K//(2*gs), M, gs): the nibble-plane
    columns regrouped so the accscale kernels can index whole (M, gs) group
    slabs without lane-dim reshapes (Mosaic can't shape-cast lanes)."""
    m, k = x.shape
    xlo, xhi = _split_x_planes(x, gs)
    nbt = k // (2 * gs)
    return (xlo.reshape(m, nbt, gs).transpose(1, 0, 2),
            xhi.reshape(m, nbt, gs).transpose(1, 0, 2))


def _bound_tile_vmem(bm: int, bk: int, bn: int, n: int, gs: int,
                     w_row_bytes: float,
                     limit: int = 11 * 1024 * 1024) -> tuple[int, int]:
    """Shrink (bn, then bm) until the kernel's estimated VMEM footprint fits
    the 16 MB scoped-vmem budget: x block (bm, bk) bf16 plus double-buffered
    w (bk x bn x w_row_bytes) and scales ((bk//gs, bn) f32) blocks, f32
    accumulator and out tile. The limit is well under 16 MB because Mosaic's
    actual buffering exceeds this model (measured: (128, 11008, 512) int8
    estimates 15.2M, Mosaic allocates 17.06M). Matters when K has no legal
    divisor tile and bk falls back to full K (e.g. 11008 through w2): the
    serving warmup's (k=8, T=32) prefill bucket OOMed scoped vmem there at
    the old fixed (256, 512) tile."""
    def est(bm, bn):
        return (bm * bk * 2
                + 2 * (int(bk * bn * w_row_bytes) + (bk // gs) * bn * 4)
                + bm * bn * 6)

    while est(bm, bn) > limit:
        if bn > 128:
            bn = _pick_block(n, bn // 2, 128)
        elif bm > 8:
            bm //= 2
        else:
            break
    return bm, bn


@partial(jax.jit, static_argnames=("block_m", "block_k", "block_n", "interpret"))
def quant_matmul(x: jax.Array, qt: QuantizedTensor, *, block_m: int = 256,
                 block_k: int = 1024, block_n: int = 512,
                 interpret: bool = False) -> jax.Array:
    """x (M, K) @ dequant(qt) (K, N) -> (M, N), never materializing W in HBM."""
    m, k = x.shape
    kq, n = qt.shape[-2], qt.shape[-1]
    assert k == kq, f"K mismatch: x {k} vs qt {kq}"
    gs = qt.group_size
    srm = _srow_mult(qt.scales)

    bk = _pick_k_block(k, block_k, gs, srm=srm)
    bn = _pick_block(n, block_n, 128)
    bm, bn = _bound_tile_vmem(min(m, block_m), bk, bn, n, gs,
                              w_row_bytes=0.5 if qt.bits == 4 else 1.0)
    if m % bm:  # pad M up to a tile
        pad = bm - m % bm
        x = jnp.pad(x, ((0, pad), (0, 0)))
    mp = x.shape[0]

    common = dict(
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )

    if qt.bits == 8 and m <= 32 and (acc_bk8 := _pick_k_block_int8_acc(
            k, gs, srm=srm)) is not None:
        # decode path: accscale kernel, bk=2048 blocks (see _kernel_int8_acc)
        bk = acc_bk8
        bn = _pick_block(n, 640, 128)   # 640 kicks in for vocab-ish N
        nbt = bk // gs
        out = pl.pallas_call(
            partial(_kernel_int8_acc, gs=gs, out_dtype=x.dtype),
            grid=(1, n // bn, k // bk),
            in_specs=[
                pl.BlockSpec((nbt, m, gs), lambda i, j, kk: (kk, 0, 0)),
                pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
                pl.BlockSpec((bk // gs, bn), lambda i, j, kk: (kk, j)),
            ],
            out_specs=pl.BlockSpec((m, bn), lambda i, j, kk: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
            scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * m * k * n,
                bytes_accessed=m * k * 2 + k * n + m * n * 2,
                transcendentals=0,
            ),
            interpret=interpret,
        )(_group_x(x[:m], gs), qt.q, qt.scales)
        return out
    elif qt.bits == 8:
        grid = (mp // bm, n // bn, k // bk)
        out = pl.pallas_call(
            partial(_kernel_int8, gs=gs, out_dtype=x.dtype,
                    dot_dtype=_dot_dtype(bm)),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
                pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
                pl.BlockSpec((bk // gs, bn), lambda i, j, kk: (kk, j)),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * mp * k * n,
                bytes_accessed=mp * k * 2 + k * n + mp * n * 2,
                transcendentals=0,
            ),
            **common,
        )(x, qt.q, qt.scales)
    elif (acc_bk := _pick_k_block_int4_acc(k, _pick_block(n, 1024, 128), gs,
                                           srm=srm)
          if m <= 32 else None) is not None:
        # decode path: accscale kernel, big blocks (see _kernel_int4_acc)
        bn = _pick_block(n, 1024, 128)
        bk = acc_bk
        nbt = bk // (2 * gs)
        xlo_g, xhi_g = _group_x_planes(x[:m], gs)
        out = pl.pallas_call(
            partial(_kernel_int4_acc, gs=gs, out_dtype=x.dtype),
            grid=(1, n // bn, k // bk),
            in_specs=[
                pl.BlockSpec((nbt, m, gs), lambda i, j, kk: (kk, 0, 0)),
                pl.BlockSpec((nbt, m, gs), lambda i, j, kk: (kk, 0, 0)),
                pl.BlockSpec((bk // 2, bn), lambda i, j, kk: (kk, j)),
                pl.BlockSpec((bk // gs, bn), lambda i, j, kk: (kk, j)),
            ],
            out_specs=pl.BlockSpec((m, bn), lambda i, j, kk: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
            scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * m * k * n,
                bytes_accessed=m * k * 2 + (k * n) // 2 + m * n * 2,
                transcendentals=0,
            ),
            interpret=interpret,
        )(xlo_g, xhi_g, qt.q, qt.scales)
        return out
    else:
        # block-local packing: a K tile of bk logical rows is bk/2 packed
        # byte rows and bk/gs scale rows, all block-aligned by construction.
        bk = _pick_k_block_int4(k, block_k, gs, srm=srm)
        bn = _shrink_bn_int4(bk, bn, n)
        if bn is None:
            from rama_tpu.ops.quant import matmul_xla
            return matmul_xla(x[:m], qt, dtype=x.dtype)
        # this branch's bk differs from the one bm was bounded with; re-bound
        # (bm shrinks only if the smaller tile still divides the padded M)
        bm2, bn = _bound_tile_vmem(bm, bk, bn, n, gs, w_row_bytes=0.5)
        if bm2 != bm and mp % bm2 == 0:
            bm = bm2
        # bm/bn may have shrunk since `common` was built
        common["out_specs"] = pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j))
        common["scratch_shapes"] = [pltpu.VMEM((bm, bn), jnp.float32)]
        grid = (mp // bm, n // bn, k // bk)
        x_lo, x_hi = _split_x_planes(x, gs)
        out = pl.pallas_call(
            partial(_kernel_int4, gs=gs, out_dtype=x.dtype,
                    dot_dtype=_dot_dtype(bm)),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk // 2), lambda i, j, kk: (i, kk)),
                pl.BlockSpec((bm, bk // 2), lambda i, j, kk: (i, kk)),
                pl.BlockSpec((bk // 2, bn), lambda i, j, kk: (kk, j)),
                pl.BlockSpec((bk // gs, bn), lambda i, j, kk: (kk, j)),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * mp * k * n,
                bytes_accessed=mp * k * 2 + (k * n) // 2 + mp * n * 2,
                transcendentals=0,
            ),
            **common,
        )(x_lo, x_hi, qt.q, qt.scales)
    return out[:m] if mp != m else out
