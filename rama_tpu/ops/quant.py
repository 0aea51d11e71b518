"""Weight-only group quantization: INT8 (Q8_0) and packed INT4.

The TPU-native consumption of the reference's v2 export format
(engine/export/export.py:46-70, 182-260): symmetric per-group scales,
group_size contiguous input-dim elements per scale. The reference *exports*
Q8_0 but its engine never reads it (README.md:116 TODO); here quantized
weights are first-class.

Layout contract (kernel-facing):
    q:      int8, (K, N)        — input-dim-major, output columns
    scales: fp32, (K//gs, N)    — one scale per (input-group, output column)
INT4 packs two nibbles per byte in a *block-local split* layout: within each
block of 2*gs consecutive K rows, byte row j (j < gs) holds logical row
block_start + j in the low nibble and block_start + gs + j in the high
nibble, values in [-7, 7] (scale = absmax/7). Each byte row's two nibbles
therefore belong to the block's two scale groups respectively, and any shard
boundary at a multiple of 2*gs keeps blocks (and their scales) intact — which
is what makes row-parallel (Megatron wo/w2) sharding of packed int4 exact.

Why decode gets faster: single-token decode is HBM-bandwidth-bound — the
whole win is reading 1 (or 0.5) bytes per weight instead of 2/4. The fused
Pallas kernel (rama_tpu.ops.pallas.quant_matmul) dequantizes tiles in VMEM on
the way into the MXU; `matmul_xla` below is the numerically-identical
reference path used in tests and as a CPU fallback.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.tree_util.register_dataclass,
         data_fields=["q", "scales"],
         meta_fields=["group_size", "bits", "il"])
@dataclass
class QuantizedTensor:
    """Group-quantized 2-D (or stacked 3-D (L, K, N)) weight.

    il > 0 marks a tile-interleaved fused-w13 column layout: columns are
    alternating il-wide tiles [W1_0 W3_0 W1_1 W3_1 ...] instead of the plain
    [W1 | W3] concat, so the fused-FFN kernel streams ONE contiguous
    (K, 2*il) block per phase-A grid step (models.llama._interleave_w13)."""

    q: jax.Array       # int8; (.., K, N) for int8, (.., K//2, N) for int4
    scales: jax.Array  # fp32; (.., K//gs, N)
    group_size: int
    bits: int = 8
    il: int = 0

    @property
    def k_dim(self) -> int:
        k = self.q.shape[-2]
        return k * 2 if self.bits == 4 else k

    @property
    def shape(self) -> tuple:
        return (*self.q.shape[:-2], self.k_dim, self.q.shape[-1])


def quantize_int8(w, group_size: int) -> QuantizedTensor:
    """w: (.., K, N) float -> Q8_0 along K in groups of group_size.

    numpy inputs are quantized on the host (one device_put instead of a
    compiled program per tensor — load-time friendly on tunneled devices).
    group_size is reduced per tensor when it doesn't divide K (e.g.
    stories15M's dim 288 with the default 64 -> 32).
    """
    import math

    group_size = max(1, math.gcd(group_size, w.shape[-2]))
    if isinstance(w, np.ndarray):
        *lead, k, n = w.shape
        wf = w.astype(np.float32).reshape(*lead, k // group_size, group_size, n)
        absmax = np.abs(wf).max(axis=-2, keepdims=True)
        scales = np.maximum(absmax / 127.0, 1e-10).astype(np.float32)
        q = np.round(wf / scales).astype(np.int8).reshape(*lead, k, n)
        return QuantizedTensor(q=jnp.asarray(q), scales=jnp.asarray(scales[..., 0, :]),
                               group_size=group_size, bits=8)
    *lead, k, n = w.shape
    wf = w.astype(jnp.float32).reshape(*lead, k // group_size, group_size, n)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scales = jnp.maximum(absmax / 127.0, 1e-10)
    q = jnp.round(wf / scales).astype(jnp.int8).reshape(*lead, k, n)
    return QuantizedTensor(q=q, scales=scales[..., 0, :], group_size=group_size, bits=8)


def pick_int4_group_size(k: int, group_size: int, max_tp: int = 8) -> int:
    """Largest gs <= group_size with 2*gs dividing K/max_tp, so every TP shard
    boundary (tp | max_tp) falls on a packing-block boundary."""
    import math

    base = k // (2 * max_tp) if k % (2 * max_tp) == 0 else k // 2
    gs = math.gcd(group_size, base)
    return max(gs, 1)


def quantize_int4(w, group_size: int) -> QuantizedTensor:
    """w: (.., K, N) float -> block-local split packed int4 (module docstring).

    group_size may be reduced (pick_int4_group_size) so packing blocks align
    with row-parallel shard boundaries up to tp=8.
    """
    xp = np if isinstance(w, np.ndarray) else jnp
    *lead, k, n = w.shape
    group_size = pick_int4_group_size(k, group_size)
    wf = w.astype(xp.float32).reshape(*lead, k // group_size, group_size, n)
    absmax = xp.abs(wf).max(axis=-2, keepdims=True) if xp is np else jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scales = xp.maximum(absmax / 7.0, 1e-10)
    q = xp.clip(xp.round(wf / scales), -7, 7).astype(xp.int8)
    # (.., nb, 2, gs, n): axis -3 separates each block's lo/hi halves
    qb = q.reshape(*lead, k // (2 * group_size), 2, group_size, n)
    lo = qb[..., 0, :, :] & 0x0F
    hi = (qb[..., 1, :, :] & 0x0F) << 4
    packed = (lo | hi).astype(xp.int8).reshape(*lead, k // 2, n)
    scales = scales[..., 0, :]
    if xp is np:
        packed, scales = jnp.asarray(packed), jnp.asarray(scales.astype(np.float32))
    return QuantizedTensor(q=packed, scales=scales, group_size=group_size, bits=4)


def _unpack_int4(packed: jax.Array, group_size: int) -> jax.Array:
    """(.., K//2, N) block-local packed -> (.., K, N) int8 (sign-extended)."""
    p32 = packed.astype(jnp.int32)
    lo = ((p32 << 28) >> 28).astype(jnp.int8)
    hi = (p32 >> 4).astype(jnp.int8)  # int8 sign == high-nibble sign
    *lead, kh, n = packed.shape
    nb = kh // group_size
    lo = lo.reshape(*lead, nb, 1, group_size, n)
    hi = hi.reshape(*lead, nb, 1, group_size, n)
    out = jnp.concatenate([lo, hi], axis=-3)  # (.., nb, 2, gs, n)
    return out.reshape(*lead, kh * 2, n)


def dequantize(qt: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    q = _unpack_int4(qt.q, qt.group_size) if qt.bits == 4 else qt.q
    *lead, k, n = q.shape
    gs = qt.group_size
    w = q.astype(jnp.float32).reshape(*lead, k // gs, gs, n)
    w = w * qt.scales[..., :, None, :]
    return w.reshape(*lead, k, n).astype(dtype)


def split_groups(qt: QuantizedTensor, new_gs: int) -> QuantizedTensor:
    """Exactly re-express Q8 with a finer group size (new_gs | group_size):
    each scale is repeated over its sub-groups, so dequantization is
    bit-identical. Used to align scale rows with TP shard boundaries.
    (int4 packing is tied to its group size, so only int8 regroups.)"""
    if qt.bits != 8:
        raise ValueError("split_groups only supports int8 tensors")
    if qt.group_size % new_gs != 0:
        raise ValueError(f"{new_gs} does not divide group_size {qt.group_size}")
    if new_gs == qt.group_size:
        return qt
    r = qt.group_size // new_gs
    s = jnp.repeat(qt.scales, r, axis=-2)
    return QuantizedTensor(q=qt.q, scales=s, group_size=new_gs, bits=8)


def cast_scales(params: dict, dtype=jnp.bfloat16) -> dict:
    """Cast every quantized leaf's STORED scales to `dtype` (usually bf16).

    f32 scales are ~14% of a 7B int4 weight stream and ~8% of the int8 one
    (profiled r5: 0.54 GB of the int4 step's 3.78 GB HBM traffic); every
    compute path already upcasts scales to f32 in VMEM/registers
    (quant_matmul.py:50, ffn.py:108, dequantize), so the storage dtype only
    changes HBM bytes plus a <=2^-9 relative rounding on each scale —
    ~0.1% weight error on top of int4's ~7%. Returns a new params dict;
    leaves that aren't quantized pass through unchanged."""

    def one(p):
        if isinstance(p, QuantizedTensor):
            return QuantizedTensor(q=p.q, scales=p.scales.astype(dtype),
                                   group_size=p.group_size, bits=p.bits,
                                   il=p.il)
        if isinstance(p, QuantizedEmbedding):
            return QuantizedEmbedding(q=p.q, scales=p.scales.astype(dtype),
                                      group_size=p.group_size)
        return p

    return {k: one(v) for k, v in params.items()}


def matmul_xla(x: jax.Array, qt: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Reference path: dequantize then dot. Numerically defines the op."""
    w = dequantize(qt, dtype=dtype)
    return jnp.dot(x.astype(dtype), w, preferred_element_type=jnp.float32).astype(x.dtype)


@partial(jax.tree_util.register_dataclass,
         data_fields=["q", "scales"], meta_fields=["group_size"])
@dataclass
class QuantizedEmbedding:
    """Embedding table quantized per-row along the feature dim: q (V, D) int8,
    scales (V, D//gs) fp32 — the v2 file's tok_embedding layout as-is."""

    q: jax.Array
    scales: jax.Array
    group_size: int

    def lookup(self, ids: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
        rows = jnp.take(self.q, ids, axis=0).astype(jnp.float32)   # (.., D)
        s = jnp.take(self.scales, ids, axis=0)                     # (.., D//gs)
        *lead, d = rows.shape
        gs = self.group_size
        out = rows.reshape(*lead, d // gs, gs) * s[..., None]
        return out.reshape(*lead, d).astype(dtype)

    def as_classifier(self) -> QuantizedTensor:
        """Shared-classifier view: exactly the embedding bytes, transposed to
        the kernel layout (D, V) with scales (D//gs, V) — zero requantization
        (the reference encodes sharing via the v0 negative-vocab flag;
        mod.rs:150-158)."""
        return QuantizedTensor(q=self.q.T, scales=self.scales.T,
                               group_size=self.group_size, bits=8)


def quantize_embedding(w, group_size: int) -> QuantizedEmbedding:
    """w: (V, D) float -> per-row Q8_0 along D (host-side for numpy inputs)."""
    import math

    v, d = w.shape
    group_size = max(1, math.gcd(group_size, d))
    if isinstance(w, np.ndarray):
        wf = w.astype(np.float32).reshape(v, d // group_size, group_size)
        absmax = np.abs(wf).max(axis=-1, keepdims=True)
        scales = np.maximum(absmax / 127.0, 1e-10).astype(np.float32)
        q = np.round(wf / scales).astype(np.int8).reshape(v, d)
        return QuantizedEmbedding(q=jnp.asarray(q), scales=jnp.asarray(scales[..., 0]),
                                  group_size=group_size)
    wf = w.astype(jnp.float32).reshape(v, d // group_size, group_size)
    absmax = jnp.max(jnp.abs(wf), axis=-1, keepdims=True)
    scales = jnp.maximum(absmax / 127.0, 1e-10)
    q = jnp.round(wf / scales).astype(jnp.int8).reshape(v, d)
    return QuantizedEmbedding(q=q, scales=scales[..., 0], group_size=group_size)


def from_q80_file_layout(q_file: np.ndarray, s_file: np.ndarray,
                         group_size: int) -> QuantizedTensor:
    """Convert checkpoint.QuantParams entries — int8 (.., out, in) with scales
    (.., out, in//gs) — to the kernel layout (.., in, out) / (.., in//gs, out)."""
    q = jnp.asarray(np.swapaxes(q_file, -1, -2))
    s = jnp.asarray(np.swapaxes(s_file, -1, -2), jnp.float32)
    return QuantizedTensor(q=q, scales=s, group_size=group_size, bits=8)
