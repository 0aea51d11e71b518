"""Functional Llama-2 forward pass in JAX — the framework's L3.

This is the TPU-native re-design of the reference's per-op, single-token,
batch-1 forward (engine/src/transformer/infer.rs:8-53): instead of 10 tiny
dispatched device ops per layer per token, the whole network is one traced
function — batched over request slots, scanned over layers, jit-compiled once
— so XLA fuses elementwise work into the MXU matmuls and the HBM-bound decode
step stays a single fused program.

Differences from the reference, by design (SURVEY.md §7):
- batch dimension everywhere (the reference hardcodes batch=1, infer.rs:20-51)
- real GQA via KV-head grouping (the reference parses n_kv_heads but strides
  its cache densely, ram.rs:8 vs infer.rs:31-33)
- prefill processes the whole prompt in one pass (the reference force-feeds
  prompt tokens one forward call at a time, mod.rs:187-193)
- per-slot position vector so a continuous-batching scheduler can mix
  requests at ragged decode offsets in one step

Math parity is with the reference CPU path: interleaved-pair RoPE
(cpu.rs:87-96), rmsnorm eps 1e-5 (cpu.rs:110-118), SiLU-gated FFN
(cpu.rs:56-58, infer.rs:41-47), 1/sqrt(head_dim) attention scale (cpu.rs:40).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from rama_tpu.checkpoint import QuantParams, compute_freqs
from rama_tpu.config import ModelConfig
from rama_tpu.ops.quant import (QuantizedEmbedding, QuantizedTensor,
                                from_q80_file_layout, matmul_xla,
                                quantize_embedding, quantize_int4,
                                quantize_int8)

Params = dict[str, Any]


def _linear(x: jax.Array, w) -> jax.Array:
    """x (..., K) @ w — w is a dense array or a QuantizedTensor.

    Quantized weights go through the fused Pallas dequant+matmul on TPU and
    the numerically-identical XLA dequant path elsewhere (tests, CPU mesh).
    """
    if isinstance(w, QuantizedTensor):
        *lead, k = x.shape
        x2 = x.reshape(-1, k)
        if jax.default_backend() == "tpu" and _kernel_tileable(w):
            from rama_tpu.ops.pallas.quant_matmul import quant_matmul

            out = quant_matmul(x2, w)
        else:
            out = matmul_xla(x2, w, dtype=x.dtype)
        return out.reshape(*lead, w.shape[-1])
    return x @ w


def _linear_layered(x: jax.Array, w, l: jax.Array) -> jax.Array:
    """x (..., K) @ w[l] for stacked per-layer weights (L, K, N).

    Quantized weights on TPU go through quant_matmul_layered, whose block
    index maps select the layer straight from HBM — avoiding the per-layer
    weight copy an XLA dynamic-slice would materialize (profiled at >50% of
    decode step time). Dense / CPU paths fall back to a gather.
    """
    if isinstance(w, QuantizedTensor):
        *lead, k = x.shape
        x2 = x.reshape(-1, k)
        if jax.default_backend() == "tpu" and _kernel_tileable(w):
            from rama_tpu.ops.pallas.quant_matmul import quant_matmul_layered

            out = quant_matmul_layered(x2, w, l)
        else:
            wl = QuantizedTensor(q=jnp.take(w.q, l, axis=0),
                                 scales=jnp.take(w.scales, l, axis=0),
                                 group_size=w.group_size, bits=w.bits)
            out = matmul_xla(x2, wl, dtype=x.dtype)
        return out.reshape(*lead, w.shape[-1])
    return x @ jnp.take(w, l, axis=0)


def _decode_attn_supported(nh: int, nkv: int, hd: int, s: int) -> bool:
    """Fused decode-attention kernel needs 128-lane head dim and 8-sublane
    cache stripes; anything else falls back to the XLA einsum."""
    return hd % 128 == 0 and s % 8 == 0 and nh % nkv == 0


def _kernel_tileable(w: QuantizedTensor) -> bool:
    """The Pallas kernel needs 128-lane N tiles and whole scale groups per
    K tile; small-model shapes (e.g. stories15M dim=288) fall back to XLA."""
    k, n = w.shape[-2], w.shape[-1]
    if n % 128 != 0:
        return False
    if w.bits == 4:
        return k % (2 * w.group_size) == 0  # whole packing blocks
    return k % max(w.group_size, 32) == 0


def _ffn_one_call_ok(w13, w2, batch: int) -> bool:
    """Whether the whole-FFN fused kernel (ops/pallas/ffn.py) applies: both
    weights quantized the same way and tileable with VMEM headroom."""
    from rama_tpu.ops.pallas.ffn import ffn_tileable

    return ffn_tileable(w13, w2, max_m=max(batch, 8))


def _embed(tok_embedding, tokens: jax.Array, dtype) -> jax.Array:
    if isinstance(tok_embedding, QuantizedEmbedding):
        return tok_embedding.lookup(tokens, dtype=dtype)
    return jnp.take(tok_embedding, tokens, axis=0)


@jax.tree_util.register_dataclass
@dataclass
class KVCache:
    """Dense per-layer KV cache: k/v are (L, B, n_kv_heads, S, head_dim).

    The functional replacement for the reference's per-request mutable
    key_cache/value_cache buffers (state.rs:14-15, ram.rs:20-21). Head-major
    so each (slot, head) stripe (S, hd) is contiguous — the unit the fused
    decode-attention kernel streams from HBM.
    """

    k: jax.Array
    v: jax.Array

    @staticmethod
    def create(cfg: ModelConfig, batch: int, max_len: int | None = None,
               dtype=jnp.bfloat16) -> "KVCache":
        s = max_len or cfg.seq_len
        shape = (cfg.n_layers, batch, cfg.n_kv_heads, s, cfg.head_dim)
        return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def max_len(self) -> int:
        return self.k.shape[3]


@jax.tree_util.register_dataclass
@dataclass
class QuantKVCache:
    """INT8 KV cache: k/v int8 (L, B, n_kv, S, hd); ks/vs fp32 per-row
    scales (L, B, n_kv, S) — per-(token, head) absmax quantization.

    Halves cache HBM traffic (the dominant cost of batched decode once
    weights are quantized) and doubles capacity vs bf16. Scales ride
    separately so attention dequantizes AFTER the matmuls: QK^T scales per
    score column, probs·V scales per probability column — O(S) multiplies
    instead of O(S*hd). The reference has no KV quantization (its caches
    are f32, state.rs:14-15); this is a beyond-parity capability.
    """

    k: jax.Array
    v: jax.Array
    ks: jax.Array
    vs: jax.Array

    @staticmethod
    def create(cfg: ModelConfig, batch: int,
               max_len: int | None = None) -> "QuantKVCache":
        s = max_len or cfg.seq_len
        shape = (cfg.n_layers, batch, cfg.n_kv_heads, s, cfg.head_dim)
        return QuantKVCache(k=jnp.zeros(shape, jnp.int8),
                            v=jnp.zeros(shape, jnp.int8),
                            ks=jnp.zeros(shape[:-1], jnp.float32),
                            vs=jnp.zeros(shape[:-1], jnp.float32))

    @property
    def max_len(self) -> int:
        return self.k.shape[3]


def kv_quant_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., hd) float -> (int8 rows, fp32 absmax/127 scales (...,))."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / 127.0, 1e-10)
    q = jnp.round(xf / scale[..., None]).astype(jnp.int8)
    return q, scale


def _cache_arrays(cache) -> tuple:
    """Scan-able leaf tuple for either cache flavor (layer axis leading)."""
    if isinstance(cache, QuantKVCache):
        return (cache.k, cache.v, cache.ks, cache.vs)
    return (cache.k, cache.v)


def _cache_rebuild(cache, arrays: tuple):
    if isinstance(cache, QuantKVCache):
        return QuantKVCache(*arrays)
    return KVCache(*arrays)


def _dequant_kv(k8, v8, ks, vs, dtype=jnp.bfloat16):
    """Per-layer dense dequantization for the XLA (non-Pallas) paths."""
    k = (k8.astype(jnp.float32) * ks[..., None]).astype(dtype)
    v = (v8.astype(jnp.float32) * vs[..., None]).astype(dtype)
    return k, v


def load_params(cfg: ModelConfig, np_params: dict, dtype=jnp.bfloat16) -> Params:
    """numpy canonical params -> device pytree + precomputed RoPE tables."""
    p = {k: jnp.asarray(v, dtype=dtype) for k, v in np_params.items()}
    cos, sin = compute_freqs(cfg)
    # RoPE tables stay fp32: rotation error compounds over positions.
    p["rope_cos"] = jnp.asarray(cos, jnp.float32)
    p["rope_sin"] = jnp.asarray(sin, jnp.float32)
    return p


_QUANT_LAYER_NAMES = ("wq", "wk", "wv", "wo", "w1", "w2", "w3")


def load_params_quantized(cfg: ModelConfig, qp: QuantParams,
                          dtype=jnp.bfloat16) -> Params:
    """v2 (Q8_0) checkpoint -> quantized device pytree, keeping the file's
    int8 bytes (no requantization anywhere, including the shared classifier)."""
    p: Params = {
        "attn_norm": jnp.asarray(qp.norms["attn_norm"], dtype),
        "ffn_norm": jnp.asarray(qp.norms["ffn_norm"], dtype),
        "final_norm": jnp.asarray(qp.norms["final_norm"], dtype),
    }
    eq, es = qp.quant["tok_embedding"]  # (V, D) int8, (V, D//gs) f32
    emb = QuantizedEmbedding(q=jnp.asarray(eq), scales=jnp.asarray(es),
                             group_size=qp.group_size)
    p["tok_embedding"] = emb
    for name in _QUANT_LAYER_NAMES:
        q, s = qp.quant[name]  # (L, out, in) + (L, out, in//gs)
        p[name] = from_q80_file_layout(q, s, qp.group_size)
    if cfg.shared_classifier:
        p["wcls"] = emb.as_classifier()
    else:
        q, s = qp.quant["wcls"]
        p["wcls"] = from_q80_file_layout(q, s, qp.group_size)
    cos, sin = compute_freqs(cfg)
    p["rope_cos"] = jnp.asarray(cos, jnp.float32)
    p["rope_sin"] = jnp.asarray(sin, jnp.float32)
    return p


def quantize_params(cfg: ModelConfig, np_params: dict, bits: int = 8,
                    group_size: int = 64, dtype=jnp.bfloat16,
                    quantize_embedding_table: bool = True) -> Params:
    """Quantize canonical fp32 params at load time (weight-only INT8/INT4).

    The matmul weights take groups along their input dim (kernel layout);
    INT4 uses the split-half nibble packing. The embedding (and the shared
    classifier derived from it) stays INT8 — int4 embeddings cost accuracy
    for negligible bandwidth, since the lookup reads one row per token.
    """
    quant = quantize_int8 if bits == 8 else quantize_int4
    p: Params = {
        "attn_norm": jnp.asarray(np_params["attn_norm"], dtype),
        "ffn_norm": jnp.asarray(np_params["ffn_norm"], dtype),
        "final_norm": jnp.asarray(np_params["final_norm"], dtype),
    }
    for name in _QUANT_LAYER_NAMES:
        p[name] = quant(np.asarray(np_params[name]), group_size)
    if quantize_embedding_table:
        emb = quantize_embedding(np.asarray(np_params["tok_embedding"]), group_size)
        p["tok_embedding"] = emb
        p["wcls"] = (emb.as_classifier() if cfg.shared_classifier
                     else quantize_int8(np.asarray(np_params["wcls"]), group_size))
    else:
        p["tok_embedding"] = jnp.asarray(np_params["tok_embedding"], dtype)
        p["wcls"] = jnp.asarray(np_params["wcls"], dtype)
    cos, sin = compute_freqs(cfg)
    p["rope_cos"] = jnp.asarray(cos, jnp.float32)
    p["rope_sin"] = jnp.asarray(sin, jnp.float32)
    return p


def _concat_weights(ws, cfg: ModelConfig, tp_size: int):
    """Concatenate weights along their output dim, grouped per TP shard.

    ws: list of (L, K, Ni) dense arrays or QuantizedTensors that share K and
    quantization metadata. The output column order is
    [shard0: w0_0 | w1_0 | ..., shard1: w0_1 | ...] so a contiguous
    column-shard holds that shard's slice of every constituent — fusion and
    tensor parallelism compose.
    """
    def slices(w):
        n = w.shape[-1]
        if n % tp_size != 0:
            raise ValueError(
                f"tensor-parallel size {tp_size} does not divide output dim "
                f"{n}; columns would be silently dropped")
        step = n // tp_size
        return [(i * step, step) for i in range(tp_size)]

    if isinstance(ws[0], QuantizedTensor):
        qs, ss = [], []
        for i in range(tp_size):
            for w in ws:
                off, step = slices(w)[i]
                qs.append(w.q[..., off : off + step])
                ss.append(w.scales[..., off : off + step])
        return QuantizedTensor(q=jnp.concatenate(qs, axis=-1),
                               scales=jnp.concatenate(ss, axis=-1),
                               group_size=ws[0].group_size, bits=ws[0].bits)
    parts = []
    for i in range(tp_size):
        for w in ws:
            off, step = slices(w)[i]
            parts.append(w[..., off : off + step])
    return jnp.concatenate(parts, axis=-1)


def _interleave_w13(qt: QuantizedTensor, h_local: int, bh: int) -> QuantizedTensor:
    """Per-shard [W1 | W3] columns -> alternating bh-wide tiles
    [W1_0 W3_0 W1_1 W3_1 ...], so the fused-FFN kernel's phase A streams ONE
    contiguous (K, 2*bh) weight block per grid step instead of two (K, bh)
    blocks nh*bh columns apart (bigger DMA grain, same bytes). Pure column
    permutation — numerically exact; split_h13 inverts it on matmul outputs.
    """
    def rearr(a):
        *lead, k, n = a.shape
        ns = n // (2 * h_local)  # tp shard regions, each [W1_s | W3_s]
        t = a.reshape(*lead, k, ns, 2, h_local // bh, bh)
        t = jnp.swapaxes(t, -3, -2)  # (.., ns, nh, 2, bh)
        return t.reshape(*lead, k, n)

    return QuantizedTensor(q=rearr(qt.q), scales=rearr(qt.scales),
                           group_size=qt.group_size, bits=qt.bits, il=bh)


def split_h13(h13: jax.Array, w13) -> tuple:
    """Split a fused up-projection activation into (h1, h3), honoring the
    w13 column layout (plain halves, or il-tile interleaved)."""
    il = getattr(w13, "il", 0)
    if not il:
        return tuple(jnp.split(h13, 2, axis=-1))
    *lead, n = h13.shape
    t = h13.reshape(*lead, n // (2 * il), 2, il)
    return (t[..., 0, :].reshape(*lead, n // 2),
            t[..., 1, :].reshape(*lead, n // 2))


def fuse_params(params: Params, cfg: ModelConfig, tp_size: int = 1) -> Params:
    """Fuse the three attention input projections into one wqkv matmul and
    the two FFN up-projections into one w13 — 7 -> 4 weight streams per
    layer, cutting per-op overhead on the HBM-bound decode step.

    The reference issues every projection as its own kernel launch (and wq
    twice, infer.rs:20-21); fusion is the TPU-native counterpoint.

    Quantized w13 additionally gets the tile-interleaved column layout when
    the fused-FFN kernel's phase-A tile exists for these shapes (see
    _interleave_w13); split_h13 de-interleaves on the non-kernel paths.
    """
    if "wqkv" in params:
        return params
    p = dict(params)
    p["wqkv"] = _concat_weights([p.pop("wq"), p.pop("wk"), p.pop("wv")], cfg, tp_size)
    p["w13"] = _concat_weights([p.pop("w1"), p.pop("w3")], cfg, tp_size)
    w13, w2 = p["w13"], p.get("w2")
    if (isinstance(w13, QuantizedTensor) and isinstance(w2, QuantizedTensor)
            and w13.bits == w2.bits and cfg.hidden_dim % tp_size == 0):
        from rama_tpu.ops.pallas.ffn import phase_a_tile

        h_local = cfg.hidden_dim // tp_size
        bh = phase_a_tile(h_local, w13.bits, w2.group_size)
        if bh:
            p["w13"] = _interleave_w13(w13, h_local, bh)
    return p


def rmsnorm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    """fp32-accumulated RMS norm (cpu.rs:110-118 semantics)."""
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (w.astype(jnp.float32) * (xf * inv)).astype(x.dtype)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate interleaved (even, odd) lanes of the last dim.

    x: (..., T, n_heads, head_dim); cos/sin: (T, head_dim//2) broadcast over
    batch and heads. llama2.c convention (cpu.rs:87-96) — pairs are adjacent
    lanes (2i, 2i+1), not split halves like HF.
    """
    xf = x.astype(jnp.float32)
    shape = xf.shape[:-1] + (xf.shape[-1] // 2, 2)
    xp = xf.reshape(shape)
    xr, xi = xp[..., 0], xp[..., 1]
    c = cos[..., :, None, :]  # (..., T, 1, hd/2)
    s = sin[..., :, None, :]
    out = jnp.stack([xr * c - xi * s, xr * s + xi * c], axis=-1)
    return out.reshape(xf.shape).astype(x.dtype)


def _attention(q, k_cache, v_cache, pos_mask):
    """Grouped-query attention over the cached sequence (XLA path).

    q: (B, T, n_heads, hd); caches: (B, n_kv, S, hd);
    pos_mask: (B, T, S) True where key position is visible.
    Head counts come from the operand shapes, so the same code runs on the
    full model and on a tensor-parallel shard (heads split over the mesh).
    """
    b, t, nh, hd = q.shape
    nkv = k_cache.shape[1]
    rep = nh // nkv
    qg = q.reshape(b, t, nkv, rep, hd)
    if jax.default_backend() != "tpu" and k_cache.dtype == jnp.bfloat16:
        # the CPU dot thunk lacks bf16xbf16->f32 for this layout
        qg, k_cache, v_cache = (qg.astype(jnp.float32),
                                k_cache.astype(jnp.float32),
                                v_cache.astype(jnp.float32))
    # scores fp32 for softmax stability (the reference softmaxes fp32 too)
    scores = jnp.einsum(
        "btkrh,bksh->btkrs", qg, k_cache, preferred_element_type=jnp.float32
    ) / np.sqrt(hd)
    scores = jnp.where(pos_mask[:, :, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "btkrs,bksh->btkrh", probs.astype(v_cache.dtype), v_cache,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, t, nh * hd).astype(q.dtype)


def _layer(x, lp, cv, cos, sin, pos_index, pos_mask,
           cfg: ModelConfig, tp_axis: str | None = None, plen=None):
    """One transformer block over a (B, T) chunk against (B, S) caches.

    `cv` is the per-layer cache leaf tuple: (k, v) dense bf16 or
    (k, v, ks, vs) int8+scales (see QuantKVCache). Returns (x_out, new_cv).
    Cache write happens at positions `pos_index` (B, T) via a scatter
    (quantizing the rows first in int8 mode), supporting ragged decode.

    Under tensor parallelism (inside shard_map with `tp_axis` set), wq/wk/wv/
    w1/w3 are column-sharded and wo/w2 row-sharded (Megatron layout): x stays
    replicated, the two psums after attention-out and FFN-down restore the
    full residual — the only collectives per layer, riding ICI.
    """
    b, t, _ = x.shape
    hd = cfg.head_dim
    kv_quant = len(cv) == 4

    xb = rmsnorm(x, lp["attn_norm"], cfg.norm_eps)
    if "wqkv" in lp:
        # fused projection; local head counts recovered from the shard shape
        heads_total = cfg.n_heads + 2 * cfg.n_kv_heads
        heads_local = lp["wqkv"].shape[-1] // hd
        nh = heads_local * cfg.n_heads // heads_total
        nkv = heads_local * cfg.n_kv_heads // heads_total
        qkv = _linear(xb, lp["wqkv"])
        q = qkv[..., : nh * hd].reshape(b, t, nh, hd)
        k = qkv[..., nh * hd : (nh + nkv) * hd].reshape(b, t, nkv, hd)
        v = qkv[..., (nh + nkv) * hd :].reshape(b, t, nkv, hd)
    else:
        nh = (lp["wq"].shape[-1]) // hd    # local head count under TP
        nkv = (lp["wk"].shape[-1]) // hd
        q = _linear(xb, lp["wq"]).reshape(b, t, nh, hd)
        k = _linear(xb, lp["wk"]).reshape(b, t, nkv, hd)
        v = _linear(xb, lp["wv"]).reshape(b, t, nkv, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    # scatter k,v into the (B, n_kv, S, hd) caches at per-slot positions
    bi = jnp.arange(b)[:, None, None]                # (B, 1, 1)
    hi = jnp.arange(nkv)[None, None, :]              # (1, 1, nkv)
    pi = pos_index[:, :, None]                       # (B, T, 1)
    if kv_quant:
        k_cache, v_cache, ks_c, vs_c = cv
        kq, ksc = kv_quant_rows(k)                   # (B,T,nkv,hd),(B,T,nkv)
        vq, vsc = kv_quant_rows(v)
        k_cache = k_cache.at[bi, hi, pi].set(kq)
        v_cache = v_cache.at[bi, hi, pi].set(vq)
        ks_c = ks_c.at[bi, hi, pi].set(ksc)
        vs_c = vs_c.at[bi, hi, pi].set(vsc)
        cv = (k_cache, v_cache, ks_c, vs_c)
    else:
        k_cache, v_cache = cv
        k_cache = k_cache.at[bi, hi, pi].set(k.astype(k_cache.dtype))
        v_cache = v_cache.at[bi, hi, pi].set(v.astype(v_cache.dtype))
        cv = (k_cache, v_cache)

    from rama_tpu.ops.pallas.prefill_attention import (
        prefill_attention, prefill_attention_supported)

    on_tpu = jax.default_backend() == "tpu"
    if kv_quant and t == 1 and on_tpu and _decode_attn_supported(
            nh, nkv, hd, k_cache.shape[2]):
        from rama_tpu.ops.pallas.decode_attention import decode_attention_q8

        att = decode_attention_q8(q[:, 0], k_cache, v_cache, ks_c, vs_c,
                                  pos_index[:, 0])[:, None, :]
    elif kv_quant:
        kd, vd = _dequant_kv(k_cache, v_cache, ks_c, vs_c, q.dtype)
        att = _attention(q, kd, vd, pos_mask)
    elif t == 1 and on_tpu and _decode_attn_supported(
            nh, nkv, hd, k_cache.shape[2]):
        from rama_tpu.ops.pallas.decode_attention import decode_attention

        att = decode_attention(q[:, 0], k_cache, v_cache,
                               pos_index[:, 0])[:, None, :]
    elif (t > 1 and plen is not None and on_tpu
          and prefill_attention_supported(t, k_cache.shape[2], hd, nh, nkv)):
        # flash-style prefill: tiles above the causal diagonal are neither
        # read nor computed; the (T, S) score matrix never materializes
        att = prefill_attention(q, k_cache, v_cache,
                                plen).reshape(b, t, nh * hd)
    else:
        att = _attention(q, k_cache, v_cache, pos_mask)
    attn_out = _linear(att, lp["wo"])
    if tp_axis is not None:
        attn_out = jax.lax.psum(attn_out, tp_axis)
    x = x + attn_out

    xb = rmsnorm(x, lp["ffn_norm"], cfg.norm_eps)
    if "w13" in lp:
        h13 = _linear(xb, lp["w13"])
        h1, h3 = split_h13(h13, lp["w13"])
    else:
        h1 = _linear(xb, lp["w1"])
        h3 = _linear(xb, lp["w3"])
    ffn_out = _linear(jax.nn.silu(h1) * h3, lp["w2"])
    if tp_axis is not None:
        ffn_out = jax.lax.psum(ffn_out, tp_axis)
    x = x + ffn_out
    return x, cv


_LAYER_KEYS = ("attn_norm", "wq", "wk", "wv", "wqkv", "wo", "ffn_norm",
               "w1", "w2", "w3", "w13")


# Fused attention-block kernel (rope + cache write + attention + wo in one
# pallas_call, ops/pallas/attn_block.py) for the T=1 dense-cache decode path.
# Module flag so benches can A/B it; auto-disabled where unsupported.
# Correct on v5e (kernel-vs-XLA max-abs-err 0.0015 at 7B shapes for
# int8/int4 x b=1/8) but measured SLOWER than the unfused pipeline in
# same-session A/Bs (driver bench, 2026-08-19):
#   int8 b=1: off 95.6 / light 92.5 / full 90.8 tok/s
#   int4 b=1: off 145.5 / light 137-139 / full 135.0 tok/s
# i.e. XLA's op pipeline around the existing attention kernel is already
# tight; the fused call's extra in-kernel work (rope rolls, t==0 fold,
# window RMW) and, for the full variant, its tighter VMEM budget (hb=8
# head groups) cost more than the removed op boundaries. Kept for A/B and
# future chips. Modes (env RAMA_ATTN_BLOCK): 0 = off (default); 1 = light
# (rope + cache write + attention fused, wo separate); 2 = full (wo too).
import os as _os

_ATTN_BLOCK = int(_os.environ.get("RAMA_ATTN_BLOCK", "0"))


def _forward_decode_fused(params: Params, cfg: ModelConfig, tokens: jax.Array,
                          pos_index: jax.Array, cache: KVCache,
                          tp_axis: str | None = None):
    """Decode-step (T=1) forward with the fused attention kernel.

    Differences from the generic path, both eliminating whole-cache copies
    XLA otherwise materializes per layer (measured ~60% of step time at
    batch 8): the cache is a scan *carry* written by a row scatter, and
    attention reads the stacked cache in place via a layer-indexed Pallas
    kernel instead of a sliced dense view. Long caches (S > 512) use the
    S-tiled ragged kernel: bounded VMEM and only the rows below the slot's
    position are streamed. With a dense cache and quantized weights the
    whole attention block (rope + cache write + attention + wo) runs as ONE
    pallas_call per layer (ops/pallas/attn_block.py).
    """
    from rama_tpu.ops.pallas.decode_attention import (
        decode_attention_layer, decode_attention_layer_q8,
        decode_attention_layer_tiled, decode_attention_layer_tiled_q8)

    b = tokens.shape[0]
    dtype = params["final_norm"].dtype
    x = _embed(params["tok_embedding"], tokens, dtype)          # (B, 1, D)
    cos = jnp.take(params["rope_cos"], pos_index, axis=0, mode="clip")
    sin = jnp.take(params["rope_sin"], pos_index, axis=0, mode="clip")
    pos = pos_index[:, 0]                                        # (B,)
    hd = cfg.head_dim
    fused = "wqkv" in params
    ffn_one_call = (
        fused
        and jax.default_backend() == "tpu"
        and isinstance(params.get("w13"), QuantizedTensor)
        and _ffn_one_call_ok(params["w13"], params["w2"], b)
    )

    kv_quant = isinstance(cache, QuantKVCache)
    attn_block = (
        _ATTN_BLOCK
        and not kv_quant
        and hd == 128
        and jax.default_backend() == "tpu"
        and isinstance(params.get("wo"), QuantizedTensor)
    )
    if attn_block:
        from rama_tpu.ops.pallas.attn_block import attn_block_supported

        if not attn_block_supported(cfg, params["wo"], cache.max_len, b):
            attn_block = 0

    def body(carry, l):
        x, *cv = carry
        k_c, v_c = cv[0], cv[1]
        nkv_local = k_c.shape[2]

        xb = rmsnorm(x, jnp.take(params["attn_norm"], l, axis=0), cfg.norm_eps)
        if fused:
            heads_total = cfg.n_heads + 2 * cfg.n_kv_heads
            heads_local = params["wqkv"].shape[-1] // hd
            nh = heads_local * cfg.n_heads // heads_total
            nkv = heads_local * cfg.n_kv_heads // heads_total
            qkv = _linear_layered(xb, params["wqkv"], l)
            q = qkv[..., : nh * hd].reshape(b, 1, nh, hd)
            k = qkv[..., nh * hd : (nh + nkv) * hd].reshape(b, 1, nkv, hd)
            v = qkv[..., (nh + nkv) * hd :].reshape(b, 1, nkv, hd)
        else:
            nh = params["wq"].shape[-1] // hd
            nkv = params["wk"].shape[-1] // hd
            q = _linear_layered(xb, params["wq"], l).reshape(b, 1, nh, hd)
            k = _linear_layered(xb, params["wk"], l).reshape(b, 1, nkv, hd)
            v = _linear_layered(xb, params["wv"], l).reshape(b, 1, nkv, hd)
        if attn_block == 2:
            # one pallas_call: rope + cache write (in place, aliased) +
            # attention + wo — no scatter op, no per-op glue
            from rama_tpu.ops.pallas.attn_block import attn_block_layered

            attn_out, k_c, v_c = attn_block_layered(
                q[:, 0], k[:, 0], v[:, 0], cos[:, 0], sin[:, 0],
                k_c, v_c, params["wo"], pos, l)
            cv = (k_c, v_c)
            if tp_axis is not None:
                attn_out = jax.lax.psum(attn_out, tp_axis)
            x = x + attn_out[:, None]
        elif attn_block:
            # light fusion: rope + in-place cache write + attention in one
            # call; wo keeps its full standalone tiling budget
            from rama_tpu.ops.pallas.attn_block import attn_rope_write_layered

            att, k_c, v_c = attn_rope_write_layered(
                q[:, 0], k[:, 0], v[:, 0], cos[:, 0], sin[:, 0],
                k_c, v_c, pos, l)
            cv = (k_c, v_c)
            attn_out = _linear_layered(att, params["wo"], l)
            if tp_axis is not None:
                attn_out = jax.lax.psum(attn_out, tp_axis)
            x = x + attn_out[:, None]
        else:
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)

            bi = jnp.arange(b)[:, None]
            hi = jnp.arange(nkv_local)[None, :]
            pi = pos[:, None]
            if kv_quant:
                ks_c, vs_c = cv[2], cv[3]
                kq, ksc = kv_quant_rows(k[:, 0])     # (B,nkv,hd), (B,nkv)
                vq, vsc = kv_quant_rows(v[:, 0])
                # XLA's int8 scatter materializes the whole layer slice
                # (broadcast+select, ~1.7 ms/step at 7B b=8); the Pallas
                # writer updates the 32-row window in place (aliased)
                from rama_tpu.ops.pallas.kv_write import write_kv_rows_q8

                k_c, v_c, ks_c, vs_c = write_kv_rows_q8(
                    k_c, v_c, ks_c, vs_c, kq, vq, ksc, vsc, pos, l)
                cv = (k_c, v_c, ks_c, vs_c)
                if k_c.shape[3] > 256:
                    att = decode_attention_layer_tiled_q8(
                        q[:, 0], k_c, v_c, ks_c, vs_c, pos, l)
                else:
                    att = decode_attention_layer_q8(
                        q[:, 0], k_c, v_c, ks_c, vs_c, pos, l)
            else:
                k_c = k_c.at[l, bi, hi, pi].set(k[:, 0].astype(k_c.dtype))
                v_c = v_c.at[l, bi, hi, pi].set(v[:, 0].astype(v_c.dtype))
                cv = (k_c, v_c)
                if k_c.shape[3] > 256:
                    att = decode_attention_layer_tiled(q[:, 0], k_c, v_c,
                                                       pos, l)
                else:
                    att = decode_attention_layer(q[:, 0], k_c, v_c, pos, l)
            attn_out = _linear_layered(att, params["wo"], l)
            if tp_axis is not None:
                attn_out = jax.lax.psum(attn_out, tp_axis)
            x = x + attn_out[:, None]

        xb = rmsnorm(x, jnp.take(params["ffn_norm"], l, axis=0), cfg.norm_eps)
        if ffn_one_call:
            from rama_tpu.ops.pallas.ffn import ffn_fused_layered

            ffn_out = ffn_fused_layered(
                xb.reshape(b, -1), params["w13"], params["w2"], l
            ).reshape(xb.shape[0], xb.shape[1], -1)
        else:
            if fused:
                h13 = _linear_layered(xb, params["w13"], l)
                h1, h3 = split_h13(h13, params["w13"])
            else:
                h1 = _linear_layered(xb, params["w1"], l)
                h3 = _linear_layered(xb, params["w3"], l)
            ffn_out = _linear_layered(jax.nn.silu(h1) * h3, params["w2"], l)
        if tp_axis is not None:
            ffn_out = jax.lax.psum(ffn_out, tp_axis)
        x = x + ffn_out
        return (x, *cv), None

    # unroll: fewer while-loop iterations -> less per-layer carry/bookkeeping
    # overhead (profiled ~0.25 ms/step of inter-op gaps at b=1)
    (x, *cv_new), _ = jax.lax.scan(
        body, (x, *_cache_arrays(cache)),
        jnp.arange(cfg.n_layers, dtype=jnp.int32),
        unroll=4 if cfg.n_layers % 4 == 0 else 1)

    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    logits = _linear(x, params["wcls"]).astype(jnp.float32)
    if tp_axis is not None:
        logits = jax.lax.all_gather(logits, tp_axis, axis=logits.ndim - 1,
                                    tiled=True)
    return logits, _cache_rebuild(cache, tuple(cv_new))


def _forward_chunk_fused(params: Params, cfg: ModelConfig, tokens: jax.Array,
                         pos0: jax.Array, cache: KVCache,
                         tp_axis: str | None = None,
                         _interpret: bool = False):
    """Chunk forward (2 <= T <= 8, consecutive positions) with the fused
    layer-indexed attention kernels — the speculative-verification path.

    Same structure as _forward_decode_fused (cache as scan carry written by
    a row scatter; attention reads the stacked cache in place), but each
    slot carries T consecutive queries at pos0[b]..pos0[b]+T-1. Without
    this, a spec tick pays the generic (B, T) forward's per-layer cache
    re-stacking — measured at ~2x a plain decode step, eating most of the
    speculative win.
    """
    from rama_tpu.ops.pallas.decode_attention import (
        chunk_attention_layer, chunk_attention_layer_q8,
        chunk_attention_layer_tiled, chunk_attention_layer_tiled_q8)

    b, t = tokens.shape
    dtype = params["final_norm"].dtype
    x = _embed(params["tok_embedding"], tokens, dtype)          # (B, T, D)
    pos_index = pos0[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
    cos = jnp.take(params["rope_cos"], pos_index, axis=0, mode="clip")       # (B, T, hd/2)
    sin = jnp.take(params["rope_sin"], pos_index, axis=0, mode="clip")
    hd = cfg.head_dim
    fused = "wqkv" in params
    ffn_one_call = (
        fused
        and (jax.default_backend() == "tpu" or _interpret)
        and isinstance(params.get("w13"), QuantizedTensor)
        and _ffn_one_call_ok(params["w13"], params["w2"], b * t)
    )

    kv_quant = isinstance(cache, QuantKVCache)

    def body(carry, l):
        x, *cv = carry
        k_c, v_c = cv[0], cv[1]
        nkv_local = k_c.shape[2]

        xb = rmsnorm(x, jnp.take(params["attn_norm"], l, axis=0), cfg.norm_eps)
        if fused:
            heads_total = cfg.n_heads + 2 * cfg.n_kv_heads
            heads_local = params["wqkv"].shape[-1] // hd
            nh = heads_local * cfg.n_heads // heads_total
            nkv = heads_local * cfg.n_kv_heads // heads_total
            qkv = _linear_layered(xb, params["wqkv"], l)
            q = qkv[..., : nh * hd].reshape(b, t, nh, hd)
            k = qkv[..., nh * hd : (nh + nkv) * hd].reshape(b, t, nkv, hd)
            v = qkv[..., (nh + nkv) * hd :].reshape(b, t, nkv, hd)
        else:
            nh = params["wq"].shape[-1] // hd
            nkv = params["wk"].shape[-1] // hd
            q = _linear_layered(xb, params["wq"], l).reshape(b, t, nh, hd)
            k = _linear_layered(xb, params["wk"], l).reshape(b, t, nkv, hd)
            v = _linear_layered(xb, params["wv"], l).reshape(b, t, nkv, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        bi = jnp.arange(b)[:, None, None]
        hi = jnp.arange(nkv_local)[None, None, :]
        pi = pos_index[:, :, None]
        if kv_quant:
            ks_c, vs_c = cv[2], cv[3]
            kq, ksc = kv_quant_rows(k)           # (B,T,nkv,hd), (B,T,nkv)
            vq, vsc = kv_quant_rows(v)
            # same scatter-vs-in-place story as the T=1 decode path: XLA's
            # int8 scatter materializes the whole layer slice per chunk
            from rama_tpu.ops.pallas.kv_write import write_kv_chunk_q8

            k_c, v_c, ks_c, vs_c = write_kv_chunk_q8(
                k_c, v_c, ks_c, vs_c, kq, vq, ksc, vsc, pos0, l,
                interpret=_interpret)
            cv = (k_c, v_c, ks_c, vs_c)
            if k_c.shape[3] > 256:
                att = chunk_attention_layer_tiled_q8(
                    q, k_c, v_c, ks_c, vs_c, pos0, l, interpret=_interpret)
            else:
                att = chunk_attention_layer_q8(
                    q, k_c, v_c, ks_c, vs_c, pos0, l, interpret=_interpret)
        else:
            k_c = k_c.at[l, bi, hi, pi].set(k.astype(k_c.dtype))
            v_c = v_c.at[l, bi, hi, pi].set(v.astype(v_c.dtype))
            cv = (k_c, v_c)
            if k_c.shape[3] > 256:
                att = chunk_attention_layer_tiled(q, k_c, v_c, pos0, l,
                                                  interpret=_interpret)
            else:
                att = chunk_attention_layer(q, k_c, v_c, pos0, l,
                                            interpret=_interpret)
        attn_out = _linear_layered(att, params["wo"], l)        # (B, T, D)
        if tp_axis is not None:
            attn_out = jax.lax.psum(attn_out, tp_axis)
        x = x + attn_out

        xb = rmsnorm(x, jnp.take(params["ffn_norm"], l, axis=0), cfg.norm_eps)
        if ffn_one_call:
            from rama_tpu.ops.pallas.ffn import ffn_fused_layered

            ffn_out = ffn_fused_layered(
                xb.reshape(b * t, -1), params["w13"], params["w2"], l,
                interpret=_interpret,
            ).reshape(b, t, -1)
        else:
            if fused:
                h13 = _linear_layered(xb, params["w13"], l)
                h1, h3 = split_h13(h13, params["w13"])
            else:
                h1 = _linear_layered(xb, params["w1"], l)
                h3 = _linear_layered(xb, params["w3"], l)
            ffn_out = _linear_layered(jax.nn.silu(h1) * h3, params["w2"], l)
        if tp_axis is not None:
            ffn_out = jax.lax.psum(ffn_out, tp_axis)
        x = x + ffn_out
        return (x, *cv), None

    (x, *cv_new), _ = jax.lax.scan(
        body, (x, *_cache_arrays(cache)),
        jnp.arange(cfg.n_layers, dtype=jnp.int32),
        unroll=4 if cfg.n_layers % 4 == 0 else 1)

    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    logits = _linear(x, params["wcls"]).astype(jnp.float32)
    if tp_axis is not None:
        logits = jax.lax.all_gather(logits, tp_axis, axis=logits.ndim - 1,
                                    tiled=True)
    return logits, _cache_rebuild(cache, tuple(cv_new))


def forward_chunk(params: Params, cfg: ModelConfig, tokens: jax.Array,
                  pos0: jax.Array, cache: KVCache,
                  tp_axis: str | None = None):
    """Forward a (B, T) chunk of CONSECUTIVE tokens per slot: column j of
    slot b sits at position pos0[b] + j. The speculative-verification entry
    point (runtime.engine._spec_scan_tick, runtime.speculative): on TPU with
    2 <= T <= 8 it takes the fused carry-cache path, otherwise the generic
    forward. Returns (logits (B, T, V) fp32, new cache)."""
    b, t = tokens.shape
    if (2 <= t <= 8 and jax.default_backend() == "tpu"
            and _decode_attn_supported(cfg.n_heads, cfg.n_kv_heads,
                                       cfg.head_dim, cache.max_len)):
        return _forward_chunk_fused(params, cfg, tokens, pos0, cache, tp_axis)
    pos_index = pos0[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
    return forward(params, cfg, tokens, pos_index, cache, tp_axis)


def forward(params: Params, cfg: ModelConfig, tokens: jax.Array,
            pos_index: jax.Array, cache: KVCache, tp_axis: str | None = None,
            plen: jax.Array | None = None,
            logit_rows: jax.Array | None = None):
    """Forward a (B, T) token chunk at per-slot positions (B, T).

    Causal over the cache: position s of slot b is visible to query t iff
    s <= pos_index[b, t]. Returns (logits (B, T, V) fp32, new KVCache).
    Used with T=prompt_len for prefill and T=1 for decode.

    `plen` (B,) int32, prefill-only: promises this is a from-position-0
    causal prompt of per-slot length plen[b] (query t at position t, rows
    >= plen[b] padding). Enables the flash-style Pallas prefill kernel on
    TPU; numerics match the masked XLA path either way.

    `logit_rows` (B,) int32: compute the classifier only at column
    logit_rows[b] of each slot and return (B, 1, V) logits. Prefill only
    needs the last real row, and the full (B, T, V) fp32 tensor plus its
    lm_head matmul dominate prefill memory AND compute at large T
    (8 x 2048 x 32000 fp32 = 2.1 GB + ~2 TFLOP that admission throws away
    — an OOM at 7B on a 16 GB chip).

    With `tp_axis` set (inside shard_map), params/cache are the local TP
    shards; the returned logits are the full vocab (all-gathered).
    """
    b, t = tokens.shape
    if (logit_rows is None and t == 1 and jax.default_backend() == "tpu"
            and _decode_attn_supported(cfg.n_heads, cfg.n_kv_heads,
                                       cfg.head_dim, cache.max_len)):
        return _forward_decode_fused(params, cfg, tokens, pos_index, cache,
                                     tp_axis)
    dtype = params["final_norm"].dtype
    x = _embed(params["tok_embedding"], tokens, dtype)

    cos = jnp.take(params["rope_cos"], pos_index, axis=0, mode="clip")  # (B, T, hd/2)
    sin = jnp.take(params["rope_sin"], pos_index, axis=0, mode="clip")

    s = cache.max_len
    pos_mask = jnp.arange(s)[None, None, :] <= pos_index[:, :, None]  # (B,T,S)

    layer_params = {k: params[k] for k in _LAYER_KEYS if k in params}

    def body(x, xs):
        lp = xs[0]
        x, cv = _layer(x, lp, xs[1:], cos, sin, pos_index, pos_mask,
                       cfg, tp_axis, plen)
        return x, cv

    x, cv_new = jax.lax.scan(
        body, x, (layer_params, *_cache_arrays(cache)))

    if logit_rows is not None:
        x = jnp.take_along_axis(x, logit_rows[:, None, None], axis=1)  # (B,1,D)
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    logits = _linear(x, params["wcls"]).astype(jnp.float32)
    if tp_axis is not None:
        # classifier is vocab-sharded; gather shards into the full vocab dim
        logits = jax.lax.all_gather(logits, tp_axis, axis=logits.ndim - 1,
                                    tiled=True)
    return logits, _cache_rebuild(cache, cv_new)


def prefill(params: Params, cfg: ModelConfig, tokens: jax.Array,
            cache: KVCache, last_only: bool = False):
    """Process a whole (B, T) prompt in one batched pass from position 0.

    last_only=True returns (B, 1, V) logits for the final position only —
    generation never reads the other rows, and the full (B, T, V) fp32
    tensor + its lm_head matmul dominate long-prompt prefill memory/compute
    (see forward's logit_rows)."""
    b, t = tokens.shape
    pos = jnp.arange(t)[None, :].repeat(b, 0)
    rows = jnp.full((b,), t - 1, jnp.int32) if last_only else None
    return forward(params, cfg, tokens, pos, cache,
                   plen=jnp.full((b,), t, jnp.int32), logit_rows=rows)


def decode_step(params: Params, cfg: ModelConfig, token: jax.Array,
                pos: jax.Array, cache: KVCache):
    """One decode step for a batch of slots at ragged positions.

    token: (B,) int32; pos: (B,) int32. Returns (logits (B, V), new cache).
    """
    logits, cache = forward(params, cfg, token[:, None], pos[:, None], cache)
    return logits[:, 0], cache
