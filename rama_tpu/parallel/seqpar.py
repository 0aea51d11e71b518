"""Sequence-parallel decode: the KV cache's SEQUENCE dim sharded over the
`model` mesh axis (blockwise attention with a flash-style combine).

Beyond ~16-32K tokens, a single chip's decode is bounded by streaming the
live KV prefix (the measured S=16K curve: 93 -> 63 tok/s as the prefix
fills, tools/results/serving_r04.jsonl), and eventually by HBM capacity for
the cache itself. Tensor parallelism doesn't help that axis — it shards KV
HEADS, so every chip still streams S rows. Sequence parallelism shards the
ROWS: chip i owns cache positions [i*Ss, (i+1)*Ss), computes a partial
attention (unnormalized flash output + running max/sum-exp) over its block,
and one psum/pmax pair combines the partials exactly — the blockwise
decomposition of softmax(QK^T)V used by ring/blockwise attention, with XLA
collectives riding ICI instead of an explicit ring permute (the all-reduce
IS the ring at this message size; a hand-rolled ppermute ring only wins when
overlap with per-block compute matters, i.e. prefill — see the module-end
note). Weights are fully REPLICATED here: attention reads scale as S/n_dev
per chip while the weight stream stays constant, which is the right trade
precisely in the long-context regime this targets (S*kv_bytes >> weight
bytes; at 7B int8 + 16K int8 KV the cache already rivals the weights).

The reference has no analogue (its attention is a serial scan over one
host's cache, engine/src/device/cpu.rs:34-48); SURVEY §5 scopes this as the
post-parity stretch. Composes with data parallelism (batch over `data`).

Numerics: the combine is exact up to fp summation order (same guarantee as
any flash-attention tiling); the oracle test pins it against the dense
single-device step (tests/test_seqpar.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rama_tpu.config import ModelConfig
from rama_tpu.models.llama import (KVCache, QuantKVCache, _LAYER_KEYS,
                                   _cache_arrays, _cache_rebuild, _embed,
                                   _linear, apply_rope, kv_quant_rows,
                                   rmsnorm, split_h13)
from rama_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from rama_tpu.runtime.sampler import fold_in_pos, sample_batched_keyed

P = jax.sharding.PartitionSpec


def seqpar_cache_spec(kv_quant: bool = False):
    """(L, B, n_kv, S, hd): batch over `data`, SEQUENCE over `model` —
    each chip owns a contiguous S/n block of every slot's cache."""
    s = P(None, DATA_AXIS, None, MODEL_AXIS, None)
    if kv_quant:
        sc = P(None, DATA_AXIS, None, MODEL_AXIS)
        return QuantKVCache(k=s, v=s, ks=sc, vs=sc)
    return KVCache(k=s, v=s)


def _partial_attention(q, k_local, v_local, pos, base):
    """Flash-style partial attention over this chip's S-block.

    q: (B, nh, hd); k/v_local: (B, nkv, Ss, hd); pos: (B,) global query
    positions; base: () this shard's first global row index.

    Returns (o_un (B, nh, hd) fp32 unnormalized, m (B, nh) row max,
    l (B, nh) sum-exp) — combined across shards by the caller with the
    standard max/rescale/psum identity:
        softmax(s)V = sum_i exp(m_i - M) o_i / sum_i exp(m_i - M) l_i.
    """
    b, nh, hd = q.shape
    nkv = k_local.shape[1]
    rep = nh // nkv
    ss = k_local.shape[2]
    qg = q.reshape(b, nkv, rep, hd)
    if jax.default_backend() != "tpu" and k_local.dtype == jnp.bfloat16:
        qg = qg.astype(jnp.float32)
        k_local = k_local.astype(jnp.float32)
        v_local = v_local.astype(jnp.float32)
    scores = jnp.einsum("bkrh,bksh->bkrs", qg, k_local,
                        preferred_element_type=jnp.float32) / np.sqrt(hd)
    idx = base + jnp.arange(ss)
    visible = idx[None, None, None, :] <= pos[:, None, None, None]
    scores = jnp.where(visible, scores, -jnp.inf)
    m = jnp.max(scores, axis=-1)                         # (B, nkv, rep)
    # a shard whose whole block is masked contributes m=-inf; exp(-inf-(-inf))
    # is nan — substitute a finite max, its weights are exactly 0 anyway
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(scores - m_safe[..., None])
    p = jnp.where(visible, p, 0.0)
    l = jnp.sum(p, axis=-1)                              # (B, nkv, rep)
    o = jnp.einsum("bkrs,bksh->bkrh", p.astype(v_local.dtype), v_local,
                   preferred_element_type=jnp.float32)
    return (o.reshape(b, nh, hd).astype(jnp.float32),
            m_safe.reshape(b, nh) + jnp.where(
                jnp.isfinite(m.reshape(b, nh)), 0.0, -jnp.inf),
            l.reshape(b, nh))


def _combine(o, m, l, seq_axis):
    """psum/pmax combine of per-shard partials into the exact softmax."""
    M = jax.lax.pmax(m, seq_axis)                        # (B, nh)
    M_safe = jnp.where(jnp.isfinite(M), M, 0.0)
    scale = jnp.where(jnp.isfinite(m), jnp.exp(m - M_safe), 0.0)
    o = jax.lax.psum(o * scale[..., None], seq_axis)
    l = jax.lax.psum(l * scale, seq_axis)
    return o / jnp.maximum(l, 1e-30)[..., None]


def _owner_write(cache_leaf, rows, pos_local, ss):
    """Scatter (B, nkv, ...) rows into this shard's block at local positions,
    dropping rows another shard owns (clamped to an out-of-bounds index —
    each global position has exactly one owner, so the union over shards is
    the dense scatter)."""
    b = rows.shape[0]
    valid = (pos_local >= 0) & (pos_local < ss)
    safe = jnp.where(valid, pos_local, ss)               # ss is OOB -> drop
    bi = jnp.arange(b)
    return cache_leaf.at[bi, :, safe].set(
        rows.astype(cache_leaf.dtype), mode="drop")


def _seqpar_layer(x, lp, cv, cos, sin, pos, cfg: ModelConfig,
                  seq_axis: str):
    """One decode-step (T=1) transformer block against S-sharded caches.

    Weights replicated, cache leaves are this chip's (B, nkv, Ss, hd)
    sequence block. The only collectives are the attention combine's
    pmax+psum pair per layer."""
    b = x.shape[0]
    hd = cfg.head_dim
    kv_quant = len(cv) == 4
    nh, nkv = cfg.n_heads, cfg.n_kv_heads

    xb = rmsnorm(x[:, None], lp["attn_norm"], cfg.norm_eps)
    if "wqkv" in lp:
        qkv = _linear(xb, lp["wqkv"])[:, 0]
        q = qkv[:, : nh * hd].reshape(b, nh, hd)
        k = qkv[:, nh * hd: (nh + nkv) * hd].reshape(b, nkv, hd)
        v = qkv[:, (nh + nkv) * hd:].reshape(b, nkv, hd)
    else:
        q = _linear(xb, lp["wq"])[:, 0].reshape(b, nh, hd)
        k = _linear(xb, lp["wk"])[:, 0].reshape(b, nkv, hd)
        v = _linear(xb, lp["wv"])[:, 0].reshape(b, nkv, hd)
    q = apply_rope(q[:, None], cos, sin)[:, 0]
    k = apply_rope(k[:, None], cos, sin)[:, 0]

    ss = cv[0].shape[2]
    base = jax.lax.axis_index(seq_axis).astype(jnp.int32) * ss
    pos_local = pos - base                               # (B,)
    if kv_quant:
        k_cache, v_cache, ks_c, vs_c = cv
        kq, ksc = kv_quant_rows(k[:, None])              # (B,1,nkv,*)
        vq, vsc = kv_quant_rows(v[:, None])
        k_cache = _owner_write(k_cache, kq[:, 0], pos_local, ss)
        v_cache = _owner_write(v_cache, vq[:, 0], pos_local, ss)
        ks_c = _owner_write(ks_c, ksc[:, 0], pos_local, ss)
        vs_c = _owner_write(vs_c, vsc[:, 0], pos_local, ss)
        cv = (k_cache, v_cache, ks_c, vs_c)
        kd = (k_cache.astype(jnp.float32)
              * ks_c[..., None].astype(jnp.float32)).astype(x.dtype)
        vd = (v_cache.astype(jnp.float32)
              * vs_c[..., None].astype(jnp.float32)).astype(x.dtype)
    else:
        k_cache, v_cache = cv
        k_cache = _owner_write(k_cache, k, pos_local, ss)
        v_cache = _owner_write(v_cache, v, pos_local, ss)
        cv = (k_cache, v_cache)
        kd, vd = k_cache, v_cache

    o, m, l = _partial_attention(q, kd, vd, pos, base)
    att = _combine(o, m, l, seq_axis).astype(x.dtype)    # (B, nh, hd)
    x = x + _linear(att.reshape(b, 1, nh * hd), lp["wo"])[:, 0]

    xb = rmsnorm(x[:, None], lp["ffn_norm"], cfg.norm_eps)
    if "w13" in lp:
        h13 = _linear(xb, lp["w13"])
        h1, h3 = split_h13(h13, lp["w13"])
    else:
        h1 = _linear(xb, lp["w1"])
        h3 = _linear(xb, lp["w3"])
    x = x + _linear(jax.nn.silu(h1) * h3, lp["w2"])[:, 0]
    return x, cv


def forward_seqpar_decode(params, cfg: ModelConfig, tokens, pos, cache,
                          seq_axis: str):
    """T=1 decode forward with S-sharded caches (call inside shard_map).

    tokens/pos: (B,). Returns (logits (B, V) fp32, new cache)."""
    dtype = params["final_norm"].dtype
    x = _embed(params["tok_embedding"], tokens[:, None], dtype)[:, 0]
    cos = jnp.take(params["rope_cos"], pos[:, None], axis=0, mode="clip")
    sin = jnp.take(params["rope_sin"], pos[:, None], axis=0, mode="clip")
    layer_params = {k: params[k] for k in _LAYER_KEYS if k in params}

    def body(x, xs):
        lp = xs[0]
        x, cv = _seqpar_layer(x, lp, xs[1:], cos, sin, pos, cfg, seq_axis)
        return x, cv

    x, cv_new = jax.lax.scan(body, x, (layer_params, *_cache_arrays(cache)))
    x = rmsnorm(x[:, None], params["final_norm"], cfg.norm_eps)
    logits = _linear(x, params["wcls"])[:, 0].astype(jnp.float32)
    return logits, _cache_rebuild(cache, cv_new)


def make_seqpar_decode_step(cfg: ModelConfig, mesh, params_example,
                            kv_quant: bool = False):
    """Sampled sequence-parallel decode step over a (data, model) mesh:
    weights replicated, slot batch over `data`, cache SEQUENCE over `model`.

    Returns step(params, tokens (B,), pos (B,), temps, top_ps,
    slot_keys (B, 2), cache) -> (next (B,), logits (B, V), cache)."""
    pspec = jax.tree_util.tree_map(lambda _: P(), params_example)
    cspec = seqpar_cache_spec(kv_quant)

    def inner(params, tokens, pos, cache):
        return forward_seqpar_decode(params, cfg, tokens, pos, cache,
                                     MODEL_AXIS)

    mapped = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(pspec, P(DATA_AXIS), P(DATA_AXIS), cspec),
        out_specs=(P(DATA_AXIS, None), cspec),
        check_vma=False)

    @partial(jax.jit, donate_argnames=("cache",))
    def step(params, tokens, pos, temps, top_ps, slot_keys, cache):
        logits, cache = mapped(params, tokens, pos, cache)
        nxt = sample_batched_keyed(logits, fold_in_pos(slot_keys, pos),
                                   temps, top_ps)
        return nxt, logits, cache

    return step


def make_seqpar_decode_tick(cfg: ModelConfig, mesh, params_example,
                            kv_quant: bool = False):
    """Multi-token sequence-parallel decode tick — the seqpar counterpart of
    tp.make_decode_tick, PLUG-COMPATIBLE with the Engine's mesh tick slot:
    tick(params, tokens (B,), pos (B,), temps, top_ps, slot_keys (B, 2),
    cache, n=) -> (tokens (n, B), cache). n sampled steps per dispatch, the
    sampled feedback never leaving the device."""
    pspec = jax.tree_util.tree_map(lambda _: P(), params_example)
    cspec = seqpar_cache_spec(kv_quant)

    def inner(params, tokens, pos, cache):
        return forward_seqpar_decode(params, cfg, tokens, pos, cache,
                                     MODEL_AXIS)

    mapped = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(pspec, P(DATA_AXIS), P(DATA_AXIS), cspec),
        out_specs=(P(DATA_AXIS, None), cspec),
        check_vma=False)

    @partial(jax.jit, static_argnames=("n",), donate_argnames=("cache",))
    def tick(params, tokens, pos, temps, top_ps, slot_keys, cache, n=1):
        def body(carry, _):
            tokens, pos, cache = carry
            logits, cache = mapped(params, tokens, pos, cache)
            nxt = sample_batched_keyed(logits, fold_in_pos(slot_keys, pos),
                                       temps, top_ps)
            return (nxt, pos + 1, cache), nxt

        (_, _, cache), out = jax.lax.scan(body, (tokens, pos, cache), None,
                                          length=n)
        return out, cache

    return tick


def shard_seqpar_cache(cache, mesh):
    from rama_tpu.parallel.distributed import make_global
    from rama_tpu.models.llama import QuantKVCache

    spec = seqpar_cache_spec(isinstance(cache, QuantKVCache))
    return jax.tree_util.tree_map(
        lambda x, s: make_global(x, mesh, s), cache, spec)


def replicate_params(params, mesh):
    from rama_tpu.parallel.distributed import make_global

    return jax.tree_util.tree_map(
        lambda x: make_global(jnp.asarray(x), mesh, P()), params)


# Prefill note: blockwise-ring prefill (each chip processes its query block
# while KV blocks rotate via ppermute, overlapping transfer with per-block
# attention) follows the same partial/combine algebra with the psum unrolled
# into n_dev ring steps. Decode doesn't want it — the per-step payload
# (B, nh, hd) is far below the ICI bandwidth-latency product, so the single
# fused all-reduce is faster than n_dev dependent hops. For seqpar serving,
# prompts can prefill through the existing chunked-prefill path (chunks land
# in each owner's block via the same owner-write rule).
