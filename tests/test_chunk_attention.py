"""Chunked-query (T<=8) layer-indexed attention kernels (interpret mode)
vs the XLA einsum path — the speculative-verification fast path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rama_tpu.models.llama import _attention, kv_quant_rows
from rama_tpu.ops.pallas.decode_attention import (
    chunk_attention_layer, chunk_attention_layer_q8,
    chunk_attention_layer_tiled, chunk_attention_layer_tiled_q8)


def make(b, t, nh, nkv, s, hd, L, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, t, nh, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((L, b, nkv, s, hd)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((L, b, nkv, s, hd)) * 0.3, jnp.float32)
    # chunk must fit: pos0 + t - 1 < s
    pos0 = jnp.asarray(rng.integers(0, s - t, b), jnp.int32)
    return q, k, v, pos0


def xla_reference(q, k, v, pos0):
    """Query column j of slot b sits at position pos0[b]+j."""
    b, t, nh, hd = q.shape
    s = k.shape[2]
    pos_index = pos0[:, None] + jnp.arange(t)[None, :]          # (B, T)
    pos_mask = jnp.arange(s)[None, None, :] <= pos_index[:, :, None]
    return _attention(q, k, v, pos_mask)


@pytest.mark.parametrize("b,t,nh,nkv,s,hd", [
    (2, 4, 4, 4, 64, 128),    # MHA
    (2, 3, 8, 2, 128, 128),   # GQA rep=4
    (1, 8, 4, 1, 256, 128),   # MQA
])
def test_chunk_attention_layer_matches(b, t, nh, nkv, s, hd):
    L = 3
    q, k, v, pos0 = make(b, t, nh, nkv, s, hd, L, seed=1)
    for l in range(L):
        want = np.asarray(xla_reference(q, k[l], v[l], pos0)).reshape(
            b, t, nh * hd)
        got = np.asarray(chunk_attention_layer(q, k, v, pos0, jnp.int32(l),
                                               interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4,
                                   err_msg=f"layer {l}")


@pytest.mark.parametrize("t,nh,nkv", [(4, 4, 4), (3, 8, 2)])
def test_chunk_attention_layer_tiled_matches(t, nh, nkv):
    b, s, hd, L = 2, 512, 128, 2
    q, k, v, pos0 = make(b, t, nh, nkv, s, hd, L, seed=2)
    for l in range(L):
        want = np.asarray(xla_reference(q, k[l], v[l], pos0)).reshape(
            b, t, nh * hd)
        got = np.asarray(chunk_attention_layer_tiled(
            q, k, v, pos0, jnp.int32(l), chunk=128, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4,
                                   err_msg=f"layer {l}")


def test_chunk_attention_tile_boundary():
    """Chunks straddling an S-tile boundary read the extra tile."""
    b, t, nh, nkv, s, hd, L = 1, 4, 2, 2, 256, 128, 1
    q, k, v, _ = make(b, t, nh, nkv, s, hd, L, seed=3)
    for p0 in (125, 126, 127, 128):   # chunk spans rows p0..p0+3
        pos0 = jnp.asarray([p0], jnp.int32)
        want = np.asarray(xla_reference(q, k[0], v[0], pos0)).reshape(
            b, t, nh * hd)
        got = np.asarray(chunk_attention_layer_tiled(
            q, k, v, pos0, jnp.int32(0), chunk=128, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4,
                                   err_msg=f"pos0 {p0}")


@pytest.mark.parametrize("kv_quant,max_len", [
    (False, 48),    # non-tiled kernels
    (False, 512),   # S-tiled kernels
    (True, 48),
    (True, 512),
])
def test_forward_chunk_fused_matches_generic(tiny_model, kv_quant, max_len):
    """The speculative fast path (_forward_chunk_fused, kernels in interpret
    mode) must equal the generic (B, T) forward: logits at every chunk
    column and the cache rows it writes."""
    from rama_tpu.models.llama import (KVCache, QuantKVCache,
                                       _forward_chunk_fused, forward,
                                       load_params)

    cfg, np_params = tiny_model
    params = load_params(cfg, np_params, dtype=jnp.float32)
    b, t, p = 2, 4, 9
    mk = (QuantKVCache if kv_quant else KVCache).create
    rng = np.random.default_rng(11)
    prompt = jnp.asarray(rng.integers(1, cfg.vocab_size, (b, p)), jnp.int32)
    prompt_pos = jnp.arange(p, dtype=jnp.int32)[None, :].repeat(b, 0)
    caches = []
    for _ in range(2):
        _, c = forward(params, cfg, prompt, prompt_pos,
                       mk(cfg, batch=b, max_len=max_len))
        caches.append(c)

    chunk = jnp.asarray(rng.integers(1, cfg.vocab_size, (b, t)), jnp.int32)
    pos0 = jnp.asarray([p, p], jnp.int32)
    pos_index = pos0[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
    want_logits, want_cache = forward(params, cfg, chunk, pos_index,
                                      caches[0])
    got_logits, got_cache = _forward_chunk_fused(params, cfg, chunk, pos0,
                                                 caches[1], _interpret=True)
    tol = 5e-2 if kv_quant else 2e-2  # bf16 cache + different reduce order
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(want_logits), rtol=tol, atol=tol)
    for leaf_w, leaf_g in zip(jax.tree.leaves(want_cache),
                              jax.tree.leaves(got_cache)):
        # 1-ulp differences allowed: the two paths reduce matmuls in a
        # different order before the bf16/int8 cache rounding
        atol = 1.001 if leaf_w.dtype == jnp.int8 else 5e-3
        np.testing.assert_allclose(np.asarray(leaf_g).astype(np.float32),
                                   np.asarray(leaf_w).astype(np.float32),
                                   rtol=5e-3, atol=atol)


def quantize(k, v):
    """Row-quantize stacked (L, B, nkv, S, hd) caches layer by layer."""
    ks, vs = [], []
    kq, vq = [], []
    for l in range(k.shape[0]):
        a, b_ = kv_quant_rows(k[l])
        c, d = kv_quant_rows(v[l])
        kq.append(a); ks.append(b_); vq.append(c); vs.append(d)
    return (jnp.stack(kq), jnp.stack(vq), jnp.stack(ks), jnp.stack(vs))


@pytest.mark.parametrize("tiled", [False, True])
def test_chunk_attention_q8_matches(tiled):
    b, t, nh, nkv, s, hd, L = 2, 4, 4, 2, 256, 128, 2
    q, k, v, pos0 = make(b, t, nh, nkv, s, hd, L, seed=4)
    k8, v8, ks, vs = quantize(k, v)
    for l in range(L):
        kd = k8[l].astype(jnp.float32) * ks[l][..., None]
        vd = v8[l].astype(jnp.float32) * vs[l][..., None]
        want = np.asarray(xla_reference(q, kd, vd, pos0)).reshape(
            b, t, nh * hd)
        if tiled:
            got = np.asarray(chunk_attention_layer_tiled_q8(
                q, k8, v8, ks, vs, pos0, jnp.int32(l), chunk=128,
                interpret=True))
        else:
            got = np.asarray(chunk_attention_layer_q8(
                q, k8, v8, ks, vs, pos0, jnp.int32(l), interpret=True))
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3,
                                   err_msg=f"layer {l} tiled={tiled}")
