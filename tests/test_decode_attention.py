"""Fused decode-attention kernels (interpret mode) vs the XLA einsum path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rama_tpu.models.llama import _attention
from rama_tpu.ops.pallas.decode_attention import (decode_attention,
                                                  decode_attention_layer)


def make(b, nh, nkv, s, hd, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, nh, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, nkv, s, hd)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, nkv, s, hd)) * 0.3, jnp.float32)
    pos = jnp.asarray(rng.integers(0, s, b), jnp.int32)
    return q, k, v, pos


def xla_reference(q, k, v, pos):
    b, nh, hd = q.shape
    s = k.shape[2]
    pos_mask = (jnp.arange(s)[None, None, :] <= pos[:, None, None])
    return _attention(q[:, None], k, v, pos_mask)[:, 0]


@pytest.mark.parametrize("b,nh,nkv,s,hd", [
    (2, 4, 4, 64, 128),    # MHA
    (3, 8, 2, 128, 128),   # GQA rep=4
    (1, 4, 1, 256, 128),   # MQA
])
def test_decode_attention_matches_xla(b, nh, nkv, s, hd):
    q, k, v, pos = make(b, nh, nkv, s, hd)
    want = np.asarray(xla_reference(q, k, v, pos))
    got = np.asarray(decode_attention(q, k, v, pos, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_decode_attention_layer_matches(rng):
    b, nh, nkv, s, hd, L = 2, 4, 2, 64, 128, 3
    q, k0, v0, pos = make(b, nh, nkv, s, hd, seed=3)
    k_full = jnp.asarray(rng.standard_normal((L, b, nkv, s, hd)) * 0.3, jnp.float32)
    v_full = jnp.asarray(rng.standard_normal((L, b, nkv, s, hd)) * 0.3, jnp.float32)
    for l in range(L):
        want = np.asarray(xla_reference(q, k_full[l], v_full[l], pos))
        got = np.asarray(decode_attention_layer(q, k_full, v_full, pos,
                                                jnp.int32(l), interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4,
                                   err_msg=f"layer {l}")


def test_pos_zero_attends_only_first():
    b, nh, nkv, s, hd = 1, 2, 2, 64, 128
    q, k, v, _ = make(b, nh, nkv, s, hd, seed=9)
    pos = jnp.zeros(b, jnp.int32)
    got = np.asarray(decode_attention(q, k, v, pos, interpret=True))
    want = np.asarray(v[:, :, 0, :]).reshape(b, nh // nkv and nkv * hd * (nh // nkv) // (nh // nkv))
    # softmax over a single visible position returns v[..., 0, :] per head
    expect = np.repeat(np.asarray(v[0, :, 0, :]), nh // nkv, axis=0).reshape(-1)
    np.testing.assert_allclose(got[0], expect, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("s,chunk", [
    (1024, 512),  # 2 chunks
    (96, 32),     # 3 chunks, small tiles
    (64, 512),    # chunk > S -> single tile (degenerates to the flat kernel)
])
def test_decode_attention_layer_tiled_matches(s, chunk):
    """S-tiled ragged kernel vs the einsum path: online softmax across
    chunks, positions at chunk boundaries, early/late ragged slots."""
    from rama_tpu.ops.pallas.decode_attention import decode_attention_layer_tiled

    rng = np.random.default_rng(17)
    b, nh, nkv, hd, L = 3, 4, 2, 128, 2
    q = jnp.asarray(rng.standard_normal((b, nh, hd)), jnp.float32)
    k_full = jnp.asarray(rng.standard_normal((L, b, nkv, s, hd)) * 0.3, jnp.float32)
    v_full = jnp.asarray(rng.standard_normal((L, b, nkv, s, hd)) * 0.3, jnp.float32)
    # one slot near the start, one exactly at a chunk boundary, one at the end
    pos = jnp.asarray([3, min(chunk, s) - 1, s - 1], jnp.int32)
    for layer in range(L):
        got = decode_attention_layer_tiled(q, k_full, v_full, pos,
                                           jnp.int32(layer), chunk=chunk,
                                           interpret=True)
        want = np.asarray(xla_reference(q, k_full[layer], v_full[layer], pos))
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-4, err_msg=f"layer {layer}")
