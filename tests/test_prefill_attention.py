"""Flash-style prefill attention kernel vs a dense masked-softmax reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from rama_tpu.ops.pallas.prefill_attention import (prefill_attention,
                                                   prefill_attention_supported)


def _ref(q, k, v, plen):
    """Dense causal reference: (B, T, nh, hd) x (B, nkv, S, hd)."""
    b, t, nh, hd = q.shape
    nkv, s = k.shape[1], k.shape[2]
    rep = nh // nkv
    out = np.zeros_like(q, dtype=np.float32)
    qf = np.asarray(q, np.float32)
    kf = np.asarray(k, np.float32)
    vf = np.asarray(v, np.float32)
    for bi in range(b):
        for h in range(nh):
            g = h // rep
            scores = qf[bi, :, h] @ kf[bi, g].T / np.sqrt(hd)  # (T, S)
            mask = (np.arange(s)[None, :] <= np.arange(t)[:, None]) & (
                np.arange(s)[None, :] < plen[bi])
            scores = np.where(mask, scores, -1e30)
            e = np.exp(scores - scores.max(-1, keepdims=True))
            probs = e / e.sum(-1, keepdims=True)
            out[bi, :, h] = probs @ vf[bi, g]
    # rows past plen are undefined in the kernel (zeros); zero them here too
    for bi in range(b):
        out[bi, plen[bi]:] = 0.0
    return out


@pytest.mark.parametrize("t,s", [(16, 32), (64, 64), (24, 48)])
@pytest.mark.parametrize("nh,nkv", [(4, 4), (4, 2)])
def test_prefill_attention_matches_dense(t, s, nh, nkv):
    hd = 128
    b = 2
    rng = np.random.default_rng(t + s + nh)
    assert prefill_attention_supported(t, s, hd, nh, nkv)
    q = jnp.asarray(rng.standard_normal((b, t, nh, hd)).astype(np.float32),
                    jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, nkv, s, hd)).astype(np.float32),
                    jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, nkv, s, hd)).astype(np.float32),
                    jnp.bfloat16)
    plen = np.array([t, max(t - 5, 1)], np.int32)

    got = np.asarray(
        prefill_attention(q, k, v, jnp.asarray(plen), interpret=True),
        np.float32)
    # mirror the kernel's zeroing of rows past plen
    want = _ref(q, k, v, plen)
    for bi in range(b):
        got[bi, plen[bi]:] = 0.0
    np.testing.assert_allclose(got, want, atol=0.03, rtol=0.05)


def test_prefill_attention_ragged_lengths():
    """Short prompts must not read (or be polluted by) rows past plen."""
    b, t, s, nh, nkv, hd = 2, 16, 32, 2, 2, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, t, nh, hd)).astype(np.float32),
                    jnp.bfloat16)
    k_np = rng.standard_normal((b, nkv, s, hd)).astype(np.float32)
    v_np = rng.standard_normal((b, nkv, s, hd)).astype(np.float32)
    plen = np.array([4, 16], np.int32)
    got1 = np.asarray(prefill_attention(
        jnp.asarray(q), jnp.asarray(k_np, jnp.bfloat16),
        jnp.asarray(v_np, jnp.bfloat16), jnp.asarray(plen), interpret=True))
    # poison the cache past plen: output must be unchanged
    k_np[0, :, 4:] = 99.0
    v_np[0, :, 4:] = -99.0
    got2 = np.asarray(prefill_attention(
        jnp.asarray(q), jnp.asarray(k_np, jnp.bfloat16),
        jnp.asarray(v_np, jnp.bfloat16), jnp.asarray(plen), interpret=True))
    np.testing.assert_array_equal(got1[:, :4], got2[:, :4])
