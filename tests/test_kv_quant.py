"""INT8 KV cache: kernel oracles (interpret mode) and model-level parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rama_tpu.models.llama import (KVCache, QuantKVCache, _attention,
                                   _dequant_kv, decode_step, kv_quant_rows,
                                   load_params, prefill)
from rama_tpu.ops.pallas.decode_attention import (
    decode_attention_layer_q8, decode_attention_layer_tiled_q8,
    decode_attention_q8)
from rama_tpu.testing.ref_model import random_params, tiny_config


def _quant_cache(rng, L, B, nkv, S, hd):
    k = rng.standard_normal((L, B, nkv, S, hd)).astype(np.float32)
    v = rng.standard_normal((L, B, nkv, S, hd)).astype(np.float32)
    k8, ks = kv_quant_rows(jnp.asarray(k))
    v8, vs = kv_quant_rows(jnp.asarray(v))
    return k8, v8, ks, vs


def _xla_want(q, k8, v8, ks, vs, pos):
    kd, vd = _dequant_kv(k8, v8, ks, vs, jnp.float32)
    s = kd.shape[2]
    mask = (jnp.arange(s)[None, None, :] <= pos[:, None, None])
    return _attention(q[:, None].astype(jnp.float32), kd, vd, mask)[:, 0]


@pytest.mark.parametrize("s", [64, 1024])
@pytest.mark.parametrize("rep", [1, 2])
def test_decode_attention_q8_matches_dequant(s, rep):
    rng = np.random.default_rng(s)
    B, nkv, hd = 2, 2, 128
    k8, v8, ks, vs = _quant_cache(rng, 1, B, nkv, s, hd)
    q = jnp.asarray(rng.standard_normal((B, nkv * rep, hd)).astype(np.float32),
                    jnp.bfloat16)
    pos = jnp.asarray([s - 1, s // 3], jnp.int32)
    got = decode_attention_q8(q, k8[0], v8[0], ks[0], vs[0], pos,
                              interpret=True)
    want = _xla_want(q, k8[0], v8[0], ks[0], vs[0], pos)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               atol=0.03, rtol=0.05)


@pytest.mark.parametrize("rep", [1, 2])
def test_decode_attention_layer_q8_variants(rep):
    rng = np.random.default_rng(1)
    L, B, nkv, hd, s = 3, 2, 2, 128, 1024
    k8, v8, ks, vs = _quant_cache(rng, L, B, nkv, s, hd)
    q = jnp.asarray(rng.standard_normal((B, nkv * rep, hd)).astype(np.float32),
                    jnp.bfloat16)
    pos = jnp.asarray([700, 13], jnp.int32)
    for l in range(L):
        want = _xla_want(q, k8[l], v8[l], ks[l], vs[l], pos)
        got = decode_attention_layer_q8(q, k8, v8, ks, vs, pos,
                                        jnp.int32(l), interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want), atol=0.03, rtol=0.05)
        got_t = decode_attention_layer_tiled_q8(q, k8, v8, ks, vs, pos,
                                                jnp.int32(l), interpret=True)
        np.testing.assert_allclose(np.asarray(got_t, np.float32),
                                   np.asarray(want), atol=0.03, rtol=0.05)


def test_kv_quant_rows_roundtrip():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((4, 3, 128)).astype(np.float32) * 3)
    q, s = kv_quant_rows(x)
    back = np.asarray(q, np.float32) * np.asarray(s)[..., None]
    err = np.abs(back - np.asarray(x)).max() / np.abs(np.asarray(x)).max()
    assert err < 0.01
    assert q.dtype == jnp.int8 and np.abs(np.asarray(q)).max() <= 127


def test_model_decode_with_quant_cache_close_to_dense():
    """Prefill + decode through the XLA fallback path with an int8 cache:
    greedy chains must track the dense-cache chains."""
    cfg = tiny_config()
    params = load_params(cfg, random_params(cfg, seed=11), dtype=jnp.float32)
    prompt = jnp.asarray([[1, 7, 3, 9, 2, 4, 8, 5]], jnp.int32)

    def chain(cache):
        lg, cache = prefill(params, cfg, prompt, cache)
        tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
        toks = [int(tok[0])]
        for pos in range(prompt.shape[1], prompt.shape[1] + 6):
            lg, cache = decode_step(params, cfg, tok,
                                    jnp.asarray([pos], jnp.int32), cache)
            tok = jnp.argmax(lg, -1).astype(jnp.int32)
            toks.append(int(tok[0]))
        return toks, np.asarray(lg)

    toks_q, lg_q = chain(QuantKVCache.create(cfg, batch=1))
    toks_d, lg_d = chain(KVCache.create(cfg, batch=1, dtype=jnp.float32))
    err = np.abs(lg_q - lg_d).max() / (np.abs(lg_d).max() + 1e-6)
    assert err < 0.05, f"int8 KV cache moved logits too far: {err}"
    assert toks_q == toks_d


def test_engine_with_int8_kv_cache():
    """Continuous-batching engine on an int8 KV cache matches the dense
    engine's greedy streams end to end."""
    from rama_tpu.config import EngineConfig
    from rama_tpu.runtime.engine import Engine, Request
    from tests.test_engine import collect, make_tokenizer

    cfg = tiny_config()
    params = load_params(cfg, random_params(cfg, seed=21), dtype=jnp.float32)
    tok = make_tokenizer(cfg.vocab_size)
    outs = {}
    for name, kvq in (("int8", "int8"), ("dense", None)):
        eng = Engine(cfg, params, tok,
                     EngineConfig(max_batch_size=2, kv_quant=kvq))
        eng.start()
        try:
            reqs = [Request(prompt="ab", steps=6, temperature=0.0),
                    Request(prompt="ba", steps=6, temperature=0.0)]
            for r in reqs:
                eng.submit(r)
            outs[name] = [collect(r) for r in reqs]
        finally:
            eng.stop()
    assert outs["int8"] == outs["dense"]


@pytest.mark.parametrize("s", [24, 64, 256])
def test_write_kv_rows_q8_matches_scatter(s):
    """The aliased Pallas row writer must byte-match the XLA scatter update
    (which it replaces on TPU — the int8 scatter materializes whole layer
    slices there)."""
    from rama_tpu.ops.pallas.kv_write import write_kv_rows_q8

    rng = np.random.default_rng(7)
    L, B, nkv, hd = 3, 4, 2, 128
    k8 = jnp.asarray(rng.integers(-127, 128, (L, B, nkv, s, hd)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (L, B, nkv, s, hd)), jnp.int8)
    ks = jnp.asarray(rng.standard_normal((L, B, nkv, s)), jnp.float32)
    vs = jnp.asarray(rng.standard_normal((L, B, nkv, s)), jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 128, (B, nkv, hd)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (B, nkv, hd)), jnp.int8)
    ksc = jnp.asarray(rng.standard_normal((B, nkv)), jnp.float32)
    vsc = jnp.asarray(rng.standard_normal((B, nkv)), jnp.float32)
    pos = jnp.asarray([0, 5, s // 2, s - 1], jnp.int32)
    for l in range(L):
        li = jnp.int32(l)
        got = write_kv_rows_q8(k8, v8, ks, vs, kq, vq, ksc, vsc, pos, li,
                               interpret=True)
        bi = jnp.arange(B)[:, None]
        hi = jnp.arange(nkv)[None, :]
        pi = pos[:, None]
        want = (k8.at[l, bi, hi, pi].set(kq), v8.at[l, bi, hi, pi].set(vq),
                ks.at[l, bi, hi, pi].set(ksc), vs.at[l, bi, hi, pi].set(vsc))
        for g, w in zip(got, want):
            assert np.array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("s,t", [(24, 3), (64, 4), (256, 8), (256, 2)])
def test_write_kv_chunk_q8_matches_scatter(s, t):
    """The T<=8 chunk writer (speculative-verification path) must byte-match
    the XLA scatter, including chunks that straddle a 32-row sublane tile
    (pos 30 with t>=3) and the 128-col scale tile (pos 126, s=256)."""
    from rama_tpu.ops.pallas.kv_write import write_kv_chunk_q8

    rng = np.random.default_rng(11)
    L, B, nkv, hd = 3, 4, 2, 128
    k8 = jnp.asarray(rng.integers(-127, 128, (L, B, nkv, s, hd)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (L, B, nkv, s, hd)), jnp.int8)
    ks = jnp.asarray(rng.standard_normal((L, B, nkv, s)), jnp.float32)
    vs = jnp.asarray(rng.standard_normal((L, B, nkv, s)), jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 128, (B, t, nkv, hd)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (B, t, nkv, hd)), jnp.int8)
    ksc = jnp.asarray(rng.standard_normal((B, t, nkv)), jnp.float32)
    vsc = jnp.asarray(rng.standard_normal((B, t, nkv)), jnp.float32)
    straddle = 30 if s >= 64 else 10       # crosses the 32-row tile for t>=3
    cstraddle = 126 if s >= 256 else 1     # crosses the 128-col scale tile
    pos0 = jnp.asarray([0, straddle, cstraddle, s - t], jnp.int32)
    for l in range(L):
        li = jnp.int32(l)
        got = write_kv_chunk_q8(k8, v8, ks, vs, kq, vq, ksc, vsc, pos0, li,
                                interpret=True)
        bi = jnp.arange(B)[:, None, None]
        hi = jnp.arange(nkv)[None, None, :]
        pi = (pos0[:, None] + jnp.arange(t)[None, :])[:, :, None]
        want = (k8.at[l, bi, hi, pi].set(kq), v8.at[l, bi, hi, pi].set(vq),
                ks.at[l, bi, hi, pi].set(ksc), vs.at[l, bi, hi, pi].set(vsc))
        for g, w in zip(got, want):
            assert np.array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("ps,t", [(16, 1), (16, 8), (32, 3), (64, 8), (128, 5)])
def test_write_kv_paged_q8_matches_scatter(ps, t):
    """The paged in-place writer must byte-match the XLA pool scatter for
    T in [1, 8], including chunks straddling a page boundary and (ps >= 32)
    a 32-row sublane stripe within a page."""
    from rama_tpu.ops.pallas.kv_write import write_kv_paged_q8

    rng = np.random.default_rng(13)
    L, P, B, nkv, hd = 3, 10, 4, 2, 128
    k8 = jnp.asarray(rng.integers(-127, 128, (L, P, nkv, ps, hd)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (L, P, nkv, ps, hd)), jnp.int8)
    ks = jnp.asarray(rng.standard_normal((L, P, nkv, ps)), jnp.float32)
    vs = jnp.asarray(rng.standard_normal((L, P, nkv, ps)), jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 128, (B, t, nkv, hd)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (B, t, nkv, hd)), jnp.int8)
    ksc = jnp.asarray(rng.standard_normal((B, t, nkv)), jnp.float32)
    vsc = jnp.asarray(rng.standard_normal((B, t, nkv)), jnp.float32)
    # disjoint per-slot page tables (2 logical pages each), scrambled order
    tables = jnp.asarray(rng.permutation(8).reshape(B, 2), jnp.int32)
    # positions: page start, page-boundary straddle, mid-page (stripe
    # straddle when ps >= 32: 30 crosses rows 31->32), end of page 0
    pos0 = jnp.asarray([0, max(ps - t + 1, 0), min(30, ps - t),
                        ps - t], jnp.int32)
    for l in range(L):
        got = write_kv_paged_q8(k8, v8, ks, vs, kq, vq, ksc, vsc, pos0,
                                tables, jnp.int32(l), interpret=True)
        pidx = pos0[:, None] + jnp.arange(t)[None, :]            # (B, T)
        pg = jnp.take_along_axis(tables, pidx // ps, axis=1)[:, :, None]
        off = (pidx % ps)[:, :, None]
        hi = jnp.arange(nkv)[None, None, :]
        want = (k8.at[l, pg, hi, off].set(kq), v8.at[l, pg, hi, off].set(vq),
                ks.at[l, pg, hi, off].set(ksc), vs.at[l, pg, hi, off].set(vsc))
        for g, w in zip(got, want):
            assert np.array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("s,t,k", [(64, 16, 3), (256, 40, 4), (48, 48, 2)])
def test_write_kv_strips_q8_matches_scatter(s, t, k):
    """The admission strip writer (prefill insert) must byte-match the XLA
    whole-cache scatter, including tile-rounded windows (t=40 -> 64-row
    window at s=256) and duplicate padded slots."""
    from rama_tpu.ops.pallas.kv_write import write_kv_strips_q8

    rng = np.random.default_rng(17)
    L, B, nkv, hd = 3, 6, 2, 128
    k8 = jnp.asarray(rng.integers(-127, 128, (L, B, nkv, s, hd)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (L, B, nkv, s, hd)), jnp.int8)
    ks = jnp.asarray(rng.standard_normal((L, B, nkv, s)), jnp.float32)
    vs = jnp.asarray(rng.standard_normal((L, B, nkv, s)), jnp.float32)
    kq = rng.integers(-127, 128, (L, k, nkv, t, hd)).astype(np.int8)
    vq = rng.integers(-127, 128, (L, k, nkv, t, hd)).astype(np.int8)
    ksc = rng.standard_normal((L, k, nkv, t)).astype(np.float32)
    vsc = rng.standard_normal((L, k, nkv, t)).astype(np.float32)
    # last entry duplicated (batch padding) with an identical strip
    slots = np.arange(k, dtype=np.int32)
    if k > 1:
        slots[-1] = slots[-2]
    if k > 1:
        kq[:, -1], vq[:, -1] = kq[:, -2], vq[:, -2]
        ksc[:, -1], vsc[:, -1] = ksc[:, -2], vsc[:, -2]
    kq, vq = jnp.asarray(kq), jnp.asarray(vq)
    ksc, vsc = jnp.asarray(ksc), jnp.asarray(vsc)
    got = write_kv_strips_q8(k8, v8, ks, vs, kq, vq, ksc, vsc,
                             jnp.asarray(slots), interpret=True)
    want = (k8.at[:, slots, :, :t].set(kq), v8.at[:, slots, :, :t].set(vq),
            ks.at[:, slots, :, :t].set(ksc), vs.at[:, slots, :, :t].set(vsc))
    for g, w in zip(got, want):
        assert np.array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("ps,t", [(16, 40), (128, 130), (32, 32)])
def test_write_kv_prefill_paged_q8_matches_scatter(ps, t):
    """The per-slot paged prefill-strip writer must byte-match the XLA pool
    scatter, including partial last pages."""
    from rama_tpu.ops.pallas.kv_write import write_kv_prefill_paged_q8

    rng = np.random.default_rng(19)
    L, P, nkv, hd = 2, 8, 2, 128
    k8 = jnp.asarray(rng.integers(-127, 128, (L, P, nkv, ps, hd)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (L, P, nkv, ps, hd)), jnp.int8)
    ks = jnp.asarray(rng.standard_normal((L, P, nkv, ps)), jnp.float32)
    vs = jnp.asarray(rng.standard_normal((L, P, nkv, ps)), jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 128, (L, nkv, t, hd)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (L, nkv, t, hd)), jnp.int8)
    ksc = jnp.asarray(rng.standard_normal((L, nkv, t)), jnp.float32)
    vsc = jnp.asarray(rng.standard_normal((L, nkv, t)), jnp.float32)
    row = jnp.asarray(rng.permutation(P)[: -(-t // ps) + 1], jnp.int32)
    got = write_kv_prefill_paged_q8(k8, v8, ks, vs, kq, vq, ksc, vsc, row,
                                    interpret=True)
    pos = jnp.arange(t)
    pg = jnp.take(row, pos // ps)[:, None]
    off = (pos % ps)[:, None]
    hi = jnp.arange(nkv)[None, :]
    tr = lambda a: a.transpose(0, 2, 1, 3) if a.ndim == 4 else a.transpose(0, 2, 1)
    want = (k8.at[:, pg, hi, off].set(tr(kq)), v8.at[:, pg, hi, off].set(tr(vq)),
            ks.at[:, pg, hi, off].set(tr(ksc)), vs.at[:, pg, hi, off].set(tr(vsc)))
    for g, w in zip(got, want):
        assert np.array_equal(np.asarray(g), np.asarray(w))
