"""Paged KV cache: equivalence with the dense path + engine integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rama_tpu.config import EngineConfig
from rama_tpu.models.llama import KVCache, decode_step, load_params
from rama_tpu.runtime.paged import (PagedKVCache, decode_step_paged,
                                    forward_paged, insert_prefill_paged)
from rama_tpu.testing.ref_model import random_params, tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(seq_len=64)
    np_params = random_params(cfg, seed=61)
    params = load_params(cfg, np_params, dtype=jnp.float32)
    return cfg, params


def test_paged_decode_matches_dense(setup):
    """Same token chain through dense and paged caches -> identical logits."""
    cfg, params = setup
    ps, b = 16, 2
    dense = KVCache.create(cfg, batch=b, dtype=jnp.float32)
    paged = PagedKVCache.create(cfg, num_pages=2 * (64 // ps), page_size=ps,
                                dtype=jnp.float32)
    # interleave the two slots' pages to prove non-contiguity works
    tables = jnp.asarray([[0, 2, 4, 6], [1, 3, 5, 7]], jnp.int32)

    toks = [[1, 1], [5, 9], [9, 3], [20, 7], [3, 2]]
    for pos, tk in enumerate(toks):
        token = jnp.asarray(tk, jnp.int32)
        pvec = jnp.full((b,), pos, jnp.int32)
        ld, dense = decode_step(params, cfg, token, pvec, dense)
        lp, paged = decode_step_paged(params, cfg, token, pvec, paged, tables)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(ld),
                                   rtol=1e-5, atol=1e-5, err_msg=f"pos {pos}")


def test_paged_prefill_insert_matches(setup):
    cfg, params = setup
    ps = 16
    b_tokens = jnp.asarray([[1, 7, 21, 9, 3]], jnp.int32)
    t = b_tokens.shape[1]

    # dense reference prefill
    from rama_tpu.models.llama import prefill
    dense = KVCache.create(cfg, batch=1, dtype=jnp.float32)
    logits_d, dense = prefill(params, cfg, b_tokens, dense)

    # paged: prefill into scratch, insert strip into non-contiguous pages
    paged = PagedKVCache.create(cfg, num_pages=4, page_size=ps, dtype=jnp.float32)
    table = jnp.asarray([3, 1, 0, 2], jnp.int32)
    paged = insert_prefill_paged(cfg, paged, dense.k[:, 0, :, :t], dense.v[:, 0, :, :t],
                                 table)
    # next decode step must agree
    tok = jnp.asarray([4], jnp.int32)
    pvec = jnp.asarray([t], jnp.int32)
    ld, _ = decode_step(params, cfg, tok, pvec, dense)
    lp, _ = decode_step_paged(params, cfg, tok, pvec, paged, table[None, :])
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ld), rtol=1e-5, atol=1e-5)


def test_paged_engine_end_to_end(setup):
    """The engine in paged mode reproduces dense-mode outputs."""
    import time

    from rama_tpu.runtime.engine import Engine, Request
    from tests.test_engine import collect, make_tokenizer

    cfg, params = setup
    tok = make_tokenizer(cfg.vocab_size)

    outs = {}
    for paged in (False, True):
        ecfg = EngineConfig(max_batch_size=3, paged_kv=paged, kv_page_size=16)
        eng = Engine(cfg, params, tok, ecfg)
        eng.start()
        try:
            reqs = [Request(prompt=p, steps=6, temperature=0.0)
                    for p in ("abc", "zq", "hello")]
            for r in reqs:
                eng.submit(r)
            outs[paged] = [collect(r) for r in reqs]
        finally:
            eng.stop()
    assert outs[False] == outs[True]


def test_paged_page_exhaustion(setup):
    """When the pool is too small, requests are rejected cleanly."""
    from rama_tpu.runtime.engine import Engine, Request
    from tests.test_engine import collect, make_tokenizer

    cfg, params = setup
    tok = make_tokenizer(cfg.vocab_size)
    # one slot's worth of pages for a 2-slot engine
    ecfg = EngineConfig(max_batch_size=2, paged_kv=True, kv_page_size=16,
                        kv_num_pages=4)
    eng = Engine(cfg, params, tok, ecfg)
    eng.start()
    try:
        r1 = Request(prompt="abc", steps=40, temperature=0.0)
        r2 = Request(prompt="zq", steps=4, temperature=0.0)
        eng.submit(r1)
        eng.submit(r2)
        out1 = collect(r1)
        out2 = collect(r2)
        # r1 runs; r2 either completes after r1 frees pages or is rejected,
        # but never hangs or crashes the engine
        assert len(out1) >= 1
        assert isinstance(out2, list)
    finally:
        eng.stop()


def test_paged_free_slot_writes_hit_trash_page(setup):
    """Stale page tables of freed slots must never corrupt live requests:
    a short request finishing early while a long one decodes leaves the
    long one's output identical to a solo run."""
    from rama_tpu.runtime.engine import Engine, Request
    from tests.test_engine import collect, make_tokenizer

    cfg, params = setup
    tok = make_tokenizer(cfg.vocab_size)
    ecfg = EngineConfig(max_batch_size=2, paged_kv=True, kv_page_size=16)

    eng = Engine(cfg, params, tok, ecfg)
    eng.start()
    try:
        solo = Request(prompt="abc", steps=20, temperature=0.0)
        eng.submit(solo)
        want = collect(solo)
    finally:
        eng.stop()

    eng = Engine(cfg, params, tok, ecfg)
    eng.start()
    try:
        long_req = Request(prompt="abc", steps=20, temperature=0.0)
        short = Request(prompt="zq", steps=2, temperature=0.0)
        eng.submit(long_req)
        eng.submit(short)
        collect(short)          # finishes early, frees its pages mid-decode
        got = collect(long_req)
        assert got == want
    finally:
        eng.stop()


def test_paged_attention_kernel_matches_gather():
    """Ragged paged-attention kernel (interpret) vs gather-then-attention:
    non-contiguous page tables, ragged positions spanning 1..3 pages."""
    from rama_tpu.models.llama import _attention
    from rama_tpu.ops.pallas.paged_attention import paged_decode_attention_layer

    L, P, nkv, ps, hd = 3, 9, 2, 16, 128
    b, rep = 2, 2
    nh = nkv * rep
    mp = 3
    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, nh, hd), jnp.float32)
    k_pool = jax.random.normal(kk, (L, P, nkv, ps, hd), jnp.float32)
    v_pool = jax.random.normal(kv, (L, P, nkv, ps, hd), jnp.float32)
    tables = jnp.asarray([[4, 1, 7], [2, 5, 0]], jnp.int32)
    pos = jnp.asarray([37, 5], jnp.int32)  # slot0 -> 3 pages, slot1 -> 1

    for layer in range(L):
        got = paged_decode_attention_layer(q, k_pool, v_pool, pos, tables,
                                           jnp.int32(layer), interpret=True)
        # reference: gather the dense view, mask, einsum attention
        kv_view = lambda pool: (jnp.take(pool[layer], tables, axis=0)
                                .transpose(0, 2, 1, 3, 4)
                                .reshape(b, nkv, mp * ps, hd))
        mask = (jnp.arange(mp * ps)[None, None, :] <= pos[:, None, None])
        want = _attention(q[:, None], kv_view(k_pool), kv_view(v_pool),
                          mask)[:, 0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"layer {layer}")


def test_paged_engine_with_tensor_parallelism(setup):
    """paged+TP serving: KV heads of the page pool shard over `model`; the
    output stream must match the unsharded paged engine exactly."""
    from rama_tpu.runtime.engine import Engine, Request
    from tests.test_engine import collect, make_tokenizer

    cfg, params = setup
    if jax.device_count() < 2:
        pytest.skip("needs >=2 devices")
    tok = make_tokenizer(cfg.vocab_size)

    outs = {}
    for tp in (1, 2):
        ecfg = EngineConfig(max_batch_size=3, paged_kv=True, kv_page_size=16,
                            tp_size=tp)
        eng = Engine(cfg, params, tok, ecfg)
        eng.start()
        try:
            reqs = [Request(prompt=p, steps=6, temperature=0.0)
                    for p in ("abc", "zq", "hello")]
            for r in reqs:
                eng.submit(r)
            outs[tp] = [collect(r) for r in reqs]
        finally:
            eng.stop()
    assert outs[1] == outs[2]


def test_paged_q8_kernel_matches_dequant():
    """INT8-pool ragged paged-attention kernel (interpret) vs dequantize-
    gather-attend: non-contiguous tables, ragged positions."""
    from rama_tpu.models.llama import _attention, _dequant_kv, kv_quant_rows
    from rama_tpu.ops.pallas.paged_attention import (
        paged_decode_attention_layer_q8)

    L, P, nkv, ps, hd = 2, 9, 2, 16, 128
    b, rep = 2, 2
    nh = nkv * rep
    mp = 3
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((b, nh, hd)).astype(np.float32))
    k_pool, ks_pool = kv_quant_rows(jnp.asarray(
        rng.standard_normal((L, P, nkv, ps, hd)).astype(np.float32)))
    v_pool, vs_pool = kv_quant_rows(jnp.asarray(
        rng.standard_normal((L, P, nkv, ps, hd)).astype(np.float32)))
    tables = jnp.asarray([[4, 1, 7], [2, 5, 0]], jnp.int32)
    pos = jnp.asarray([37, 5], jnp.int32)

    for layer in range(L):
        got = paged_decode_attention_layer_q8(
            q, k_pool, v_pool, ks_pool, vs_pool, pos, tables,
            jnp.int32(layer), interpret=True)
        kd, vd = _dequant_kv(k_pool[layer], v_pool[layer],
                             ks_pool[layer], vs_pool[layer], jnp.float32)
        view = lambda pool: (jnp.take(pool, tables, axis=0)
                             .transpose(0, 2, 1, 3, 4)
                             .reshape(b, nkv, mp * ps, hd))
        mask = (jnp.arange(mp * ps)[None, None, :] <= pos[:, None, None])
        want = _attention(q[:, None], view(kd), view(vd), mask)[:, 0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-2, atol=5e-2,
                                   err_msg=f"layer {layer}")


def test_paged_engine_with_int8_kv(setup):
    """paged + kv_quant=int8: the int8 page pool must reproduce the dense-slot
    int8 engine's greedy streams (same quantization, different storage)."""
    from rama_tpu.runtime.engine import Engine, Request
    from tests.test_engine import collect, make_tokenizer

    cfg, params = setup
    tok = make_tokenizer(cfg.vocab_size)
    outs = {}
    for name, paged in (("paged", True), ("dense", False)):
        ecfg = EngineConfig(max_batch_size=2, kv_quant="int8", paged_kv=paged,
                            kv_page_size=16)
        eng = Engine(cfg, params, tok, ecfg)
        eng.start()
        try:
            reqs = [Request(prompt="ab", steps=6, temperature=0.0),
                    Request(prompt="zq", steps=6, temperature=0.0)]
            for r in reqs:
                eng.submit(r)
            outs[name] = [collect(r) for r in reqs]
        finally:
            eng.stop()
    assert outs["paged"] == outs["dense"]


def test_paged_q8_engine_with_tensor_parallelism(setup):
    """paged + int8 pool + TP: scale pools shard with their KV-head rows."""
    from rama_tpu.runtime.engine import Engine, Request
    from tests.test_engine import collect, make_tokenizer

    cfg, params = setup
    if jax.device_count() < 2:
        pytest.skip("needs >=2 devices")
    tok = make_tokenizer(cfg.vocab_size)
    outs = {}
    for tp in (1, 2):
        ecfg = EngineConfig(max_batch_size=2, paged_kv=True, kv_page_size=16,
                            kv_quant="int8", tp_size=tp)
        eng = Engine(cfg, params, tok, ecfg)
        eng.start()
        try:
            reqs = [Request(prompt="abc", steps=5, temperature=0.0),
                    Request(prompt="hello", steps=5, temperature=0.0)]
            for r in reqs:
                eng.submit(r)
            outs[tp] = [collect(r) for r in reqs]
        finally:
            eng.stop()
    assert outs[1] == outs[2]


def test_paged_engine_warmup_then_serves(setup):
    """warmup() on a paged engine writes only the trash page; live serving
    afterwards is unaffected."""
    from rama_tpu.runtime.engine import Engine, Request
    from tests.test_engine import collect, make_tokenizer

    cfg, params = setup
    tok = make_tokenizer(cfg.vocab_size)
    eng = Engine(cfg, params, tok,
                 EngineConfig(max_batch_size=2, paged_kv=True,
                              kv_page_size=16))
    w = eng.warmup()
    assert w["programs"] > 0
    eng.start()
    try:
        req = Request(prompt="abc", steps=8, temperature=0.0)
        eng.submit(req)
        got = collect(req)
    finally:
        eng.stop()
    assert len(got) == 8
    assert eng.metrics["engine_errors"] == 0


@pytest.mark.parametrize("t", [2, 4])
def test_paged_chunk_attention_kernel_matches_gather(t):
    """Ragged paged CHUNK attention (interpret) vs gather-then-attention:
    consecutive per-slot queries, non-contiguous tables, chunks that cross
    page boundaries."""
    from rama_tpu.models.llama import _attention
    from rama_tpu.ops.pallas.paged_attention import paged_chunk_attention_layer

    L, P, nkv, ps, hd = 2, 9, 2, 16, 128
    b, rep = 2, 2
    nh = nkv * rep
    mp = 3
    key = jax.random.PRNGKey(11)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, t, nh, hd), jnp.float32)
    k_pool = jax.random.normal(kk, (L, P, nkv, ps, hd), jnp.float32)
    v_pool = jax.random.normal(kv, (L, P, nkv, ps, hd), jnp.float32)
    tables = jnp.asarray([[4, 1, 7], [2, 5, 0]], jnp.int32)
    pos0 = jnp.asarray([15, 5], jnp.int32)  # slot0's chunk crosses a page

    for layer in range(L):
        got = paged_chunk_attention_layer(q, k_pool, v_pool, pos0, tables,
                                          jnp.int32(layer), interpret=True)
        view = lambda pool: (jnp.take(pool[layer], tables, axis=0)
                             .transpose(0, 2, 1, 3, 4)
                             .reshape(b, nkv, mp * ps, hd))
        pidx = pos0[:, None] + jnp.arange(t)[None, :]          # (b, t)
        mask = jnp.arange(mp * ps)[None, None, :] <= pidx[:, :, None]
        want = _attention(q, view(k_pool), view(v_pool), mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"layer {layer}")


@pytest.mark.parametrize("t", [3])
def test_paged_chunk_q8_kernel_matches_dequant(t):
    """INT8-pool ragged paged chunk attention (interpret) vs
    dequantize-gather-attend."""
    from rama_tpu.models.llama import _attention, _dequant_kv, kv_quant_rows
    from rama_tpu.ops.pallas.paged_attention import (
        paged_chunk_attention_layer_q8)

    L, P, nkv, ps, hd = 2, 9, 2, 16, 128
    b, rep = 2, 2
    nh = nkv * rep
    mp = 3
    rng = np.random.default_rng(13)
    q = jnp.asarray(rng.standard_normal((b, t, nh, hd)).astype(np.float32))
    k_pool, ks_pool = kv_quant_rows(jnp.asarray(
        rng.standard_normal((L, P, nkv, ps, hd)).astype(np.float32)))
    v_pool, vs_pool = kv_quant_rows(jnp.asarray(
        rng.standard_normal((L, P, nkv, ps, hd)).astype(np.float32)))
    tables = jnp.asarray([[4, 1, 7], [2, 5, 0]], jnp.int32)
    pos0 = jnp.asarray([14, 30], jnp.int32)  # both chunks cross pages

    for layer in range(L):
        got = paged_chunk_attention_layer_q8(
            q, k_pool, v_pool, ks_pool, vs_pool, pos0, tables,
            jnp.int32(layer), interpret=True)
        kd, vd = _dequant_kv(k_pool[layer], v_pool[layer],
                             ks_pool[layer], vs_pool[layer], jnp.float32)
        view = lambda pool: (jnp.take(pool, tables, axis=0)
                             .transpose(0, 2, 1, 3, 4)
                             .reshape(b, nkv, mp * ps, hd))
        pidx = pos0[:, None] + jnp.arange(t)[None, :]
        mask = jnp.arange(mp * ps)[None, None, :] <= pidx[:, :, None]
        want = _attention(q, view(kd), view(vd), mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-2, atol=5e-2,
                                   err_msg=f"layer {layer}")


@pytest.mark.parametrize("temperature", [0.0, 0.9])
def test_spec_tick_composes_with_paged(setup, temperature):
    """Speculative serving over the page pool: spec_tick is a pure latency
    knob, so the paged spec engine's stream is IDENTICAL to the plain paged
    engine's at any temperature (position-keyed sampling)."""
    from rama_tpu.runtime.engine import Engine, Request
    from tests.test_engine import collect, make_tokenizer

    cfg, params = setup
    tok = make_tokenizer(cfg.vocab_size)
    outs = {}
    for name, spec in (("plain", 0), ("spec", 3)):
        eng = Engine(cfg, params, tok,
                     EngineConfig(max_batch_size=2, paged_kv=True,
                                  kv_page_size=16, spec_tick=spec))
        eng.start()
        try:
            reqs = [Request(prompt=p, steps=12, temperature=temperature)
                    for p in ("abab", "zq")]
            for r in reqs:
                eng.submit(r)
            outs[name] = [collect(r) for r in reqs]
        finally:
            eng.stop()
        assert eng.metrics["engine_errors"] == 0
    assert outs["plain"] == outs["spec"]


def test_spec_tick_paged_composes_with_mesh(setup):
    """spec x paged x tensor-parallel (the last spec composition cell,
    VERDICT r3 item 4a): the shard_mapped paged spec tick emits the exact
    stream of the plain paged TP engine."""
    from rama_tpu.runtime.engine import Engine, Request
    from tests.test_engine import collect, make_tokenizer

    cfg, params = setup
    tok = make_tokenizer(cfg.vocab_size)
    outs = {}
    for name, spec in (("plain", 0), ("spec", 3)):
        eng = Engine(cfg, params, tok,
                     EngineConfig(max_batch_size=2, paged_kv=True,
                                  kv_page_size=16, spec_tick=spec, tp_size=2))
        eng.start()
        try:
            reqs = [Request(prompt=p, steps=12, temperature=0.7)
                    for p in ("abab", "zq")]
            for r in reqs:
                eng.submit(r)
            outs[name] = [collect(r) for r in reqs]
        finally:
            eng.stop()
        assert eng.metrics["engine_errors"] == 0
    assert outs["plain"] == outs["spec"]


@pytest.mark.parametrize("dp,tp", [(2, 1), (2, 2)])
def test_paged_engine_with_data_parallelism(setup, dp, tp):
    """paged x dp (the other round-3 composition hole, VERDICT r3 item 4b):
    the page pool shards over `data` — per-replica sub-pools, per-replica
    allocators, local page indices — and the served streams are identical
    to the unsharded paged engine's."""
    from rama_tpu.runtime.engine import Engine, Request
    from tests.test_engine import collect, make_tokenizer

    cfg, params = setup
    tok = make_tokenizer(cfg.vocab_size)
    outs = {}
    for name, (d, t) in (("single", (1, 1)), ("mesh", (dp, tp))):
        eng = Engine(cfg, params, tok,
                     EngineConfig(max_batch_size=2, paged_kv=True,
                                  kv_page_size=16, dp_size=d, tp_size=t))
        eng.start()
        try:
            reqs = [Request(prompt=p, steps=10, temperature=0.0)
                    for p in ("abc", "zq")]
            for r in reqs:
                eng.submit(r)
            outs[name] = [collect(r) for r in reqs]
        finally:
            eng.stop()
        assert eng.metrics["engine_errors"] == 0
    assert outs["single"] == outs["mesh"]


def test_paged_dp_rejects_bad_page_count(setup):
    """kv_num_pages must split evenly into per-replica sub-pools."""
    from rama_tpu.runtime.engine import Engine
    from tests.test_engine import make_tokenizer

    cfg, params = setup
    with pytest.raises(ValueError, match="kv_num_pages"):
        Engine(cfg, params, make_tokenizer(cfg.vocab_size),
               EngineConfig(max_batch_size=2, paged_kv=True, kv_page_size=16,
                            kv_num_pages=7, dp_size=2))
