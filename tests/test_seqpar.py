"""Sequence-parallel decode (parallel/seqpar.py): the S-sharded blockwise
attention + flash combine must reproduce the dense single-device decode step
exactly (same cache bytes written, same greedy chain) on a CPU mesh — the
correctness half of the ring/blockwise stretch (SURVEY §5, VERDICT r4 next
#7); the measured S-scaling half lives in tools/bench_longctx.py rows."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rama_tpu.models.llama import (KVCache, QuantKVCache, decode_step,
                                   load_params, quantize_params)
from rama_tpu.parallel.mesh import make_mesh
from rama_tpu.parallel.seqpar import (make_seqpar_decode_step,
                                      seqpar_cache_spec)
from rama_tpu.runtime.sampler import fold_in_pos, sample_batched_keyed
from rama_tpu.testing.ref_model import random_params, tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(seq_len=64)
    np_params = random_params(cfg, seed=17)
    return cfg, np_params


def _mesh(tp, dp):
    return make_mesh(tp_size=tp, dp_size=dp,
                     devices=jax.devices()[: tp * dp])


def _shard_cache(cache, mesh, kv_quant):
    from rama_tpu.parallel.distributed import make_global

    return jax.tree_util.tree_map(
        lambda x, s: make_global(x, mesh, s), cache,
        seqpar_cache_spec(kv_quant))


@pytest.mark.parametrize("kv_quant", [False, True])
@pytest.mark.parametrize("tp,dp", [(4, 1), (4, 2)])
def test_seqpar_matches_dense_decode_chain(setup, kv_quant, tp, dp):
    """Greedy 12-step chains from an empty cache: the seqpar step must emit
    the dense step's tokens and (near-)logits at ragged per-slot
    positions."""
    cfg, np_params = setup
    params = load_params(cfg, np_params, dtype=jnp.float32)
    b = 4
    mesh = _mesh(tp, dp)
    step = make_seqpar_decode_step(cfg, mesh, params, kv_quant=kv_quant)

    make = QuantKVCache.create if kv_quant else KVCache.create
    ref_cache = make(cfg, batch=b, max_len=cfg.seq_len)
    sp_cache = _shard_cache(make(cfg, batch=b, max_len=cfg.seq_len), mesh,
                            kv_quant)

    tokens = jnp.asarray([5, 9, 3, 7], jnp.int32)
    # ragged positions: slots advance from different offsets so shard
    # ownership of the written rows differs per slot
    pos = jnp.asarray([0, 3, 17, 33], jnp.int32)
    temps = jnp.zeros(b, jnp.float32)
    tps = jnp.full(b, 0.9, jnp.float32)
    keys = jnp.asarray(np.random.default_rng(0).integers(
        0, 1 << 32, size=(b, 2), dtype=np.uint32))

    ref_tok, sp_tok = tokens, tokens
    for _ in range(12):
        logits, ref_cache = decode_step(params, cfg, ref_tok, pos, ref_cache)
        want = sample_batched_keyed(logits, fold_in_pos(keys, pos), temps,
                                    tps)
        got, sp_logits, sp_cache = step(params, sp_tok, pos, temps, tps,
                                        keys, sp_cache)
        np.testing.assert_allclose(np.asarray(sp_logits), np.asarray(logits),
                                   rtol=2e-4, atol=2e-4)
        assert np.asarray(got).tolist() == np.asarray(want).tolist()
        ref_tok = want
        sp_tok = got
        pos = pos + 1


def test_seqpar_cache_bytes_match_dense(setup):
    """After a few steps the gathered seqpar cache holds exactly the dense
    cache's rows (owner-write covers every position exactly once)."""
    cfg, np_params = setup
    params = load_params(cfg, np_params, dtype=jnp.float32)
    b = 2
    mesh = _mesh(4, 1)
    step = make_seqpar_decode_step(cfg, mesh, params, kv_quant=False)
    ref_cache = KVCache.create(cfg, batch=b, max_len=cfg.seq_len)
    sp_cache = _shard_cache(KVCache.create(cfg, batch=b,
                                           max_len=cfg.seq_len), mesh, False)
    tokens = jnp.asarray([4, 11], jnp.int32)
    pos = jnp.asarray([0, 14], jnp.int32)   # row 14/15/16 straddles shards
    temps = jnp.zeros(b, jnp.float32)
    tps = jnp.full(b, 0.9, jnp.float32)
    keys = jnp.zeros((b, 2), jnp.uint32)
    for _ in range(4):
        _, ref_cache = decode_step(params, cfg, tokens, pos, ref_cache)
        tokens, _, sp_cache = step(params, tokens, pos, temps, tps, keys,
                                   sp_cache)
        pos = pos + 1
    # compare only written rows (unwritten rows are uninitialized zeros in
    # both, but assert the written band exactly)
    ref_k = np.asarray(ref_cache.k)
    got_k = np.asarray(jax.device_get(sp_cache.k))
    np.testing.assert_array_equal(got_k[:, 0, :, :4], ref_k[:, 0, :, :4])
    np.testing.assert_array_equal(got_k[:, 1, :, 14:18], ref_k[:, 1, :, 14:18])


def test_seqpar_quantized_weights(setup):
    """Quantized (int8) replicated weights through the seqpar step: greedy
    chain matches the dense quantized decode."""
    cfg, np_params = setup
    params = quantize_params(cfg, np_params, bits=8, group_size=16,
                             dtype=jnp.bfloat16)
    b = 2
    mesh = _mesh(4, 1)
    step = make_seqpar_decode_step(cfg, mesh, params, kv_quant=False)
    ref_cache = KVCache.create(cfg, batch=b, max_len=cfg.seq_len)
    sp_cache = _shard_cache(KVCache.create(cfg, batch=b,
                                           max_len=cfg.seq_len), mesh, False)
    tokens = jnp.asarray([5, 9], jnp.int32)
    pos = jnp.zeros(b, jnp.int32)
    temps = jnp.zeros(b, jnp.float32)
    tps = jnp.full(b, 0.9, jnp.float32)
    keys = jnp.zeros((b, 2), jnp.uint32)
    for _ in range(8):
        logits, ref_cache = decode_step(params, cfg, tokens, pos, ref_cache)
        want = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        got, _, sp_cache = step(params, tokens, pos, temps, tps, keys,
                                sp_cache)
        assert np.asarray(got).tolist() == np.asarray(want).tolist()
        tokens = got
        pos = pos + 1


def test_seqpar_engine_matches_single(setup):
    """EngineConfig.seq_par: the serving engine with the sequence-sharded
    cache (tp=4 and dp=2 x tp=2) emits exactly the single-device streams —
    admission (GSPMD scatter insert), multi-token ticks, and kv_quant all
    through the seqpar path."""
    import jax.numpy as jnp

    from rama_tpu.config import EngineConfig
    from rama_tpu.runtime.engine import Engine, Request
    from tests.test_engine import collect, make_tokenizer

    cfg, np_params = setup
    tok = make_tokenizer(cfg.vocab_size)
    outs = {}
    for label, ecfg in (
            ("single", EngineConfig(max_batch_size=4)),
            ("sp4", EngineConfig(max_batch_size=4, tp_size=4, seq_par=True)),
            ("sp2dp2", EngineConfig(max_batch_size=4, tp_size=2, dp_size=2,
                                    seq_par=True)),
            ("sp4_kv8", EngineConfig(max_batch_size=4, tp_size=4,
                                     seq_par=True, kv_quant="int8"))):
        params = load_params(cfg, np_params, dtype=jnp.float32)
        eng = Engine(cfg, params, tok, ecfg)
        eng.start()
        try:
            reqs = [Request(prompt=p, steps=6, temperature=t)
                    for p, t in (("abc", 0.0), ("zq", 0.9), ("abab", 0.0))]
            for r in reqs:
                eng.submit(r)
            outs[label] = [collect(r) for r in reqs]
            for r in reqs:
                assert r.error is None, r.error
        finally:
            eng.stop()
        assert eng.metrics["engine_errors"] == 0, label
    assert outs["sp4"] == outs["single"]
    assert outs["sp2dp2"] == outs["single"]
    # kv_quant changes numerics vs bf16 cache; assert only the seqpar run
    # matches the single-device kv_quant engine
    params = load_params(cfg, np_params, dtype=jnp.float32)
    eng = Engine(cfg, params, tok,
                 EngineConfig(max_batch_size=4, kv_quant="int8"))
    eng.start()
    try:
        reqs = [Request(prompt=p, steps=6, temperature=t)
                for p, t in (("abc", 0.0), ("zq", 0.9), ("abab", 0.0))]
        for r in reqs:
            eng.submit(r)
        want = [collect(r) for r in reqs]
    finally:
        eng.stop()
    assert outs["sp4_kv8"] == want


def test_seqpar_engine_validation(setup):
    import jax.numpy as jnp

    from rama_tpu.config import EngineConfig
    from rama_tpu.runtime.engine import Engine
    from tests.test_engine import make_tokenizer

    cfg, np_params = setup
    tok = make_tokenizer(cfg.vocab_size)
    params = load_params(cfg, np_params, dtype=jnp.float32)
    with pytest.raises(ValueError, match="tp_size"):
        Engine(cfg, params, tok, EngineConfig(seq_par=True))
    with pytest.raises(ValueError, match="paged"):
        Engine(cfg, params, tok,
               EngineConfig(seq_par=True, tp_size=2, paged_kv=True))
    with pytest.raises(ValueError, match="divide"):
        Engine(cfg, params, tok,
               EngineConfig(seq_par=True, tp_size=2, max_seq_len=63))
