"""Tensor/data-parallel decode on a virtual CPU mesh vs the single-device path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rama_tpu.models.llama import KVCache, decode_step, load_params, prefill, quantize_params
from rama_tpu.parallel.mesh import make_mesh
from rama_tpu.parallel.tp import (make_decode_step, make_prefill, shard_cache,
                                  shard_params)
from rama_tpu.runtime.sampler import sample_batched
from rama_tpu.testing.ref_model import random_params, tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()  # nh=4, nkv=2 -> tp in {1, 2}
    np_params = random_params(cfg, seed=41)
    params = load_params(cfg, np_params, dtype=jnp.float32)
    return cfg, np_params, params


def run_reference_chain(cfg, params, tokens_seq, batch):
    cache = KVCache.create(cfg, batch=batch, dtype=jnp.float32)
    logits = None
    for pos, toks in enumerate(tokens_seq):
        logits, cache = decode_step(params, cfg, jnp.asarray(toks, jnp.int32),
                                    jnp.full((batch,), pos, jnp.int32), cache)
    return np.asarray(logits)


@pytest.mark.parametrize("dp,tp", [(1, 2), (2, 2), (4, 2), (1, 1)])
def test_tp_decode_matches_single_device(setup, dp, tp):
    cfg, np_params, params = setup
    batch = max(dp, 2)
    mesh = make_mesh(tp_size=tp, dp_size=dp, devices=jax.devices()[: dp * tp])

    sparams = shard_params(params, mesh)
    cache = shard_cache(KVCache.create(cfg, batch=batch, dtype=jnp.float32), mesh)
    step = make_decode_step(cfg, mesh, sparams)

    tokens_seq = [[1] * batch, [5] * batch, [9] * batch]
    want = run_reference_chain(cfg, params, tokens_seq, batch)

    key = jax.random.PRNGKey(0)
    temps = jnp.zeros(batch)
    tps = jnp.full(batch, 0.9)
    for pos, toks in enumerate(tokens_seq):
        nxt, logits, cache = step(sparams, jnp.asarray(toks, jnp.int32),
                                  jnp.full((batch,), pos, jnp.int32),
                                  temps, tps, key, cache)
    np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(nxt), np.argmax(want, -1))


def test_tp_prefill_matches_single_device(setup):
    cfg, np_params, params = setup
    mesh = make_mesh(tp_size=2, dp_size=2, devices=jax.devices()[:4])
    sparams = shard_params(params, mesh)

    tokens = jnp.asarray(np.random.default_rng(0).integers(3, 100, (2, 6)), jnp.int32)
    cache0 = KVCache.create(cfg, batch=2, dtype=jnp.float32)
    want, _ = prefill(params, cfg, tokens, cache0)

    cache = shard_cache(KVCache.create(cfg, batch=2, dtype=jnp.float32), mesh)
    pf = make_prefill(cfg, mesh, sparams)
    got, cache = pf(sparams, tokens, cache)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_tp_quantized_params(setup):
    """Quantized weights shard and decode on the mesh (XLA dequant path on CPU)."""
    cfg, np_params, _ = setup
    mesh = make_mesh(tp_size=2, dp_size=1, devices=jax.devices()[:2])
    qparams = quantize_params(cfg, np_params, bits=8, group_size=16,
                              dtype=jnp.float32)
    sq = shard_params(qparams, mesh)
    step = make_decode_step(cfg, mesh, sq)
    cache = shard_cache(KVCache.create(cfg, batch=2, dtype=jnp.float32), mesh)

    # single-device quantized reference
    cache0 = KVCache.create(cfg, batch=2, dtype=jnp.float32)
    want, _ = decode_step(qparams, cfg, jnp.asarray([1, 1], jnp.int32),
                          jnp.zeros(2, jnp.int32), cache0)

    nxt, logits, cache = step(sq, jnp.asarray([1, 1], jnp.int32),
                              jnp.zeros(2, jnp.int32), jnp.zeros(2),
                              jnp.full(2, 0.9), jax.random.PRNGKey(0), cache)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_mesh_shapes():
    m = make_mesh(tp_size=4, devices=jax.devices()[:8])
    assert m.devices.shape == (2, 4)
    m = make_mesh(dp_size=8, devices=jax.devices()[:8])
    assert m.devices.shape == (8, 1)
    with pytest.raises(ValueError):
        make_mesh(tp_size=3, dp_size=3, devices=jax.devices()[:8])


def test_engine_tensor_parallel_matches_single(setup):
    """The engine with tp=2 produces the same streams as tp=1 (BASELINE #4:
    tensor-sharded continuous-batching serving)."""
    from rama_tpu.config import EngineConfig
    from rama_tpu.runtime.engine import Engine, Request
    from tests.test_engine import collect, make_tokenizer

    cfg, np_params, params = setup
    tok = make_tokenizer(cfg.vocab_size)

    outs = {}
    for tp in (1, 2):
        eng = Engine(cfg, params, tok,
                     EngineConfig(max_batch_size=2, tp_size=tp))
        eng.start()
        try:
            reqs = [Request(prompt=p, steps=6, temperature=0.0)
                    for p in ("abc", "zq")]
            for r in reqs:
                eng.submit(r)
            outs[tp] = [collect(r) for r in reqs]
        finally:
            eng.stop()
    assert outs[1] == outs[2]


def test_tp_int4_params(setup):
    """INT4 block-local packing shards row-parallel without corruption."""
    cfg, np_params, _ = setup
    mesh = make_mesh(tp_size=2, dp_size=1, devices=jax.devices()[:2])
    q4 = quantize_params(cfg, np_params, bits=4, group_size=16,
                         dtype=jnp.float32)
    s4 = shard_params(q4, mesh)
    step = make_decode_step(cfg, mesh, s4)
    cache = shard_cache(KVCache.create(cfg, batch=2, dtype=jnp.float32), mesh)

    cache0 = KVCache.create(cfg, batch=2, dtype=jnp.float32)
    want, _ = decode_step(q4, cfg, jnp.asarray([1, 1], jnp.int32),
                          jnp.zeros(2, jnp.int32), cache0)
    nxt, logits, cache = step(s4, jnp.asarray([1, 1], jnp.int32),
                              jnp.zeros(2, jnp.int32), jnp.zeros(2),
                              jnp.full(2, 0.9), jax.random.PRNGKey(0), cache)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_engine_tp_with_int8_kv_cache(setup):
    """kv_quant=int8 under tensor parallelism: the quantized-cache scales
    shard with their rows (quant_cache_spec), and the tp=2 engine matches the
    tp=1 quantized engine stream for stream."""
    from rama_tpu.config import EngineConfig
    from rama_tpu.runtime.engine import Engine, Request
    from tests.test_engine import collect, make_tokenizer

    cfg, np_params, params = setup
    tok = make_tokenizer(cfg.vocab_size)

    outs = {}
    for tp in (1, 2):
        eng = Engine(cfg, params, tok,
                     EngineConfig(max_batch_size=2, tp_size=tp,
                                  kv_quant="int8"))
        eng.start()
        try:
            reqs = [Request(prompt=p, steps=6, temperature=0.0)
                    for p in ("abc", "zq")]
            for r in reqs:
                eng.submit(r)
            outs[tp] = [collect(r) for r in reqs]
        finally:
            eng.stop()
    assert outs[1] == outs[2]


def test_engine_spec_tick_composes_with_tp(setup):
    """Speculative serving under tensor parallelism: the tp=2 spec_tick
    engine emits exactly the tp=1 non-speculative stream (shard_mapped chunk
    verification + position-keyed sampling), at temperature 0 and 0.9."""
    from rama_tpu.config import EngineConfig
    from rama_tpu.runtime.engine import Engine, Request
    from tests.test_engine import collect, make_tokenizer

    cfg, np_params, params = setup
    tok = make_tokenizer(cfg.vocab_size)

    outs = {}
    for label, ecfg in (("plain", EngineConfig(max_batch_size=2)),
                        ("spec_tp", EngineConfig(max_batch_size=2, tp_size=2,
                                                 spec_tick=3))):
        eng = Engine(cfg, params, tok, ecfg)
        eng.start()
        try:
            reqs = [Request(prompt="abab", steps=8, temperature=0.0),
                    Request(prompt="zq", steps=6, temperature=0.9)]
            for r in reqs:
                eng.submit(r)
            outs[label] = [collect(r) for r in reqs]
        finally:
            eng.stop()
    assert outs["plain"] == outs["spec_tp"]
    eng = Engine(cfg, params, tok,
                 EngineConfig(max_batch_size=2, tp_size=2, spec_tick=3))
    eng.start()
    try:
        r = Request(prompt="abab", steps=8, temperature=0.0)
        eng.submit(r)
        collect(r)
        assert eng.stats()["spec_accept_rate"] is not None
    finally:
        eng.stop()


def test_engine_data_parallel_matches_single(setup):
    """EngineConfig.dp_size shards the slot batch over `data`: the dp=2 and
    dp=2 x tp=2 engines emit exactly the single-device streams."""
    from rama_tpu.config import EngineConfig
    from rama_tpu.runtime.engine import Engine, Request
    from tests.test_engine import collect, make_tokenizer

    cfg, np_params, params = setup
    tok = make_tokenizer(cfg.vocab_size)

    outs = {}
    for label, ecfg in (
            ("single", EngineConfig(max_batch_size=4)),
            ("dp2", EngineConfig(max_batch_size=4, dp_size=2)),
            ("dp2tp2", EngineConfig(max_batch_size=4, dp_size=2, tp_size=2))):
        eng = Engine(cfg, params, tok, ecfg)
        eng.start()
        try:
            reqs = [Request(prompt=p, steps=6, temperature=t)
                    for p, t in (("abc", 0.0), ("zq", 0.9), ("abab", 0.0))]
            for r in reqs:
                eng.submit(r)
            outs[label] = [collect(r) for r in reqs]
        finally:
            eng.stop()
    assert outs["single"] == outs["dp2"]
    assert outs["single"] == outs["dp2tp2"]


def test_engine_dp_rejects_bad_combos(setup):
    from rama_tpu.config import EngineConfig
    from rama_tpu.runtime.engine import Engine
    from tests.test_engine import make_tokenizer

    cfg, np_params, params = setup
    tok = make_tokenizer(cfg.vocab_size)
    with pytest.raises(ValueError):
        Engine(cfg, params, tok, EngineConfig(max_batch_size=3, dp_size=2))


def test_engine_tp_warmup_then_serves(setup):
    """warmup() drives the shard_mapped tick/prefill builders; TP serving
    afterwards still matches the single-device stream."""
    from rama_tpu.config import EngineConfig
    from rama_tpu.runtime.engine import Engine, Request
    from tests.test_engine import collect, make_tokenizer

    cfg, np_params, params = setup
    tok = make_tokenizer(cfg.vocab_size)
    outs = {}
    for tp, warm in ((1, False), (2, True)):
        eng = Engine(cfg, params, tok,
                     EngineConfig(max_batch_size=2, tp_size=tp))
        if warm:
            assert eng.warmup()["programs"] > 0
        eng.start()
        try:
            req = Request(prompt="abc", steps=6, temperature=0.0)
            eng.submit(req)
            outs[tp] = collect(req)
        finally:
            eng.stop()
        assert eng.metrics["engine_errors"] == 0
    assert outs[1] == outs[2]


def test_tp_long_prompt_bucket_beyond_cache(setup):
    """A prompt whose T bucket rounds past max_seq_len used to gather
    out-of-range RoPE rows in the mesh prefill (jnp.take fill mode -> NaN
    K/V rows that poisoned masked attention for the whole slot). The bucket
    is now capped at the cache length and rope gathers clip."""
    from rama_tpu.config import EngineConfig
    from rama_tpu.runtime.engine import Engine, Request
    from tests.test_engine import collect, make_tokenizer

    cfg, np_params, params = setup
    tok = make_tokenizer(cfg.vocab_size)
    prompt = "abcdefghijklmnopqrstuvwxyz" * 2  # 52 ids -> truncated to 46
    outs = {}
    for tp in (1, 2):
        eng = Engine(cfg, params, tok,
                     EngineConfig(max_batch_size=2, tp_size=tp))
        eng.start()
        try:
            req = Request(prompt=prompt, steps=4, temperature=0.0)
            eng.submit(req)
            outs[tp] = collect(req)
        finally:
            eng.stop()
        assert eng.metrics["engine_errors"] == 0
    assert outs[1] == outs[2]
