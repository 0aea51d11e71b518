"""Quantized model path: v2 file -> quantized pytree -> decode parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rama_tpu import checkpoint as ckpt
from rama_tpu.models.llama import (KVCache, decode_step, load_params,
                                   load_params_quantized, quantize_params)
from rama_tpu.testing.ref_model import random_params, tiny_config


@pytest.fixture(scope="module")
def v2_setup(tmp_path_factory):
    cfg = tiny_config()
    params = random_params(cfg, seed=13)
    path = tmp_path_factory.mktemp("q") / "m2.bin"
    ckpt.save_v2(path, cfg, params, group_size=16)
    return cfg, params, path


def run_chain(cfg, p, steps=8, dtype=jnp.float32):
    cache = KVCache.create(cfg, batch=1, dtype=dtype)
    token, out = 1, []
    for pos in range(steps):
        lg, cache = decode_step(p, cfg, jnp.asarray([token], jnp.int32),
                                jnp.asarray([pos], jnp.int32), cache)
        token = int(jnp.argmax(lg[0]))
        out.append((token, np.asarray(lg[0])))
    return out


def test_quantized_matches_dequantized_file(v2_setup):
    """Decoding with int8 weights == decoding with their fp32 dequantization."""
    cfg, _, path = v2_setup
    qp = ckpt.load_checkpoint_quantized(path)
    pq = load_params_quantized(cfg, qp, dtype=jnp.float32)

    _, deq = ckpt.load_checkpoint(path)
    pd = load_params(cfg, deq, dtype=jnp.float32)

    got = run_chain(cfg, pq)
    want = run_chain(cfg, pd)
    for (tg, lg), (tw, lw) in zip(got, want):
        np.testing.assert_allclose(lg, lw, atol=2e-4, rtol=1e-3)
        assert tg == tw


def test_quantize_at_load_int8_close(v2_setup):
    cfg, params, _ = v2_setup
    p32 = load_params(cfg, params, dtype=jnp.float32)
    pq = quantize_params(cfg, params, bits=8, group_size=16, dtype=jnp.float32)
    got = run_chain(cfg, pq, steps=4)
    want = run_chain(cfg, p32, steps=4)
    for (_, lg), (_, lw) in zip(got, want):
        np.testing.assert_allclose(lg, lw, atol=0.02)


def test_quantize_at_load_int4_reasonable(v2_setup):
    cfg, params, _ = v2_setup
    p32 = load_params(cfg, params, dtype=jnp.float32)
    pq = quantize_params(cfg, params, bits=4, group_size=16, dtype=jnp.float32)
    got = run_chain(cfg, pq, steps=4)
    want = run_chain(cfg, p32, steps=4)
    # int4 is lossier; logits of a tiny random model are O(0.3)
    for (_, lg), (_, lw) in zip(got, want):
        np.testing.assert_allclose(lg, lw, atol=0.15)


def test_unshared_classifier_quantized(tmp_path):
    cfg = tiny_config(shared_classifier=False)
    params = random_params(cfg, seed=17)
    path = tmp_path / "m2u.bin"
    ckpt.save_v2(path, cfg, params, group_size=16)
    qp = ckpt.load_checkpoint_quantized(path)
    pq = load_params_quantized(cfg, qp, dtype=jnp.float32)
    _, deq = ckpt.load_checkpoint(path)
    pd = load_params(cfg, deq, dtype=jnp.float32)
    got = run_chain(cfg, pq, steps=3)
    want = run_chain(cfg, pd, steps=3)
    for (tg, lg), (tw, lw) in zip(got, want):
        np.testing.assert_allclose(lg, lw, atol=2e-4, rtol=1e-3)


def test_engine_serves_quantized_params(v2_setup):
    """The continuous-batching engine runs on int8 params end to end and
    matches the dequantized-fp32 engine's greedy streams."""
    import jax.numpy as jnp

    from rama_tpu import checkpoint as ckpt
    from rama_tpu.config import EngineConfig
    from rama_tpu.runtime.engine import Engine, Request
    from tests.test_engine import collect, make_tokenizer

    cfg, _, path = v2_setup
    tok = make_tokenizer(cfg.vocab_size)
    qp = ckpt.load_checkpoint_quantized(path)
    pq = load_params_quantized(cfg, qp, dtype=jnp.float32)
    _, deq = ckpt.load_checkpoint(path)
    pd = load_params(cfg, deq, dtype=jnp.float32)

    outs = {}
    for name, params in (("quant", pq), ("dequant", pd)):
        eng = Engine(cfg, params, tok, EngineConfig(max_batch_size=2))
        eng.start()
        try:
            req = Request(prompt="ab", steps=6, temperature=0.0)
            eng.submit(req)
            outs[name] = collect(req)
        finally:
            eng.stop()
    assert outs["quant"] == outs["dequant"]


def test_engine_scale_dtype_bf16(v2_setup):
    """EngineConfig.scale_dtype='bf16': the engine casts stored scales,
    serves deterministically (run-to-run identical), and stays within the
    bf16 rounding of the f32-scale stream for a short greedy prompt; tp=2
    shards the bf16 scales like f32 ones."""
    import jax.numpy as jnp

    from rama_tpu import checkpoint as ckpt
    from rama_tpu.config import EngineConfig
    from rama_tpu.runtime.engine import Engine, Request
    from tests.test_engine import collect, make_tokenizer

    cfg, _, path = v2_setup
    tok = make_tokenizer(cfg.vocab_size)

    def run(ecfg):
        qp = ckpt.load_checkpoint_quantized(path)
        pq = load_params_quantized(cfg, qp, dtype=jnp.float32)
        eng = Engine(cfg, pq, tok, ecfg)
        eng.start()
        try:
            req = Request(prompt="ab", steps=6, temperature=0.0)
            eng.submit(req)
            out = collect(req)
        finally:
            eng.stop()
        assert eng.metrics["engine_errors"] == 0
        return out

    a = run(EngineConfig(max_batch_size=2, scale_dtype="bf16"))
    b = run(EngineConfig(max_batch_size=2, scale_dtype="bf16"))
    assert a == b  # deterministic under the cast
    c = run(EngineConfig(max_batch_size=2, scale_dtype="bf16", tp_size=2))
    assert c == a  # tp shards bf16 scales identically

    with pytest.raises(ValueError):
        Engine(cfg, load_params_quantized(
            cfg, ckpt.load_checkpoint_quantized(path), dtype=jnp.float32),
            tok, EngineConfig(scale_dtype="fp8"))
