"""Flagship-shape (Llama-2-7B) tensor-parallel lowering checks on CPU.

The regular TP tests run tiny configs, so a shard_map shape bug that only
exists at deployment shapes (head_dim 128, hidden 11008, the w2 scale-group
split at tp=8) would surface for the first time on real multi-chip hardware
(VERDICT r3 item 8). These tests trace/lower the tp=8 serving programs at
full 7B shapes using ShapeDtypeStruct params — no 7B buffers materialize —
and unit-test the shard_params scale-regrouping on skinny real tensors at
the flagship K dims.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding

from rama_tpu.config import ModelConfig
from rama_tpu.models.llama import KVCache, QuantKVCache
from rama_tpu.ops.quant import (QuantizedEmbedding, QuantizedTensor,
                                dequantize, pick_int4_group_size,
                                quantize_int4, quantize_int8)
from rama_tpu.parallel.mesh import make_mesh
from rama_tpu.parallel.tp import (make_decode_tick, make_prefill,
                                  make_spec_scan_tick, param_specs,
                                  quant_cache_spec, shard_params)

TP = 8


def flagship_config():
    return ModelConfig(dim=4096, hidden_dim=11008, n_layers=32, n_heads=32,
                       n_kv_heads=32, vocab_size=32000, seq_len=2048)


def _sds_params(cfg: ModelConfig, mesh):
    """ShapeDtypeStruct pytree of the POST-shard_params flagship int8 params
    (fused wqkv/w13 layout; w2 scale groups split to gcd(64, 11008/8) = 32,
    exactly what shard_params emits for tp=8), with TP shardings attached so
    .lower() sees the deployment layout."""
    L, D, H, V = cfg.n_layers, cfg.dim, cfg.hidden_dim, cfg.vocab_size

    def qt(k, n, gs):
        return QuantizedTensor(
            q=jax.ShapeDtypeStruct((L, k, n), jnp.int8),
            scales=jax.ShapeDtypeStruct((L, k // gs, n), jnp.float32),
            group_size=gs, bits=8)

    emb = QuantizedEmbedding(q=jax.ShapeDtypeStruct((V, D), jnp.int8),
                             scales=jax.ShapeDtypeStruct((V, D // 64),
                                                         jnp.float32),
                             group_size=64)
    qkv_n = (cfg.n_heads + 2 * cfg.n_kv_heads) * cfg.head_dim
    params = {
        "tok_embedding": emb,
        "attn_norm": jax.ShapeDtypeStruct((L, D), jnp.bfloat16),
        "ffn_norm": jax.ShapeDtypeStruct((L, D), jnp.bfloat16),
        "final_norm": jax.ShapeDtypeStruct((D,), jnp.bfloat16),
        "wqkv": qt(D, qkv_n, 64),
        "w13": qt(D, 2 * H, 64),
        "wo": qt(D, D, 64),
        "w2": qt(H, D, 32),  # 11008/8 = 1376; gcd(64, 1376) = 32
        "wcls": QuantizedTensor(
            q=jax.ShapeDtypeStruct((D, V), jnp.int8),
            scales=jax.ShapeDtypeStruct((D // 64, V), jnp.float32),
            group_size=64, bits=8),
        "rope_cos": jax.ShapeDtypeStruct((cfg.seq_len, cfg.head_dim // 2),
                                         jnp.float32),
        "rope_sin": jax.ShapeDtypeStruct((cfg.seq_len, cfg.head_dim // 2),
                                         jnp.float32),
    }
    specs = param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                          sharding=NamedSharding(mesh, s)),
        params, specs)


def _sds_cache(cfg, mesh, batch, max_len):
    shaped = jax.eval_shape(
        lambda: QuantKVCache.create(cfg, batch=batch, max_len=max_len))
    spec = quant_cache_spec()
    return jax.tree_util.tree_map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                          sharding=NamedSharding(mesh, s)),
        shaped, spec)


@pytest.fixture(scope="module")
def flagship():
    cfg = flagship_config()
    mesh = make_mesh(tp_size=TP, dp_size=1, devices=jax.devices()[:TP])
    return cfg, mesh, _sds_params(cfg, mesh)


def test_tp8_flagship_decode_tick_lowers(flagship):
    cfg, mesh, params = flagship
    b = 8
    tick = make_decode_tick(cfg, mesh, params, kv_quant=True)
    cache = _sds_cache(cfg, mesh, b, cfg.seq_len)
    sb = jax.ShapeDtypeStruct((b,), jnp.int32)
    sf = jax.ShapeDtypeStruct((b,), jnp.float32)
    keys = jax.ShapeDtypeStruct((b, 2), jnp.uint32)
    lowered = tick.lower(params, sb, sb, sf, sf, keys, cache, n=8)
    assert "stablehlo" in lowered.as_text(dialect="stablehlo")[:4096].lower() \
        or lowered is not None


def test_tp8_flagship_spec_tick_lowers(flagship):
    cfg, mesh, params = flagship
    b, k = 8, 3
    spec = make_spec_scan_tick(cfg, mesh, params, k, kv_quant=True)
    cache = _sds_cache(cfg, mesh, b, cfg.seq_len)
    sb = jax.ShapeDtypeStruct((b,), jnp.int32)
    sf = jax.ShapeDtypeStruct((b,), jnp.float32)
    keys = jax.ShapeDtypeStruct((b, 2), jnp.uint32)
    hist = jax.ShapeDtypeStruct((b, cfg.seq_len + k + 1), jnp.int32)
    assert spec.lower(params, sb, sb, sf, sf, keys, cache, hist,
                      m=4) is not None


def test_tp8_flagship_prefill_lowers(flagship):
    cfg, mesh, params = flagship
    k_pad, t_pad = 8, 2048
    prefill = make_prefill(cfg, mesh, params)
    scratch = jax.eval_shape(
        lambda: KVCache.create(cfg, batch=k_pad, max_len=t_pad))
    from rama_tpu.parallel.tp import cache_spec

    scratch = jax.tree_util.tree_map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                          sharding=NamedSharding(mesh, s)),
        scratch, cache_spec())
    tokens = jax.ShapeDtypeStruct((k_pad, t_pad), jnp.int32)
    assert prefill.lower(params, tokens, scratch) is not None


def test_shard_params_w2_scale_split_at_flagship_k():
    """shard_params must regroup w2's int8 scales (gs 64 -> 32) for tp=8 at
    K=11008 — bit-identically (split_groups repeats scale rows)."""
    mesh = make_mesh(tp_size=TP, dp_size=1, devices=jax.devices()[:TP])
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((1, 11008, 128)), jnp.float32)
    qt = quantize_int8(w, group_size=64)
    out = shard_params({"w2": qt}, mesh)["w2"]
    assert out.group_size == 32
    assert out.scales.shape == (1, 11008 // 32, 128)
    np.testing.assert_array_equal(
        np.asarray(dequantize(qt, jnp.float32)),
        np.asarray(dequantize(out, jnp.float32)))


def test_int4_group_size_aligns_for_tp8_at_flagship_k():
    """pick_int4_group_size must choose a packing block that splits evenly
    into tp=8 shards of K=11008 (shard_params raises otherwise)."""
    mesh = make_mesh(tp_size=TP, dp_size=1, devices=jax.devices()[:TP])
    gs = pick_int4_group_size(11008, 64)
    k_local = 11008 // TP
    assert k_local % (2 * gs) == 0
    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.standard_normal((1, 11008, 128)), jnp.float32)
    qt = quantize_int4(w, group_size=gs)
    out = shard_params({"w2": qt}, mesh)["w2"]
    assert out.bits == 4
