"""Fused SwiGLU FFN kernel vs the unfused XLA reference (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rama_tpu.ops.pallas.ffn import ffn_fused_layered, ffn_tileable
from rama_tpu.ops.quant import (dequantize, quantize_int4, quantize_int8)


def _stack(quant, mats, gs):
    qts = [quant(jnp.asarray(m), gs) for m in mats]
    from rama_tpu.ops.quant import QuantizedTensor
    return QuantizedTensor(q=jnp.stack([q.q for q in qts]),
                           scales=jnp.stack([q.scales for q in qts]),
                           group_size=qts[0].group_size, bits=qts[0].bits)


def _ref_ffn(x, w13_l, w2_l):
    h = w2_l.shape[0]
    w1 = dequantize_slice(w13_l, 0, h)
    w3 = dequantize_slice(w13_l, h, h)
    a = x.astype(jnp.float32) @ w1
    c = x.astype(jnp.float32) @ w3
    hmid = (jax.nn.silu(a) * c).astype(jnp.bfloat16).astype(jnp.float32)
    from rama_tpu.ops.quant import QuantizedTensor
    w2 = dequantize(w2_l, jnp.float32)
    return hmid @ w2


def dequantize_slice(qt, off, width):
    full = dequantize(qt, jnp.float32)
    return full[:, off:off + width]


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("m", [1, 8])
def test_ffn_fused_matches_reference(bits, m):
    rng = np.random.default_rng(7 + bits)
    L, K, H = 3, 256, 512
    gs = 64
    quant = quantize_int8 if bits == 8 else quantize_int4
    w13s = [rng.standard_normal((K, 2 * H)).astype(np.float32) * 0.1
            for _ in range(L)]
    w2s = [rng.standard_normal((H, K)).astype(np.float32) * 0.1
           for _ in range(L)]
    w13 = _stack(quant, w13s, gs)
    w2 = _stack(quant, w2s, gs)
    assert ffn_tileable(w13, w2)
    x = jnp.asarray(rng.standard_normal((m, K)).astype(np.float32) * 0.5,
                    jnp.bfloat16)

    for l in range(L):
        got = ffn_fused_layered(x, w13, w2, jnp.int32(l), interpret=True)
        from rama_tpu.ops.quant import QuantizedTensor
        w13_l = QuantizedTensor(q=w13.q[l], scales=w13.scales[l],
                                group_size=w13.group_size, bits=bits)
        w2_l = QuantizedTensor(q=w2.q[l], scales=w2.scales[l],
                               group_size=w2.group_size, bits=bits)
        want = _ref_ffn(x, w13_l, w2_l)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want), atol=0.15, rtol=0.1)


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("m", [1, 8])
def test_ffn_fused_interleaved_matches_plain(bits, m):
    """The il-tile w13 layout is a pure column permutation: the kernel must
    produce the same output as the plain [W1 | W3] layout."""
    from rama_tpu.models.llama import _interleave_w13
    from rama_tpu.ops.pallas.ffn import phase_a_tile

    rng = np.random.default_rng(11 + bits)
    L, K, H = 2, 256, 512
    gs = 64
    quant = quantize_int8 if bits == 8 else quantize_int4
    w13 = _stack(quant, [rng.standard_normal((K, 2 * H)).astype(np.float32) * 0.1
                         for _ in range(L)], gs)
    w2 = _stack(quant, [rng.standard_normal((H, K)).astype(np.float32) * 0.1
                        for _ in range(L)], gs)
    bh = phase_a_tile(H, bits, w2.group_size)
    w13_il = _interleave_w13(w13, H, bh)
    assert w13_il.il == bh and ffn_tileable(w13_il, w2)
    x = jnp.asarray(rng.standard_normal((m, K)).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    for l in range(L):
        plain = ffn_fused_layered(x, w13, w2, jnp.int32(l), interpret=True)
        il = ffn_fused_layered(x, w13_il, w2, jnp.int32(l), interpret=True)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(il))


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("m", [1, 8])
def test_ffn_fused_phase_b_acc_matches(bits, m):
    """The transposed-scratch accscale phase B is numerically equivalent to
    the dequant-in-VMEM phase B (scales distribute over the group dots)."""
    from rama_tpu.ops.pallas import ffn as ffn_mod

    rng = np.random.default_rng(23 + bits)
    L, K, H = 2, 256, 512
    gs = 64
    quant = quantize_int8 if bits == 8 else quantize_int4
    w13 = _stack(quant, [rng.standard_normal((K, 2 * H)).astype(np.float32) * 0.1
                         for _ in range(L)], gs)
    w2 = _stack(quant, [rng.standard_normal((H, K)).astype(np.float32) * 0.1
                        for _ in range(L)], gs)
    x = jnp.asarray(rng.standard_normal((m, K)).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    try:
        ffn_mod._PHASE_B_ACC = True
        got = ffn_fused_layered(x, w13, w2, jnp.int32(1), interpret=True)
    finally:
        ffn_mod._PHASE_B_ACC = False
    want = ffn_fused_layered(x, w13, w2, jnp.int32(1), interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=5e-3, rtol=5e-3)


def test_split_h13_inverts_interleave():
    from rama_tpu.models.llama import _interleave_w13, split_h13
    from rama_tpu.ops.quant import dequantize

    rng = np.random.default_rng(5)
    K, H, gs, bh = 128, 512, 64, 128
    w13 = _stack(quantize_int8,
                 [rng.standard_normal((K, 2 * H)).astype(np.float32)], gs)
    w13_il = _interleave_w13(w13, H, bh)
    x = jnp.asarray(rng.standard_normal((4, K)).astype(np.float32))
    h_plain = x @ dequantize(w13, jnp.float32)[0]
    h_il = x @ dequantize(w13_il, jnp.float32)[0]
    h1p, h3p = split_h13(h_plain, w13)
    h1i, h3i = split_h13(h_il, w13_il)
    np.testing.assert_array_equal(np.asarray(h1p), np.asarray(h1i))
    np.testing.assert_array_equal(np.asarray(h3p), np.asarray(h3i))


def test_fuse_params_interleaves_quantized_w13():
    """fuse_params marks quantized w13 interleaved and whole-model decode
    logits are unchanged vs the unfused params (exact column permutation)."""
    from rama_tpu.models.llama import KVCache, forward, fuse_params, quantize_params
    from rama_tpu.testing.ref_model import tiny_config, random_params

    cfg = tiny_config()
    npp = random_params(cfg)
    params = quantize_params(cfg, npp, bits=8, group_size=32)
    fused = fuse_params(dict(params), cfg)
    w13 = fused["w13"]
    from rama_tpu.ops.quant import QuantizedTensor
    if isinstance(w13, QuantizedTensor):
        from rama_tpu.ops.pallas.ffn import phase_a_tile
        assert w13.il == (phase_a_tile(cfg.hidden_dim, 8,
                                       fused["w2"].group_size) or 0)
    tokens = jnp.asarray([[1, 5, 9]], jnp.int32)
    pos = jnp.arange(3)[None, :]
    lu, cu = forward(params, cfg, tokens, pos,
                     KVCache.create(cfg, batch=1, max_len=8))
    lf, cf = forward(fused, cfg, tokens, pos,
                     KVCache.create(cfg, batch=1, max_len=8))
    np.testing.assert_allclose(np.asarray(lu), np.asarray(lf),
                               atol=2e-2, rtol=2e-2)


def test_ffn_tileable_rejects_mismatch():
    rng = np.random.default_rng(3)
    w13 = _stack(quantize_int8, [rng.standard_normal((256, 512)).astype(np.float32)], 64)
    w2 = _stack(quantize_int8, [rng.standard_normal((512, 256)).astype(np.float32)], 64)
    # w13 last dim 512 != 2 * 512
    assert not ffn_tileable(w13, w2)
