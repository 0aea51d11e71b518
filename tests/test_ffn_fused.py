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


def test_ffn_tileable_rejects_mismatch():
    rng = np.random.default_rng(3)
    w13 = _stack(quantize_int8, [rng.standard_normal((256, 512)).astype(np.float32)], 64)
    w2 = _stack(quantize_int8, [rng.standard_normal((512, 256)).astype(np.float32)], 64)
    # w13 last dim 512 != 2 * 512
    assert not ffn_tileable(w13, w2)
