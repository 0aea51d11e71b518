"""Fused attention-block kernel (rope + cache write + attention + wo) vs the
composed reference ops, in interpret mode (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rama_tpu.models.llama import apply_rope, _attention
from rama_tpu.ops.pallas.attn_block import attn_block_layered
from rama_tpu.ops.quant import matmul_xla, quantize_int4, quantize_int8


def composed_reference(q_raw, kn_raw, vn, cos_rows, sin_rows, k_full, v_full,
                       wo_qt, pos, layer):
    """rope -> scatter -> masked attention -> dequant matmul, all XLA."""
    b, nh, hd = q_raw.shape
    nkv = kn_raw.shape[1]
    q = apply_rope(q_raw[:, None], cos_rows[:, None], sin_rows[:, None])
    kn = apply_rope(kn_raw[:, None], cos_rows[:, None], sin_rows[:, None])[:, 0]
    bi = jnp.arange(b)[:, None]
    hi = jnp.arange(nkv)[None, :]
    k_full = k_full.at[layer, bi, hi, pos[:, None]].set(
        kn.astype(k_full.dtype))
    v_full = v_full.at[layer, bi, hi, pos[:, None]].set(
        vn.astype(v_full.dtype))
    s = k_full.shape[3]
    pos_mask = jnp.arange(s)[None, None, :] <= pos[:, None, None]
    att = _attention(q, k_full[layer], v_full[layer], pos_mask)[:, 0]
    from rama_tpu.ops.quant import QuantizedTensor

    wl = QuantizedTensor(q=wo_qt.q[layer], scales=wo_qt.scales[layer],
                         group_size=wo_qt.group_size, bits=wo_qt.bits)
    out = matmul_xla(att, wl, dtype=att.dtype)
    return out, k_full, v_full


def make_case(b=2, nkv=4, rep=1, hd=128, s=64, n_layers=2, gs=16, bits=8,
              seed=0):
    rng = np.random.default_rng(seed)
    nh = nkv * rep
    d = nh * hd
    q = jnp.asarray(rng.normal(size=(b, nh, hd)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(b, nkv, hd)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(b, nkv, hd)), jnp.float32)
    k_full = jnp.asarray(rng.normal(size=(n_layers, b, nkv, s, hd)),
                         jnp.float32)
    v_full = jnp.asarray(rng.normal(size=(n_layers, b, nkv, s, hd)),
                         jnp.float32)
    quant = quantize_int8 if bits == 8 else quantize_int4
    wo = quant(rng.normal(size=(n_layers, d, d)).astype(np.float32) * 0.1, gs)
    half = hd // 2
    inv = 1.0 / (10000.0 ** (np.arange(half) * 2.0 / hd))
    pos = jnp.asarray(rng.integers(0, s - 1, size=(b,)), jnp.int32)
    ang = np.asarray(pos)[:, None] * inv[None, :]
    cos = jnp.asarray(np.cos(ang), jnp.float32)
    sin = jnp.asarray(np.sin(ang), jnp.float32)
    return q, kn, vn, cos, sin, k_full, v_full, wo, pos


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("rep", [1, 2])
@pytest.mark.parametrize("acc_c", [True, False])
def test_attn_block_matches_composed(bits, rep, acc_c):
    # acc_c (transposed-att phase C) only engages at b == 1
    case = make_case(b=1 if acc_c else 2, rep=rep, bits=bits,
                     seed=11 + bits + rep)
    q, kn, vn, cos, sin, k_full, v_full, wo, pos = case
    layer = jnp.int32(1)

    want, k_want, v_want = composed_reference(
        q, kn, vn, cos, sin, k_full, v_full,
        jax.tree_util.tree_map(lambda x: x, wo), pos, layer)

    got, k_got, v_got = attn_block_layered(
        q, kn, vn, cos, sin, k_full, v_full, wo, pos, layer,
        chunk=16, acc_c=acc_c, interpret=True)

    np.testing.assert_allclose(np.asarray(k_got), np.asarray(k_want),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(v_got), np.asarray(v_want),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)


def test_attn_block_pos_edges():
    """pos = 0 (no cache history) and pos = S-1 (last row) both correct."""
    q, kn, vn, cos, sin, k_full, v_full, wo, _ = make_case(b=2, seed=3)
    s = k_full.shape[3]
    hd = q.shape[-1]
    for p0 in (0, s - 1):
        pos = jnp.asarray([p0, min(p0 + 1, s - 1)], jnp.int32)
        half = hd // 2
        inv = 1.0 / (10000.0 ** (np.arange(half) * 2.0 / hd))
        ang = np.asarray(pos)[:, None] * inv[None, :]
        cos = jnp.asarray(np.cos(ang), jnp.float32)
        sin = jnp.asarray(np.sin(ang), jnp.float32)
        layer = jnp.int32(0)
        want, k_want, v_want = composed_reference(
            q, kn, vn, cos, sin, k_full, v_full, wo, pos, layer)
        got, k_got, v_got = attn_block_layered(
            q, kn, vn, cos, sin, k_full, v_full, wo, pos, layer,
            chunk=16, interpret=True)
        np.testing.assert_allclose(np.asarray(k_got), np.asarray(k_want),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-3, atol=5e-3, err_msg=f"pos={p0}")


@pytest.mark.parametrize("rep", [1, 2])
def test_attn_rope_write_matches_composed(rep):
    """Light fusion (rope + cache write + attention, wo outside) matches the
    composed ops."""
    from rama_tpu.ops.pallas.attn_block import attn_rope_write_layered

    q, kn, vn, cos, sin, k_full, v_full, wo, pos = make_case(
        b=2, rep=rep, seed=29 + rep)
    layer = jnp.int32(1)
    want, k_want, v_want = composed_reference(
        q, kn, vn, cos, sin, k_full, v_full, wo, pos, layer)

    att, k_got, v_got = attn_rope_write_layered(
        q, kn, vn, cos, sin, k_full, v_full, pos, layer,
        chunk=16, interpret=True)
    from rama_tpu.ops.quant import QuantizedTensor
    wl = QuantizedTensor(q=wo.q[1], scales=wo.scales[1],
                         group_size=wo.group_size, bits=wo.bits)
    got = matmul_xla(att, wl, dtype=att.dtype)
    np.testing.assert_allclose(np.asarray(k_got), np.asarray(k_want),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(v_got), np.asarray(v_want),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)
