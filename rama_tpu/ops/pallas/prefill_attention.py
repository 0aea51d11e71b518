"""Flash-style causal prefill attention (Pallas TPU).

The XLA prefill path materializes (B, T, S) masked scores against the full
cache length S = max_len: HBM traffic and peak memory scale with T*S even
though causality makes half the tiles dead and positions past the prompt
contribute nothing. (The reference's CPU/GPU prefill has the same shape:
engine/src/device/gpu.rs attention loops score the whole cache row range per
query.) This kernel computes softmax(QK^T)V tile-by-tile with the online
softmax recurrence, so:

  - only S-tiles with s_tile_start <= q_tile_end are read or computed
    (strictly-above-diagonal tiles repeat the previous block index; their
    DMAs are elided and the grid step is a no-op);
  - the (T, S) score matrix never exists: per program it's a (bt, c) VMEM
    tile; peak VMEM is O(bt*hd + c*hd) regardless of T or S;
  - GQA query groups ride along as extra tile rows ((rep*bt, hd) per
    program), so each cache stripe is streamed once per kv head, not once
    per query head.

Grid: (B, n_kv, nt, nc); scratch carries (acc, m, l) across the S-tile loop
(the innermost grid axis), reset at s-tile 0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(len_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
            *, bt: int, c: int, nc: int, rep: int):
    b = pl.program_id(0)
    t = pl.program_id(2)
    p = pl.program_id(3)
    hd = q_ref.shape[-1]
    plen = len_ref[b]
    # last s-tile this q-tile can see: diagonal tile, clipped to the prompt
    last = jnp.minimum(((t + 1) * bt - 1) // c,
                       jnp.maximum((plen - 1) // c, 0))

    @pl.when(p == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(p <= last)
    def _():
        q = q_ref[0, 0].reshape(rep * bt, hd)      # (rep, bt, hd) tile
        k = k_ref[0, 0]                            # (c, hd)
        v = v_ref[0, 0]

        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) / np.sqrt(hd)  # (rep*bt, c)
        # causal + prompt-length mask: row r is query position t*bt + r%bt
        qpos = t * bt + jax.lax.broadcasted_iota(
            jnp.int32, (rep * bt, c), 0) % bt
        spos = p * c + jax.lax.broadcasted_iota(jnp.int32, (rep * bt, c), 1)
        ok = (spos <= qpos) & (spos < plen)
        scores = jnp.where(ok, scores, -1e30)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        e = jnp.exp(scores - m_new)
        l_new = alpha * l_prev + jnp.sum(e, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[...] = alpha * acc_ref[...] + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(p == nc - 1)
    def _():
        # rows past plen never matched the mask: l == 0 there; emit zeros
        # rather than NaN (those logits are dropped by the caller anyway)
        l = l_ref[:, :1]
        out = acc_ref[...] / jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = out.reshape(rep, bt, hd).astype(o_ref.dtype)


def _pick(n: int, target: int, step: int) -> int:
    best = None
    b = step
    while b <= min(n, target):
        if n % b == 0:
            best = b
        b += step
    return best if best is not None else n


def prefill_attention_supported(t: int, s: int, hd: int, nh: int,
                                nkv: int) -> bool:
    return (hd % 128 == 0 and t % 8 == 0 and s % 8 == 0 and nh % nkv == 0
            and s >= t)


@partial(jax.jit, static_argnames=("interpret",))
def prefill_attention(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                      plen: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Causal prefill attention over freshly-written cache stripes.

    q (B, T, nh, hd): the prompt's query vectors for positions 0..T-1.
    k_cache/v_cache (B, nkv, S, hd): cache with rows 0..T-1 already written.
    plen (B,) int32: per-slot prompt length (rows >= plen are masked; query
    rows >= plen produce zeros).

    Returns (B, T, nh, hd).
    """
    b, t, nh, hd = q.shape
    nkv, s = k_cache.shape[1], k_cache.shape[2]
    rep = nh // nkv
    bt = _pick(t, 256, 8)
    c = _pick(s, 512, 8)
    nt, nc = t // bt, s // c

    # (B, T, nh, hd) -> (B, nkv, rep, T, hd): kv-head-major query groups
    qg = q.reshape(b, t, nkv, rep, hd).transpose(0, 2, 3, 1, 4)

    def kv_idx(bi, j, ti, p, sc):
        last = jnp.minimum(((ti + 1) * bt - 1) // c,
                           jnp.maximum((sc[bi] - 1) // c, 0))
        return (bi, j, jnp.minimum(p, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nkv, nt, nc),
        in_specs=[
            pl.BlockSpec((1, 1, rep, bt, hd),
                         lambda bi, j, ti, p, sc: (bi, j, 0, ti, 0)),
            pl.BlockSpec((1, 1, c, hd), kv_idx),
            pl.BlockSpec((1, 1, c, hd), kv_idx),
        ],
        out_specs=pl.BlockSpec((1, 1, rep, bt, hd),
                               lambda bi, j, ti, p, sc: (bi, j, 0, ti, 0)),
        scratch_shapes=[
            pltpu.VMEM((rep * bt, hd), jnp.float32),
            pltpu.VMEM((rep * bt, 128), jnp.float32),
            pltpu.VMEM((rep * bt, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel, bt=bt, c=c, nc=nc, rep=rep),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nkv, rep, t, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(plen.astype(jnp.int32), qg, k_cache, v_cache)
    return out.transpose(0, 3, 1, 2, 4).reshape(b, t, nh, hd)
