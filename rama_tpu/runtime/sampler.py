"""Token sampling: greedy argmax and temperature + nucleus (top-p).

Semantic parity with the reference sampler (engine/src/device/cpu.rs:155-179
`Device::sample` and engine/src/transformer/infer.rs:55-85 `sample_top_q`),
vectorized over a batch and driven by `jax.random` keys instead of the
reference's per-token re-seeded ChaCha20 (cpu.rs:161-162 — a quirk we do not
replicate; determinism here comes from the key fold, the idiomatic JAX way).

Reference semantics kept exactly:
- temperature == 0 -> greedy argmax (cpu.rs:164-168)
- temperature < 1 scales logits; temperature > 1 does NOT (cpu.rs:170-172
  only divides when temperature < 1.0 — documented quirk, preserved because
  golden outputs depend on it)
- top-p: drop probs <= (1-p)/(n-1), sort descending, cut at the first prefix
  whose cumulative mass exceeds p, then draw r = u * cum_prob and walk the CDF
  (infer.rs:55-85)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_greedy(logits: jax.Array) -> jax.Array:
    """(..., V) logits -> (...,) int32 argmax token ids."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


# top-k prefilter width for nucleus sampling: when the nucleus provably
# closes within the top TOPK_CAP probabilities (or everything past them is
# below the top-p floor), the CDF walk runs on (B, TOPK_CAP) instead of the
# full (B, V) sort — the full sort measurably doubles the cost of sampled
# serving ticks at V=32000. A lax.cond falls back to the exact full sort
# whenever ANY row's nucleus might extend past the cap, so results are
# BIT-IDENTICAL to the always-full-sort path.
TOPK_CAP = 1024


def _nucleus_walk(sp: jax.Array, si: jax.Array, u: jax.Array, tp: jax.Array,
                  cutoff: jax.Array) -> jax.Array:
    """Reference CDF walk over descending probs sp (B, W) with ids si:
    drop probs <= cutoff, cut at the first prefix whose cumulative mass
    exceeds top_p, draw r = u * cum_prob, walk (infer.rs:55-85)."""
    keep = sp > cutoff
    spk = jnp.where(keep, sp, 0.0)
    csum = jnp.cumsum(spk, axis=-1)

    # last_index: first prefix with csum > top_p, else the last kept entry
    over = csum > tp
    n_kept = jnp.maximum(jnp.sum(keep, axis=-1), 1)
    first_over = jnp.argmax(over, axis=-1)
    last_index = jnp.where(jnp.any(over, axis=-1), first_over, n_kept - 1)

    cum_prob = jnp.take_along_axis(csum, last_index[:, None], axis=-1)[:, 0]
    r = u * cum_prob

    idx_range = jnp.arange(sp.shape[-1])[None, :]
    candidate = (r[:, None] < csum) & (idx_range <= last_index[:, None]) & keep
    pick = jnp.where(jnp.any(candidate, axis=-1),
                     jnp.argmax(candidate, axis=-1), last_index)
    return jnp.take_along_axis(si, pick[:, None], axis=-1)[:, 0].astype(jnp.int32)


def _top_p_from_u(logits: jax.Array, u: jax.Array,
                  temperature: float | jax.Array,
                  top_p: float | jax.Array) -> jax.Array:
    """Nucleus sampling over (B, V) logits with a pre-drawn uniform u (B,)
    in [0, 1) per row -> (B,) int32 token ids."""
    b, v = logits.shape
    logits = logits.astype(jnp.float32)
    # scalar or per-slot (B,) hyperparameters both broadcast as (B, 1)
    tp = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (b,))[:, None]
    temp = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), (b,))[:, None]
    # reference only scales when temperature < 1.0 (cpu.rs:170-172)
    scale = jnp.where(temp < 1.0, 1.0 / jnp.maximum(temp, 1e-6), 1.0)
    probs = jax.nn.softmax(logits * scale, axis=-1)

    cutoff = (1.0 - tp) / (v - 1)
    if v <= 2 * TOPK_CAP:
        # small vocab: one key/value sort (a separate sort + argsort
        # measurably doubled the cost of sampled serving ticks)
        nsp, si = jax.lax.sort_key_val(-probs, jnp.broadcast_to(
            jnp.arange(v, dtype=jnp.int32), probs.shape), dimension=-1)
        return _nucleus_walk(-nsp, si, u, tp, cutoff)

    topv, topi = jax.lax.top_k(probs, TOPK_CAP)      # descending, stable
    kept_cap = jnp.where(topv > cutoff, topv, 0.0)
    # a row is exact within the cap iff everything past the cap is dropped
    # by the top-p floor, or the nucleus closes before the cap
    row_exact = ((topv[:, -1] <= cutoff[:, 0])
                 | (jnp.sum(kept_cap, axis=-1) > tp[:, 0]))

    def capped(_):
        return _nucleus_walk(topv, topi, u, tp, cutoff)

    def full(_):
        nsp, si = jax.lax.sort_key_val(-probs, jnp.broadcast_to(
            jnp.arange(v, dtype=jnp.int32), probs.shape), dimension=-1)
        return _nucleus_walk(-nsp, si, u, tp, cutoff)

    return jax.lax.cond(jnp.all(row_exact), capped, full, operand=None)


def sample_top_p(logits: jax.Array, key: jax.Array, temperature: float | jax.Array,
                 top_p: float | jax.Array) -> jax.Array:
    """Nucleus sampling over (B, V) logits -> (B,) int32 token ids."""
    b = logits.shape[0]
    return _top_p_from_u(logits, jax.random.uniform(key, (b,)),
                         temperature, top_p)


def sample(logits: jax.Array, key: jax.Array, temperature: float,
           top_p: float) -> jax.Array:
    """Dispatch greedy vs nucleus. `temperature` must be a static float here;
    inside jitted loops use `sample_top_p` + `jnp.where` on traced values."""
    if temperature == 0.0:
        return sample_greedy(logits)
    return sample_top_p(logits, key, temperature, top_p)


def sample_batched(logits: jax.Array, key: jax.Array, temperature: jax.Array,
                   top_p: jax.Array) -> jax.Array:
    """Per-slot sampling for the continuous-batching engine.

    temperature/top_p are (B,) arrays; slots with temperature == 0 decode
    greedily, the rest nucleus-sample — all inside one traced program.
    """
    nucleus = sample_top_p(logits, key, temperature, top_p)
    return jnp.where(temperature == 0.0, sample_greedy(logits), nucleus)


def fold_in_pos(slot_keys: jax.Array, pos: jax.Array) -> jax.Array:
    """Per-slot, per-position PRNG keys: slot_keys (B, 2) uint32 raw keys +
    pos (B,) int32 -> (B, 2) keys.

    The sampling key for (slot, position) is a pure function of the slot's
    stream key and the query position, so a slot's sampled stream is
    invariant to how steps are grouped into device dispatches (plain scan
    tick, speculative chunk, chained tick) — the same contract
    runtime.speculative._sample_positions established for the library path.
    """
    return jax.vmap(jax.random.fold_in)(slot_keys, pos)


def sample_batched_keyed(logits: jax.Array, keys: jax.Array,
                         temperature: jax.Array, top_p: jax.Array) -> jax.Array:
    """sample_batched with PER-SLOT keys (B, 2) uint32: each row draws its
    uniform from its own key (see fold_in_pos)."""
    u = jax.vmap(lambda k: jax.random.uniform(k, ()))(keys)
    nucleus = _top_p_from_u(logits, u, temperature, top_p)
    return jnp.where(temperature == 0.0, sample_greedy(logits), nucleus)
