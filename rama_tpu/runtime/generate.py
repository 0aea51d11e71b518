"""Generation loops: on-device scan generation and prefill+decode fast path.

The reference's hot loop (engine/src/transformer/mod.rs:169-248) does one
host-driven forward per token with a device->host logits sync per step
(gpu.rs:153 — the per-token D2H bubble called out in SURVEY §3.3). Here the
*entire* generation — forward, sample, prompt forcing — is one jit-compiled
`lax.scan`, so a 200-token run is a single device program with zero host
round-trips. Streaming callers use `decode_step` directly instead (see
rama_tpu.runtime.engine).

Emission semantics match the reference loop (mod.rs:182-204): generation
starts from BOS=1 at position 0; while pos < len(prompt) the "sampled" token
is forced to prompt[pos]; every next-token (including the re-echoed prompt)
is emitted; there is no EOS early-stop in parity mode (the reference always
runs all `steps`), but `stop_at_eos` is available for serving.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rama_tpu.config import ModelConfig
from rama_tpu.models.llama import KVCache, decode_step, prefill
from rama_tpu.runtime.sampler import sample_greedy, sample_top_p
from rama_tpu.tokenizer import BOS_ID, Tokenizer


@partial(jax.jit, static_argnames=("cfg", "steps", "temperature", "top_p"),
         donate_argnames=("cache",))
def generate_scan(params, cfg: ModelConfig, prompt_padded: jax.Array,
                  prompt_len: jax.Array, steps: int, temperature: float,
                  top_p: float, key: jax.Array, cache: KVCache) -> jax.Array:
    """Token-at-a-time generation, fully on device. Returns (steps,) emitted ids.

    prompt_padded: (steps,) int32 (prompt ids then anything); prompt_len: ().
    Exact reference loop semantics — every position (prompt included) runs one
    decode step, matching mod.rs:187-193.
    """

    def step(carry, pos):
        token, cache, key = carry
        logits, cache = decode_step(params, cfg, token[None], pos[None], cache)
        if temperature == 0.0:
            sampled = sample_greedy(logits)[0]
        else:
            key, sub = jax.random.split(key)
            sampled = sample_top_p(logits, sub, temperature, top_p)[0]
        nxt = jnp.where(pos < prompt_len, prompt_padded[pos], sampled)
        return (nxt, cache, key), nxt

    init = (jnp.int32(BOS_ID), cache, key)
    _, out = jax.lax.scan(step, init, jnp.arange(steps, dtype=jnp.int32))
    return out


@partial(jax.jit, static_argnames=("cfg", "steps", "prompt_len", "temperature", "top_p"),
         donate_argnames=("cache",))
def generate_prefill_decode(params, cfg: ModelConfig, prompt: jax.Array,
                            steps: int, prompt_len: int, temperature: float,
                            top_p: float, key: jax.Array, cache: KVCache) -> jax.Array:
    """Fast path: batched prefill over the prompt, then scan decode.

    prompt: (prompt_len,) int32 with 1 <= prompt_len < steps. The prefill
    input stream is [BOS, prompt[0], ..., prompt[-1]] at positions
    0..prompt_len, so the logits at the last prefill position sample the
    first post-prompt token — numerically the same computation as the
    token-at-a-time loop, restructured into one big MXU-friendly pass.
    """
    inputs = jnp.concatenate([jnp.full((1,), BOS_ID, jnp.int32), prompt])
    logits, cache = prefill(params, cfg, inputs[None, :], cache,
                            last_only=True)

    def sample_fn(logits_1v, key):
        if temperature == 0.0:
            return sample_greedy(logits_1v)[0]
        return sample_top_p(logits_1v, key, temperature, top_p)[0]

    key, sub = jax.random.split(key)
    first = sample_fn(logits[:, -1], sub)

    def step(carry, pos):
        token, cache, key = carry
        logits, cache = decode_step(params, cfg, token[None], pos[None], cache)
        key, sub = jax.random.split(key)
        nxt = sample_fn(logits, sub)
        return (nxt, cache, key), nxt

    positions = jnp.arange(prompt_len + 1, steps, dtype=jnp.int32)
    _, rest = jax.lax.scan(step, (first, cache, key), positions)
    return jnp.concatenate([prompt, first[None], rest])


def generate_text(params, cfg: ModelConfig, tokenizer: Tokenizer, prompt: str,
                  steps: int | None = None, temperature: float = 1.0,
                  top_p: float = 0.9, seed: int = 100,
                  cache_dtype=jnp.bfloat16, fast: bool = True) -> tuple[str, list[int]]:
    """Encode, generate, decode. Returns (text, emitted token ids)."""
    steps = min(steps or 255, cfg.seq_len)
    prompt_ids = tokenizer.encode(prompt) if prompt else []
    if len(prompt_ids) >= steps:
        prompt_ids = prompt_ids[: steps - 1]
    key = jax.random.PRNGKey(seed)
    cache = KVCache.create(cfg, batch=1, dtype=cache_dtype)

    if fast and prompt_ids:
        ids = generate_prefill_decode(
            params, cfg, jnp.asarray(prompt_ids, jnp.int32), steps,
            len(prompt_ids), temperature, top_p, key, cache)
    else:
        padded = np.zeros(steps, np.int32)
        padded[: len(prompt_ids)] = prompt_ids
        ids = generate_scan(params, cfg, jnp.asarray(padded),
                            jnp.int32(len(prompt_ids)), steps, temperature,
                            top_p, key, cache)
    ids = np.asarray(jax.device_get(ids)).tolist()
    return tokenizer.decode_ids(ids), ids
