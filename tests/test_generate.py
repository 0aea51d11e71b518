"""Generation loop semantics: prompt forcing, scan vs prefill+decode parity."""

import jax
import jax.numpy as jnp
import numpy as np

from rama_tpu.models.llama import KVCache, load_params
from rama_tpu.runtime.generate import generate_prefill_decode, generate_scan
from rama_tpu.testing.ref_model import RefModel, random_params, tiny_config

STEPS = 16


def setup():
    cfg = tiny_config()
    params = random_params(cfg, seed=21)
    p = load_params(cfg, params, dtype=jnp.float32)
    return cfg, params, p


def run_scan(cfg, p, prompt_ids, temperature=0.0):
    padded = np.zeros(STEPS, np.int32)
    padded[: len(prompt_ids)] = prompt_ids
    cache = KVCache.create(cfg, batch=1, dtype=jnp.float32)
    ids = generate_scan(p, cfg, jnp.asarray(padded), jnp.int32(len(prompt_ids)),
                        STEPS, temperature, 0.9, jax.random.PRNGKey(0), cache)
    return np.asarray(ids).tolist()


def test_greedy_matches_oracle_chain():
    """On-device greedy loop == numpy oracle running the reference loop."""
    cfg, params, p = setup()
    prompt = [5, 9, 31]
    got = run_scan(cfg, p, prompt)

    ref = RefModel(cfg, params)
    token, emitted = 1, []
    for pos in range(STEPS):
        logits = ref.step(token, pos)
        nxt = prompt[pos] if pos < len(prompt) else int(np.argmax(logits))
        emitted.append(nxt)
        token = nxt
    assert got == emitted


def test_prompt_echoed():
    cfg, params, p = setup()
    prompt = [7, 2, 40, 11]
    got = run_scan(cfg, p, prompt)
    assert got[: len(prompt)] == prompt


def test_fast_path_matches_scan_greedy():
    cfg, params, p = setup()
    prompt = [5, 9, 31]
    slow = run_scan(cfg, p, prompt)
    cache = KVCache.create(cfg, batch=1, dtype=jnp.float32)
    fast = generate_prefill_decode(p, cfg, jnp.asarray(prompt, jnp.int32), STEPS,
                                   len(prompt), 0.0, 0.9, jax.random.PRNGKey(0),
                                   cache)
    assert np.asarray(fast).tolist() == slow


def test_empty_prompt_starts_from_bos():
    cfg, params, p = setup()
    got = run_scan(cfg, p, [])
    ref = RefModel(cfg, params)
    token, emitted = 1, []
    for pos in range(STEPS):
        nxt = int(np.argmax(ref.step(token, pos)))
        emitted.append(nxt)
        token = nxt
    assert got == emitted


def test_topp_sampling_deterministic_per_key():
    cfg, params, p = setup()
    a = run_scan(cfg, p, [3], temperature=0.8)
    b = run_scan(cfg, p, [3], temperature=0.8)
    assert a == b
    assert all(0 <= t < cfg.vocab_size for t in a)
