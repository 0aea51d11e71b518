"""Regenerate the pinned golden decode fixtures (tests/fixtures/goldens.json).

The reference's de-facto acceptance test is pinned generations at fixed seeds
(reference README.md:24-31, 56-70). With no real model artifacts in this
environment, the goldens pin fixed-seed token sequences for deterministic
*synthetic* checkpoints instead: any cross-round change to the forward pass,
sampler, RoPE tables, or quantization packing shifts the chains and fails
tests/test_goldens.py.

Run on the CPU backend (the one CI uses) after an intentional numerics
change, then commit the updated fixture:

    python tools/make_goldens.py
"""

from __future__ import annotations

import json
import pathlib

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rama_tpu.config import ModelConfig  # noqa: E402
from rama_tpu.models.llama import (KVCache, fuse_params, load_params,  # noqa: E402
                                   quantize_params)
from rama_tpu.runtime.generate import generate_prefill_decode  # noqa: E402
from rama_tpu.testing.ref_model import random_params  # noqa: E402

FIXTURE = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "goldens.json"

# (name, config, param seed) — "tiny" mirrors tiny_config(); "stories15M-ish"
# is the published stories15M shape at a shorter seq_len to keep CI fast.
CASES = [
    ("tiny", ModelConfig(dim=64, hidden_dim=176, n_layers=3, n_heads=4,
                         n_kv_heads=2, vocab_size=128, seq_len=48), 7),
    ("stories15M", ModelConfig(dim=288, hidden_dim=768, n_layers=6, n_heads=6,
                               n_kv_heads=6, vocab_size=32000, seq_len=64), 0),
]

PROMPT = [3, 42, 7, 11]
STEPS = 24


def chains_for(cfg: ModelConfig, seed: int) -> dict:
    np_params = random_params(cfg, seed=seed)
    out = {}
    for quant in ("fp32", "int8", "int4"):
        if quant == "fp32":
            params = load_params(cfg, np_params, dtype=jnp.float32)
        elif quant == "int8":
            params = quantize_params(cfg, np_params, bits=8, group_size=16,
                                     dtype=jnp.float32)
        else:
            # int4 packing needs whole 2*gs blocks along every K; the tiny
            # config's hidden_dim=176 forces gs=8 (176 % 32 != 0)
            gs4 = 8 if cfg.hidden_dim % 32 else 16
            params = quantize_params(cfg, np_params, bits=4, group_size=gs4,
                                     dtype=jnp.float32)
        params = fuse_params(params, cfg)
        for temp, top_p, label in ((0.0, 0.9, "greedy"), (0.9, 0.9, "sampled")):
            cache = KVCache.create(cfg, batch=1, max_len=STEPS,
                                   dtype=jnp.float32)
            ids = generate_prefill_decode(
                params, cfg, jnp.asarray(PROMPT, jnp.int32), STEPS,
                len(PROMPT), temp, top_p, jax.random.PRNGKey(100), cache)
            out[f"{quant}/{label}"] = np.asarray(ids).tolist()
    return out


def main():
    goldens = {"prompt": PROMPT, "steps": STEPS, "key_seed": 100, "cases": {}}
    for name, cfg, seed in CASES:
        goldens["cases"][name] = {"seed": seed, "chains": chains_for(cfg, seed)}
        print(f"{name}: pinned {len(goldens['cases'][name]['chains'])} chains")
    FIXTURE.write_text(json.dumps(goldens, indent=1))
    print(f"wrote {FIXTURE}")


if __name__ == "__main__":
    main()
