"""Pinned golden decodes: fixed-seed token chains for deterministic synthetic
checkpoints (the reference's acceptance practice, README.md:24-31, applied to
the artifacts this environment can synthesize).

If one of these fails after an INTENTIONAL numerics change (sampler, RoPE,
forward, quantization packing), regenerate with `python tools/make_goldens.py`
and commit the diff — the point is that such changes are loud and reviewed,
never silent.
"""

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rama_tpu.config import ModelConfig
from rama_tpu.models.llama import KVCache, fuse_params, load_params, quantize_params
from rama_tpu.runtime.generate import generate_prefill_decode
from rama_tpu.testing.ref_model import random_params

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "goldens.json"

CONFIGS = {
    "tiny": ModelConfig(dim=64, hidden_dim=176, n_layers=3, n_heads=4,
                        n_kv_heads=2, vocab_size=128, seq_len=48),
    "stories15M": ModelConfig(dim=288, hidden_dim=768, n_layers=6, n_heads=6,
                              n_kv_heads=6, vocab_size=32000, seq_len=64),
}


@pytest.fixture(scope="module")
def goldens():
    return json.loads(FIXTURE.read_text())


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden_decode_chains(goldens, name):
    cfg = CONFIGS[name]
    case = goldens["cases"][name]
    prompt = jnp.asarray(goldens["prompt"], jnp.int32)
    steps = goldens["steps"]
    key = jax.random.PRNGKey(goldens["key_seed"])
    np_params = random_params(cfg, seed=case["seed"])

    for chain_name, want in case["chains"].items():
        quant, label = chain_name.split("/")
        if quant == "fp32":
            params = load_params(cfg, np_params, dtype=jnp.float32)
        elif quant == "int8":
            params = quantize_params(cfg, np_params, bits=8, group_size=16,
                                     dtype=jnp.float32)
        else:
            gs4 = 8 if cfg.hidden_dim % 32 else 16
            params = quantize_params(cfg, np_params, bits=4, group_size=gs4,
                                     dtype=jnp.float32)
        params = fuse_params(params, cfg)
        temp = 0.0 if label == "greedy" else 0.9
        cache = KVCache.create(cfg, batch=1, max_len=steps, dtype=jnp.float32)
        ids = generate_prefill_decode(params, cfg, prompt, steps,
                                      len(goldens["prompt"]), temp, 0.9,
                                      key, cache)
        got = np.asarray(ids).tolist()
        assert got == want, (
            f"{name} {chain_name} drifted:\n got {got}\nwant {want}\n"
            "If this change is intentional, regenerate with "
            "tools/make_goldens.py and commit the fixture diff.")
