"""Worker process for the multi-host serving test (not a pytest module).

Usage: python tests/_multihost_worker.py <process_id> <coordinator_port>

Two of these form a 2-process jax.distributed "pod" on the CPU backend
(gloo collectives). Process 0 fronts the engine and prints the collected
token streams as JSON; process 1 runs Engine.follow(), replaying the
broadcast device-call sequence.
"""

import json
import os
import sys

# self-sufficient import: the repo may not be pip-installed in the venv
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid, port = int(sys.argv[1]), sys.argv[2]

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(f"127.0.0.1:{port}", 2, pid)

import jax.numpy as jnp  # noqa: E402

from rama_tpu.config import EngineConfig  # noqa: E402
from rama_tpu.models.llama import load_params  # noqa: E402
from rama_tpu.runtime.engine import Engine, Request  # noqa: E402
from rama_tpu.testing.ref_model import random_params, tiny_config  # noqa: E402
from rama_tpu.tokenizer import Tokenizer  # noqa: E402


def make_tokenizer(vocab_size):
    vocab = ["<unk>", "<s>", "</s>"] + [
        chr(ord("a") + i % 26) + ("" if i < 26 else str(i // 26))
        for i in range(vocab_size - 3)]
    return Tokenizer(vocab, [0.0] * vocab_size, max_token_length=4)


def main():
    mode = sys.argv[3] if len(sys.argv) > 3 else "dense"
    paged = mode == "paged"
    cfg = tiny_config(seq_len=64)
    np_params = random_params(cfg, seed=31)
    params = load_params(cfg, np_params, dtype=jnp.float32)
    tok = make_tokenizer(cfg.vocab_size)
    draft = None
    if mode == "draft":
        # draft-model speculation + chunked prefill: exercises the follower's
        # draft replay hooks (_OP_PREFILL draft insert + _OP_PFCHUNK token
        # re-assembly + _OP_PFDONE draft prefill). Both processes build the
        # identical draft pytree from the seed.
        dcfg = tiny_config(dim=32, hidden_dim=96, n_layers=2, n_heads=2,
                           n_kv_heads=2, seq_len=64)
        draft = (dcfg, load_params(dcfg, random_params(dcfg, seed=77),
                                   dtype=jnp.float32))
        ecfg = EngineConfig(max_batch_size=2, tp_size=2, spec_tick=3,
                            spec_mode="draft", prefill_chunk=16,
                            prefill_chunk_min=16)
    else:
        ecfg = EngineConfig(max_batch_size=2, tp_size=2, paged_kv=paged,
                            kv_page_size=16)
    eng = Engine(cfg, params, tok, ecfg, draft=draft)
    assert eng.multihost, "expected a 2-process run"

    if pid != 0:
        eng.follow()
        return

    eng.start()
    prompt0 = "abcdefghij" * 4 if mode == "draft" else "abc"
    reqs = [Request(prompt=prompt0, steps=8, temperature=0.0),
            Request(prompt="zq", steps=5, temperature=0.0)]
    for r in reqs:
        eng.submit(r)
    outs = []
    for r in reqs:
        toks = []
        while True:
            t = r.queue.get(timeout=120)
            if t is None:
                break
            toks.append(t)
        assert r.error is None, r.error
        outs.append(toks)
    eng.stop()
    print("RESULT " + json.dumps(outs), flush=True)


main()
