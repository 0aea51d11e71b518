"""Multi-host serving: a real 2-process jax.distributed engine run.

Spawns two worker processes (tests/_multihost_worker.py) forming a CPU-backend
"pod" (gloo collectives): process 0 fronts the engine, process 1 replays the
broadcast device-call protocol via Engine.follow(). The streams must equal a
single-process tensor-parallel run of the same requests — proving the
host-0-fronted lockstep design (parallel/distributed.py) end to end, not just
the init helper.
"""

import json
import pathlib
import socket
import subprocess
import sys

import jax.numpy as jnp
import pytest

from rama_tpu.config import EngineConfig
from rama_tpu.models.llama import load_params
from rama_tpu.runtime.engine import Engine, Request
from rama_tpu.testing.ref_model import random_params, tiny_config

WORKER = pathlib.Path(__file__).parent / "_multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_reference(mode: str):
    from tests.test_engine import collect, make_tokenizer

    cfg = tiny_config(seq_len=64)
    np_params = random_params(cfg, seed=31)
    params = load_params(cfg, np_params, dtype=jnp.float32)
    tok = make_tokenizer(cfg.vocab_size)
    # the reference for EVERY mode is a PLAIN tp2 engine: speculation and
    # chunked prefill are stream-invariant, so the 2-process draft run must
    # reproduce the plain single-process stream bit for bit
    eng = Engine(cfg, params, tok,
                 EngineConfig(max_batch_size=2, tp_size=2,
                              paged_kv=mode == "paged", kv_page_size=16))
    eng.start()
    try:
        prompt0 = "abcdefghij" * 4 if mode == "draft" else "abc"
        reqs = [Request(prompt=prompt0, steps=8, temperature=0.0),
                Request(prompt="zq", steps=5, temperature=0.0)]
        for r in reqs:
            eng.submit(r)
        return [collect(r) for r in reqs]
    finally:
        eng.stop()


@pytest.mark.parametrize("mode", ["dense", "paged", "draft"])
def test_two_process_engine_matches_single(mode):
    want = _single_process_reference(mode)

    port = _free_port()
    env = {"PATH": "/usr/bin:/bin", "HOME": "/root",
           "PYTHONPATH": str(WORKER.parent.parent)}
    import os

    env.update({k: v for k, v in os.environ.items()
                if k.startswith(("VIRTUAL_ENV", "LD_", "PYTHON"))})
    margs = [] if mode == "dense" else [mode]
    procs = [subprocess.Popen(
        [sys.executable, str(WORKER), str(i), str(port)] + margs,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{outs[i]}"
    result = [l for l in outs[0].splitlines() if l.startswith("RESULT ")]
    assert result, f"no RESULT line:\n{outs[0]}"
    got = json.loads(result[0][len("RESULT "):])
    assert got == want
