"""Real-weight acceptance tests — gated on artifacts this environment lacks.

The reference's de-facto acceptance test is pinned real-weight generations
(reference README.md:24-31,56-70); its published texts are sampled with its
own per-token-reseeded ChaCha RNG (cpu.rs:161-162), so byte-exact text parity
is not meaningful across samplers. The checkable real-weight claims are
pinned here instead, and SKIP LOUDLY until the artifacts exist:

    tests/fixtures/real/stories15M.bin      (llama2.c v0 checkpoint)
    tests/fixtures/real/wikitext2_test.txt  (wikitext-2 test split, raw text)

(or point RAMA_REAL_DIR at a directory holding them). The moment they are
present, `pytest tests/test_real_weights.py` machine-checks:
- greedy stories15M decoding matches the numpy RefModel oracle token-exactly
  (forward-pass correctness on real weights, not just synthetic ones);
- the BASELINE.md quantization gates on real wikitext-2: INT8 perplexity
  within 1% of fp32, INT4 within 3%.
"""

import os
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

REAL = pathlib.Path(os.environ.get(
    "RAMA_REAL_DIR", str(pathlib.Path(__file__).parent / "fixtures" / "real")))
STORIES = REAL / "stories15M.bin"
WIKI = REAL / "wikitext2_test.txt"
TOKENIZER = pathlib.Path(__file__).parent / "fixtures" / "tokenizer.bin"

needs_stories = pytest.mark.skipif(
    not STORIES.exists(),
    reason=f"real weights absent: place stories15M.bin at {STORIES} "
           "(no network in this environment) to run the real-weight "
           "acceptance gate")
needs_wiki = pytest.mark.skipif(
    not (STORIES.exists() and WIKI.exists()),
    reason=f"real eval artifacts absent: place stories15M.bin and "
           f"wikitext2_test.txt under {REAL} to run the wikitext-2 "
           "quantization-quality gates (BASELINE.md: int8 <=1%, int4 <=3%)")


@pytest.fixture(scope="module")
def stories():
    from rama_tpu.checkpoint import load_checkpoint
    from rama_tpu.tokenizer import Tokenizer

    cfg, np_params = load_checkpoint(str(STORIES))
    tok = Tokenizer.from_file(str(TOKENIZER), cfg.vocab_size)
    return cfg, np_params, tok


@needs_stories
def test_stories15m_greedy_matches_oracle(stories):
    """Greedy decode on REAL stories15M weights, token-exact vs the numpy
    oracle — the real-weight analogue of the reference's pinned sample."""
    from rama_tpu.models.llama import KVCache, fuse_params, load_params
    from rama_tpu.runtime.generate import generate_prefill_decode
    from rama_tpu.testing.ref_model import RefModel
    from rama_tpu.tokenizer import BOS_ID

    import jax

    cfg, np_params, tok = stories
    prompt_ids = tok.encode("once upon a time")
    steps = len(prompt_ids) + 40

    params = fuse_params(load_params(cfg, np_params, dtype=jnp.float32), cfg)
    cache = KVCache.create(cfg, batch=1, max_len=steps, dtype=jnp.float32)
    got = np.asarray(generate_prefill_decode(
        params, cfg, jnp.asarray(prompt_ids, jnp.int32), steps,
        len(prompt_ids), 0.0, 0.9, jax.random.PRNGKey(0), cache)).tolist()

    ref = RefModel(cfg, np_params)
    ids = [BOS_ID] + prompt_ids
    for pos, t in enumerate(ids):
        logits = ref.step(t, pos)
    want = list(prompt_ids)
    pos = len(ids)
    while len(want) < steps:
        nxt = int(np.argmax(logits))
        want.append(nxt)
        logits = ref.step(nxt, pos)
        pos += 1
    assert got == want


@needs_wiki
def test_wikitext2_quant_ppl_gates(stories):
    """BASELINE.md quality gates on real data: quantized wikitext-2
    perplexity within 1% (INT8) / 3% (INT4) of this framework's fp32."""
    from rama_tpu.eval import perplexity
    from rama_tpu.models.llama import load_params, quantize_params

    cfg, np_params, tok = stories
    text = WIKI.read_text()

    fp = perplexity(load_params(cfg, np_params, dtype=jnp.float32), cfg, tok,
                    text, max_tokens=50_000)["perplexity"]
    p8 = perplexity(quantize_params(cfg, np_params, bits=8), cfg, tok,
                    text, max_tokens=50_000)["perplexity"]
    assert abs(p8 - fp) / fp < 0.01, f"int8 ppl {p8} vs fp32 {fp}"
    p4 = perplexity(quantize_params(cfg, np_params, bits=4, group_size=16),
                    cfg, tok, text, max_tokens=50_000)["perplexity"]
    assert abs(p4 - fp) / fp < 0.03, f"int4 ppl {p4} vs fp32 {fp}"
