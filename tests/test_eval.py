"""Perplexity harness vs a direct numpy teacher-forced computation."""

import jax.numpy as jnp
import numpy as np
import pytest

from rama_tpu.eval import perplexity
from rama_tpu.models.llama import load_params, quantize_params
from rama_tpu.testing.ref_model import RefModel, random_params, tiny_config
from rama_tpu.tokenizer import BOS_ID, Tokenizer


def make_tokenizer(vocab_size):
    vocab = ["<unk>", "<s>", "</s>"] + [chr(ord("a") + i % 26) + ("" if i < 26 else str(i))
                                        for i in range(vocab_size - 3)]
    return Tokenizer(vocab, [0.0] * vocab_size, 4)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(seq_len=48)
    np_params = random_params(cfg, seed=51)
    params = load_params(cfg, np_params, dtype=jnp.float32)
    tok = make_tokenizer(cfg.vocab_size)
    return cfg, np_params, params, tok


def ref_nll(cfg, np_params, ids):
    ref = RefModel(cfg, np_params)
    total, n = 0.0, 0
    for pos in range(len(ids) - 1):
        logits = ref.step(ids[pos], pos)
        logp = logits - (np.log(np.sum(np.exp(logits - logits.max()))) + logits.max())
        total += logp[ids[pos + 1]]
        n += 1
    return -total / n


def test_ppl_matches_reference(setup):
    cfg, np_params, params, tok = setup
    text = "abcab cabca bcabc"
    res = perplexity(params, cfg, tok, text, window=8, batch=2)
    ids = [BOS_ID] + tok.encode(text, strict=False)
    # windows reset the cache, so compare against per-window scoring
    total, n = 0.0, 0
    for s in range(0, len(ids) - 1, 8):
        w = ids[s : s + 9]
        if len(w) < 2:
            break
        ref = RefModel(cfg, np_params)
        for pos in range(len(w) - 1):
            logits = ref.step(w[pos], pos)
            m = logits.max()
            logp = logits - (np.log(np.sum(np.exp(logits - m))) + m)
            total += logp[w[pos + 1]]
            n += 1
    want = float(np.exp(-total / n))
    assert res["tokens"] == n
    np.testing.assert_allclose(res["perplexity"], want, rtol=1e-3)


def test_quantized_ppl_gate():
    """Synthetic quantization-quality gate (BASELINE bands: INT8 within 1%
    of fp32, INT4 within 3%) on a model sharp enough to be *sensitive*: at
    weight scale 0.1 an int4 scale-row mis-indexing moves ppl ~9% (measured),
    so a kernel or packing regression trips the bands. The scale-0.02 fixture
    model is near-uniform and would pass the bands even fully corrupted."""
    from rama_tpu.ops.quant import QuantizedTensor

    cfg = tiny_config(seq_len=48)
    np_params = random_params(cfg, seed=51, scale=0.1)
    params = load_params(cfg, np_params, dtype=jnp.float32)
    tok = make_tokenizer(cfg.vocab_size)
    text = "the quick brown fox jumps over the lazy dog " * 8

    fp = perplexity(params, cfg, tok, text, window=32)["perplexity"]
    q8 = quantize_params(cfg, np_params, bits=8, group_size=16, dtype=jnp.float32)
    p8 = perplexity(q8, cfg, tok, text, window=32)["perplexity"]
    assert abs(p8 - fp) / fp < 0.01, f"int8 ppl {p8} vs fp32 {fp}"

    q4 = quantize_params(cfg, np_params, bits=4, group_size=16, dtype=jnp.float32)
    p4 = perplexity(q4, cfg, tok, text, window=32)["perplexity"]
    assert abs(p4 - fp) / fp < 0.03, f"int4 ppl {p4} vs fp32 {fp}"

    # meta-check: the gate must actually CATCH a packing/scale regression —
    # rolling w2's scale rows by one group simulates scale mis-indexing
    w2 = q4["w2"]
    q4c = dict(q4)
    q4c["w2"] = QuantizedTensor(q=w2.q, scales=jnp.roll(w2.scales, 1, axis=-2),
                                group_size=w2.group_size, bits=w2.bits)
    p4c = perplexity(q4c, cfg, tok, text, window=32)["perplexity"]
    assert abs(p4c - fp) / fp > 0.03, "gate too insensitive to catch corruption"


def test_bf16_scale_ppl_delta_tiny():
    """bf16-stored scales move perplexity by far less than the quantization
    bands themselves: the quality side of EngineConfig.scale_dtype (the
    sensitive scale-0.1 model from the gate above, so the check has teeth)."""
    from rama_tpu.ops.quant import cast_scales

    cfg = tiny_config(seq_len=48)
    np_params = random_params(cfg, seed=51, scale=0.1)
    tok = make_tokenizer(cfg.vocab_size)
    text = "the quick brown fox jumps over the lazy dog " * 8
    for bits, band in ((8, 0.002), (4, 0.005)):
        q = quantize_params(cfg, np_params, bits=bits, group_size=16,
                            dtype=jnp.float32)
        p32 = perplexity(q, cfg, tok, text, window=32)["perplexity"]
        p16 = perplexity(cast_scales(q), cfg, tok, text,
                         window=32)["perplexity"]
        assert abs(p16 - p32) / p32 < band, \
            f"int{bits}: bf16-scale ppl {p16} vs f32-scale {p32}"
