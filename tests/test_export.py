"""External checkpoint ingestion: HF and llama2.c .pt conversions.

The HF test is the framework's strongest oracle: a randomly initialized
transformers LlamaForCausalLM is converted to canonical params and the JAX
forward pass must reproduce transformers' logits — covering the rotary
permute_reverse, GQA mapping, norm/FFN conventions end to end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from rama_tpu.export import hf_to_params, llama2c_pt_to_params, permute_reverse
from rama_tpu.models.llama import KVCache, load_params, prefill


def make_hf_model(n_kv_heads=2, tie=False):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=n_kv_heads,
        vocab_size=96, max_position_embeddings=48, rms_norm_eps=1e-5,
        tie_word_embeddings=tie)
    model = LlamaForCausalLM(cfg)
    model.eval()
    return model


@pytest.mark.parametrize("n_kv_heads", [4, 2])
def test_hf_logits_match(n_kv_heads):
    model = make_hf_model(n_kv_heads=n_kv_heads)
    cfg, params = hf_to_params(model)
    assert cfg.n_kv_heads == n_kv_heads

    tokens = np.array([[5, 11, 42, 7, 90, 3]], dtype=np.int64)
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()[0]

    p = load_params(cfg, params, dtype=jnp.float32)
    cache = KVCache.create(cfg, batch=1, dtype=jnp.float32)
    got, _ = prefill(p, cfg, jnp.asarray(tokens, jnp.int32), cache)
    np.testing.assert_allclose(np.asarray(got[0]), want, rtol=1e-3, atol=1e-3)


def test_hf_tied_embeddings():
    model = make_hf_model(tie=True)
    cfg, params = hf_to_params(model)
    assert cfg.shared_classifier
    np.testing.assert_allclose(params["wcls"], params["tok_embedding"].T)


@pytest.mark.parametrize("tie", [False, True])
def test_hf_reexport_roundtrip(tmp_path, tie):
    """HF -> canonical -> params_to_hf -> transformers: the re-exported
    checkpoint must produce logits identical to the original model
    (round-trips the forward/reverse rotary permutation, GQA mapping, and
    tied lm_head through a real from_pretrained load)."""
    from transformers import AutoModelForCausalLM

    from rama_tpu.export import params_to_hf

    model = make_hf_model(n_kv_heads=2, tie=tie)
    cfg, params = hf_to_params(model)
    out = tmp_path / "hf_out"
    params_to_hf(cfg, params, out)
    model2 = AutoModelForCausalLM.from_pretrained(out)
    assert model2.config.tie_word_embeddings == tie
    assert model2.config.num_key_value_heads == 2

    tokens = torch.tensor([[5, 11, 42, 7, 90, 3]])
    with torch.no_grad():
        want = model(tokens).logits.numpy()
        got = model2(tokens).logits.numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # and the state dict round-trips through hf_to_params exactly
    cfg2, params2 = hf_to_params(model2)
    assert cfg2 == cfg
    for k in params:
        np.testing.assert_allclose(params2[k], params[k], atol=1e-6, err_msg=k)


def test_permute_reverse_roundtrip():
    rng = np.random.default_rng(0)
    n_heads, hd, d = 4, 16, 64
    w = rng.standard_normal((n_heads * hd, d)).astype(np.float32)
    # forward permute (llama2.c -> HF) is the inverse reshape
    fwd = (w.reshape(n_heads, hd // 2, 2, d).transpose(0, 2, 1, 3)
           .reshape(n_heads * hd, d))
    np.testing.assert_allclose(permute_reverse(fwd, n_heads, hd), w)


def test_llama2c_pt_roundtrip(tmp_path):
    """Synthesize a llama2.c-style .pt and convert it."""
    from rama_tpu.testing.ref_model import random_params, tiny_config

    cfg = tiny_config(n_kv_heads=4)  # llama2.c state dicts are MHA-shaped here
    params = random_params(cfg, seed=5)

    sd = {
        "tok_embeddings.weight": torch.from_numpy(params["tok_embedding"].copy()),
        "norm.weight": torch.from_numpy(params["final_norm"].copy()),
        "output.weight": torch.from_numpy(params["tok_embedding"].copy()),
    }
    names = {"attn_norm": "attention_norm.weight", "wq": "attention.wq.weight",
             "wk": "attention.wk.weight", "wv": "attention.wv.weight",
             "wo": "attention.wo.weight", "ffn_norm": "ffn_norm.weight",
             "w1": "feed_forward.w1.weight", "w2": "feed_forward.w2.weight",
             "w3": "feed_forward.w3.weight"}
    for i in range(cfg.n_layers):
        for cname, sname in names.items():
            w = params[cname][i]
            if w.ndim == 2:
                w = w.T  # canonical (in,out) -> state-dict (out,in)
            sd[f"layers.{i}.{sname}"] = torch.from_numpy(np.ascontiguousarray(w))
    ckpt = {
        "model_args": dict(dim=cfg.dim, n_layers=cfg.n_layers, n_heads=cfg.n_heads,
                           n_kv_heads=cfg.n_kv_heads, vocab_size=cfg.vocab_size,
                           max_seq_len=cfg.seq_len, norm_eps=1e-5),
        # torch.compile prefix handling (export.py:362-366)
        "model": {("_orig_mod." + k): v for k, v in sd.items()},
    }
    path = tmp_path / "ck.pt"
    torch.save(ckpt, path)

    cfg2, params2 = llama2c_pt_to_params(path)
    assert cfg2.dim == cfg.dim and cfg2.shared_classifier
    for k in ("tok_embedding", "wq", "w2", "final_norm"):
        np.testing.assert_allclose(params2[k], params[k], atol=1e-6, err_msg=k)
