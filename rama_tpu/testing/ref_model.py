"""Plain-numpy fp32 Llama forward: the correctness oracle for tests.

One token at a time against a dense KV cache — the same computation the
reference performs per step (engine/src/transformer/infer.rs:8-53), with two
deliberate fixes documented in SURVEY.md ("quirks to knowingly NOT replicate"):
real GQA (the reference sizes its cache for GQA but strides it densely,
ram.rs:8 vs infer.rs:31-33) and no duplicated wq matmul (infer.rs:20-21).
"""

from __future__ import annotations

import numpy as np

from rama_tpu.checkpoint import compute_freqs
from rama_tpu.config import ModelConfig


def rmsnorm(x: np.ndarray, w: np.ndarray, eps: float = 1e-5) -> np.ndarray:
    v = 1.0 / np.sqrt(np.mean(x * x) + eps)
    return w * (v * x)


def softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max())
    return e / e.sum()


def apply_rope_interleaved(x: np.ndarray, cos: np.ndarray, sin: np.ndarray) -> np.ndarray:
    """Rotate interleaved (even, odd) pairs — llama2.c convention (cpu.rs:87-96)."""
    out = x.copy()
    xr, xi = x[..., 0::2], x[..., 1::2]
    out[..., 0::2] = xr * cos - xi * sin
    out[..., 1::2] = xr * sin + xi * cos
    return out


class RefModel:
    """Stateful fp32 decoder: call step(token, pos) for pos = 0, 1, 2, ..."""

    def __init__(self, cfg: ModelConfig, params: dict):
        self.cfg = cfg
        self.p = {k: np.asarray(v, dtype=np.float32) for k, v in params.items()}
        self.cos, self.sin = compute_freqs(cfg)
        L, S = cfg.n_layers, cfg.seq_len
        self.k_cache = np.zeros((L, S, cfg.n_kv_heads, cfg.head_dim), np.float32)
        self.v_cache = np.zeros((L, S, cfg.n_kv_heads, cfg.head_dim), np.float32)

    def step(self, token: int, pos: int) -> np.ndarray:
        cfg, p = self.cfg, self.p
        hd, nh, nkv = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
        x = p["tok_embedding"][token].copy()
        cos, sin = self.cos[pos], self.sin[pos]

        for l in range(cfg.n_layers):
            xb = rmsnorm(x, p["attn_norm"][l], cfg.norm_eps)
            q = (xb @ p["wq"][l]).reshape(nh, hd)
            k = (xb @ p["wk"][l]).reshape(nkv, hd)
            v = (xb @ p["wv"][l]).reshape(nkv, hd)
            q = apply_rope_interleaved(q, cos, sin)
            k = apply_rope_interleaved(k, cos, sin)
            self.k_cache[l, pos] = k
            self.v_cache[l, pos] = v

            out = np.zeros((nh, hd), np.float32)
            for h in range(nh):
                kvh = h // cfg.n_rep  # GQA: query head h reads KV head h//n_rep
                keys = self.k_cache[l, : pos + 1, kvh]      # (t, hd)
                vals = self.v_cache[l, : pos + 1, kvh]
                att = softmax(keys @ q[h] / np.sqrt(hd))
                out[h] = att @ vals
            x = x + out.reshape(-1) @ p["wo"][l]

            xb = rmsnorm(x, p["ffn_norm"][l], cfg.norm_eps)
            h1 = xb @ p["w1"][l]
            h3 = xb @ p["w3"][l]
            h1 = h1 / (1.0 + np.exp(-h1))  # SiLU (cpu.rs:56-58)
            x = x + (h1 * h3) @ p["w2"][l]

        x = rmsnorm(x, p["final_norm"], cfg.norm_eps)
        return x @ p["wcls"]


def random_params(cfg: ModelConfig, seed: int = 0, scale: float = 0.02) -> dict:
    """Random canonical-layout fp32 params for tests and synthetic benches."""
    rng = np.random.default_rng(seed)
    D, H, L, V = cfg.dim, cfg.hidden_dim, cfg.n_layers, cfg.vocab_size
    KV, QD = cfg.kv_dim, cfg.n_heads * cfg.head_dim

    def w(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    params = {
        "tok_embedding": w(V, D),
        "attn_norm": np.ones((L, D), np.float32) + w(L, D),
        "wq": w(L, D, QD),
        "wk": w(L, D, KV),
        "wv": w(L, D, KV),
        "wo": w(L, QD, D),
        "ffn_norm": np.ones((L, D), np.float32) + w(L, D),
        "w1": w(L, D, H),
        "w2": w(L, H, D),
        "w3": w(L, D, H),
        "final_norm": np.ones(D, np.float32) + w(D),
    }
    if cfg.shared_classifier:
        params["wcls"] = np.ascontiguousarray(params["tok_embedding"].T)
    else:
        params["wcls"] = w(D, V)
    return params


def tiny_config(**kw) -> ModelConfig:
    base = dict(
        dim=64, hidden_dim=176, n_layers=3, n_heads=4, n_kv_heads=2,
        vocab_size=128, seq_len=48, shared_classifier=True,
    )
    base.update(kw)
    return ModelConfig(**base)
