"""Perplexity evaluation harness.

Backs the quantization quality gates (BASELINE.md: wikitext-2 ppl within 1%
of fp32 at INT8 and 3% at INT4). The reference has no evaluation tooling at
all — its quality check is eyeballing pinned sample generations
(README.md:24-31). This harness scores any text file; point it at
wikitext-2's test split to reproduce the standard number.

Method: the text is tokenized once ([BOS] + ids), split into non-overlapping
windows of `window` tokens, and scored teacher-forced in batched prefill
passes; perplexity = exp(total NLL / predicted tokens).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rama_tpu.config import ModelConfig
from rama_tpu.models.llama import KVCache, prefill
from rama_tpu.tokenizer import BOS_ID, Tokenizer


@partial(jax.jit, static_argnames=("cfg",))
def _score(params, cfg: ModelConfig, inputs, targets, mask):
    """Sum of log p(target) over masked positions. inputs/targets: (B, T)."""
    cache = KVCache.create(cfg, batch=inputs.shape[0], max_len=inputs.shape[1])
    logits, _ = prefill(params, cfg, inputs, cache)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(tgt * mask), jnp.sum(mask)


def perplexity(params, cfg: ModelConfig, tokenizer: Tokenizer, text: str,
               window: int | None = None, batch: int = 4,
               max_tokens: int | None = None) -> dict:
    ids = [BOS_ID] + tokenizer.encode(text, strict=False)
    if max_tokens:
        ids = ids[: max_tokens + 1]
    t = min(window or 512, cfg.seq_len)
    n_pred = len(ids) - 1
    if n_pred < 1:
        raise ValueError("text too short to score")

    inputs = np.asarray(ids[:-1], np.int32)
    targets = np.asarray(ids[1:], np.int32)
    n_windows = -(-n_pred // t)
    pad = n_windows * t - n_pred
    inputs = np.pad(inputs, (0, pad)).reshape(n_windows, t)
    targets = np.pad(targets, (0, pad)).reshape(n_windows, t)
    mask = np.pad(np.ones(n_pred, np.float32), (0, pad)).reshape(n_windows, t)

    # pad the window count to a multiple of the batch so one compiled shape
    # serves the whole run
    wpad = (-n_windows) % batch
    if wpad:
        z = lambda a: np.pad(a, ((0, wpad), (0, 0)))
        inputs, targets, mask = z(inputs), z(targets), z(mask)

    total_lp, total_n = 0.0, 0.0
    for i in range(0, inputs.shape[0], batch):
        lp, n = _score(params, cfg, jnp.asarray(inputs[i : i + batch]),
                       jnp.asarray(targets[i : i + batch]),
                       jnp.asarray(mask[i : i + batch]))
        total_lp += float(lp)
        total_n += float(n)

    nll = -total_lp / total_n
    return {"perplexity": float(np.exp(nll)), "nll": nll,
            "tokens": int(total_n), "windows": n_windows}
