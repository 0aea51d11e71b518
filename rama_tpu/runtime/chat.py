"""Interactive chat: the `-o chat` mode the reference plumbs but never
implements (engine/src/main.rs:46-49 parses the flag; no chat loop exists).

Follows the llama2.c `run.c` chat convention for llama-2-chat models:
each user turn is wrapped in `[INST] ... [/INST]` (the first turn may carry
a `<<SYS>> ... <</SYS>>` system prompt), the assistant reply runs until EOS,
and the whole conversation shares one KV cache — each turn's template chunk
is prefilled mid-sequence at the running position, so history is never
re-processed.

Prefill chunks are padded to power-of-two buckets (bounded compile count,
like the engine's bucketed prefill): pad queries write to the last row of
the padded window, which decode rewrites before any query can attend it
(write-before-attend, same argument as runtime/engine._prefill).
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from rama_tpu.config import ModelConfig
from rama_tpu.models.llama import KVCache, decode_step, forward
from rama_tpu.runtime.sampler import sample_greedy, sample_top_p
from rama_tpu.tokenizer import BOS_ID, EOS_ID, Tokenizer


class ChatContextFull(Exception):
    """The conversation no longer fits in the model's context window."""


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class ChatSession:
    """One conversation: a KV cache plus a running position.

    turn(user_text) streams the assistant reply as decoded text pieces.
    """

    def __init__(self, params, cfg: ModelConfig, tokenizer: Tokenizer,
                 temperature: float = 1.0, top_p: float = 0.9,
                 seed: int = 100, system: str | None = None,
                 cache_dtype=jnp.bfloat16):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.temperature = temperature
        self.top_p = top_p
        self.system = system
        self.cache = KVCache.create(cfg, batch=1, dtype=cache_dtype)
        self.pos = 0          # next cache row to write
        self.turns = 0
        self.key = jax.random.PRNGKey(seed)

    def _template(self, user_text: str) -> list[int]:
        if self.turns == 0 and self.system:
            prompt = (f"[INST] <<SYS>> {self.system} <</SYS>> "
                      f"{user_text} [/INST]")
        else:
            prompt = f"[INST] {user_text} [/INST]"
        ids = self.tokenizer.encode(prompt, strict=False)
        # BOS opens every user turn (run.c chat loop convention)
        return [BOS_ID] + ids

    def _prefill_chunk(self, ids: list[int]):
        """Forward `ids` at positions pos..pos+len-1; returns last logits."""
        true = len(ids)
        t_pad = _bucket(true)
        padded = np.zeros(t_pad, np.int32)
        padded[:true] = ids
        idx = jnp.arange(t_pad)
        pos_index = jnp.where(idx < true, self.pos + idx,
                              self.pos + true - 1)[None, :]
        logits, self.cache = forward(self.params, self.cfg,
                                     jnp.asarray(padded)[None, :],
                                     pos_index, self.cache)
        self.pos += true
        return logits[0, true - 1]

    def _sample(self, logits) -> int:
        if self.temperature == 0.0:
            return int(sample_greedy(logits[None])[0])
        self.key, sub = jax.random.split(self.key)
        return int(sample_top_p(logits[None], sub, self.temperature,
                                self.top_p)[0])

    def turn(self, user_text: str, max_new: int = 256) -> Iterator[str]:
        """Run one user turn; yields decoded assistant text pieces."""
        ids = self._template(user_text)
        if self.pos + len(ids) + 2 > self.cfg.seq_len:
            raise ChatContextFull(
                f"conversation ({self.pos} tokens) + turn ({len(ids)}) "
                f"exceeds context {self.cfg.seq_len}")
        last = self._prefill_chunk(ids)
        tok = self._sample(last)
        self.turns += 1
        emitted = 0
        while tok != EOS_ID and emitted < max_new and self.pos < self.cfg.seq_len - 1:
            yield self.tokenizer.decode_token(tok)
            logits, self.cache = decode_step(
                self.params, self.cfg, jnp.asarray([tok], jnp.int32),
                jnp.asarray([self.pos], jnp.int32), self.cache)
            self.pos += 1
            tok = self._sample(logits[0])
            emitted += 1


def chat_repl(params, cfg: ModelConfig, tokenizer: Tokenizer,
              temperature: float = 1.0, top_p: float = 0.9, seed: int = 100,
              system: str | None = None, max_new: int = 256,
              cache_dtype=jnp.bfloat16, input_fn=input, out=None) -> int:
    """Interactive chat loop (the CLI `-o chat` entry). Reads user lines,
    streams assistant replies. Returns exit code."""
    import sys

    out = out or sys.stdout
    session = ChatSession(params, cfg, tokenizer, temperature, top_p, seed,
                          system, cache_dtype)
    while True:
        try:
            user = input_fn("User: ")
        except (EOFError, KeyboardInterrupt):
            print(file=out)
            return 0
        if user.strip() in ("", "exit", "quit"):
            return 0
        print("Assistant: ", end="", file=out, flush=True)
        try:
            for piece in session.turn(user, max_new=max_new):
                print(piece, end="", file=out, flush=True)
        except ChatContextFull as e:
            print(f"\n[context full: {e}]", file=out)
            return 0
        print(file=out, flush=True)
