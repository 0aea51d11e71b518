"""Synthesize a llama2.c-format tokenizer.bin fixture.

Writes a small vocabulary in the exact binary layout the engine parses
(u32 max_token_len, then per-token f32 score + i32 length + utf-8 bytes):
specials (<unk>, <s>, </s>), the 256 <0xAB> byte tokens, printable ASCII
characters, and common English merges with increasing scores.

    python tools/make_test_tokenizer.py /tmp/tok.bin
"""

from __future__ import annotations

import argparse
import struct


def build_vocab():
    vocab: list[tuple[str, float]] = [("<unk>", 0.0), ("\n<s>\n", 0.0), ("\n</s>\n", 0.0)]
    for b in range(256):
        vocab.append((f"<0x{b:02X}>", 0.0))
    chars = [chr(c) for c in range(32, 127)]
    for ch in chars:
        vocab.append((ch, -1e6))  # char fallbacks score low
    merges = ["th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
              "ti", "es", "or", "te", "the", "and", "ing", "ion", "hello",
              "world", "once", "upon", "time", " a", " t", " the", " and"]
    for i, m in enumerate(merges):
        vocab.append((m, float(i + 1)))  # later merges score higher
    return vocab


def write(path: str, vocab):
    max_len = max(len(s.encode()) for s, _ in vocab)
    with open(path, "wb") as f:
        f.write(struct.pack("<I", max_len))
        for s, score in vocab:
            b = s.encode("utf-8")
            f.write(struct.pack("<fi", score, len(b)))
            f.write(b)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output")
    args = ap.parse_args()
    vocab = build_vocab()
    write(args.output, vocab)
    print(f"wrote {args.output}: {len(vocab)} tokens")


if __name__ == "__main__":
    main()
