"""Tokenizer parity against the shipped llama2.c tokenizer.bin artifact."""

import pytest

from rama_tpu.tokenizer import BOS_ID, Tokenizer, decode

VOCAB_SIZE = 32000


@pytest.fixture(scope="module")
def tok(tokenizer_bin):
    return Tokenizer.from_file(tokenizer_bin, VOCAB_SIZE)


def test_parse(tok):
    assert len(tok.vocab) == VOCAB_SIZE
    assert tok.max_token_length > 0
    # llama2.c stores BOS as "\n<s>\n"; decode() keys off the <s> substring
    assert "<s>" in tok.vocab[BOS_ID]


def test_byte_token_decode(tok):
    # "<0xAB>" style byte tokens decode to the raw byte (bpe.rs:106-113)
    s = tok.vocab[3]  # id 3 is <0x00> in llama2 vocab
    assert s.startswith("<0x")
    assert decode(s) == chr(int(s[3:5], 16))


def test_bos_decodes_empty(tok):
    assert decode(tok.vocab[BOS_ID]) == ""


def test_encode_merges(tok):
    ids = tok.encode("once upon a time")
    # merging must shrink well below character count
    assert 0 < len(ids) < len("once upon a time")
    # decoding the ids reproduces the trimmed text
    text = "".join(tok.vocab[i] for i in ids)
    assert text.replace("▁", " ").strip() == "once upon a time"


def test_encode_deterministic(tok):
    a = tok.encode("the quick brown fox jumps over the lazy dog")
    b = tok.encode("the quick brown fox jumps over the lazy dog")
    assert a == b


def test_encode_drops_newlines(tok):
    assert tok.encode("once upon\na time") == tok.encode("once upona time")


def test_encode_strict_oov(tok):
    with pytest.raises(KeyError):
        tok.encode("\x07", strict=True)
    assert tok.encode("he\x07llo", strict=False) == tok.encode("hello", strict=False)


def test_roundtrip_decode_ids(tok):
    ids = tok.encode("hello world")
    out = tok.decode_ids(ids)
    assert "hello" in out.replace("▁", " ")
