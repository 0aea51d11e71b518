"""C++ runtime components vs their pure-Python references."""

import numpy as np
import pytest

from rama_tpu import native
from rama_tpu.tokenizer import Tokenizer

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built (make -C native)")

VOCAB_SIZE = 32000


@pytest.fixture(scope="module")
def tokenizers(tokenizer_bin):
    py = Tokenizer.from_file(tokenizer_bin, VOCAB_SIZE, use_native=False)
    nat = native.NativeTokenizer(tokenizer_bin, VOCAB_SIZE)
    return py, nat


PROMPTS = [
    "once upon a time",
    "the quick brown fox jumps over the lazy dog",
    "hello world",
    "a",
    "  leading and trailing  ",
    "multi\nline\ninput",
    "punctuation, numbers 12345 and CAPS!",
    "repeated repeated repeated repeated words words words",
]


def test_native_encode_matches_python(tokenizers):
    py, nat = tokenizers
    for p in PROMPTS:
        assert nat.encode(p) == py.encode(p), p


def test_native_encode_long_text(tokenizers):
    py, nat = tokenizers
    text = ("in a village of la mancha the name of which i have no desire to "
            "call to mind there lived not long since one of those gentlemen ") * 20
    assert nat.encode(text) == py.encode(text)


def test_native_oov(tokenizers):
    _, nat = tokenizers
    with pytest.raises(KeyError):
        nat.encode("\x07", strict=True)
    assert nat.encode("he\x07llo", strict=False) == nat.encode("hello")


def test_native_empty(tokenizers):
    _, nat = tokenizers
    assert nat.encode("") == []
    assert nat.encode("   ") == []


def test_transpose_f32(rng):
    a = rng.standard_normal((3, 37, 129)).astype(np.float32)
    got = native.transpose_batched(a)
    np.testing.assert_array_equal(got, a.transpose(0, 2, 1))


def test_transpose_i8(rng):
    a = rng.integers(-128, 127, (2, 257, 65)).astype(np.int8)
    got = native.transpose_batched(a)
    np.testing.assert_array_equal(got, a.transpose(0, 2, 1))
    b = rng.integers(-128, 127, (64, 48)).astype(np.int8)
    np.testing.assert_array_equal(native.transpose_batched(b), b.T)


def test_page_allocator():
    pa = native.PageAllocator(num_pages=10, page_size=16, max_slots=4)
    assert pa.available() == 10
    assert pa.reserve(0, 40) == 3      # ceil(40/16)
    assert pa.available() == 7
    assert pa.reserve(0, 45) == 3      # still 3 pages
    assert pa.reserve(0, 49) == 4      # grow by one
    assert pa.reserve(1, 100) == -1 if pa.available() < 7 else True
    t = pa.table(0)
    assert len(t) == 4 and len(set(t)) == 4
    pa.release(0)
    assert pa.available() == 10
    assert pa.table(0) == []


def test_page_allocator_exhaustion():
    pa = native.PageAllocator(num_pages=4, page_size=8, max_slots=2)
    assert pa.reserve(0, 32) == 4
    assert pa.reserve(1, 8) == -1      # out of pages, nothing allocated
    assert pa.table(1) == []
    pa.release(0)
    assert pa.reserve(1, 8) == 1
