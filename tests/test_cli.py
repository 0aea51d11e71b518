"""CLI (L6): generate / export / eval subcommands end-to-end on tiny models.

The reference CLI surface is engine/src/main.rs:21-53 (short flags -m/-t/-p/
-s/-r/-l, tok/s line) and export/export.py's version dispatch; here the whole
argv -> stdout path runs in-process on CPU. Numerics are oracle-tested
elsewhere (test_engine.py, test_quant_model.py); this module pins the wiring:
flags parse, checkpoints load, streams are deterministic, export round-trips,
eval emits a finite perplexity.
"""

import json
import struct

import numpy as np
import pytest

from rama_tpu.checkpoint import (load_checkpoint_quantized, load_config,
                                 save_v0)
from rama_tpu.cli import main
from rama_tpu.testing.ref_model import random_params, tiny_config


def write_tokenizer_bin(path, vocab_size):
    """llama2.c tokenizer.bin layout (u32 max_len, then f32 score + i32 len +
    utf-8 bytes per token): specials, a-z single chars, filler tail."""
    vocab = ["<unk>", "<s>", "</s>"]
    vocab += [chr(ord("a") + i) for i in range(26)]
    vocab += [f"t{i}" for i in range(vocab_size - len(vocab))]
    with open(path, "wb") as f:
        f.write(struct.pack("<I", max(len(v.encode()) for v in vocab)))
        for v in vocab:
            b = v.encode()
            f.write(struct.pack("<fi", 0.0, len(b)))
            f.write(b)
    return path


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    cfg = tiny_config(seq_len=64)
    np_params = random_params(cfg, seed=9)
    model = str(d / "tiny_v0.bin")
    save_v0(model, cfg, np_params)
    tok = write_tokenizer_bin(str(d / "tok.bin"), cfg.vocab_size)
    return d, cfg, model, tok


def run_cli(argv, capsys):
    rc = main(argv)
    out = capsys.readouterr().out
    return rc, out


def test_generate_streams_and_is_seed_deterministic(artifacts, capsys):
    d, cfg, model, tok = artifacts
    argv = ["generate", "-m", model, "-t", tok, "-p", "abc", "-s", "8",
            "-r", "0.0", "--quant", "none", "--dtype", "float32",
            "--platform", "cpu"]
    rc, out1 = run_cli(argv, capsys)
    assert rc == 0
    assert out1.strip().startswith("abc")  # echoes the prompt like run.c
    assert len(out1.strip()) > len("abc")  # and generated past it
    rc, out2 = run_cli(argv, capsys)
    assert rc == 0
    assert out2 == out1  # greedy + fixed seed -> byte-identical stream


def test_generate_int8_quant_flag(artifacts, capsys):
    _, cfg, model, tok = artifacts
    rc, out = run_cli(["generate", "-m", model, "-t", tok, "-p", "ab",
                       "-s", "4", "-r", "0.0", "--quant", "int8",
                       "--dtype", "float32", "--platform", "cpu"], capsys)
    assert rc == 0 and out.strip().startswith("ab")


def test_export_v0_to_v2_roundtrip(artifacts, capsys):
    d, cfg, model, tok = artifacts
    v2 = str(d / "tiny_v2.bin")
    rc, _ = run_cli(["export", model, v2, "--version", "2"], capsys)
    assert rc == 0
    qp = load_checkpoint_quantized(v2)
    assert qp.config.dim == cfg.dim
    assert qp.config.n_layers == cfg.n_layers
    assert qp.config.vocab_size == cfg.vocab_size
    # the quantized checkpoint generates through the same CLI path
    rc, out = run_cli(["generate", "-m", v2, "-t", tok, "-p", "abc",
                       "-s", "4", "-r", "0.0", "--platform", "cpu"], capsys)
    assert rc == 0 and out.strip().startswith("abc")


def test_export_v0_to_v1_header(artifacts, capsys):
    d, cfg, model, tok = artifacts
    v1 = str(d / "tiny_v1.bin")
    rc, _ = run_cli(["export", model, v1, "--version", "1"], capsys)
    assert rc == 0
    assert load_config(v1).dim == cfg.dim


def test_eval_emits_finite_perplexity(artifacts, capsys):
    d, cfg, model, tok = artifacts
    txt = d / "eval.txt"
    txt.write_text("abcd efgh ijkl mnop qrst uvwx yz " * 8)
    rc, out = run_cli(["eval", "-m", model, "-t", tok, "--text", str(txt),
                       "--window", "16", "--batch", "2", "--dtype", "float32",
                       "--platform", "cpu"], capsys)
    assert rc == 0
    result = json.loads(out.strip().splitlines()[-1])
    assert np.isfinite(result["perplexity"]) and result["perplexity"] > 0
    assert result["tokens"] > 0


def test_generate_scale_dtype_bf16(artifacts, capsys):
    """--scale-dtype bf16 loads, casts, and streams deterministically (the
    CLI plumbing for ops.quant.cast_scales)."""
    d, cfg, model, tok = artifacts
    argv = ["generate", "-m", model, "-t", tok, "-p", "abc", "-s", "6",
            "-r", "0.0", "--quant", "int8", "--scale-dtype", "bf16",
            "--dtype", "float32", "--platform", "cpu"]
    rc1, out1 = run_cli(argv, capsys)
    rc2, out2 = run_cli(argv, capsys)
    assert rc1 == 0 and rc2 == 0
    assert out1 == out2
    assert "tok/s" not in out1  # the rate line goes to stderr, not stdout
