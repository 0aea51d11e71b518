"""Engine CLI — the reference's `engine` binary (engine/src/main.rs:20-105).

    python -m rama_tpu.cli generate -m model.bin -t tokenizer.bin \
        -p "once upon a time" -s 200 -r 0.9 --temperature 1.0

Loads a v0/v1/v2 .bin checkpoint, runs generation, prints the text and a
tok/s line computed the reference way: (steps - 1) / elapsed
(engine/src/main.rs:100-103).
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="rama-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="run timed generation")
    # flag names follow the reference CLI (engine/src/main.rs:20-50)
    g.add_argument("-m", "--model", required=True, help="path to .bin checkpoint")
    g.add_argument("-t", "--tokenizer", required=True, help="path to tokenizer.bin")
    g.add_argument("-p", "--prompt", default="", help="prompt text")
    g.add_argument("-s", "--step", type=int, default=255, help="max steps")
    # short flags match the reference exactly: -r temperature, -l topp, -o
    # mode (engine/src/main.rs:39-49; mode is plumbed-but-unused there too)
    g.add_argument("-r", "--temperature", type=float, default=1.0)
    g.add_argument("-l", "--topp", type=float, default=0.9, help="nucleus top-p")
    g.add_argument("-o", "--mode", default="generate", choices=["generate", "chat"])
    g.add_argument("--seed", type=int, default=100)
    g.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    g.add_argument("--quant", default="auto",
                   choices=["auto", "none", "int8", "int4"],
                   help="weight-only quantization: 'auto' keeps v2 files "
                        "quantized and loads v0/v1 dense; int8/int4 quantize "
                        "any input at load")
    g.add_argument("--scale-dtype", default=None, choices=["bf16"],
                   help="store weight-quant scales in bf16 (~8-14%% less "
                        "weight HBM traffic for <=2^-9 scale rounding)")
    g.add_argument("--parity", action="store_true",
                   help="token-at-a-time loop (reference semantics) instead of "
                        "the prefill+decode fast path")
    g.add_argument("--platform", default="auto", choices=["auto", "cpu", "tpu"],
                   help="pin the jax backend (the host env may default to TPU)")
    g.add_argument("--warmup", action="store_true",
                   help="run the generation once untimed first, so the timed "
                        "run excludes jit compilation (the reference's CUDA "
                        "kernels NVRTC-compile at startup, outside its timer)")
    g.add_argument("--spec", default="off", choices=["off", "ngram", "draft"],
                   help="speculative decoding: 'ngram' drafts by prompt "
                        "lookup, 'draft' uses a small draft model "
                        "(--draft-model); output is identical to sequential "
                        "decoding, only faster")
    g.add_argument("--spec-k", type=int, default=8,
                   help="speculation chunk size (1 current + k-1 drafted)")
    g.add_argument("--draft-model", default=None,
                   help=".bin checkpoint for --spec draft")

    e = sub.add_parser("export", help="convert checkpoints between formats")
    e.add_argument("input", help=".bin file, HF model path, llama2.c .pt, or "
                                 "Meta consolidated dir")
    e.add_argument("output")
    e.add_argument("--version", type=int, default=2, choices=[-1, 0, 1, 2],
                   help="-1 writes a HuggingFace checkpoint directory "
                        "(reference export.py:508 convention)")
    e.add_argument("--group-size", type=int, default=64)
    e.add_argument("--source", default="auto",
                   choices=["auto", "bin", "hf", "llama2c", "meta"],
                   help="input format (auto sniffs: .bin header magic/shape, "
                        ".pt -> llama2c, dir with params.json -> meta, "
                        "dir with config.json -> hf)")

    v = sub.add_parser("eval", help="perplexity over a text file (e.g. "
                                    "wikitext-2 test split for the INT8/INT4 "
                                    "quality gates)")
    v.add_argument("-m", "--model", required=True)
    v.add_argument("-t", "--tokenizer", required=True)
    v.add_argument("--text", required=True, help="path to plain-text file")
    v.add_argument("--quant", default="auto",
                   choices=["auto", "none", "int8", "int4"])
    v.add_argument("--dtype", default="float32", choices=["bfloat16", "float32"])
    v.add_argument("--scale-dtype", default=None, choices=["bf16"],
                   help="store weight-quant scales in bf16 (quantifies the "
                        "serving option's quality delta via perplexity)")
    v.add_argument("--window", type=int, default=512)
    v.add_argument("--batch", type=int, default=4)
    v.add_argument("--max-tokens", type=int, default=None)
    v.add_argument("--platform", default="auto", choices=["auto", "cpu", "tpu"])
    return ap


def cmd_generate(args) -> int:
    from rama_tpu.utils.platform import force_platform

    force_platform(args.platform)
    import jax.numpy as jnp

    from rama_tpu.checkpoint import load_checkpoint
    from rama_tpu.models.llama import load_params
    from rama_tpu.runtime.generate import generate_text
    from rama_tpu.tokenizer import Tokenizer

    from rama_tpu.checkpoint import load_checkpoint_quantized, load_config, peek_version
    from rama_tpu.models.llama import (fuse_params, load_params_quantized,
                                       quantize_params)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    version = peek_version(args.model)
    if args.quant == "auto" and version == 2:
        qp = load_checkpoint_quantized(args.model)
        cfg = qp.config
        params = load_params_quantized(cfg, qp, dtype=dtype)
    elif args.quant in ("int8", "int4"):
        cfg, np_params = load_checkpoint(args.model)
        params = quantize_params(cfg, np_params,
                                 bits=8 if args.quant == "int8" else 4,
                                 dtype=dtype)
    else:
        cfg, np_params = load_checkpoint(args.model)
        params = load_params(cfg, np_params, dtype=dtype)
    params = _maybe_cast_scales(args, fuse_params(params, cfg))
    tokenizer = Tokenizer.from_file(args.tokenizer, cfg.vocab_size)

    if args.mode == "chat":
        # the reference parses -o chat but never implemented the loop
        # (main.rs:46-49); here it's the llama2.c run.c chat convention:
        # -p becomes the system prompt, EOS ends each assistant reply
        from rama_tpu.runtime.chat import chat_repl

        return chat_repl(params, cfg, tokenizer,
                         temperature=args.temperature, top_p=args.topp,
                         seed=args.seed, system=args.prompt or None,
                         max_new=args.step, cache_dtype=dtype)

    stats = None
    if args.spec != "off":
        from rama_tpu.runtime.speculative import generate_text_speculative

        draft = None
        if args.spec == "draft":
            if not args.draft_model:
                print("--spec draft requires --draft-model", file=sys.stderr)
                return 2
            dcfg, dnp = load_checkpoint(args.draft_model)
            draft = (fuse_params(load_params(dcfg, dnp, dtype=dtype), dcfg),
                     dcfg)

        def run():
            return generate_text_speculative(
                params, cfg, tokenizer, args.prompt, steps=args.step,
                temperature=args.temperature, top_p=args.topp,
                seed=args.seed, cache_dtype=dtype, k=args.spec_k,
                draft=draft)
    else:
        def run():
            return generate_text(
                params, cfg, tokenizer, args.prompt, steps=args.step,
                temperature=args.temperature, top_p=args.topp,
                seed=args.seed, cache_dtype=dtype, fast=not args.parity)

    if args.warmup:
        run()

    t0 = time.time()
    out = run()
    elapsed = time.time() - t0
    if args.spec != "off":
        text, ids, stats = out
        print(f"[spec] rounds={stats['rounds']} "
              f"accepted={stats['accepted_drafts']} "
              f"tokens/round={stats['tokens_per_round']:.2f}",
              file=sys.stderr)
    else:
        text, ids = out
    print(text)
    steps = len(ids)
    print(f"\n{steps} tokens in {elapsed:.2f}s: {(steps - 1) / elapsed:.2f} tok/s",
          file=sys.stderr)
    return 0


def _sniff_source(path: str) -> str:
    import os

    if os.path.isdir(path):
        if os.path.exists(os.path.join(path, "params.json")):
            return "meta"
        return "hf"
    if path.endswith((".pt", ".pth")):
        return "llama2c"
    return "bin"


def cmd_export(args) -> int:
    from rama_tpu.checkpoint import load_checkpoint, save_v0, save_v1, save_v2

    source = args.source if args.source != "auto" else _sniff_source(args.input)
    if source == "bin":
        cfg, params = load_checkpoint(args.input)
    elif source == "hf":
        from rama_tpu.export import hf_to_params

        cfg, params = hf_to_params(args.input)
    elif source == "llama2c":
        from rama_tpu.export import llama2c_pt_to_params

        cfg, params = llama2c_pt_to_params(args.input)
    else:
        from rama_tpu.export import meta_to_params

        cfg, params = meta_to_params(args.input)
    if args.version == -1:
        from rama_tpu.export import params_to_hf

        params_to_hf(cfg, params, args.output)
    elif args.version == 0:
        save_v0(args.output, cfg, params)
    elif args.version == 1:
        save_v1(args.output, cfg, params)
    else:
        err = save_v2(args.output, cfg, params, group_size=args.group_size)
        print(f"max quantization group error: {err:.6f}", file=sys.stderr)
    print(f"wrote {args.output}", file=sys.stderr)
    return 0


def _load_model(args):
    """Shared model-loading path for generate/eval (quant + dtype + fusion)."""
    import jax.numpy as jnp

    from rama_tpu.checkpoint import (load_checkpoint, load_checkpoint_quantized,
                                     peek_version)
    from rama_tpu.models.llama import (load_params, load_params_quantized,
                                       quantize_params)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    version = peek_version(args.model)
    if args.quant == "auto" and version == 2:
        qp = load_checkpoint_quantized(args.model)
        return qp.config, load_params_quantized(qp.config, qp, dtype=dtype), dtype
    if args.quant in ("int8", "int4"):
        cfg, np_params = load_checkpoint(args.model)
        return cfg, quantize_params(cfg, np_params,
                                    bits=8 if args.quant == "int8" else 4,
                                    dtype=dtype), dtype
    cfg, np_params = load_checkpoint(args.model)
    return cfg, load_params(cfg, np_params, dtype=dtype), dtype


def _maybe_cast_scales(args, params):
    if getattr(args, "scale_dtype", None):
        import jax.numpy as jnp

        from rama_tpu.ops.quant import cast_scales

        return cast_scales(params, jnp.bfloat16)
    return params


def cmd_eval(args) -> int:
    import json

    from rama_tpu.utils.platform import force_platform

    force_platform(args.platform)
    from rama_tpu.eval import perplexity
    from rama_tpu.models.llama import fuse_params
    from rama_tpu.tokenizer import Tokenizer

    cfg, params, _ = _load_model(args)
    params = _maybe_cast_scales(args, fuse_params(params, cfg))
    tokenizer = Tokenizer.from_file(args.tokenizer, cfg.vocab_size)
    with open(args.text) as f:
        text = f.read()
    result = perplexity(params, cfg, tokenizer, text, window=args.window,
                        batch=args.batch, max_tokens=args.max_tokens)
    print(json.dumps(result))
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cmd == "generate":
        return cmd_generate(args)
    if args.cmd == "export":
        return cmd_export(args)
    if args.cmd == "eval":
        return cmd_eval(args)
    return 1


if __name__ == "__main__":
    sys.exit(main())
