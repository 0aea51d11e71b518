"""Create random-weight .bin checkpoints for testing and benchmarking.

No stories*.bin artifacts ship with this environment, so synthetic models at
the published shapes stand in: perf characteristics match (same tensor sizes),
text output is gibberish.

    python tools/make_test_model.py stories15M /tmp/stories15M.bin --version 0
"""

from __future__ import annotations

import argparse

from rama_tpu.config import ModelConfig
from rama_tpu.checkpoint import save_v0, save_v1, save_v2
from rama_tpu.testing.ref_model import random_params

# Published llama2.c model shapes (vocab 32000, from the llama2.c family).
SHAPES = {
    "tiny": dict(dim=64, hidden_dim=176, n_layers=3, n_heads=4, n_kv_heads=2,
                 vocab_size=128, seq_len=48),
    "stories15M": dict(dim=288, hidden_dim=768, n_layers=6, n_heads=6,
                       n_kv_heads=6, vocab_size=32000, seq_len=256),
    "stories110M": dict(dim=768, hidden_dim=2048, n_layers=12, n_heads=12,
                        n_kv_heads=12, vocab_size=32000, seq_len=1024),
    "tinyllama-1.1b": dict(dim=2048, hidden_dim=5632, n_layers=22, n_heads=32,
                           n_kv_heads=4, vocab_size=32000, seq_len=2048),
    "llama2-7b": dict(dim=4096, hidden_dim=11008, n_layers=32, n_heads=32,
                      n_kv_heads=32, vocab_size=32000, seq_len=2048),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("shape", choices=sorted(SHAPES))
    ap.add_argument("output")
    ap.add_argument("--version", type=int, default=0, choices=[0, 1, 2])
    ap.add_argument("--group-size", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seq-len", type=int, default=None)
    args = ap.parse_args()

    kw = dict(SHAPES[args.shape])
    if args.seq_len:
        kw["seq_len"] = args.seq_len
    cfg = ModelConfig(**kw)
    params = random_params(cfg, seed=args.seed)
    if args.version == 0:
        save_v0(args.output, cfg, params)
    elif args.version == 1:
        save_v1(args.output, cfg, params)
    else:
        save_v2(args.output, cfg, params, group_size=args.group_size)
    print(f"wrote {args.output} ({cfg})")


if __name__ == "__main__":
    main()
