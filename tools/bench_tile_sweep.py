"""Tile-size sweep for the layered quant matmuls at Llama-2-7B decode shapes.

NEXT.md #3: qkv (4096x12288) measured ~645 GB/s and lm_head (4096x32000)
~440 GB/s vs the fused-FFN kernel's 703 GB/s — both may be leaving bandwidth
on the table to block-shape choices. Sweeps block_k x block_n per shape.

Run:  nohup python tools/bench_tile_sweep.py > /tmp/tsweep.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rama_tpu.ops.pallas.quant_matmul import quant_matmul_layered
from rama_tpu.ops.quant import QuantizedTensor
from tools._ktime import best_device_time, log

L, GS, M = 12, 64, 8


def sweep(name, k, n, bits, grid):
    kdiv = k // (2 if bits == 4 else 1)
    kq, ks = jax.random.split(jax.random.PRNGKey(3))
    q = jax.random.randint(kq, (L, kdiv, n), -127, 127, jnp.int8)
    scales = jax.random.uniform(ks, (L, k // GS, n), jnp.float32) * 0.02 + 0.01
    qt = QuantizedTensor(q=q, scales=scales, group_size=GS, bits=bits)
    byt = (q.size + scales.size * 4) // L
    log(f"== {name} int{bits} ({k}x{n}), {byt / 1e6:.1f} MB/layer ==")

    x0 = jax.random.normal(jax.random.PRNGKey(0), (M, k), jnp.bfloat16)
    for bk, bn in grid:
        @partial(jax.jit, static_argnames=("nn",))
        def run(x0, qt, nn, _bk=bk, _bn=bn):
            def body(x, i):
                y = quant_matmul_layered(x, qt, i % L, block_k=_bk,
                                         block_n=_bn)
                x = y.reshape(M, n // k, k).sum(1).astype(jnp.bfloat16) \
                    if n % k == 0 else \
                    y[:, :k].astype(jnp.bfloat16)
                return x, ()
            x, _ = jax.lax.scan(body, x0, jnp.arange(nn, dtype=jnp.int32))
            return x

        steps = 96
        try:
            np.asarray(run(x0, qt, steps))
        except Exception as e:
            log(f"  bk={bk} bn={bn}: FAILED {type(e).__name__}: {e}")
            continue
        best = best_device_time(lambda: np.asarray(run(x0, qt, steps)),
                                "closed_call", steps)
        if best is None:
            continue
        log(f"  bk={bk} bn={bn}: {best:.1f} us (device), "
            f"{byt / (best / 1e6) / 1e9:.0f} GB/s")
    del q, scales, qt


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    grid = [(512, 512), (1024, 256), (1024, 512), (1024, 1024),
            (2048, 512), (2048, 1024), (4096, 256), (4096, 512),
            (4096, 1024), (4096, 2048)]
    sweep("qkv", 4096, 12288, 8, grid)
    sweep("wo", 4096, 4096, 8, grid)
    sweep("lm_head", 4096, 32000, 8,
          [(1024, 256), (2048, 256), (4096, 256), (1024, 128),
           (4096, 128), (2048, 2000), (4096, 2000), (4096, 1000),
           (4096, 500), (4096, 4000)])


if __name__ == "__main__":
    main()
