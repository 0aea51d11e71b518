"""Device-timeline benchmark for the fused FFN kernel at Llama-2-7B decode
shapes: accscale phase A vs dequant-in-VMEM phase A, int8 and int4.

Run:  nohup python tools/bench_ffn.py > /tmp/ffn.log 2>&1 &
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rama_tpu.ops.quant import QuantizedTensor
from rama_tpu.ops.pallas import ffn
from tools._ktime import best_device_time, log

L, K, H = 4, 4096, 11008
GS = 64
REPS = 24


def make(bits: int):
    kq, ks = jax.random.split(jax.random.PRNGKey(3))
    kp = 1 if bits == 8 else 2
    w13 = QuantizedTensor(
        q=jax.random.randint(kq, (L, K // kp, 2 * H), -127, 127, jnp.int8),
        scales=jax.random.uniform(ks, (L, K // GS, 2 * H), jnp.float32)
        * 0.02 + 0.01,
        group_size=GS, bits=bits)
    w2 = QuantizedTensor(
        q=jax.random.randint(ks, (L, H // kp, K), -127, 127, jnp.int8),
        scales=jax.random.uniform(kq, (L, H // GS, K), jnp.float32)
        * 0.02 + 0.01,
        group_size=GS, bits=bits)
    return w13, w2


def time_ffn(tag: str, m: int, bits: int, w13, w2):
    x = jax.random.normal(jax.random.PRNGKey(1), (m, K), jnp.bfloat16)
    lyr = jnp.int32(1)

    def run():
        outs = [ffn.ffn_fused_layered(x, w13, w2, lyr) for _ in range(REPS)]
        np.asarray(outs[-1])

    run()  # compile + warm
    us = best_device_time(run, "_ffn_fused_impl.", divisor=REPS)
    if us is None:
        log(f"{tag:28s} m={m} bits={bits}: no device events matched")
        return None
    wbytes = (K * 2 * H + H * K) * (1 if bits == 8 else 0.5) \
        + (K // GS * 2 * H + H // GS * K) * 4
    gbs = wbytes / (us * 1e3) if us else 0.0
    log(f"{tag:28s} m={m} bits={bits}: {us:8.1f} us  {gbs:6.1f} GB/s")
    return us


def main():
    from rama_tpu.models.llama import _interleave_w13
    from rama_tpu.ops.pallas.ffn import phase_a_tile

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    for bits in (8, 4):
        w13, w2 = make(bits)
        w13_il = _interleave_w13(w13, H, phase_a_tile(H, bits, GS))
        for m in (1, 8):
            ffn._FORCE_DEQUANT = True
            time_ffn("phaseA dequant-in-VMEM", m, bits, w13, w2)
            ffn._FORCE_DEQUANT = False
            time_ffn("phaseA accscale", m, bits, w13, w2)
            time_ffn("phaseA accscale+interleave", m, bits, w13_il, w2)
            ffn._PHASE_B_ACC = True
            time_ffn("+phaseB accscale", m, bits, w13_il, w2)
            ffn._PHASE_B_ACC = False
        del w13, w13_il, w2


if __name__ == "__main__":
    main()
