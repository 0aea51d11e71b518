"""Is an N-packed int4 layout worth it for the FFN down-projection?

The fused-FFN phase B contracts the VMEM-resident hidden activation against
w2 (H, N) int4. K-packed nibbles (the standard layout) need an interleaving
concat back to logical row order because the hidden activation can't be
plane-split inside the kernel (lane-dim reshapes are illegal in Mosaic).
N-packing pairs output column c with c + N/2 instead: the two nibble planes
become independent OUTPUT column tiles — no concat, no per-weight reorder.

This measures both chains as standalone layered matmuls at w2 shape
(M=8, K=11008, N=4096, gs=32, L layers cycled).

Run:  nohup python tools/bench_w2_pack.py > /tmp/w2pack.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools._ktime import best_device_time, log

L, K, N, GS, M = 8, 11008, 4096, 32, 8
BH = 256          # phase-B consumes h in bh-row tiles like the FFN kernel


def kernel_kpack(l_ref, x_ref, q_ref, s_ref, o_ref, *, gs, nh, bh):
    """Current phase-B chain: dequant K-packed rows + interleave concat."""
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for j in range(nh):
        p32 = q_ref[0, j * (bh // 2):(j + 1) * (bh // 2)].astype(jnp.int32)
        k2, n = p32.shape
        nb = k2 // gs
        lo = ((p32 << 28) >> 28).astype(jnp.float32)
        hi = (p32 >> 4).astype(jnp.float32)
        s = s_ref[0, j * (bh // gs):(j + 1) * (bh // gs)].reshape(nb, 2, n)
        wlo = (lo.reshape(nb, gs, n) * s[:, 0:1, :]).reshape(k2, n)
        whi = (hi.reshape(nb, gs, n) * s[:, 1:2, :]).reshape(k2, n)
        w = jnp.concatenate(
            [wlo.reshape(nb, 1, gs, n), whi.reshape(nb, 1, gs, n)],
            axis=1).reshape(k2 * 2, n)
        acc += jnp.dot(x_ref[j].astype(jnp.float32), w,
                       preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(jnp.bfloat16)


def kernel_npack(l_ref, x_ref, q_ref, s_lo_ref, s_hi_ref, olo_ref, ohi_ref,
                 *, gs, nh, bh):
    """N-packed chain: byte (k, c) holds nibbles for output cols c (lo) and
    c + N/2 (hi); the two planes dot independently into two output tiles."""
    acc_lo = jnp.zeros(olo_ref.shape, jnp.float32)
    acc_hi = jnp.zeros(ohi_ref.shape, jnp.float32)
    for j in range(nh):
        p32 = q_ref[0, j * bh:(j + 1) * bh].astype(jnp.int32)   # (bh, bw)
        bhj, bw = p32.shape
        nb = bhj // gs
        lo = ((p32 << 28) >> 28).astype(jnp.float32)
        hi = (p32 >> 4).astype(jnp.float32)
        slo = s_lo_ref[0, j * (bh // gs):(j + 1) * (bh // gs)]
        shi = s_hi_ref[0, j * (bh // gs):(j + 1) * (bh // gs)]
        wlo = (lo.reshape(nb, gs, bw) * slo[:, None, :]).reshape(bhj, bw)
        whi = (hi.reshape(nb, gs, bw) * shi[:, None, :]).reshape(bhj, bw)
        xj = x_ref[j].astype(jnp.float32)
        acc_lo += jnp.dot(xj, wlo, preferred_element_type=jnp.float32)
        acc_hi += jnp.dot(xj, whi, preferred_element_type=jnp.float32)
    olo_ref[...] = acc_lo.astype(jnp.bfloat16)
    ohi_ref[...] = acc_hi.astype(jnp.bfloat16)


def run_variant(name, npack: bool, bw: int):
    nh = K // BH
    kq, ks = jax.random.split(jax.random.PRNGKey(5))
    # q bytes identical either way; interpretation differs
    q = jax.random.randint(kq, (L, K // (1 if npack else 2),
                                (N // 2 if npack else N)), -127, 127, jnp.int8)
    scales = jax.random.uniform(ks, (L, K // GS, N), jnp.float32) * 0.02 + .01
    x = jax.random.normal(jax.random.PRNGKey(1), (nh, M, BH), jnp.bfloat16)

    if npack:
        nn = (N // 2) // bw
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nn,),
            in_specs=[
                pl.BlockSpec((nh, M, BH), lambda t, sc: (0, 0, 0)),
                pl.BlockSpec((1, K, bw), lambda t, sc: (sc[0], 0, t)),
                pl.BlockSpec((1, K // GS, bw), lambda t, sc: (sc[0], 0, t)),
                pl.BlockSpec((1, K // GS, bw),
                             lambda t, sc: (sc[0], 0, t + nn)),
            ],
            out_specs=[pl.BlockSpec((M, bw), lambda t, sc: (0, t)),
                       pl.BlockSpec((M, bw), lambda t, sc: (0, t))],
        )
        call = pl.pallas_call(
            partial(kernel_npack, gs=GS, nh=nh, bh=BH),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((M, N // 2), jnp.bfloat16)] * 2,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )
    else:
        nn = N // bw
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nn,),
            in_specs=[
                pl.BlockSpec((nh, M, BH), lambda t, sc: (0, 0, 0)),
                pl.BlockSpec((1, K // 2, bw), lambda t, sc: (sc[0], 0, t)),
                pl.BlockSpec((1, K // GS, bw), lambda t, sc: (sc[0], 0, t)),
            ],
            out_specs=pl.BlockSpec((M, bw), lambda t, sc: (0, t)),
        )
        call = pl.pallas_call(
            partial(kernel_kpack, gs=GS, nh=nh, bh=BH),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )

    @partial(jax.jit, static_argnames=("steps",))
    def loop(x, q, scales, steps):
        def body(c, i):
            if npack:
                slo = scales[:, :, :N // 2]
                shi = scales[:, :, N // 2:]
                olo, ohi = call(i.reshape(1) % L, c, q, slo, shi)
                y = jnp.concatenate([olo, ohi], -1)
            else:
                y = call(i.reshape(1) % L, c, q, scales)
            c = c + y[None, :, :BH].astype(jnp.bfloat16) * 1e-3
            return c, ()
        c, _ = jax.lax.scan(body, x, jnp.arange(steps, dtype=jnp.int32))
        return c

    steps = 96
    np.asarray(loop(x, q, scales, steps))
    best = best_device_time(lambda: np.asarray(loop(x, q, scales, steps)),
                            "closed_call", steps)
    byt = (q.size + scales.size * 4) // L
    if best:
        log(f"  {name}: {best:.1f} us (device), "
            f"{byt / (best / 1e6) / 1e9:.0f} GB/s")


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    for bw in (256, 512):
        log(f"== bw={bw} ==")
        run_variant(f"kpack-interleave bw={bw}", False, bw)
        run_variant(f"npack-halves bw={bw // 2}", True, bw // 2)


if __name__ == "__main__":
    main()
