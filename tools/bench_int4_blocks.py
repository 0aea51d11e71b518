"""Block-size x dequant-chain experiments for the int4 layered matmul.

Measures (device timeline): the pure-DMA stream floor and the accscale
kernel at several block shapes, plus a biased-nibble (zero-point) chain.

Run:  nohup python tools/bench_int4_blocks.py > /tmp/qblk.log 2>&1 &
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import tools.bench_quant_variants as B
from rama_tpu.ops.quant import QuantizedTensor


def k4_v8(l_ref, xlo_ref, xhi_ref, q_ref, s_ref, o_ref, acc_ref, *, gs,
          out_dtype):
    """Zero-point chain (TIMING emulation; assumes biased storage u=v+8):
    dot unsigned nibbles per group, correct with 8*sum(x_g) on the
    accumulator. lo = p & 0xF (no sign-extend shifts); hi = (p>>4) & 0xF."""
    B._start(acc_ref)
    p32 = q_ref[0].astype(jnp.int32)
    bk2, bn = p32.shape
    nb = bk2 // gs
    lo = (p32 & 0xF).astype(jnp.float32)
    hi = ((p32 >> 4) & 0xF).astype(jnp.float32)
    s = s_ref[0].reshape(nb, 2, bn)
    acc = acc_ref[...]
    for g in range(nb):
        rows = slice(g * gs, (g + 1) * gs)
        xlo = xlo_ref[g].astype(jnp.float32)
        xhi = xhi_ref[g].astype(jnp.float32)
        plo = jnp.dot(xlo, lo[rows], preferred_element_type=jnp.float32)
        phi = jnp.dot(xhi, hi[rows], preferred_element_type=jnp.float32)
        # zero-point correction: (p - 8*sum(x_g)) * s
        zlo = 8.0 * jnp.sum(xlo, axis=1, keepdims=True)
        zhi = 8.0 * jnp.sum(xhi, axis=1, keepdims=True)
        acc += (plo - zlo) * s[g, 0] + (phi - zhi) * s[g, 1]
    acc_ref[...] = acc
    B._finish(o_ref, acc_ref, out_dtype)


def k4_v9(l_ref, xlo_ref, xhi_ref, q_ref, s_ref, o_ref, acc_ref, *, gs,
          out_dtype):
    """Floor-split unpack (TIMING emulation; assumes lo-BIASED storage:
    byte = 16*hi_s + lo_u with lo_u = lo_s + 8 in [0,15], so the byte's
    two's-complement value decomposes by floor division). One int8->f32
    convert + mul + floor + fma (4 elementwise passes) vs the i32 route's
    widen + 3 shifts + 2 converts (6). The lo bias folds into the
    accumulator via the per-group sum of x (prefetched in a real kernel;
    computed in-kernel here — (M, gs) sums are noise next to the weight
    block)."""
    B._start(acc_ref)
    bf = q_ref[0].astype(jnp.float32)
    bk2, bn = bf.shape
    nb = bk2 // gs
    hi = jnp.floor(bf * 0.0625)
    lo = bf - 16.0 * hi
    s = s_ref[0].reshape(nb, 2, bn)
    acc = acc_ref[...]
    for g in range(nb):
        rows = slice(g * gs, (g + 1) * gs)
        xlo = xlo_ref[g].astype(jnp.float32)
        xhi = xhi_ref[g].astype(jnp.float32)
        plo = jnp.dot(xlo, lo[rows], preferred_element_type=jnp.float32)
        phi = jnp.dot(xhi, hi[rows], preferred_element_type=jnp.float32)
        zlo = 8.0 * jnp.sum(xlo, axis=1, keepdims=True)
        acc += (plo - zlo) * s[g, 0] + phi * s[g, 1]
    acc_ref[...] = acc
    B._finish(o_ref, acc_ref, out_dtype)


def k4_v10(l_ref, xlo_ref, xhi_ref, q_ref, s_ref, o_ref, acc_ref, *, gs,
           out_dtype):
    """Three-dot floor unpack (TIMING emulation, lo-biased storage): never
    materialize the lo plane — dot(xlo, lo) = dot(xlo, byte) -
    16*dot(xlo, hi). Elementwise passes drop to 3 (convert, mul, floor);
    the extra per-group (M, gs)x(gs, bn) dot rides the idle MXU at
    decode M."""
    B._start(acc_ref)
    bf = q_ref[0].astype(jnp.float32)
    bk2, bn = bf.shape
    nb = bk2 // gs
    hi = jnp.floor(bf * 0.0625)
    s = s_ref[0].reshape(nb, 2, bn)
    acc = acc_ref[...]
    for g in range(nb):
        rows = slice(g * gs, (g + 1) * gs)
        xlo = xlo_ref[g].astype(jnp.float32)
        xhi = xhi_ref[g].astype(jnp.float32)
        pb = jnp.dot(xlo, bf[rows], preferred_element_type=jnp.float32)
        plh = jnp.dot(xlo, hi[rows], preferred_element_type=jnp.float32)
        phi = jnp.dot(xhi, hi[rows], preferred_element_type=jnp.float32)
        zlo = 8.0 * jnp.sum(xlo, axis=1, keepdims=True)
        acc += (pb - 16.0 * plh - zlo) * s[g, 0] + phi * s[g, 1]
    acc_ref[...] = acc
    B._finish(o_ref, acc_ref, out_dtype)


def main():
    dev = jax.devices()[0]
    B.log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    only = sys.argv[1] if len(sys.argv) > 1 else None
    kq, ks = jax.random.split(jax.random.PRNGKey(7))

    if only in (None, "4"):
        q = jax.random.randint(kq, (B.L, B.K // 2, B.N), -127, 127, jnp.int8)
        scales = (jax.random.uniform(ks, (B.L, B.K // B.GS, B.N), jnp.float32)
                  * 0.02 + 0.01)
        qt = QuantizedTensor(q=q, scales=scales, group_size=B.GS, bits=4)
        for bk, bn in ((1024, 512), (2048, 512), (2048, 1024), (4096, 512),
                       (4096, 1024), (4096, 1536), (4096, 3072)):
            B.log(f"== int4 blocks bk={bk} bn={bn} ==")
            B.time_variant("floor", B.k4_v5, 4, qt, skip_check=True,
                           block_k=bk, block_n=bn)
            B.time_variant("v3", B.k4_v3, 4, qt, grouped_x=True,
                           block_k=bk, block_n=bn)
            B.time_variant("v8-zp", k4_v8, 4, qt, grouped_x=True,
                           skip_check=True, block_k=bk, block_n=bn)
            B.time_variant("v9-floor", k4_v9, 4, qt, grouped_x=True,
                           skip_check=True, block_k=bk, block_n=bn)
            B.time_variant("v10-3dot", k4_v10, 4, qt, grouped_x=True,
                           skip_check=True, block_k=bk, block_n=bn)
        del q, scales, qt

    if only in (None, "8"):
        q = jax.random.randint(kq, (B.L, B.K, B.N), -127, 127, jnp.int8)
        scales = (jax.random.uniform(ks, (B.L, B.K // B.GS, B.N), jnp.float32)
                  * 0.02 + 0.01)
        qt = QuantizedTensor(q=q, scales=scales, group_size=B.GS, bits=8)
        for bk, bn in ((1024, 512), (2048, 512), (2048, 1024),
                       (4096, 1024), (4096, 1536)):
            B.log(f"== int8 blocks bk={bk} bn={bn} ==")
            B.time_variant("v0", B.k8_v0, 8, qt, block_k=bk, block_n=bn)
            B.time_variant("v2-accscale", B.k8_v2, 8, qt, grouped_x=True,
                           block_k=bk, block_n=bn)


if __name__ == "__main__":
    main()
