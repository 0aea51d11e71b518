"""Micro-benchmark: int4/int8 dequant-chain variants for the layered
quant-matmul kernel, on the real chip.

The decode path is VPU-bound on the dequant arithmetic (NEXT.md #1): int4
streams ~400 GB/s effective vs the int8 kernel's ~600+. Each variant below
changes only the in-kernel expansion chain; the weight bytes streamed are
identical. Timing is slope-based over two scan lengths (tunnel dispatch cost
cancels), layers cycled so every step streams fresh HBM.

Run:  nohup python tools/bench_quant_variants.py > /tmp/qvar.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rama_tpu.ops.pallas.quant_matmul import (_pick_block, _pick_k_block,
                                              _pick_k_block_int4,
                                              _split_x_planes)
from rama_tpu.ops.quant import QuantizedTensor

L, K, N, GS = 12, 4096, 12288, 64
M = 8


def log(m):
    print(m, file=sys.stderr, flush=True)


# ---------------------------------------------------------------- variants

def _start(acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)


def _finish(o_ref, acc_ref, out_dtype):
    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


def k4_v0(l_ref, xlo_ref, xhi_ref, q_ref, s_ref, o_ref, acc_ref, *, gs,
          out_dtype):
    """Current production chain: i32 shifts, i->f convert, scale mul, bf16."""
    _start(acc_ref)
    p32 = q_ref[0].astype(jnp.int32)
    bk2, bn = p32.shape
    nb = bk2 // gs
    lo = ((p32 << 28) >> 28).astype(jnp.float32)
    hi = (p32 >> 4).astype(jnp.float32)
    s = s_ref[0].reshape(nb, 2, bn)
    wlo = (lo.reshape(nb, gs, bn) * s[:, 0:1, :]).reshape(bk2, bn)
    whi = (hi.reshape(nb, gs, bn) * s[:, 1:2, :]).reshape(bk2, bn)
    acc_ref[...] += jnp.dot(xlo_ref[...].astype(jnp.bfloat16),
                            wlo.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
    acc_ref[...] += jnp.dot(xhi_ref[...].astype(jnp.bfloat16),
                            whi.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
    _finish(o_ref, acc_ref, out_dtype)


def k4_v1(l_ref, xlo_ref, xhi_ref, q_ref, s_ref, o_ref, acc_ref, *, gs,
          out_dtype):
    """V0 minus the bf16 casts: f32 x f32 dot (MXU idle at decode M)."""
    _start(acc_ref)
    p32 = q_ref[0].astype(jnp.int32)
    bk2, bn = p32.shape
    nb = bk2 // gs
    lo = ((p32 << 28) >> 28).astype(jnp.float32)
    hi = (p32 >> 4).astype(jnp.float32)
    s = s_ref[0].reshape(nb, 2, bn)
    wlo = (lo.reshape(nb, gs, bn) * s[:, 0:1, :]).reshape(bk2, bn)
    whi = (hi.reshape(nb, gs, bn) * s[:, 1:2, :]).reshape(bk2, bn)
    acc_ref[...] += jnp.dot(xlo_ref[...].astype(jnp.float32), wlo,
                            preferred_element_type=jnp.float32)
    acc_ref[...] += jnp.dot(xhi_ref[...].astype(jnp.float32), whi,
                            preferred_element_type=jnp.float32)
    _finish(o_ref, acc_ref, out_dtype)


def k4_v2(l_ref, xlo_ref, xhi_ref, q_ref, s_ref, o_ref, acc_ref, *, gs,
          out_dtype):
    """Magic-bias dequant: nibble OR'd into a 2^23-biased f32 mantissa;
    (f - (2^23+8)) * s recovers the signed value. No int->float convert."""
    _start(acc_ref)
    p32 = q_ref[0].astype(jnp.int32) ^ 0x88        # flip both nibble sign bits
    bk2, bn = p32.shape
    nb = bk2 // gs
    flo = pltpu.bitcast((p32 & 0xF) | 0x4B000000, jnp.float32)
    fhi = pltpu.bitcast(((p32 >> 4) & 0xF) | 0x4B000000, jnp.float32)
    c = jnp.float32(8388616.0)                     # 2**23 + 8
    s = s_ref[0].reshape(nb, 2, bn)
    wlo = ((flo.reshape(nb, gs, bn) - c) * s[:, 0:1, :]).reshape(bk2, bn)
    whi = ((fhi.reshape(nb, gs, bn) - c) * s[:, 1:2, :]).reshape(bk2, bn)
    acc_ref[...] += jnp.dot(xlo_ref[...].astype(jnp.float32), wlo,
                            preferred_element_type=jnp.float32)
    acc_ref[...] += jnp.dot(xhi_ref[...].astype(jnp.float32), whi,
                            preferred_element_type=jnp.float32)
    _finish(o_ref, acc_ref, out_dtype)


def k4_v3(l_ref, xlo_ref, xhi_ref, q_ref, s_ref, o_ref, acc_ref, *, gs,
          out_dtype):
    """Scale on the accumulator: dot raw nibbles per scale group (exact
    numerics), then scale the (M, bn) group partials. Dequant chain drops to
    shifts + convert; the scale mul moves off the weight-sized tensor.
    x planes arrive pre-grouped as (nb, M, gs) so the kernel never reshapes
    across the lane dim (Mosaic can't shape-cast lanes into sublanes)."""
    _start(acc_ref)
    p32 = q_ref[0].astype(jnp.int32)
    bk2, bn = p32.shape
    nb = bk2 // gs
    lo = ((p32 << 28) >> 28).astype(jnp.float32)
    hi = (p32 >> 4).astype(jnp.float32)
    s = s_ref[0].reshape(nb, 2, bn)
    acc = acc_ref[...]
    for g in range(nb):
        rows = slice(g * gs, (g + 1) * gs)
        plo = jnp.dot(xlo_ref[g].astype(jnp.float32), lo[rows],
                      preferred_element_type=jnp.float32)
        phi = jnp.dot(xhi_ref[g].astype(jnp.float32), hi[rows],
                      preferred_element_type=jnp.float32)
        acc += plo * s[g, 0] + phi * s[g, 1]
    acc_ref[...] = acc
    _finish(o_ref, acc_ref, out_dtype)


def k4_v5(l_ref, xlo_ref, xhi_ref, q_ref, s_ref, o_ref, acc_ref, *, gs,
          out_dtype):
    """Pure-stream floor: touch the weight block, no dequant/dot. The
    output is garbage; this measures the DMA-bound lower limit."""
    _start(acc_ref)
    bn = acc_ref.shape[-1]
    acc_ref[...] += (q_ref[0, :8, :bn].astype(jnp.float32)
                     + s_ref[0, :8, :bn])
    _finish(o_ref, acc_ref, out_dtype)


def k4_v3b(l_ref, xlo_ref, xhi_ref, q_ref, s_ref, o_ref, acc_ref, *, gs,
           out_dtype):
    """v3 with bf16 group dots (nibbles convert i32->bf16 directly; x planes
    cast once): quarter the MXU passes of the f32 dots."""
    _start(acc_ref)
    p32 = q_ref[0].astype(jnp.int32)
    bk2, bn = p32.shape
    nb = bk2 // gs
    lo = ((p32 << 28) >> 28).astype(jnp.bfloat16)
    hi = (p32 >> 4).astype(jnp.bfloat16)
    s = s_ref[0].reshape(nb, 2, bn)
    acc = acc_ref[...]
    for g in range(nb):
        rows = slice(g * gs, (g + 1) * gs)
        plo = jnp.dot(xlo_ref[g].astype(jnp.bfloat16), lo[rows],
                      preferred_element_type=jnp.float32)
        phi = jnp.dot(xhi_ref[g].astype(jnp.bfloat16), hi[rows],
                      preferred_element_type=jnp.float32)
        acc += plo * s[g, 0] + phi * s[g, 1]
    acc_ref[...] = acc
    _finish(o_ref, acc_ref, out_dtype)


def k4_v4(l_ref, xlo_ref, xhi_ref, q_ref, s_ref, o_ref, acc_ref, *, gs,
          out_dtype):
    """bf16 dequant: i32 -> bf16 convert directly, bf16 scale mul (packed
    2/lane if Mosaic vectorizes bf16 arithmetic), bf16 dot."""
    _start(acc_ref)
    p32 = q_ref[0].astype(jnp.int32)
    bk2, bn = p32.shape
    nb = bk2 // gs
    lo = ((p32 << 28) >> 28).astype(jnp.bfloat16)
    hi = (p32 >> 4).astype(jnp.bfloat16)
    s = s_ref[0].astype(jnp.bfloat16).reshape(nb, 2, bn)
    wlo = (lo.reshape(nb, gs, bn) * s[:, 0:1, :]).reshape(bk2, bn)
    whi = (hi.reshape(nb, gs, bn) * s[:, 1:2, :]).reshape(bk2, bn)
    acc_ref[...] += jnp.dot(xlo_ref[...].astype(jnp.bfloat16), wlo,
                            preferred_element_type=jnp.float32)
    acc_ref[...] += jnp.dot(xhi_ref[...].astype(jnp.bfloat16), whi,
                            preferred_element_type=jnp.float32)
    _finish(o_ref, acc_ref, out_dtype)


def k8_v0(l_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *, gs, out_dtype):
    """Current production int8 chain."""
    _start(acc_ref)
    w8 = q_ref[0]
    bk, bn = w8.shape
    scales = s_ref[0]
    w = (w8.astype(jnp.float32).reshape(bk // gs, gs, bn)
         * scales[:, None, :]).reshape(bk, bn).astype(jnp.bfloat16)
    acc_ref[...] += jnp.dot(x_ref[...].astype(jnp.bfloat16), w,
                            preferred_element_type=jnp.float32)
    _finish(o_ref, acc_ref, out_dtype)


def k8_v1(l_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *, gs, out_dtype):
    """int8 minus the bf16 cast: f32 dot."""
    _start(acc_ref)
    w8 = q_ref[0]
    bk, bn = w8.shape
    scales = s_ref[0]
    w = (w8.astype(jnp.float32).reshape(bk // gs, gs, bn)
         * scales[:, None, :]).reshape(bk, bn)
    acc_ref[...] += jnp.dot(x_ref[...].astype(jnp.float32), w,
                            preferred_element_type=jnp.float32)
    _finish(o_ref, acc_ref, out_dtype)


def k8_v2(l_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *, gs, out_dtype):
    """int8, scale on the accumulator (per-group dots, exact numerics).
    x arrives pre-grouped (nb, M, gs)."""
    _start(acc_ref)
    w8 = q_ref[0]
    bk, bn = w8.shape
    nb = bk // gs
    w = w8.astype(jnp.float32)
    s = s_ref[0]
    acc = acc_ref[...]
    for g in range(nb):
        acc += jnp.dot(x_ref[g].astype(jnp.float32),
                       w[g * gs:(g + 1) * gs],
                       preferred_element_type=jnp.float32) * s[g]
    acc_ref[...] = acc
    _finish(o_ref, acc_ref, out_dtype)


def k8_v4(l_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *, gs, out_dtype):
    """int8 magic-bias dequant: byte OR'd into a 2^23-biased f32 mantissa,
    (f - (2^23+128)) * s. No int->float convert."""
    _start(acc_ref)
    p32 = q_ref[0].astype(jnp.int32)
    bk, bn = p32.shape
    f = pltpu.bitcast(((p32 ^ 0x80) & 0xFF) | 0x4B000000, jnp.float32)
    c = jnp.float32(8388736.0)                     # 2**23 + 128
    scales = s_ref[0]
    w = ((f.reshape(bk // gs, gs, bn) - c)
         * scales[:, None, :]).reshape(bk, bn)
    acc_ref[...] += jnp.dot(x_ref[...].astype(jnp.float32), w,
                            preferred_element_type=jnp.float32)
    _finish(o_ref, acc_ref, out_dtype)


def k8_v3(l_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *, gs, out_dtype):
    """int8, bf16 dequant directly (i8->bf16 convert, bf16 scale mul)."""
    _start(acc_ref)
    w8 = q_ref[0]
    bk, bn = w8.shape
    scales = s_ref[0].astype(jnp.bfloat16)
    w = (w8.astype(jnp.bfloat16).reshape(bk // gs, gs, bn)
         * scales[:, None, :]).reshape(bk, bn)
    acc_ref[...] += jnp.dot(x_ref[...].astype(jnp.bfloat16), w,
                            preferred_element_type=jnp.float32)
    _finish(o_ref, acc_ref, out_dtype)


# ---------------------------------------------------------------- harness

def build_call(kernel, bits, qt, grouped_x=False, block_k=1024, block_n=512):
    gs = qt.group_size
    k, n = qt.shape[-2], qt.shape[-1]
    bk = _pick_k_block(k, block_k, gs) if bits == 8 else _pick_k_block_int4(
        k, block_k, gs)
    bn = _pick_block(n, block_n, 128)
    bm = M
    k_pack = 1 if bits == 8 else 2
    if bits == 4 and grouped_x:
        nbt = bk // 2 // gs
        x_specs = [pl.BlockSpec((nbt, bm, gs), lambda i, j, kk, l: (kk, 0, 0)),
                   pl.BlockSpec((nbt, bm, gs), lambda i, j, kk, l: (kk, 0, 0))]
    elif bits == 8 and grouped_x:
        x_specs = [pl.BlockSpec((bk // gs, bm, gs),
                                lambda i, j, kk, l: (kk, 0, 0))]
    elif bits == 4:
        x_specs = [pl.BlockSpec((bm, bk // 2), lambda i, j, kk, l: (i, kk)),
                   pl.BlockSpec((bm, bk // 2), lambda i, j, kk, l: (i, kk))]
    else:
        x_specs = [pl.BlockSpec((bm, bk), lambda i, j, kk, l: (i, kk))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, n // bn, k // bk),
        in_specs=x_specs + [
            pl.BlockSpec((1, bk // k_pack, bn), lambda i, j, kk, l: (l[0], kk, j)),
            pl.BlockSpec((1, bk // gs, bn), lambda i, j, kk, l: (l[0], kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )

    def call(x, q, s, layer):
        if bits == 8:
            if grouped_x:
                x = x.reshape(bm, k // gs, gs).transpose(1, 0, 2)
            ops = (x,)
        else:
            xlo, xhi = _split_x_planes(x, gs)
            if grouped_x:
                nbt_all = k // 2 // gs
                xlo = xlo.reshape(bm, nbt_all, gs).transpose(1, 0, 2)
                xhi = xhi.reshape(bm, nbt_all, gs).transpose(1, 0, 2)
            ops = (xlo, xhi)
        return pl.pallas_call(
            partial(kernel, gs=gs, out_dtype=jnp.bfloat16),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((bm, n), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        )(layer.reshape(1).astype(jnp.int32), *ops, q, s)

    return call


def device_kernel_time(fn, match: str, steps: int):
    """Run fn() under a profiler trace and return (us_per_step, count) for
    device events whose name contains `match`. Device-timeline times are
    immune to the tunnel's dispatch-queue noise, unlike wall-clock slopes."""
    import glob
    import gzip
    import json
    import shutil
    import tempfile

    tdir = tempfile.mkdtemp(prefix="ktrace_")
    jax.profiler.start_trace(tdir)
    fn()
    jax.profiler.stop_trace()
    paths = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        shutil.rmtree(tdir, ignore_errors=True)
        return None, 0
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    tot, cnt = 0.0, 0
    groups = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        nm = e.get("name", "")
        if nm.startswith("$"):
            continue
        groups[nm] = groups.get(nm, 0.0) + e["dur"]
        if match in nm:
            tot += e["dur"]
            cnt += 1
    shutil.rmtree(tdir, ignore_errors=True)
    if cnt == 0:
        top = sorted(groups.items(), key=lambda kv: -kv[1])[:12]
        log(f"    [no event matched '{match}'; top events: "
            + ", ".join(f"{n}={d:.0f}us" for n, d in top) + "]")
        return None, 0
    return tot / steps, cnt


def time_variant(name, kernel, bits, qt, ref_out=None, grouped_x=False,
                 skip_check=False, block_k=1024, block_n=512):
    call = build_call(kernel, bits, qt, grouped_x=grouped_x,
                      block_k=block_k, block_n=block_n)

    @partial(jax.jit, static_argnames=("n",))
    def run(x0, q, s, n):
        def body(x, i):
            y = call(x, q, s, i % L)
            x = y.reshape(M, N // K, K).sum(1).astype(jnp.bfloat16)
            return x, ()
        x, _ = jax.lax.scan(body, x0, jnp.arange(n, dtype=jnp.int32))
        return x

    x0 = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
    # correctness vs ref (single call, layer 1)
    one = jax.jit(lambda x, q, s: call(x, q, s, jnp.int32(1)))
    got = np.asarray(one(x0, qt.q, qt.scales), np.float32)
    if ref_out is not None and not skip_check:
        rel = np.abs(got - ref_out).max() / (np.abs(ref_out).max() + 1e-6)
        log(f"  {name}: rel-err vs v0 = {rel:.5f}")
        if not np.isfinite(got).all() or rel > 0.02:
            log(f"  {name}: INCORRECT — skipping timing")
            return None, got
    steps = 96
    try:
        np.asarray(run(x0, qt.q, qt.scales, steps))  # compile + warm
    except Exception as e:
        log(f"  {name}: FAILED compile/run: {type(e).__name__}: {e}")
        return None, got
    best = None
    for _ in range(3):
        per_us, cnt = device_kernel_time(
            lambda: np.asarray(run(x0, qt.q, qt.scales, steps)),
            "closed_call", steps)
        if per_us is not None and (best is None or per_us < best):
            best = per_us
    if best is None:
        log(f"  {name}: no device events matched {kernel.__name__}")
        return None, got
    per = best / 1e6
    byt = (qt.q.size * qt.q.dtype.itemsize + qt.scales.size * 4) // L
    log(f"  {name}: {best:.1f} us/matmul (device), "
        f"{byt / per / 1e9:.0f} GB/s stream")
    return per, got


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    key = jax.random.PRNGKey(7)
    kq, ks = jax.random.split(key)

    only = int(sys.argv[1]) if len(sys.argv) > 1 else None
    for bits, variants in ((4, [("v0-current", k4_v0, False),
                                ("v3-accscale", k4_v3, True),
                                ("v3b-accscale-bf16", k4_v3b, True),
                                ("v5-streamfloor", k4_v5, False)]),
                           (8, [("v0-current", k8_v0, False),
                                ("v1-f32dot", k8_v1, False),
                                ("v2-accscale", k8_v2, True)])):
        if only is not None and bits != only:
            continue
        kdiv = K // (2 if bits == 4 else 1)
        q = jax.random.randint(kq, (L, kdiv, N), -127, 127, jnp.int8)
        scales = (jax.random.uniform(ks, (L, K // GS, N), jnp.float32)
                  * 0.02 + 0.01)
        qt = QuantizedTensor(q=q, scales=scales, group_size=GS, bits=bits)
        log(f"== int{bits}: {L}x({K}x{N}), gs={GS}, "
            f"{(q.size + scales.size * 4) / 1e6:.0f} MB ==")
        ref = None
        for name, kern, grouped in variants:
            per, got = time_variant(name, kern, bits, qt, ref,
                                    grouped_x=grouped,
                                    skip_check="floor" in name)
            if ref is None:
                ref = got
        del q, scales, qt


if __name__ == "__main__":
    main()
