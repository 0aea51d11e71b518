"""On-chip kernel-vs-interpret checks for the attention kernel families.

The pytest suite runs the kernels in interpret mode on CPU; a Mosaic
miscompile (layout, tiling, masking) only shows on real hardware. This tool
compares every decode/chunk/paged attention variant compiled-vs-interpret at
7B-like MHA shapes AND a GQA group (nkv=8, rep=4), exiting nonzero on
mismatch. Run after kernel changes:

    nohup timeout 1800 python tools/check_kernels_onchip.py > /tmp/kchk.log 2>&1 &
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rama_tpu.ops.pallas.decode_attention import (  # noqa: E402
    chunk_attention_layer_q8, chunk_attention_layer_tiled,
    chunk_attention_layer_tiled_q8, decode_attention_layer_q8,
    decode_attention_layer_tiled, decode_attention_layer_tiled_q8,
    decode_attention_q8)
from rama_tpu.ops.pallas.paged_attention import (  # noqa: E402
    paged_chunk_attention_layer, paged_chunk_attention_layer_q8,
    paged_decode_attention_layer, paged_decode_attention_layer_q8)

FAILED = []


def check(name, got, want, tol=0.03):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = float(np.abs(got - want).max())
    ok = np.isfinite(got).all() and err < tol
    print(f"{name}: max_abs_err {err:.5f} {'OK' if ok else 'FAIL'}",
          flush=True)
    if not ok:
        FAILED.append(name)


def run(nh: int, nkv: int):
    rng = np.random.default_rng(0)
    L, B, S, HD, T = 4, 8, 512, 128, 4
    tag = f"nh{nh}/nkv{nkv}"
    q = jnp.asarray(rng.standard_normal((B, nh, HD)), jnp.bfloat16)
    qc = jnp.asarray(rng.standard_normal((B, T, nh, HD)), jnp.bfloat16)
    pos = jnp.asarray(rng.integers(3, S - 1, (B,)), jnp.int32)
    pos0 = jnp.asarray(rng.integers(3, S - T - 1, (B,)), jnp.int32)
    lay = jnp.int32(2)

    kb = jnp.asarray(rng.standard_normal((L, B, nkv, S, HD)), jnp.bfloat16)
    vb = jnp.asarray(rng.standard_normal((L, B, nkv, S, HD)), jnp.bfloat16)
    k8 = jnp.asarray(rng.integers(-127, 128, (L, B, nkv, S, HD)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (L, B, nkv, S, HD)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (L, B, nkv, S)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (L, B, nkv, S)), jnp.float32)

    cases = [
        ("dec_tiled", lambda i: decode_attention_layer_tiled(
            q, kb, vb, pos, lay, interpret=i)),
        ("dec_tiled_q8", lambda i: decode_attention_layer_tiled_q8(
            q, k8, v8, ks, vs, pos, lay, interpret=i)),
        ("dec_q8", lambda i: decode_attention_q8(
            q, k8[2], v8[2], ks[2], vs[2], pos, interpret=i)),
        ("dec_layer_q8", lambda i: decode_attention_layer_q8(
            q, k8, v8, ks, vs, pos, lay, interpret=i)),
        ("chunk_tiled", lambda i: chunk_attention_layer_tiled(
            qc, kb, vb, pos0, lay, interpret=i)),
        ("chunk_tiled_q8", lambda i: chunk_attention_layer_tiled_q8(
            qc, k8, v8, ks, vs, pos0, lay, interpret=i)),
        ("chunk_q8", lambda i: chunk_attention_layer_q8(
            qc, k8, v8, ks, vs, pos0, lay, interpret=i)),
    ]
    for name, fn in cases:
        check(f"{tag} {name}", fn(False), fn(True))

    P, PS, MP = 40, 128, 4
    kp8 = jnp.asarray(rng.integers(-127, 128, (L, P, nkv, PS, HD)), jnp.int8)
    vp8 = jnp.asarray(rng.integers(-127, 128, (L, P, nkv, PS, HD)), jnp.int8)
    ksp = jnp.asarray(rng.uniform(0.005, 0.02, (L, P, nkv, PS)), jnp.float32)
    vsp = jnp.asarray(rng.uniform(0.005, 0.02, (L, P, nkv, PS)), jnp.float32)
    kpb = jnp.asarray(rng.standard_normal((L, P, nkv, PS, HD)), jnp.bfloat16)
    vpb = jnp.asarray(rng.standard_normal((L, P, nkv, PS, HD)), jnp.bfloat16)
    tables = jnp.asarray(rng.permutation(P)[: B * MP].reshape(B, MP),
                         jnp.int32)
    posp = jnp.asarray(rng.integers(3, MP * PS - 1, (B,)), jnp.int32)
    pospc = jnp.asarray(rng.integers(3, MP * PS - T - 1, (B,)), jnp.int32)
    pcases = [
        ("paged", lambda i: paged_decode_attention_layer(
            q, kpb, vpb, posp, tables, lay, interpret=i)),
        ("paged_q8", lambda i: paged_decode_attention_layer_q8(
            q, kp8, vp8, ksp, vsp, posp, tables, lay, interpret=i)),
        ("paged_chunk", lambda i: paged_chunk_attention_layer(
            qc, kpb, vpb, pospc, tables, lay, interpret=i)),
        ("paged_chunk_q8", lambda i: paged_chunk_attention_layer_q8(
            qc, kp8, vp8, ksp, vsp, pospc, tables, lay, interpret=i)),
    ]
    for name, fn in pcases:
        check(f"{tag} {name}", fn(False), fn(True))


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    run(nh=32, nkv=32)   # MHA (llama-2-7B)
    run(nh=32, nkv=8)    # GQA rep=4 (llama-2-70B / mistral shape class)
    if FAILED:
        print("FAILED:", FAILED)
        raise SystemExit(1)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
