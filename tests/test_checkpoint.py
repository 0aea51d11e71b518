"""Checkpoint format round-trips: v0 / v1 / v2 writers vs readers."""

import numpy as np
import pytest

from rama_tpu import checkpoint as ckpt
from rama_tpu.testing.ref_model import random_params, tiny_config


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config()
    return cfg, random_params(cfg, seed=3)


def assert_params_close(a, b, atol=0.0):
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=atol, rtol=0, err_msg=k)


def test_v0_roundtrip(tmp_path, model):
    cfg, params = model
    path = tmp_path / "m.bin"
    ckpt.save_v0(path, cfg, params)
    cfg2, params2 = ckpt.load_checkpoint(path)
    assert cfg2 == cfg
    assert ckpt.peek_version(path) == 0
    assert_params_close(params, params2)


def test_v0_unshared_classifier(tmp_path, model):
    cfg, params = model
    cfg = cfg.replace(shared_classifier=False)
    params = dict(params)
    rng = np.random.default_rng(9)
    params["wcls"] = rng.standard_normal((cfg.dim, cfg.vocab_size)).astype(np.float32)
    path = tmp_path / "m.bin"
    ckpt.save_v0(path, cfg, params)
    # negative vocab_size in the raw header encodes the unshared classifier
    raw = np.fromfile(path, dtype=np.int32, count=7)
    assert raw[5] == -cfg.vocab_size
    cfg2, params2 = ckpt.load_checkpoint(path)
    assert not cfg2.shared_classifier
    np.testing.assert_allclose(params2["wcls"], params["wcls"])


def test_v1_roundtrip(tmp_path, model):
    cfg, params = model
    path = tmp_path / "m1.bin"
    ckpt.save_v1(path, cfg, params)
    assert ckpt.peek_version(path) == 1
    cfg2, params2 = ckpt.load_checkpoint(path)
    assert cfg2 == cfg
    assert_params_close(params, params2)


def test_v2_roundtrip_quantized(tmp_path, model):
    cfg, params = model
    path = tmp_path / "m2.bin"
    max_err = ckpt.save_v2(path, cfg, params, group_size=16)
    assert ckpt.peek_version(path) == 2
    # export.py:254 expects O(~0.001) max group error for typical weights
    assert max_err < 0.01
    cfg2, params2 = ckpt.load_checkpoint(path)
    assert cfg2 == cfg
    for k in params:
        np.testing.assert_allclose(params2[k], params[k], atol=3e-3, err_msg=k)


def test_v2_quant_params_view(tmp_path, model):
    cfg, params = model
    path = tmp_path / "m2.bin"
    ckpt.save_v2(path, cfg, params, group_size=16)
    qp = ckpt.load_checkpoint_quantized(path)
    assert qp.group_size == 16
    assert qp.config == cfg
    # dequantizing the int8 view must match the fp32-dequantized loader
    _, dq = ckpt.load_checkpoint(path)
    q, s = qp.quant["w1"]  # file orientation: (L, hidden, dim), (L, hidden, dim//16)
    assert q.shape == (cfg.n_layers, cfg.hidden_dim, cfg.dim)
    assert s.shape == (cfg.n_layers, cfg.hidden_dim, cfg.dim // 16)
    w = q.astype(np.float32).reshape(*s.shape, 16) * s[..., None]
    w = w.reshape(q.shape)
    np.testing.assert_allclose(w.transpose(0, 2, 1), dq["w1"], rtol=0, atol=0)


def _write_reference_v2(path, cfg, params, group_size):
    """Independent re-implementation of the reference's v2 serialization
    (export.py:182-260): per-layer weight matrices in file orientation
    (out, in), each immediately followed by its own fp32 scales — NOT one
    int8 block per stacked tensor. Written here from the reference's spec so
    the repo's readers are cross-checked against the actual byte layout, not
    just against save_v2."""
    import struct

    def file_orient(name):
        w = params[name]
        if w.ndim == 3:
            return w.transpose(0, 2, 1)  # canonical (L,in,out)->(L,out,in)
        if name in ("tok_embedding",):
            return w
        return w.T

    with open(path, "wb") as f:
        f.write(struct.pack("<I", 0x616B3432))
        f.write(struct.pack("<i", 2))
        f.write(struct.pack("<7i", cfg.dim, cfg.hidden_dim, cfg.n_layers,
                            cfg.n_heads, cfg.n_kv_heads, cfg.vocab_size,
                            cfg.seq_len))
        f.write(struct.pack("<B", int(cfg.shared_classifier)))
        f.write(struct.pack("<i", group_size))
        f.write(b"\0" * (256 - f.tell()))
        for name in ("attn_norm", "ffn_norm", "final_norm"):
            np.ascontiguousarray(params[name], dtype="<f4").tofile(f)
        # the reference's flat weights list: one entry per layer matrix
        entries = [file_orient("tok_embedding")]
        for name in ("wq", "wk", "wv", "wo", "w1", "w2", "w3"):
            entries.extend(file_orient(name))  # L separate matrices
        if not cfg.shared_classifier:
            entries.append(file_orient("wcls"))
        for w in entries:
            flat = np.ascontiguousarray(w, dtype=np.float32).reshape(-1, group_size)
            s = (np.abs(flat).max(axis=1) / 127.0).astype(np.float32)
            s = np.where(s == 0, 1e-10, s)
            q = np.round(flat / s[:, None]).astype(np.int8)
            q.reshape(-1).tofile(f)
            np.ascontiguousarray(s, dtype="<f4").tofile(f)


def test_v2_reference_byte_layout_cross_compat(tmp_path, model):
    """Reference-exported multi-layer v2 files interleave q/scales per layer;
    both loaders must parse that layout (round-1 bug: stacked-block reads)."""
    cfg, params = model
    assert cfg.n_layers >= 2, "needs multiple layers to expose interleaving"
    path = tmp_path / "ref_layout.bin"
    _write_reference_v2(path, cfg, params, group_size=16)

    cfg2, dq = ckpt.load_checkpoint(path)
    assert cfg2 == cfg
    for k in params:
        np.testing.assert_allclose(dq[k], params[k], atol=3e-3, err_msg=k)

    qp = ckpt.load_checkpoint_quantized(path)
    q, s = qp.quant["w1"]
    w = q.astype(np.float32).reshape(*s.shape, 16) * s[..., None]
    np.testing.assert_allclose(
        w.reshape(q.shape).transpose(0, 2, 1), params["w1"], atol=3e-3)

    # and save_v2 must emit the same interleaved layout byte-for-byte
    path2 = tmp_path / "ours.bin"
    ckpt.save_v2(path2, cfg, params, group_size=16)
    assert path.read_bytes() == path2.read_bytes()


def test_quantize_q80_exact_for_small_ints():
    w = np.arange(-64, 64, dtype=np.float32).reshape(2, 64)
    q, s, err = ckpt.quantize_q80(w, 64)
    assert err < 0.26  # absmax 64 -> scale ~0.5 -> max rounding err ~0.25
    deq = ckpt.dequantize_q80(q, s, 64).reshape(w.shape)
    np.testing.assert_allclose(deq, w, atol=0.26)


def test_gqa_shapes(tmp_path):
    cfg = tiny_config(n_kv_heads=2)
    params = random_params(cfg, seed=1)
    assert params["wk"].shape == (cfg.n_layers, cfg.dim, cfg.kv_dim)
    path = tmp_path / "gqa.bin"
    ckpt.save_v0(path, cfg, params)
    cfg2, params2 = ckpt.load_checkpoint(path)
    assert cfg2.n_kv_heads == 2
    np.testing.assert_allclose(params2["wk"], params["wk"])


def test_compute_freqs_matches_file_layout():
    cfg = tiny_config()
    cos, sin = ckpt.compute_freqs(cfg)
    assert cos.shape == (cfg.seq_len, cfg.head_dim // 2)
    # position 0 rotates nothing
    np.testing.assert_allclose(cos[0], np.ones(cfg.head_dim // 2))
    np.testing.assert_allclose(sin[0], np.zeros(cfg.head_dim // 2))
    # frequency 0 at position t has angle t
    np.testing.assert_allclose(cos[3, 0], np.cos(3.0), rtol=1e-6)
