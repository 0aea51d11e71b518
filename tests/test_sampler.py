"""Sampler semantics vs a numpy re-implementation of the reference sample_top_q."""

import jax
import jax.numpy as jnp
import numpy as np

from rama_tpu.runtime.sampler import sample_greedy, sample_top_p


def ref_sample_top_q(probs, topp, r):
    """Direct transcription of infer.rs:55-85 semantics with injected r in [0,1)."""
    n = len(probs)
    cutoff = (1.0 - topp) / (n - 1)
    idx = [i for i, p in enumerate(probs) if p > cutoff]
    idx.sort(key=lambda i: -probs[i])
    cum, last = 0.0, len(idx) - 1
    for j, i in enumerate(idx):
        cum += probs[i]
        if cum > topp:
            last = j
            break
    cum_prob = sum(probs[i] for i in idx[: last + 1])
    rr = r * cum_prob
    cdf = 0.0
    for j in range(last):
        cdf += probs[idx[j]]
        if rr < cdf:
            return idx[j]
    return idx[last]


def jax_pick_with_r(probs, topp, r):
    """Drive sample_top_p's selection with a fixed uniform draw r."""
    v = probs.shape[-1]
    sp = np.sort(probs)[::-1]
    si = np.argsort(-probs)
    cutoff = (1.0 - topp) / (v - 1)
    keep = sp > cutoff
    spk = np.where(keep, sp, 0.0)
    csum = np.cumsum(spk)
    over = csum > topp
    n_kept = max(keep.sum(), 1)
    last = int(np.argmax(over)) if over.any() else n_kept - 1
    rr = r * csum[last]
    cand = (rr < csum) & (np.arange(v) <= last) & keep
    pick = int(np.argmax(cand)) if cand.any() else last
    return int(si[pick])


def test_selection_logic_matches_reference(rng):
    for _ in range(200):
        v = rng.integers(5, 40)
        probs = rng.dirichlet(np.ones(v) * rng.uniform(0.1, 3.0))
        topp = rng.uniform(0.3, 0.99)
        r = rng.uniform(0, 1)
        assert jax_pick_with_r(probs, topp, r) == ref_sample_top_q(probs, topp, r)


def test_greedy():
    logits = jnp.asarray([[0.1, 5.0, -2.0], [3.0, 0.0, 1.0]])
    np.testing.assert_array_equal(np.asarray(sample_greedy(logits)), [1, 0])


def test_top_p_one_hot():
    """A near-delta distribution must always return its mode."""
    logits = jnp.asarray([[0.0, 50.0, 0.0, 0.0]])
    for s in range(10):
        t = sample_top_p(logits, jax.random.PRNGKey(s), 0.9, 0.9)
        assert int(t[0]) == 1


def test_top_p_restricts_tail():
    """With top_p small, low-probability tokens must never be drawn."""
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.1, 0.05, 0.05]]))
    seen = set()
    for s in range(50):
        seen.add(int(sample_top_p(logits, jax.random.PRNGKey(s), 1.0, 0.5)[0]))
    assert seen <= {0, 1}


def test_temperature_above_one_not_scaled():
    """Reference quirk (cpu.rs:170-172): T>1 does NOT flatten the distribution."""
    logits = jnp.asarray([[0.0, 10.0, 0.0, 0.0]])
    picks = {int(sample_top_p(logits, jax.random.PRNGKey(s), 5.0, 0.99)[0])
             for s in range(20)}
    assert picks == {1}


def test_batched_shapes():
    logits = jnp.zeros((4, 32))
    out = sample_top_p(logits, jax.random.PRNGKey(0), 0.9, 0.9)
    assert out.shape == (4,)
    assert out.dtype == jnp.int32


def test_topk_prefilter_bit_identical_to_full_sort(rng):
    """The TOPK_CAP prefilter path must pick the exact token the full-sort
    path picks, for peaked (capped branch) AND flat (fallback branch)
    distributions at a large vocab."""
    import numpy as np

    from rama_tpu.runtime.sampler import _nucleus_walk, _top_p_from_u

    v, b = 8192, 8

    def full_sort_reference(logits, u, temp, tp_):
        logits = jnp.asarray(logits, jnp.float32)
        tp = jnp.full((b, 1), tp_, jnp.float32)
        scale = 1.0 / temp if temp < 1.0 else 1.0
        probs = jax.nn.softmax(logits * scale, axis=-1)
        nsp, si = jax.lax.sort_key_val(
            -probs, jnp.broadcast_to(jnp.arange(v, dtype=jnp.int32),
                                     probs.shape), dimension=-1)
        return _nucleus_walk(-nsp, si, jnp.asarray(u, jnp.float32), tp,
                             (1.0 - tp) / (v - 1))

    for case, scale in (("peaked", 8.0), ("flat", 0.05)):
        logits = rng.standard_normal((b, v)).astype(np.float32) * scale
        for seed in range(5):
            u = np.random.default_rng(seed).uniform(size=b)
            got = _top_p_from_u(jnp.asarray(logits), jnp.asarray(u, jnp.float32),
                                0.9, 0.9)
            want = full_sort_reference(logits, u, 0.9, 0.9)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                          err_msg=case)
