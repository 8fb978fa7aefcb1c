"""Sampler math tests vs a scalar transliteration of the reference sampler
(biogpt.cpp:908-980)."""

import numpy as np
import jax
import jax.numpy as jnp

from biogpt_tpu.runtime.sampling import greedy, sample_top_k_top_p, top_k_top_p_probs


def ref_probs(logits, top_k, top_p, temp):
    """Scalar reference: temp scale -> top-k -> softmax -> top-p cut+renorm."""
    scaled = [(l / temp, i) for i, l in enumerate(logits)]
    scaled.sort(key=lambda t: -t[0])
    scaled = scaled[:top_k]
    maxl = max(s for s, _ in scaled)
    exps = [np.exp(s - maxl) for s, _ in scaled]
    total = sum(exps)
    probs = [e / total for e in exps]
    if top_p < 1.0:
        cumsum = 0.0
        for i, p in enumerate(probs):
            cumsum += p
            if cumsum >= top_p:
                probs = probs[: i + 1]
                scaled = scaled[: i + 1]
                break
        probs = [p / cumsum for p in probs]
    return {scaled[i][1]: probs[i] for i in range(len(probs))}


def test_probs_match_reference_math():
    rng = np.random.RandomState(0)
    logits = rng.randn(100).astype(np.float32) * 3
    for top_k, top_p, temp in [(40, 0.9, 0.9), (10, 0.5, 1.3), (100, 1.0, 0.7)]:
        expect = ref_probs(logits.tolist(), top_k, top_p, temp)
        probs, ids = top_k_top_p_probs(jnp.asarray(logits)[None], top_k, top_p, temp)
        probs, ids = np.asarray(probs)[0], np.asarray(ids)[0]
        got = {int(i): float(p) for i, p in zip(ids, probs) if p > 0}
        assert set(got) == set(expect)
        for i in expect:
            np.testing.assert_allclose(got[i], expect[i], rtol=1e-4, atol=1e-6)


def test_greedy():
    logits = jnp.asarray(np.array([[0.1, 3.0, -2.0], [5.0, 1.0, 4.9]], np.float32))
    assert greedy(logits).tolist() == [1, 0]


def test_sampling_respects_top_k_support():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(1, 50).astype(np.float32))
    top3 = set(np.asarray(jax.lax.top_k(logits, 3)[1])[0].tolist())
    key = jax.random.PRNGKey(0)
    for i in range(20):
        key, sub = jax.random.split(key)
        tok = int(sample_top_k_top_p(sub, logits, top_k=3, top_p=1.0, temp=1.0)[0])
        assert tok in top3


def test_sampling_deterministic_given_key():
    logits = jnp.asarray(np.random.RandomState(2).randn(1, 64).astype(np.float32))
    k = jax.random.PRNGKey(7)
    a = int(sample_top_k_top_p(k, logits)[0])
    b = int(sample_top_k_top_p(k, logits)[0])
    assert a == b


def test_low_temp_concentrates():
    logits = jnp.asarray(np.random.RandomState(3).randn(1, 64).astype(np.float32))
    best = int(greedy(logits)[0])
    key = jax.random.PRNGKey(0)
    toks = set()
    for _ in range(10):
        key, sub = jax.random.split(key)
        toks.add(int(sample_top_k_top_p(sub, logits, top_k=40, top_p=0.9, temp=0.01)[0]))
    assert toks == {best}


def test_topk_2stage_exact_vs_lax(monkeypatch):
    """Grouped two-stage top-k == lax.top_k exactly, including the
    index-stable tie-breaking, at wide (vocab-like) and padded widths.
    (Direct lax.top_k is the default since round 4 — this forces the
    BIOGPT_TOPK=grouped path so it stays correct for re-measurement.)"""
    from biogpt_tpu.runtime.sampling import topk_2stage

    monkeypatch.setenv("BIOGPT_TOPK", "grouped")
    rng = np.random.RandomState(0)
    for B, V, k in [(4, 42384, 64), (2, 8192, 40), (3, 42384, 1),
                    (1, 5000, 8)]:
        x = rng.randn(B, V).astype(np.float32)
        # heavy ties: quantize to few levels so tie-breaking is exercised
        x_tied = np.round(x * 2) / 2
        for arr in (x, x_tied):
            xa = jnp.asarray(arr)
            v_ref, i_ref = jax.lax.top_k(xa, k)
            v_got, i_got = topk_2stage(xa, k)
            np.testing.assert_array_equal(np.asarray(v_got),
                                          np.asarray(v_ref))
            np.testing.assert_array_equal(np.asarray(i_got),
                                          np.asarray(i_ref))


def test_per_request_greedy_rows_match_argmax():
    """temp <= 0 rows of the batched sampler return the exact argmax (the
    fallback now reuses top_ids[:, 0] instead of a second full argmax)."""
    from biogpt_tpu.runtime.sampling import sample_per_request

    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(5, 42384).astype(np.float32))
    out = sample_per_request(
        jax.random.PRNGKey(0), logits,
        top_k=jnp.asarray([40, 1, 40, 5, 40], jnp.int32),
        top_p=jnp.full((5,), 0.9, jnp.float32),
        temp=jnp.asarray([0.0, 0.8, -1.0, 0.7, 0.0], jnp.float32))
    am = np.asarray(greedy(logits))
    got = np.asarray(out)
    for row in (0, 2, 4):
        assert got[row] == am[row]
