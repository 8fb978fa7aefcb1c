"""Perplexity harness tests: scoring math and the Δppl sweep machinery."""

import math

import numpy as np
import pytest
import jax.numpy as jnp

from biogpt_tpu.config import BioGptConfig
from biogpt_tpu.modelio.checkpoint import params_from_state_dict
from biogpt_tpu.modelio.synthetic import make_state_dict
from biogpt_tpu.quant import codecs
from biogpt_tpu.runtime.engine import Engine
from biogpt_tpu.tools.perplexity import perplexity_of_ids

TINY = BioGptConfig.tiny()


@pytest.fixture(scope="module")
def engines():
    sd = make_state_dict(TINY, seed=33)
    return {
        "f32": Engine(TINY, params_from_state_dict(sd, TINY),
                      compute_dtype=jnp.float32),
        "q4_0": Engine(TINY, params_from_state_dict(sd, TINY, qtype=codecs.GGML_TYPE_Q4_0),
                       compute_dtype=jnp.float32),
        "q8_0": Engine(TINY, params_from_state_dict(sd, TINY, qtype=codecs.GGML_TYPE_Q8_0),
                       compute_dtype=jnp.float32),
    }


def test_ppl_math_matches_manual(engines):
    ids = [2, 10, 25, 48, 7, 31, 5, 99]
    stats = perplexity_of_ids(engines["f32"], ids, window=len(ids))
    logits = engines["f32"].score(np.asarray([ids]))[0]
    logp = np.asarray(jnp.log(jnp.asarray(
        np.exp(logits - logits.max(-1, keepdims=True))
        / np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True))))
    nll = -np.mean([logp[i, ids[i + 1]] for i in range(len(ids) - 1)])
    assert stats["tokens"] == len(ids) - 1
    np.testing.assert_allclose(stats["nll"], nll, rtol=1e-4)
    np.testing.assert_allclose(stats["ppl"], math.exp(nll), rtol=1e-4)


def test_dppl_ordering(engines):
    """Q8_0 must be closer to f32 than Q4_0 (the Δppl sanity ordering)."""
    rng = np.random.RandomState(0)
    ids = [2] + rng.randint(4, TINY.n_vocab - 10, size=120).tolist()
    ppl = {k: perplexity_of_ids(e, ids, window=60)["ppl"]
           for k, e in engines.items()}
    d_q8 = abs(ppl["q8_0"] - ppl["f32"])
    d_q4 = abs(ppl["q4_0"] - ppl["f32"])
    assert d_q8 < d_q4, ppl
    # Q8_0 is a tight format: delta should be tiny in relative terms
    assert d_q8 / ppl["f32"] < 0.01, ppl


def test_windowing_covers_long_stream(engines):
    ids = [2] + list(np.random.RandomState(1).randint(4, 200, size=150))
    stats = perplexity_of_ids(engines["f32"], ids, window=64, stride=64)
    # ceil coverage: all but the first token of each window scored
    assert stats["tokens"] > 120
