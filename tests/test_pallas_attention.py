"""Fused decode-attention kernel vs the XLA attention path (interpret)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from biogpt_tpu.ops.pallas_attention import decode_attention


def _reference(q, k, v, past):
    """Plain numpy attention over slots 0..past (inclusive)."""
    B, _, H, Dk = q.shape
    W = k.shape[1]
    out = np.zeros((B, 1, H, Dk), np.float32)
    for b in range(B):
        for h in range(H):
            s = (q[b, 0, h].astype(np.float32) @
                 k[b, :, h].astype(np.float32).T)          # (W,)
            s[past[b] + 1:] = -np.inf
            e = np.exp(s - s.max())
            p = e / e.sum()
            out[b, 0, h] = p @ v[b, :, h].astype(np.float32)
    return out


@pytest.mark.parametrize("B,past_vals", [(1, [5]), (3, [0, 7, 14])])
def test_fused_matches_reference(B, past_vals):
    rng = np.random.RandomState(0)
    H, Dk, W = 4, 64, 16
    q = rng.randn(B, 1, H, Dk).astype(np.float32)
    k = rng.randn(B, W, H, Dk).astype(np.float32)
    v = rng.randn(B, W, H, Dk).astype(np.float32)
    kb = jnp.asarray(k, jnp.bfloat16)
    vb = jnp.asarray(v, jnp.bfloat16)
    past = np.asarray(past_vals, np.int32)

    got = np.asarray(decode_attention(jnp.asarray(q), kb, vb,
                                      jnp.asarray(past), interpret=True))
    expect = _reference(q, np.asarray(kb.astype(jnp.float32)),
                        np.asarray(vb.astype(jnp.float32)), past)
    np.testing.assert_allclose(got, expect, rtol=3e-2, atol=3e-2)


def test_engine_uses_fused_attention_consistently():
    """bf16-cache engine (fused attention on the forced-pallas path) decodes
    the same tokens as the fp16-cache XLA path."""
    from biogpt_tpu.config import BioGptConfig, GenerationParams
    from biogpt_tpu.modelio.checkpoint import params_from_state_dict
    from biogpt_tpu.modelio.synthetic import make_state_dict
    from biogpt_tpu.quant import codecs
    from biogpt_tpu.runtime.engine import Engine
    from biogpt_tpu.ops import qmatmul

    config = BioGptConfig.tiny(d_model=128, d_ff=256, n_vocab=256)
    sd = make_state_dict(config, seed=9)
    params = params_from_state_dict(sd, config, qtype=codecs.GGML_TYPE_Q4_0)

    gen = GenerationParams(n_predict=6, temp=0.0, stop_at_eos=False)
    ref = Engine(config, params, compute_dtype=jnp.float32,
                 pack_q4=False).generate([2, 5, 9], gen)

    from biogpt_tpu.ops import pallas_attention
    qmatmul.set_pallas_mode(True)  # force pallas (interpret) on CPU
    pallas_attention.ENABLED = True
    try:
        fast = Engine(config, params, pack_q4=True).generate([2, 5, 9], gen)
    finally:
        qmatmul.set_pallas_mode("auto")
        pallas_attention.ENABLED = False
    assert fast.ids == ref.ids, (fast.ids, ref.ids)
