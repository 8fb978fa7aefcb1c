"""Prefill megakernel vs the per-op oracle (interpret mode).

The fresh-cache prompt forward (ops/pallas_prefill.py) must reproduce
forward(causal, past=0) for every refill shape: same last-token logits
winners, same cache rows for the REAL (non-pad) positions, int8 cache
contract preserved.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from biogpt_tpu.config import BioGptConfig
from biogpt_tpu.modelio.checkpoint import params_from_state_dict
from biogpt_tpu.modelio.synthetic import make_state_dict
from biogpt_tpu.models.biogpt import forward, forward_prefill_fused
from biogpt_tpu.ops.pallas_prefill import supports_prefill
from biogpt_tpu.quant import codecs
from biogpt_tpu.runtime.cache import init_cache
from biogpt_tpu.runtime.engine import _pack_matmul_weights

CFG = BioGptConfig.tiny(d_model=128, d_ff=256, n_head=2, n_layer=3,
                        n_vocab=256, n_positions=64)


def _packed_params(qtype, seed=0):
    sd = make_state_dict(CFG, seed=seed)
    params = params_from_state_dict(sd, CFG, qtype=qtype)
    return _pack_matmul_weights(params)


def _pair(qtype, lens, padded, seed=0):
    """Run oracle and kernel over the same padded prompt batch."""
    params = _packed_params(qtype, seed=seed)
    rng = np.random.RandomState(seed + 5)
    R = len(lens)
    ids = np.zeros((R, padded), dtype=np.int32)
    last = np.zeros((R,), dtype=np.int32)
    for r, n in enumerate(lens):
        ids[r, :n] = rng.randint(3, CFG.n_vocab, size=n)
        last[r] = n - 1

    cache_o = init_cache(CFG, batch=R, max_len=padded, dtype=jnp.bfloat16)
    logits_o, cache_o = forward(
        params, jnp.asarray(ids), cache_o, jnp.int32(0), CFG,
        compute_dtype=jnp.bfloat16, causal=True, logits_mode="last",
        allow_pallas=False, last_index=jnp.asarray(last))
    logits_f, cache_f = forward_prefill_fused(
        params, jnp.asarray(ids), CFG, jnp.asarray(last),
        compute_dtype=jnp.bfloat16, cache_dtype=jnp.bfloat16,
        interpret=True)
    return (np.asarray(logits_o, np.float32),
            np.asarray(logits_f, np.float32), cache_o, cache_f, lens)


@pytest.mark.parametrize("lens,padded", [
    ([5], 8),                      # 1-row tiny refill
    ([3, 8, 6, 2], 8),             # full small wave
    ([13, 4], 16),                 # ragged within a bucket
    ([30], 32),                    # single longer prompt
    ([3, 8, 6, 2, 5, 7, 4, 1], 8),  # 8-row wave (extended-cap row count)
])
def test_prefill_kernel_matches_oracle(lens, padded):
    logits_o, logits_f, cache_o, cache_f, lens = _pair(
        codecs.GGML_TYPE_Q4_0, lens, padded)
    assert (logits_o.argmax(-1) == logits_f.argmax(-1)).all()
    np.testing.assert_allclose(logits_f, logits_o, rtol=5e-2, atol=0.35)
    for r, n in enumerate(lens):
        np.testing.assert_allclose(
            np.asarray(cache_f.k, np.float32)[:, r, :n],
            np.asarray(cache_o.k, np.float32)[:, r, :n],
            rtol=2e-2, atol=0.1)
        np.testing.assert_allclose(
            np.asarray(cache_f.v, np.float32)[:, r, :n],
            np.asarray(cache_o.v, np.float32)[:, r, :n],
            rtol=2e-2, atol=0.1)


def test_prefill_kernel_mins_format():
    logits_o, logits_f, *_ = _pair(codecs.GGML_TYPE_Q4_1, [7, 3], 8)
    assert (logits_o.argmax(-1) == logits_f.argmax(-1)).all()
    np.testing.assert_allclose(logits_f, logits_o, rtol=5e-2, atol=0.35)


def test_prefill_kernel_int8_cache():
    """int8 cache_dtype: quantize_rows contract on the kernel's rows."""
    params = _packed_params(codecs.GGML_TYPE_Q4_0)
    rng = np.random.RandomState(11)
    ids = rng.randint(3, CFG.n_vocab, size=(2, 8)).astype(np.int32)
    last = np.asarray([7, 7], np.int32)
    logits, small = forward_prefill_fused(
        params, jnp.asarray(ids), CFG, jnp.asarray(last),
        cache_dtype=jnp.int8, interpret=True)
    from biogpt_tpu.runtime.cache import QuantKVCache
    assert isinstance(small, QuantKVCache)
    assert small.k.dtype == jnp.int8 and small.ks.shape == (3, 2, 1, 8)
    # dequantized rows approximate the bf16 kernel's rows
    _, small_b = forward_prefill_fused(
        params, jnp.asarray(ids), CFG, jnp.asarray(last),
        cache_dtype=jnp.bfloat16, interpret=True)
    deq = (np.asarray(small.k, np.float32)
           * np.asarray(small.ks, np.float32).transpose(0, 1, 3, 2))
    np.testing.assert_allclose(deq, np.asarray(small_b.k, np.float32),
                               rtol=2e-2, atol=0.1)


def test_supports_prefill_gate():
    layers = _packed_params(codecs.GGML_TYPE_Q4_0)["layers"]
    assert supports_prefill(layers, 4, 128, 1024)
    assert supports_prefill(layers, 1, 512, 1024)
    # short-padded shapes (T <= 128) afford RT up to 1024: the uniform
    # 32-slot refill wave and 8-row medium-prompt refills
    assert supports_prefill(layers, 8, 128, 1024)
    assert supports_prefill(layers, 32, 32, 1024)
    assert not supports_prefill(layers, 16, 128, 1024)  # RT > 1024
    assert not supports_prefill(layers, 4, 256, 1024)   # long T: cap 512
    assert not supports_prefill(layers, 2, 512, 1024)   # long T: cap 512
    assert not supports_prefill(layers, 2, 12, 1024)    # padded % 8
    assert not supports_prefill(layers, 2, 16, 1000)    # d_model % 128


def test_serving_refill_uses_prefill_kernel_when_enabled():
    """Forcing the gate on (it defaults off under interpret) routes small
    refills through the kernel and still serves correctly end to end."""
    from biogpt_tpu.config import GenerationParams
    from biogpt_tpu.ops.qmatmul import set_pallas_mode
    from biogpt_tpu.runtime.serving import BatchedEngine, Request

    sd = make_state_dict(CFG, seed=9)
    params = params_from_state_dict(sd, CFG, qtype=codecs.GGML_TYPE_Q4_0)
    rng = np.random.RandomState(1)
    prompts = [[2] + rng.randint(3, CFG.n_vocab, size=n).tolist()
               for n in (4, 9, 3, 6, 5)]
    reqs = [Request(prompt_ids=p, n_predict=3, request_id=i)
            for i, p in enumerate(prompts)]
    be = BatchedEngine(CFG, params, max_batch=4, chunk=2,
                       compute_dtype=jnp.bfloat16, max_seq=32)
    be._prefill_fused = True   # interpret-mode override for coverage
    try:
        set_pallas_mode(True)
        res = be.serve(reqs, GenerationParams(temp=0.0,
                                              stop_at_eos=False))
    finally:
        set_pallas_mode("auto")
    for i, p in enumerate(prompts):
        assert len(res[i].new_ids) == 3
        assert all(0 <= t < CFG.n_vocab for t in res[i].new_ids)
