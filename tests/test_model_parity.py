"""Model forward parity vs HF torch BioGptForCausalLM (the ground truth the
reference was manually validated against) plus KV-cache consistency checks.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from biogpt_tpu.config import BioGptConfig
from biogpt_tpu.modelio.checkpoint import params_from_state_dict
from biogpt_tpu.quant import codecs
from biogpt_tpu.runtime.engine import Engine

TINY = BioGptConfig.tiny()


@pytest.fixture(scope="module")
def hf_model_and_state():
    torch = pytest.importorskip("torch")
    from transformers import BioGptConfig as HFConfig
    from transformers import BioGptForCausalLM

    hf_config = HFConfig(
        vocab_size=TINY.n_vocab,
        hidden_size=TINY.d_model,
        num_hidden_layers=TINY.n_layer,
        num_attention_heads=TINY.n_head,
        intermediate_size=TINY.d_ff,
        max_position_embeddings=TINY.n_positions,
        scale_embedding=True,
        activation_function="gelu",
    )
    torch.manual_seed(0)
    model = BioGptForCausalLM(hf_config).eval()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return model, state


def _our_params(state, qtype=None):
    return params_from_state_dict(state, TINY, qtype=qtype)


def _hf_logits(model, ids):
    import torch

    with torch.no_grad():
        out = model(input_ids=torch.tensor(ids, dtype=torch.long))
    return out.logits.numpy()


def test_fp32_logits_match_hf(hf_model_and_state):
    model, state = hf_model_and_state
    ids = np.array([[2, 10, 25, 48, 7, 31, 5, 99]], dtype=np.int32)
    hf = _hf_logits(model, ids)

    engine = Engine(TINY, _our_params(state), compute_dtype=jnp.float32,
                    cache_dtype=jnp.float32)
    ours = engine.score(ids)
    np.testing.assert_allclose(ours, hf, rtol=2e-4, atol=2e-4)


def test_fp32_decode_matches_prefill(hf_model_and_state):
    """Token-by-token decode through the fp16 KV cache must agree with a
    single full-sequence pass."""
    _, state = hf_model_and_state
    ids = [2, 10, 25, 48, 7, 31, 5, 99, 3, 17]
    engine = Engine(TINY, _our_params(state), compute_dtype=jnp.float32)

    full = engine.score(np.array([ids]))[0]  # (N, V)

    cache = engine.new_cache()
    logits, cache, past = engine.prefill(cache, ids[:4])
    step_logits = [np.asarray(logits)[0]]
    for t in ids[4:]:
        logits, cache = engine.decode_step(cache, t, past)
        past += 1
        step_logits.append(np.asarray(logits)[0])
    # step_logits[i] is the distribution after consuming ids[:4+i]
    for i, sl in enumerate(step_logits):
        np.testing.assert_allclose(sl, full[3 + i], rtol=3e-3, atol=3e-3)


def test_greedy_continuation_matches_hf(hf_model_and_state):
    model, state = hf_model_and_state
    import torch

    prompt = [2, 10, 25, 48, 7]
    with torch.no_grad():
        hf_out = model.generate(
            torch.tensor([prompt], dtype=torch.long),
            max_new_tokens=12, do_sample=False, num_beams=1,
            pad_token_id=3,
        )[0].tolist()

    engine = Engine(TINY, _our_params(state), compute_dtype=jnp.float32)
    from biogpt_tpu.config import GenerationParams

    res = engine.generate(prompt, GenerationParams(
        n_predict=12, temp=0.0, seed=1, stop_at_eos=False))
    assert res.ids[:len(hf_out)] == hf_out


def test_padded_prefill_matches_exact(hf_model_and_state):
    """Prompt lengths that hit padding must produce the same last-token
    logits as the unpadded sequence (garbage slots never read)."""
    _, state = hf_model_and_state
    engine = Engine(TINY, _our_params(state), compute_dtype=jnp.float32)
    ids = [2, 10, 25, 48, 7, 31, 5]   # length 7 -> bucket 8

    full = engine.score(np.array([ids]))[0][-1]
    cache = engine.new_cache()
    logits, _, _ = engine.prefill(cache, ids)
    np.testing.assert_allclose(np.asarray(logits)[0], full, rtol=3e-4, atol=3e-4)


def test_bf16_close_to_fp32(hf_model_and_state):
    _, state = hf_model_and_state
    ids = np.array([[2, 10, 25, 48, 7, 31]], dtype=np.int32)
    e32 = Engine(TINY, _our_params(state), compute_dtype=jnp.float32)
    e16 = Engine(TINY, _our_params(state), compute_dtype=jnp.bfloat16)
    l32 = e32.score(ids)
    l16 = e16.score(ids)
    # bf16 matmuls: loose tolerance, but the argmax should agree
    assert np.abs(l32 - l16).max() < 0.15
    np.testing.assert_array_equal(l32.argmax(-1), l16.argmax(-1))


@pytest.mark.parametrize("qtype", [codecs.GGML_TYPE_Q8_0, codecs.GGML_TYPE_Q4_0,
                                   codecs.GGML_TYPE_Q5_1])
def test_quantized_forward_runs_and_tracks_fp32(hf_model_and_state, qtype):
    """Quantized logits should be close to fp32 logits (tiny weights, so
    quantization error is small relative to logit scale)."""
    _, state = hf_model_and_state
    ids = np.array([[2, 10, 25, 48, 7, 31]], dtype=np.int32)
    e32 = Engine(TINY, _our_params(state), compute_dtype=jnp.float32)
    eq = Engine(TINY, _our_params(state, qtype=qtype), compute_dtype=jnp.float32)
    l32 = e32.score(ids)
    lq = eq.score(ids)
    assert lq.shape == l32.shape
    assert np.isfinite(lq).all()
    # correlation between logit vectors stays high under quantization
    a, b = l32[0, -1], lq[0, -1]
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.98, f"corr {corr}"


def test_quantized_matmul_matches_dense_dequant(hf_model_and_state):
    """The block-accumulated quantized matmul must equal dequantize-then-
    matmul to float tolerance."""
    from biogpt_tpu.ops import matmul, dequantize
    from biogpt_tpu.quant.layouts import quantize_to_planes

    rng = np.random.RandomState(0)
    w = rng.randn(96, 64).astype(np.float32)   # (d_out, d_in)
    x = rng.randn(4, 64).astype(np.float32)
    for qtype in [codecs.GGML_TYPE_Q4_0, codecs.GGML_TYPE_Q4_1,
                  codecs.GGML_TYPE_Q5_0, codecs.GGML_TYPE_Q5_1,
                  codecs.GGML_TYPE_Q8_0]:
        qt = quantize_to_planes(w, qtype)
        got = np.asarray(matmul(jnp.asarray(x), qt))
        expect = x @ np.asarray(dequantize(qt))
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_nomask_compat_mode(hf_model_and_state):
    """causal=False reproduces the reference's unmasked prefill (Q1): early
    positions see the future, and (with >1 layer) that corruption propagates
    into deep-layer KV, so even last-token logits shift — exactly the
    reference behavior SURVEY §8 Q1 documents. Single-token decode is
    unaffected (inherently causal)."""
    _, state = hf_model_and_state
    ids = np.array([[2, 10, 25, 48, 7, 31]], dtype=np.int32)
    ec = Engine(TINY, _our_params(state), compute_dtype=jnp.float32)
    en = Engine(TINY, _our_params(state), compute_dtype=jnp.float32, causal=False)
    lc = ec.score(ids)
    ln = en.score(ids)
    assert np.isfinite(ln).all()
    assert np.abs(lc[0, 0] - ln[0, 0]).max() > 1e-3  # early rows corrupted

    # decode of a single token is causal either way: prefill 1 token then
    # decode — the two modes agree exactly
    c1 = en.new_cache()
    l1, c1, _ = en.prefill(c1, ids[0, :1])
    c2 = ec.new_cache()
    l2, c2, _ = ec.prefill(c2, ids[0, :1])
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)


def test_eos_stops_mid_chunk(hf_model_and_state):
    """Greedy generation must stop at the first EOS even when it lands in
    the middle of a speculative decode chunk."""
    _, state = hf_model_and_state
    engine = Engine(TINY, _our_params(state), compute_dtype=jnp.float32)
    from biogpt_tpu.config import GenerationParams

    probe = engine.generate([2, 10, 25], GenerationParams(
        n_predict=6, temp=0.0, stop_at_eos=False))
    eos = probe.new_ids[2]  # declare the 3rd generated token as "EOS"
    first_occurrence = probe.new_ids.index(eos)  # may repeat earlier
    res = engine.generate([2, 10, 25], GenerationParams(
        n_predict=40, temp=0.0, stop_at_eos=True, eos_token_id=eos))
    assert res.new_ids[-1] == eos
    assert len(res.new_ids) == first_occurrence + 1
    assert res.new_ids == probe.new_ids[:first_occurrence + 1]


def test_engine_warmup(hf_model_and_state):
    _, state = hf_model_and_state
    engine = Engine(TINY, _our_params(state), compute_dtype=jnp.float32)
    engine.warmup(prompt_len=4, n_tokens=2)
