"""int8 KV cache: quantization round-trip, per-op parity, megakernel parity,
engine/serving integration. The technique follows the int8-KV literature
(per-row absmax scales — see PAPERS.md); correctness bar: close to the
bf16-KV reference, IDENTICAL between this repo's own int8 paths.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from biogpt_tpu.config import BioGptConfig, GenerationParams
from biogpt_tpu.modelio.checkpoint import params_from_state_dict
from biogpt_tpu.modelio.synthetic import make_state_dict
from biogpt_tpu.models.biogpt import forward, forward_fused_decode
from biogpt_tpu.quant import codecs
from biogpt_tpu.runtime.cache import (QuantKVCache, dequant_layer,
                                      init_cache, quantize_rows,
                                      update_layer)
from biogpt_tpu.runtime.engine import Engine, _pack_matmul_weights

CFG = BioGptConfig.tiny(d_model=128, d_ff=256, n_head=2, n_layer=3,
                        n_vocab=256, n_positions=64)


def test_quantize_rows_roundtrip():
    rng = np.random.RandomState(0)
    x = (rng.randn(4, 7, 32) * rng.uniform(0.01, 5.0, (4, 7, 1))).astype(
        np.float32)
    q, s = quantize_rows(jnp.asarray(x))
    back = np.asarray(q, np.float32) * np.asarray(s)[..., None]
    # absmax/127 per row: error bounded by half a level
    np.testing.assert_allclose(back, x, atol=float(np.abs(x).max()) / 127)
    assert np.asarray(q).dtype == np.int8
    assert int(np.abs(np.asarray(q)).max()) == 127


def test_update_layer_quant_scalar_and_vector_offsets():
    cache = init_cache(CFG, batch=2, max_len=16, dtype=jnp.int8)
    assert isinstance(cache, QuantKVCache)
    rng = np.random.RandomState(1)
    k = jnp.asarray(rng.randn(2, 3, CFG.d_model), jnp.float32)
    v = jnp.asarray(rng.randn(2, 3, CFG.d_model), jnp.float32)
    cache = update_layer(cache, 1, k, v, jnp.int32(4))
    kd, vd = dequant_layer(cache, 1, 16, jnp.float32)
    np.testing.assert_allclose(np.asarray(kd[:, 4:7]), np.asarray(k),
                               rtol=0.02, atol=0.05)
    np.testing.assert_allclose(np.asarray(vd[:, 4:7]), np.asarray(v),
                               rtol=0.02, atol=0.05)
    # per-slot offsets
    cache2 = update_layer(init_cache(CFG, batch=2, max_len=16,
                                     dtype=jnp.int8),
                          0, k[:, :1], v[:, :1], jnp.asarray([2, 9]))
    kd2, _ = dequant_layer(cache2, 0, 16, jnp.float32)
    np.testing.assert_allclose(np.asarray(kd2[0, 2]), np.asarray(k[0, 0]),
                               rtol=0.02, atol=0.05)
    np.testing.assert_allclose(np.asarray(kd2[1, 9]), np.asarray(k[1, 0]),
                               rtol=0.02, atol=0.05)
    assert np.asarray(kd2[0, 9]).max() == 0  # other slot untouched


@pytest.fixture(scope="module")
def params_f32():
    return params_from_state_dict(make_state_dict(CFG, seed=5), CFG)


def test_per_op_forward_int8_close_to_f16(params_f32):
    """Prefill logits with an int8 cache stay close to the fp16-cache
    reference (quantization noise only)."""
    ids = np.random.RandomState(2).randint(
        3, CFG.n_vocab, size=(1, 8)).astype(np.int32)

    def run(dtype):
        cache = init_cache(CFG, batch=1, max_len=32, dtype=dtype)
        logits, c = forward(params_f32, jnp.asarray(ids), cache,
                            jnp.int32(0), CFG, compute_dtype=jnp.float32,
                            logits_mode="all", allow_pallas=False)
        return np.asarray(logits), c

    ref, _ = run(jnp.float16)
    got, cache = run(jnp.int8)
    assert isinstance(cache, QuantKVCache)
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.15)
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.9


def test_fused_decode_int8_matches_per_op_int8():
    """The megakernel's int8-KV path == the per-op int8-KV path (both read
    the SAME quantized cache; same tolerance as the bf16 fused tests)."""
    sd = make_state_dict(CFG, seed=7)
    params = _pack_matmul_weights(
        params_from_state_dict(sd, CFG, qtype=codecs.GGML_TYPE_Q4_0))
    rng = np.random.RandomState(8)
    prompt = rng.randint(3, CFG.n_vocab, size=(1, 4)).astype(np.int32)

    cache_o = init_cache(CFG, batch=1, max_len=CFG.n_positions,
                         dtype=jnp.int8)
    logits_o, cache_o = forward(
        params, jnp.asarray(prompt), cache_o, jnp.int32(0), CFG,
        compute_dtype=jnp.bfloat16, causal=True, logits_mode="last",
        allow_pallas=False)
    cache_f = cache_o
    tok = int(np.asarray(logits_o).argmax(-1)[0])
    past = prompt.shape[1]
    for _ in range(5):
        t = jnp.asarray([[tok]], jnp.int32)
        logits_o, cache_o = forward(
            params, t, cache_o, jnp.int32(past), CFG,
            compute_dtype=jnp.bfloat16, causal=True, logits_mode="last",
            allow_pallas=False, kv_window=16)
        logits_f, cache_f = forward_fused_decode(
            params, t, cache_f, jnp.int32(past), CFG,
            compute_dtype=jnp.bfloat16, kv_window=16, interpret=True)
        lo, lf = np.asarray(logits_o), np.asarray(logits_f)
        # no per-step argmax assert: a random tiny model's top-2 gap (~0.02)
        # sits below int8-KV path noise (~0.05); closeness is the bar here,
        # token-level checks live in the engine/serving integration tests
        np.testing.assert_allclose(lf, lo, rtol=5e-2, atol=0.35)
        # this step's cache row must match after dequantization (the kernel
        # and XLA compute k with different bf16 rounding, so raw levels can
        # differ by one)
        kf = (np.asarray(cache_f.k[:, :, past], np.float32)
              * np.asarray(cache_f.ks[:, :, 0, past])[..., None])
        ko = (np.asarray(cache_o.k[:, :, past], np.float32)
              * np.asarray(cache_o.ks[:, :, 0, past])[..., None])
        np.testing.assert_allclose(kf, ko, rtol=5e-2, atol=0.1)
        tok = int(np.asarray(logits_o).argmax(-1)[0])
        past += 1


def test_fused_decode_int8_multiblock_kv():
    """Online softmax across KV blocks with per-row scales: block size must
    not change the result."""
    sd = make_state_dict(CFG, seed=9)
    params = _pack_matmul_weights(
        params_from_state_dict(sd, CFG, qtype=codecs.GGML_TYPE_Q4_0))
    rng = np.random.RandomState(10)
    prompt = rng.randint(3, CFG.n_vocab, size=(1, 9)).astype(np.int32)
    cache0 = init_cache(CFG, batch=1, max_len=CFG.n_positions,
                        dtype=jnp.int8)
    logits, cache0 = forward(
        params, jnp.asarray(prompt), cache0, jnp.int32(0), CFG,
        compute_dtype=jnp.bfloat16, causal=True, logits_mode="last",
        allow_pallas=False)
    t = jnp.asarray([[int(np.asarray(logits).argmax(-1)[0])]], jnp.int32)
    outs = {}
    for kvb in (None, 8):
        lf, _ = forward_fused_decode(
            params, t, cache0, jnp.int32(9), CFG,
            compute_dtype=jnp.bfloat16, kv_window=32, interpret=True,
            kv_block=kvb)
        outs[kvb] = np.asarray(lf)
    np.testing.assert_allclose(outs[8], outs[None], rtol=1e-3, atol=1e-3)


def test_fused_decode_int8_paged_matches_lockstep():
    """int8-KV through the paged (per-slot KV) kernel == the lockstep
    batched kernel, ragged positions over multiple blocks."""
    from biogpt_tpu.runtime.cache import update_layer

    sd = make_state_dict(CFG, seed=12)
    params = _pack_matmul_weights(
        params_from_state_dict(sd, CFG, qtype=codecs.GGML_TYPE_Q4_0))
    rng = np.random.RandomState(13)
    B = 3
    past = jnp.asarray([4, 11, 7], jnp.int32)
    cache = init_cache(CFG, batch=B, max_len=CFG.n_positions, dtype=jnp.int8)
    for layer in range(CFG.n_layer):
        cache = update_layer(
            cache, layer,
            jnp.asarray(rng.randn(B, 16, CFG.d_model), jnp.float32) * 0.3,
            jnp.asarray(rng.randn(B, 16, CFG.d_model), jnp.float32) * 0.3,
            jnp.int32(0))
    toks = jnp.asarray(rng.randint(3, CFG.n_vocab, size=(B, 1)), jnp.int32)
    outs = {}
    for paged in (False, True):
        lf, _ = forward_fused_decode(
            params, toks, cache, past, CFG, compute_dtype=jnp.bfloat16,
            kv_window=16, interpret=True, kv_block=8, per_slot_kv=paged)
        outs[paged] = np.asarray(lf)
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-3, atol=1e-3)


def test_engine_kv_quant_generates(params_f32):
    """Engine(kv_quant=True) runs end to end and tracks the fp16-cache
    engine closely (greedy tokens on a tiny model)."""
    gen = GenerationParams(n_predict=8, temp=0.0, stop_at_eos=False)
    prompt = [2, 10, 25, 48]
    base = Engine(CFG, params_f32, compute_dtype=jnp.float32).generate(
        prompt, gen).ids
    quant = Engine(CFG, params_f32, compute_dtype=jnp.float32,
                   kv_quant=True).generate(prompt, gen).ids
    # int8 KV noise can flip late tokens on a random tiny model; the first
    # steps must agree
    assert quant[:len(prompt) + 4] == base[:len(prompt) + 4]
    assert len(quant) == len(base)


def test_serving_kv_quant_matches_engine_kv_quant(params_f32):
    """Batched int8-KV serving == single-stream int8-KV generation (both
    quantize identically, so tokens must match exactly)."""
    from biogpt_tpu.runtime.serving import BatchedEngine, Request

    eng = Engine(CFG, params_f32, compute_dtype=jnp.float32, kv_quant=True)
    be = BatchedEngine(CFG, params_f32, max_batch=2,
                       compute_dtype=jnp.float32, chunk=4, kv_quant=True)
    gen = GenerationParams(temp=0.0, stop_at_eos=False)
    prompts = [[2, 5, 9], [2, 11, 30, 41, 8], [2, 7]]
    reqs = [Request(prompt_ids=p, n_predict=5, request_id=i)
            for i, p in enumerate(prompts)]
    results = be.serve(reqs, gen)
    for i, p in enumerate(prompts):
        expect = eng.generate(
            p, GenerationParams(n_predict=5, temp=0.0, stop_at_eos=False)).ids
        assert results[i].ids == expect, (i, results[i].ids, expect)


def test_engine_kv_quant_tp_mesh_matches(params_f32):
    """int8 KV under the shard_map TP mesh == single-device int8 KV,
    token-identical: quantize_rows completes the row absmax with a pmax
    over the model axis, so every shard writes the same scale and the
    sharded cache is bit-identical (VERDICT r2 #4: gate lifted)."""
    from biogpt_tpu.parallel import make_mesh

    gen = GenerationParams(n_predict=8, temp=0.0, stop_at_eos=False)
    prompt = [2, 10, 25, 48]
    base = Engine(CFG, params_f32, compute_dtype=jnp.float32,
                  kv_quant=True).generate(prompt, gen).ids
    par = Engine(CFG, params_f32, compute_dtype=jnp.float32,
                 mesh=make_mesh(1, 2), kv_quant=True)
    assert par._tp_fwd is not None    # the shard_map TP path is live
    assert isinstance(par.new_cache(), QuantKVCache)
    assert par.generate(prompt, gen).ids == base


def test_engine_kv_quant_gspmd_mesh_matches(params_f32):
    """int8 KV on a mesh the TP path cannot divide (n_head=2, tp=4) takes
    the GSPMD route and still matches single-device."""
    from biogpt_tpu.parallel import make_mesh

    gen = GenerationParams(n_predict=8, temp=0.0, stop_at_eos=False)
    prompt = [2, 10, 25, 48]
    base = Engine(CFG, params_f32, compute_dtype=jnp.float32,
                  kv_quant=True).generate(prompt, gen).ids
    par = Engine(CFG, params_f32, compute_dtype=jnp.float32,
                 mesh=make_mesh(2, 4), kv_quant=True)
    assert par._tp_fwd is None        # GSPMD fallback
    assert par.generate(prompt, gen).ids == base


def test_serving_kv_quant_mesh_matches(params_f32):
    """Batched int8-KV serving over a TP mesh == single-device int8-KV
    single-stream generation, token for token."""
    from biogpt_tpu.parallel import make_mesh
    from biogpt_tpu.runtime.serving import BatchedEngine, Request

    eng = Engine(CFG, params_f32, compute_dtype=jnp.float32, kv_quant=True)
    be = BatchedEngine(CFG, params_f32, max_batch=2,
                       compute_dtype=jnp.float32, chunk=4,
                       mesh=make_mesh(1, 2), kv_quant=True)
    assert be._tp
    gen = GenerationParams(temp=0.0, stop_at_eos=False)
    prompts = [[2, 5, 9], [2, 11, 30, 41, 8], [2, 7]]
    reqs = [Request(prompt_ids=p, n_predict=5, request_id=i)
            for i, p in enumerate(prompts)]
    results = be.serve(reqs, gen)
    for i, p in enumerate(prompts):
        expect = eng.generate(
            p, GenerationParams(n_predict=5, temp=0.0, stop_at_eos=False)).ids
        assert results[i].ids == expect, (i, results[i].ids, expect)


def test_per_op_forward_int8_bf16_compute(params_f32):
    """REGRESSION: with bf16 compute the per-op path once cast the softmax
    weights to the raw cache dtype (int8), truncating every weight < 1 to
    zero and collapsing the context. int8-KV bf16-compute logits must stay
    close to the fp16-cache bf16-compute reference."""
    ids = np.random.RandomState(3).randint(
        3, CFG.n_vocab, size=(1, 8)).astype(np.int32)

    def run(dtype):
        cache = init_cache(CFG, batch=1, max_len=32, dtype=dtype)
        logits, _ = forward(params_f32, jnp.asarray(ids), cache,
                            jnp.int32(0), CFG, compute_dtype=jnp.bfloat16,
                            logits_mode="all", allow_pallas=False)
        return np.asarray(logits)

    ref = run(jnp.float16)
    got = run(jnp.int8)
    np.testing.assert_allclose(got, ref, rtol=0.06, atol=0.2)
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.8


def test_perplexity_int8_kv_close_to_f16(params_f32):
    """Δppl(int8 KV vs fp16 KV) stays small on a controlled model — the
    quality guarantee behind --kv-quant (cf. the int8-KV papers' claim)."""
    from biogpt_tpu.tools.perplexity import perplexity_of_ids

    ids = np.random.RandomState(4).randint(
        3, CFG.n_vocab, size=40).tolist()
    base = perplexity_of_ids(
        Engine(CFG, params_f32, compute_dtype=jnp.float32,
               max_seq=40, donate_cache=False), ids, window=40)
    quant = perplexity_of_ids(
        Engine(CFG, params_f32, compute_dtype=jnp.float32, kv_quant=True,
               max_seq=40, donate_cache=False), ids, window=40)
    assert quant["tokens"] == base["tokens"]
    # relative ppl drift from KV quantization alone
    assert abs(quant["ppl"] - base["ppl"]) / base["ppl"] < 0.02, (quant, base)
