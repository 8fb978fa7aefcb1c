"""Whole-model decode megakernel vs the per-op XLA oracle (interpret mode).

The megakernel (ops/pallas_decode.py) must reproduce forward(N=1,
causal=True) step for step: same cache evolution, same greedy tokens,
logits within bf16-path tolerance.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from biogpt_tpu.config import BioGptConfig
from biogpt_tpu.modelio.checkpoint import params_from_state_dict
from biogpt_tpu.modelio.synthetic import make_state_dict
from biogpt_tpu.models.biogpt import forward, forward_fused_decode
from biogpt_tpu.ops.pallas_decode import supports_layers, _gelu_erf, _pick_tile
from biogpt_tpu.quant import codecs
from biogpt_tpu.runtime.cache import init_cache
from biogpt_tpu.runtime.engine import _pack_matmul_weights

CFG = BioGptConfig.tiny(d_model=128, d_ff=256, n_head=2, n_layer=3,
                        n_vocab=256, n_positions=64)


def _packed_params(qtype, seed=0):
    sd = make_state_dict(CFG, seed=seed)
    params = params_from_state_dict(sd, CFG, qtype=qtype)
    return _pack_matmul_weights(params)


def _run_parallel_steps(qtype, window, kv_block, n_steps=5, prompt_len=4,
                        seed=0):
    """Prefill once with the oracle, then step fused + oracle side by side
    feeding both the ORACLE's greedy token (so caches stay comparable)."""
    params = _packed_params(qtype, seed=seed)
    rng = np.random.RandomState(seed + 1)
    prompt = rng.randint(3, CFG.n_vocab, size=(1, prompt_len)).astype(np.int32)

    cache_o = init_cache(CFG, batch=1, max_len=CFG.n_positions,
                         dtype=jnp.bfloat16)
    logits_o, cache_o = forward(
        params, jnp.asarray(prompt), cache_o, jnp.int32(0), CFG,
        compute_dtype=jnp.bfloat16, causal=True, logits_mode="last",
        allow_pallas=False)
    # fused cache starts as a copy of the oracle prefill
    cache_f = cache_o

    tok = int(np.asarray(logits_o).argmax(-1)[0])
    past = prompt_len
    for _ in range(n_steps):
        t = jnp.asarray([[tok]], jnp.int32)
        logits_o, cache_o = forward(
            params, t, cache_o, jnp.int32(past), CFG,
            compute_dtype=jnp.bfloat16, causal=True, logits_mode="last",
            allow_pallas=False, kv_window=window)
        logits_f, cache_f = forward_fused_decode(
            params, t, cache_f, jnp.int32(past), CFG,
            compute_dtype=jnp.bfloat16, kv_window=window, interpret=True,
            kv_block=kv_block)
        yield (np.asarray(logits_o), np.asarray(logits_f),
               cache_o, cache_f, past)
        tok = int(np.asarray(logits_o).argmax(-1)[0])
        past += 1


@pytest.mark.parametrize("qtype", [codecs.GGML_TYPE_Q4_0,
                                   codecs.GGML_TYPE_Q4_1,
                                   codecs.GGML_TYPE_Q5_0,
                                   codecs.GGML_TYPE_Q8_0])
def test_fused_decode_matches_oracle(qtype):
    for logits_o, logits_f, cache_o, cache_f, past in _run_parallel_steps(
            qtype, window=16, kv_block=None):
        assert logits_o.argmax(-1) == logits_f.argmax(-1)
        np.testing.assert_allclose(logits_f, logits_o, rtol=5e-2, atol=0.35)
        # the cache row written this step must match the oracle's
        ko = np.asarray(cache_o.k[:, :, past], np.float32)
        kf = np.asarray(cache_f.k[:, :, past], np.float32)
        np.testing.assert_allclose(kf, ko, rtol=5e-2, atol=0.1)


def test_fused_decode_blockwise_kv():
    """Multi-block KV windows (online softmax across grid steps) must agree
    with the single-block result."""
    runs = {}
    for kvb in (None, 8):
        outs = []
        for logits_o, logits_f, *_ in _run_parallel_steps(
                codecs.GGML_TYPE_Q4_0, window=32, kv_block=kvb, n_steps=4,
                prompt_len=9):
            outs.append(logits_f)
        runs[kvb] = np.stack(outs)
    np.testing.assert_allclose(runs[8], runs[None], rtol=1e-3, atol=1e-3)


def test_fused_decode_blockwise_kv_vs_oracle():
    for logits_o, logits_f, *_ in _run_parallel_steps(
            codecs.GGML_TYPE_Q4_0, window=32, kv_block=8, n_steps=4,
            prompt_len=9):
        assert logits_o.argmax(-1) == logits_f.argmax(-1)
        np.testing.assert_allclose(logits_f, logits_o, rtol=5e-2, atol=0.35)


def _batched_step_pair(qtype, past_list, window, n_steps=3, seed=0,
                       kv_block=None, per_slot_kv=False, kv_groups=None):
    """Run fused-vs-oracle batched decode steps over a shared random cache
    with per-slot positions (the serving shape), feeding both sides the
    ORACLE's greedy tokens."""
    params = _packed_params(qtype, seed=seed)
    rng = np.random.RandomState(seed + 7)
    B = len(past_list)
    cache_rand = init_cache(CFG, batch=B, max_len=CFG.n_positions,
                            dtype=jnp.bfloat16)
    fill = rng.randn(*cache_rand.k.shape).astype(np.float32) * 0.3
    cache_o = cache_rand._replace(
        k=jnp.asarray(fill, jnp.bfloat16),
        v=jnp.asarray(fill[..., ::-1].copy(), jnp.bfloat16))
    cache_f = cache_o
    past = np.asarray(past_list, np.int32)
    toks = rng.randint(3, CFG.n_vocab, size=(B, 1)).astype(np.int32)

    for _ in range(n_steps):
        t = jnp.asarray(toks)
        p = jnp.asarray(past)
        logits_o, cache_o = forward(
            params, t, cache_o, p, CFG, compute_dtype=jnp.bfloat16,
            causal=True, logits_mode="last", allow_pallas=False,
            kv_window=window)
        logits_f, cache_f = forward_fused_decode(
            params, t, cache_f, p, CFG, kv_window=window, interpret=True,
            kv_block=kv_block, per_slot_kv=per_slot_kv, kv_groups=kv_groups)
        yield np.asarray(logits_o), np.asarray(logits_f), cache_o, cache_f
        toks = np.asarray(logits_o).argmax(-1)[:, None].astype(np.int32)
        past = past + 1


def test_fused_decode_batched_vs_oracle():
    for logits_o, logits_f, cache_o, cache_f in _batched_step_pair(
            codecs.GGML_TYPE_Q4_0, past_list=[3, 7, 1, 5], window=16):
        assert (logits_o.argmax(-1) == logits_f.argmax(-1)).all()
        np.testing.assert_allclose(logits_f, logits_o, rtol=5e-2, atol=0.35)
        # identical cache evolution (same dtype, same slots written)
        np.testing.assert_allclose(
            np.asarray(cache_f.k, np.float32),
            np.asarray(cache_o.k, np.float32), rtol=2e-2, atol=0.1)


@pytest.mark.parametrize("B,n_steps,kv_block", [(16, 2, 8), (32, 1, None)])
def test_fused_decode_batched_wide_vs_oracle(B, n_steps, kv_block):
    """Lifted slot cap (B up to 32 — BH spans several 128-row tiles):
    same math as the oracle, all slots live, ragged positions; the B=16
    case also sweeps multiple KV grid blocks (nW > 1 online softmax)."""
    rng = np.random.RandomState(B)
    past = rng.randint(1, 15, size=B).tolist()
    for logits_o, logits_f, cache_o, cache_f in _batched_step_pair(
            codecs.GGML_TYPE_Q4_0, past_list=past, window=16,
            n_steps=n_steps, kv_block=kv_block):
        assert (logits_o.argmax(-1) == logits_f.argmax(-1)).all()
        np.testing.assert_allclose(logits_f, logits_o, rtol=5e-2, atol=0.35)
        np.testing.assert_allclose(
            np.asarray(cache_f.k, np.float32),
            np.asarray(cache_o.k, np.float32), rtol=2e-2, atol=0.1)


def test_kv_block_respects_vmem_budget():
    """Wide batches shrink the lockstep KV block so the (1, B, KVB, D)
    VMEM window fits (B=32 at W=512 otherwise needs 128 MB and fails to
    compile — found on the real chip, round 3)."""
    from biogpt_tpu.ops.pallas_decode import _kv_block

    assert _kv_block(512, 8, 1024) == 512
    assert _kv_block(512, 16, 1024) == 256
    assert _kv_block(512, 32, 1024) == 128
    assert _kv_block(1024, 8, 1024) == 512
    assert _kv_block(1024, 32, 1024) == 128
    assert _kv_block(128, 32, 1024) == 128   # floor
    assert _kv_block(24) == 24               # odd tiny test windows


def test_fused_decode_batched_mins_format():
    for logits_o, logits_f, *_ in _batched_step_pair(
            codecs.GGML_TYPE_Q4_1, past_list=[2, 9], window=16, n_steps=2):
        assert (logits_o.argmax(-1) == logits_f.argmax(-1)).all()
        np.testing.assert_allclose(logits_f, logits_o, rtol=5e-2, atol=0.35)


@pytest.mark.parametrize("qtype", [codecs.GGML_TYPE_Q5_0,
                                   codecs.GGML_TYPE_Q5_1])
def test_fused_decode_batched_packed_5bit(qtype):
    """Batched dequant-then-dot with the packed fifth-bit plane unpack."""
    params = _packed_params(qtype)
    assert params["layers"]["qkv"]["w"].packed   # 5-bit formats pack now
    for logits_o, logits_f, *_ in _batched_step_pair(
            qtype, past_list=[2, 9], window=16, n_steps=2):
        assert (logits_o.argmax(-1) == logits_f.argmax(-1)).all()
        np.testing.assert_allclose(logits_f, logits_o, rtol=5e-2, atol=0.35)


def test_fused_decode_batched_multiblock_kv():
    """Batched online softmax across multiple KV grid steps (nW > 1)."""
    for logits_o, logits_f, *_ in _batched_step_pair(
            codecs.GGML_TYPE_Q8_0, past_list=[1, 14, 8], window=16,
            n_steps=2, kv_block=8):
        assert (logits_o.argmax(-1) == logits_f.argmax(-1)).all()
        np.testing.assert_allclose(logits_f, logits_o, rtol=5e-2, atol=0.35)


def test_fused_decode_paged_vs_oracle():
    """Per-slot KV ("paged") batched kernel: ragged positions across
    multiple KV blocks, each slot reading only its own live blocks."""
    for logits_o, logits_f, cache_o, cache_f in _batched_step_pair(
            codecs.GGML_TYPE_Q4_0, past_list=[3, 14, 1, 9], window=16,
            kv_block=8, per_slot_kv=True):
        assert (logits_o.argmax(-1) == logits_f.argmax(-1)).all()
        np.testing.assert_allclose(logits_f, logits_o, rtol=5e-2, atol=0.35)
        np.testing.assert_allclose(
            np.asarray(cache_f.k, np.float32),
            np.asarray(cache_o.k, np.float32), rtol=2e-2, atol=0.1)


def test_fused_decode_paged_matches_lockstep():
    """Paged and lockstep kernels compute the identical step (the paged
    path only changes WHICH cache blocks stream, never the math)."""
    runs = {}
    for paged in (False, True):
        outs = [logits_f for _, logits_f, *_ in _batched_step_pair(
            codecs.GGML_TYPE_Q4_0, past_list=[2, 13, 7], window=16,
            kv_block=8, n_steps=3, per_slot_kv=paged)]
        runs[paged] = np.stack(outs)
    np.testing.assert_allclose(runs[True], runs[False], rtol=1e-3, atol=1e-3)


def test_fused_decode_paged_mins_format():
    for logits_o, logits_f, *_ in _batched_step_pair(
            codecs.GGML_TYPE_Q4_1, past_list=[2, 9], window=16, n_steps=2,
            kv_block=8, per_slot_kv=True):
        assert (logits_o.argmax(-1) == logits_f.argmax(-1)).all()
        np.testing.assert_allclose(logits_f, logits_o, rtol=5e-2, atol=0.35)


def test_fused_decode_paged_single_slot():
    """B=1 through the paged kernel (BH == H degenerate case)."""
    params = _packed_params(codecs.GGML_TYPE_Q4_0)
    import jax

    cache = init_cache(CFG, batch=1, max_len=CFG.n_positions,
                       dtype=jnp.bfloat16)
    rng = np.random.RandomState(3)
    fill = rng.randn(*cache.k.shape).astype(np.float32) * 0.3
    cache = cache._replace(k=jnp.asarray(fill, jnp.bfloat16),
                           v=jnp.asarray(fill * 0.5, jnp.bfloat16))
    tok = jnp.asarray([[5]], jnp.int32)
    logits_o, _ = forward(params, tok, cache, jnp.int32(9), CFG,
                          compute_dtype=jnp.bfloat16, causal=True,
                          logits_mode="last", allow_pallas=False,
                          kv_window=16)
    logits_f, _ = forward_fused_decode(params, tok, cache, jnp.int32(9), CFG,
                                       kv_window=16, interpret=True,
                                       kv_block=8, per_slot_kv=True)
    np.testing.assert_allclose(np.asarray(logits_f), np.asarray(logits_o),
                               rtol=5e-2, atol=0.35)


def test_fused_decode_grouped_vs_oracle():
    """Group-clamped KV streaming (kv_groups): ragged per-slot positions
    spanning several KV blocks, groups clamping at different block
    counts — same math as the oracle."""
    for logits_o, logits_f, cache_o, cache_f in _batched_step_pair(
            codecs.GGML_TYPE_Q4_0, past_list=[3, 14, 1, 9], window=16,
            kv_block=8, kv_groups=2):
        assert (logits_o.argmax(-1) == logits_f.argmax(-1)).all()
        np.testing.assert_allclose(logits_f, logits_o, rtol=5e-2, atol=0.35)
        np.testing.assert_allclose(
            np.asarray(cache_f.k, np.float32),
            np.asarray(cache_o.k, np.float32), rtol=2e-2, atol=0.1)


def test_fused_decode_grouped_matches_lockstep():
    """Grouped and lockstep kernels are BIT-identical (grouping changes
    which cache blocks stream, never the math; stale revisited blocks are
    masked by idx < past)."""
    runs = {}
    for groups in (None, 2, 4):
        outs = [logits_f for _, logits_f, *_ in _batched_step_pair(
            codecs.GGML_TYPE_Q4_0, past_list=[2, 13, 7, 1], window=16,
            kv_block=8, n_steps=3, kv_groups=groups)]
        runs[groups] = np.stack(outs)
    np.testing.assert_array_equal(runs[2], runs[None])
    np.testing.assert_array_equal(runs[4], runs[None])


def test_fused_decode_grouped_mins_format():
    for logits_o, logits_f, *_ in _batched_step_pair(
            codecs.GGML_TYPE_Q4_1, past_list=[2, 9, 12, 4], window=16,
            n_steps=2, kv_block=8, kv_groups=2):
        assert (logits_o.argmax(-1) == logits_f.argmax(-1)).all()
        np.testing.assert_allclose(logits_f, logits_o, rtol=5e-2, atol=0.35)


def test_grouped_rejects_bad_shapes():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not divisible"):
        list(_batched_step_pair(
            codecs.GGML_TYPE_Q4_0, past_list=[2, 9, 12], window=16,
            kv_block=8, n_steps=1, kv_groups=2))


def test_supports_layers():
    layers = _packed_params(codecs.GGML_TYPE_Q4_0)["layers"]
    assert supports_layers(layers, jnp.bfloat16, batch=1, n_new=1)
    assert not supports_layers(layers, jnp.float16, batch=1, n_new=1)
    assert supports_layers(layers, jnp.bfloat16, batch=32, n_new=1)
    assert not supports_layers(layers, jnp.bfloat16, batch=33, n_new=1)
    assert not supports_layers(layers, jnp.bfloat16, batch=1, n_new=4)
    # unfused q/k/v (no engine packing) is not supported
    raw = params_from_state_dict(make_state_dict(CFG, seed=0), CFG,
                                 qtype=codecs.GGML_TYPE_Q4_0)
    assert not supports_layers(raw["layers"], jnp.bfloat16, 1, 1)


def test_gelu_erf_polynomial_accuracy():
    import jax

    x = jnp.linspace(-8, 8, 4097, dtype=jnp.float32)
    got = np.asarray(_gelu_erf(x))
    expect = np.asarray(jax.nn.gelu(x, approximate=False))
    np.testing.assert_allclose(got, expect, atol=3e-7, rtol=1e-5)


def test_pick_tile_divides():
    for d_in, d_out in [(1024, 3072), (1024, 1024), (1024, 4096),
                        (4096, 1024), (128, 384), (128, 256), (256, 128)]:
        t = _pick_tile(d_in, d_out)
        assert d_out % t == 0
        assert t * d_in * 2 <= 8 * 1024 * 1024


def test_serving_fused_matches_per_op():
    """BatchedEngine e2e: lockstep serving through the BATCHED megakernel
    equals the per-op path request-for-request (CPU interpret, forced
    pallas), including a refill wave (3 requests over 2 slots)."""
    from biogpt_tpu.config import GenerationParams
    from biogpt_tpu.ops.qmatmul import set_pallas_mode
    from biogpt_tpu.runtime.serving import BatchedEngine, Request

    sd = make_state_dict(CFG, seed=11)
    params = params_from_state_dict(sd, CFG, qtype=codecs.GGML_TYPE_Q4_0)
    reqs = [Request(prompt_ids=p, n_predict=4, request_id=i)
            for i, p in enumerate([[2, 41, 7], [2, 19, 3, 8], [2, 5]])]
    gen = GenerationParams(temp=0.0, stop_at_eos=False)

    be = BatchedEngine(CFG, params, max_batch=2, chunk=2,
                       compute_dtype=jnp.bfloat16, max_seq=32)
    assert be._fused_decode and be.cache_dtype == jnp.bfloat16
    try:
        set_pallas_mode(True)   # CPU: run kernels in interpret mode
        assert be._use_fused()
        fused = be.serve(reqs, gen)
        set_pallas_mode(False)
        assert not be._use_fused()
        plain = be.serve(reqs, gen)
    finally:
        set_pallas_mode("auto")
    for i in range(len(reqs)):
        assert fused[i].ids == plain[i].ids, i


def test_serving_fused_sampled_matches_unfused_pallas():
    """Sampled-tail fusion (LN+lm_head+gmax+commit kernel + gather-top-k
    sampler): per-request-sampled serving is token-identical to the
    UNFUSED pallas sampled path (megakernel + commit kernel + XLA LN +
    lm_head kernel + full-width sampler), mixed greedy/sampled rows,
    across refill waves. The per-op XLA oracle differs in low-bit
    rounding (pallas-vs-XLA dequant order), so the in-family comparison
    is the exact one; fused-vs-per-op coverage lives in the greedy and
    grouped serving tests."""
    from biogpt_tpu.config import GenerationParams
    from biogpt_tpu.ops.qmatmul import set_pallas_mode
    from biogpt_tpu.runtime.serving import BatchedEngine, Request

    sd = make_state_dict(CFG, seed=21)
    params = params_from_state_dict(sd, CFG, qtype=codecs.GGML_TYPE_Q4_0)
    rng = np.random.RandomState(2)
    prompts = [[2] + rng.randint(3, CFG.n_vocab, size=n).tolist()
               for n in (3, 9, 2, 14, 5)]

    def make_reqs():
        return [Request(prompt_ids=p, n_predict=4, request_id=i,
                        temp=0.0 if i % 3 == 0 else 0.8, top_k=12,
                        top_p=0.9)
                for i, p in enumerate(prompts)]

    gen = GenerationParams(temp=0.8, top_k=12, top_p=0.9,
                           stop_at_eos=False, seed=5)

    be = BatchedEngine(CFG, params, max_batch=4, chunk=2,
                       compute_dtype=jnp.bfloat16, max_seq=32)
    assert be._fused_sampled
    try:
        set_pallas_mode(True)   # CPU: run kernels in interpret mode
        fused = be.serve(make_reqs(), gen)
        be._fused_sampled = False
        plain = be.serve(make_reqs(), gen)
    finally:
        set_pallas_mode("auto")
        be._fused_sampled = True
    for i in range(len(prompts)):
        assert fused[i].ids == plain[i].ids, i


def test_logits_gmax_commit_kernel_matches_unfused():
    """The fused sampled-epilogue kernel's logits equal LN+wide-lm_head,
    gmax equals the 128-lane group maxima, and the commit lands each
    slot's rows at its own position."""
    import jax

    from biogpt_tpu.models.biogpt import _layer_norm
    from biogpt_tpu.ops.pallas_qmatmul import (
        lm_head_logits_gmax_commit_pallas, qmatmul_pallas_wide)

    params = _packed_params(codecs.GGML_TYPE_Q4_0)
    lm = params["lm_head"]
    B, D = 12, CFG.d_model
    L = CFG.n_layer
    S = 24
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(B, D), jnp.float32)
    kc = jnp.asarray(rng.randn(L, B, S, D), jnp.bfloat16)
    vc = jnp.asarray(rng.randn(L, B, S, D), jnp.bfloat16)
    krt = jnp.asarray(rng.randn(B, L, D), jnp.float32)
    vrt = jnp.asarray(rng.randn(B, L, D), jnp.float32)
    past = jnp.asarray(rng.randint(0, S, size=B), jnp.int32)

    logits, gmax, kc2, vc2 = lm_head_logits_gmax_commit_pallas(
        x, params["final_ln"]["w"], params["final_ln"]["b"], lm,
        CFG.n_vocab, kc, vc, krt, vrt, past, ln_eps=CFG.ln_eps,
        interpret=True)

    xn = _layer_norm(x, params["final_ln"]["w"], params["final_ln"]["b"],
                     CFG.ln_eps)
    expect = np.asarray(qmatmul_pallas_wide(xn, lm, interpret=True))
    got = np.asarray(logits)
    n_valid = CFG.n_vocab
    np.testing.assert_allclose(got[:, :n_valid], expect[:, :n_valid],
                               rtol=2e-5, atol=2e-5)
    assert (got[:, n_valid:] == -1e30).all()
    G = got.shape[1] // 128
    np.testing.assert_array_equal(
        np.asarray(gmax), got.reshape(B, G, 128).max(-1))
    # commit: each slot's row at its own position, everything else intact
    kc_np = np.asarray(kc, np.float32).copy()
    for b in range(B):
        kc_np[:, b, int(past[b])] = np.asarray(krt, np.float32)[b]
    np.testing.assert_allclose(np.asarray(kc2, np.float32), kc_np,
                               rtol=1e-2, atol=1e-2)


def test_serving_grouped_kv_matches_per_op():
    """BatchedEngine e2e with group-clamped KV streaming + length-affinity
    slot assignment (kv_groups=2 over 4 slots): token-identical to the
    per-op path request-for-request, including refill waves with mixed
    prompt lengths (what the feature is for)."""
    from biogpt_tpu.config import GenerationParams
    from biogpt_tpu.ops.qmatmul import set_pallas_mode
    from biogpt_tpu.runtime.serving import BatchedEngine, Request

    sd = make_state_dict(CFG, seed=13)
    params = params_from_state_dict(sd, CFG, qtype=codecs.GGML_TYPE_Q4_0)
    rng = np.random.RandomState(5)
    prompts = [[2] + rng.randint(3, CFG.n_vocab, size=n).tolist()
               for n in (2, 11, 3, 24, 2, 9)]   # mixed: longs force windows
    reqs = [Request(prompt_ids=p, n_predict=4, request_id=i)
            for i, p in enumerate(prompts)]
    gen = GenerationParams(temp=0.0, stop_at_eos=False)

    be = BatchedEngine(CFG, params, max_batch=4, chunk=2,
                       compute_dtype=jnp.bfloat16, max_seq=64, kv_groups=2)
    assert be._fused_decode and be._kv_groups == 2
    try:
        set_pallas_mode(True)   # CPU: run kernels in interpret mode
        fused = be.serve(reqs, gen)
        set_pallas_mode(False)
        plain = be.serve(reqs, gen)
    finally:
        set_pallas_mode("auto")
    for i in range(len(reqs)):
        assert fused[i].ids == plain[i].ids, i


def test_assign_slots_affinity():
    """Length-affinity slot assignment packs long requests into the group
    that is already tallest and best-fits the rest."""
    from biogpt_tpu.runtime.serving import BatchedEngine, Request

    sd = make_state_dict(CFG, seed=0)
    params = params_from_state_dict(sd, CFG, qtype=codecs.GGML_TYPE_Q4_0)
    be = BatchedEngine(CFG, params, max_batch=8, chunk=2,
                       compute_dtype=jnp.bfloat16, max_seq=64, kv_groups=4)
    assert be._kv_groups == 4

    # drive serve() far enough to exercise assign_slots via a real refill:
    # 2 long + 6 short requests; with G=4 (GB=2) the two longs must land
    # in the SAME group (slots {0,1}, {2,3}, {4,5} or {6,7})
    from biogpt_tpu.config import GenerationParams
    from biogpt_tpu.ops.qmatmul import set_pallas_mode

    rng = np.random.RandomState(9)
    longs = [[2] + rng.randint(3, CFG.n_vocab, size=30).tolist()
             for _ in range(2)]
    shorts = [[2] + rng.randint(3, CFG.n_vocab, size=3).tolist()
              for _ in range(6)]
    # interleave so FIFO order alone would scatter them
    prompts = [longs[0], shorts[0], shorts[1], longs[1]] + shorts[2:]
    reqs = [Request(prompt_ids=p, n_predict=2, request_id=i)
            for i, p in enumerate(prompts)]
    seen_groups = []
    orig_prefill = be._prefill_group

    def spy(pairs, *a, **k):
        for slot, req in pairs:
            if len(req.prompt_ids) > 20:
                seen_groups.append(slot // 2)
        return orig_prefill(pairs, *a, **k)

    be._prefill_group = spy
    try:
        set_pallas_mode(True)
        be.serve(reqs, GenerationParams(temp=0.0, stop_at_eos=False))
    finally:
        set_pallas_mode("auto")
        be._prefill_group = orig_prefill
    assert len(seen_groups) == 2 and seen_groups[0] == seen_groups[1], \
        seen_groups


def test_serving_staged_kv_matches_per_op():
    """Chunk-local KV staging (BatchedEngine(staged_kv=True)): the staged
    lockstep path — staging writes per step, one cache commit per chunk,
    kernel attending to cache + staging — equals per-op serving
    request-for-request across chunk boundaries and a refill wave."""
    from biogpt_tpu.config import GenerationParams
    from biogpt_tpu.ops.qmatmul import set_pallas_mode
    from biogpt_tpu.runtime.serving import BatchedEngine, Request

    sd = make_state_dict(CFG, seed=11)
    params = params_from_state_dict(sd, CFG, qtype=codecs.GGML_TYPE_Q4_0)
    reqs = [Request(prompt_ids=p, n_predict=5, request_id=i)
            for i, p in enumerate([[2, 41, 7], [2, 19, 3, 8], [2, 5]])]
    gen = GenerationParams(temp=0.0, stop_at_eos=False)

    be = BatchedEngine(CFG, params, max_batch=2, chunk=3,
                       compute_dtype=jnp.bfloat16, max_seq=32,
                       staged_kv=True)
    assert be._staged_kv
    try:
        set_pallas_mode(True)   # CPU: run kernels in interpret mode
        staged = be.serve(reqs, gen)
        set_pallas_mode(False)  # per-op XLA path on the same engine
        plain = be.serve(reqs, gen)
    finally:
        set_pallas_mode("auto")
    for i in range(len(reqs)):
        assert staged[i].ids == plain[i].ids, i


def test_engine_generate_fused_matches_per_op():
    """Engine e2e: greedy generation through the megakernel equals the
    per-op path token-for-token (CPU interpret mode, forced pallas)."""
    from biogpt_tpu.config import GenerationParams
    from biogpt_tpu.ops.qmatmul import set_pallas_mode
    from biogpt_tpu.runtime.engine import Engine

    sd = make_state_dict(CFG, seed=7)
    params = params_from_state_dict(sd, CFG, qtype=codecs.GGML_TYPE_Q4_0)
    gen = GenerationParams(n_predict=10, temp=0.0, seed=0, stop_at_eos=False)
    prompt = [2, 41, 7, 19]

    eng = Engine(CFG, params, compute_dtype=jnp.bfloat16)
    assert eng._fused_decode and eng.cache_dtype == jnp.bfloat16
    try:
        set_pallas_mode(True)   # CPU: run kernels in interpret mode
        assert eng._use_fused()
        fused_ids = eng.generate(prompt, gen).ids
        set_pallas_mode(False)  # per-op XLA path on the same engine/cache
        assert not eng._use_fused()
        plain_ids = eng.generate(prompt, gen).ids
    finally:
        set_pallas_mode("auto")
    assert fused_ids == plain_ids


def test_fused_greedy_tail_matches_logits_argmax():
    """forward_fused_decode_greedy returns argmax of forward_fused_decode's
    logits with an identical cache update (CPU interpret mode)."""
    from biogpt_tpu.models.biogpt import forward_fused_decode_greedy

    params = _packed_params(codecs.GGML_TYPE_Q4_0, seed=21)
    rng = np.random.RandomState(22)
    prompt = rng.randint(3, CFG.n_vocab, size=(1, 4)).astype(np.int32)

    cache = init_cache(CFG, batch=1, max_len=CFG.n_positions,
                       dtype=jnp.bfloat16)
    logits, cache = forward(
        params, jnp.asarray(prompt), cache, jnp.int32(0), CFG,
        compute_dtype=jnp.bfloat16, causal=True, logits_mode="last",
        allow_pallas=False)
    tok = int(np.asarray(logits).argmax(-1)[0])
    past = prompt.shape[1]
    for _ in range(3):
        t = jnp.asarray([[tok]], jnp.int32)
        logits_f, cache_a = forward_fused_decode(
            params, t, cache, jnp.int32(past), CFG,
            compute_dtype=jnp.bfloat16, kv_window=32, interpret=True)
        tok_g, cache_b = forward_fused_decode_greedy(
            params, t, cache, jnp.int32(past), CFG,
            kv_window=32, interpret=True)
        assert int(np.asarray(tok_g)[0]) == int(np.asarray(logits_f).argmax(-1)[0])
        np.testing.assert_array_equal(np.asarray(cache_a.k),
                                      np.asarray(cache_b.k))
        np.testing.assert_array_equal(np.asarray(cache_a.v),
                                      np.asarray(cache_b.v))
        cache, tok, past = cache_a, int(np.asarray(tok_g)[0]), past + 1


def test_engine_uses_fused_greedy_tail():
    """The Engine engages the lm_head argmax kernel for greedy fused decode
    and still matches the per-op path token-for-token."""
    from biogpt_tpu.config import GenerationParams
    from biogpt_tpu.ops.qmatmul import set_pallas_mode
    from biogpt_tpu.runtime.engine import Engine

    sd = make_state_dict(CFG, seed=23)
    params = params_from_state_dict(sd, CFG, qtype=codecs.GGML_TYPE_Q4_1)
    gen = GenerationParams(n_predict=8, temp=0.0, seed=0, stop_at_eos=False)
    prompt = [2, 17, 5]

    eng = Engine(CFG, params, compute_dtype=jnp.bfloat16)
    assert eng._fused_greedy  # tiny vocab is lane-aligned -> tail engages
    try:
        set_pallas_mode(True)
        fused_ids = eng.generate(prompt, gen).ids
        set_pallas_mode(False)
        plain_ids = eng.generate(prompt, gen).ids
    finally:
        set_pallas_mode("auto")
    assert fused_ids == plain_ids


def test_supports_layers_rejects_chunk_remainder_d_in():
    """A hypothetical d_model like 1536 (not a multiple of the kernel's
    1024-wide dequant chunk) must not engage the megakernel — its matmul
    loops have no remainder path (review finding, round 3)."""
    cfg = BioGptConfig.tiny(d_model=1536, d_ff=1536, n_head=4, n_layer=1,
                            n_vocab=256, n_positions=32)
    sd = make_state_dict(cfg, seed=3)
    params = params_from_state_dict(sd, cfg, qtype=codecs.GGML_TYPE_Q4_0)
    packed = _pack_matmul_weights(params)
    assert not supports_layers(packed["layers"], jnp.bfloat16, batch=1,
                               n_new=1)


@pytest.mark.parametrize("B", [2, 8, 32])
def test_kv_commit_kernel_matches_dus(B):
    """The aligned-RMW cache-commit kernel == per-slot dynamic_update_slice,
    at unaligned positions incl. the edges (0 and S-1), and it must not
    disturb any other cache row."""
    from biogpt_tpu.ops.pallas_decode import kv_commit_pallas

    L, S, D = 3, 64, 256
    rng = np.random.RandomState(B)
    k = jnp.asarray(rng.randn(L, B, S, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(L, B, S, D), jnp.bfloat16)
    kr = jnp.asarray(rng.randn(L, B, D), jnp.float32)
    vr = jnp.asarray(rng.randn(L, B, D), jnp.float32)
    past = np.array([(7 * i + 3) % S for i in range(B)], np.int32)
    past[0] = 0
    if B > 1:
        past[1] = S - 1
    past = jnp.asarray(past)

    k_ref, v_ref = np.asarray(k, np.float32), np.asarray(v, np.float32)
    k_ref = k_ref.copy()
    v_ref = v_ref.copy()
    for b in range(B):
        k_ref[:, b, int(past[b])] = np.asarray(
            kr[:, b].astype(jnp.bfloat16), np.float32)
        v_ref[:, b, int(past[b])] = np.asarray(
            vr[:, b].astype(jnp.bfloat16), np.float32)

    k2, v2 = kv_commit_pallas(
        k, v, jnp.transpose(kr, (1, 0, 2)), jnp.transpose(vr, (1, 0, 2)),
        past, interpret=True)
    np.testing.assert_array_equal(np.asarray(k2, np.float32), k_ref)
    np.testing.assert_array_equal(np.asarray(v2, np.float32), v_ref)


@pytest.mark.parametrize("B", [2, 8, 32])
def test_kv_commit_quant_kernel_matches_dus(B):
    """The int8 aligned-RMW commit kernel == the per-slot DUS path for
    levels AND scale planes, at unaligned positions incl. edges (0, S-1),
    without disturbing any other row/lane."""
    from biogpt_tpu.ops.pallas_decode import kv_commit_quant_pallas

    L, S, D = 3, 256, 256
    rng = np.random.RandomState(B + 100)
    k = jnp.asarray(rng.randint(-127, 128, (L, B, S, D)), jnp.int8)
    v = jnp.asarray(rng.randint(-127, 128, (L, B, S, D)), jnp.int8)
    ks = jnp.asarray(rng.rand(L, B, 1, S), jnp.float32)
    vs = jnp.asarray(rng.rand(L, B, 1, S), jnp.float32)
    kq = jnp.asarray(rng.randint(-127, 128, (L, B, D)), jnp.int8)
    vq = jnp.asarray(rng.randint(-127, 128, (L, B, D)), jnp.int8)
    ksc = jnp.asarray(rng.rand(L, B), jnp.float32)
    vsc = jnp.asarray(rng.rand(L, B), jnp.float32)
    past = np.array([(31 * i + 5) % S for i in range(B)], np.int32)
    past[0] = 0
    if B > 1:
        past[1] = S - 1
    past = jnp.asarray(past)

    k_ref = np.asarray(k).copy()
    v_ref = np.asarray(v).copy()
    ks_ref = np.asarray(ks).copy()
    vs_ref = np.asarray(vs).copy()
    for b in range(B):
        p = int(past[b])
        k_ref[:, b, p] = np.asarray(kq[:, b])
        v_ref[:, b, p] = np.asarray(vq[:, b])
        ks_ref[:, b, 0, p] = np.asarray(ksc[:, b])
        vs_ref[:, b, 0, p] = np.asarray(vsc[:, b])

    k2, v2, ks2, vs2 = kv_commit_quant_pallas(
        k, v, ks, vs,
        jnp.transpose(kq, (1, 0, 2)), jnp.transpose(vq, (1, 0, 2)),
        jnp.transpose(ksc, (1, 0))[..., None],
        jnp.transpose(vsc, (1, 0))[..., None],
        past, interpret=True)
    np.testing.assert_array_equal(np.asarray(k2), k_ref)
    np.testing.assert_array_equal(np.asarray(v2), v_ref)
    np.testing.assert_array_equal(np.asarray(ks2), ks_ref)
    np.testing.assert_array_equal(np.asarray(vs2), vs_ref)


def test_fused_greedy_tail_batched_commit_matches():
    """At B > 1 (lane-aligned D, bf16 cache) the greedy tail runs the
    epilogue+commit kernel — token ids AND the committed cache must match
    the separate-epilogue forward_fused_decode path at per-slot
    positions."""
    from biogpt_tpu.models.biogpt import forward_fused_decode_greedy

    params = _packed_params(codecs.GGML_TYPE_Q4_0, seed=41)
    B = 4
    rng = np.random.RandomState(42)
    cache = init_cache(CFG, batch=B, max_len=CFG.n_positions,
                       dtype=jnp.bfloat16)
    # distinct per-slot positions (edges included)
    past = jnp.asarray([0, 3, 9, CFG.n_positions - 2], jnp.int32)
    # seed the caches with junk so an off-position write would be seen
    cache = type(cache)(
        k=jnp.asarray(rng.randn(*cache.k.shape), jnp.bfloat16),
        v=jnp.asarray(rng.randn(*cache.v.shape), jnp.bfloat16))
    toks = jnp.asarray(rng.randint(3, CFG.n_vocab, size=(B, 1)), jnp.int32)

    logits, cache_a = forward_fused_decode(
        params, toks, cache, past, CFG, compute_dtype=jnp.bfloat16,
        kv_window=CFG.n_positions, interpret=True)
    tok_g, cache_b, ok = forward_fused_decode_greedy(
        params, toks, cache, past, CFG, kv_window=CFG.n_positions,
        interpret=True, with_health=True, health_per_row=True)
    np.testing.assert_array_equal(
        np.asarray(tok_g), np.asarray(logits).argmax(-1).astype(np.int32))
    assert bool(np.asarray(ok).all())
    np.testing.assert_array_equal(np.asarray(cache_a.k, np.float32),
                                  np.asarray(cache_b.k, np.float32))
    np.testing.assert_array_equal(np.asarray(cache_a.v, np.float32),
                                  np.asarray(cache_b.v, np.float32))
