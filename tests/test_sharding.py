"""Tensor/data-parallel sharding tests on the 8-virtual-device CPU mesh.

Checks that (a) sharded execution produces the same numbers as single-device
execution (mesh-degeneracy and TP-correctness), (b) weights actually land
sharded, (c) quantized plane shardings line up with their scale planes.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding

from biogpt_tpu.config import BioGptConfig
from biogpt_tpu.modelio.checkpoint import params_from_state_dict
from biogpt_tpu.modelio.synthetic import make_state_dict
from biogpt_tpu.parallel import make_mesh, shard_params, param_pspecs
from biogpt_tpu.quant import codecs
from biogpt_tpu.runtime.engine import Engine

TINY = BioGptConfig.tiny()   # n_head=4, d_ff=128, d_model=64, vocab 256


@pytest.fixture(scope="module")
def tiny_params():
    sd = make_state_dict(TINY, seed=11)
    return params_from_state_dict(sd, TINY)


@pytest.fixture(scope="module")
def tiny_params_q4():
    sd = make_state_dict(TINY, seed=11)
    return params_from_state_dict(sd, TINY, qtype=codecs.GGML_TYPE_Q4_0)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("data,model", [(1, 1), (1, 4), (2, 4), (8, 1)])
def test_sharded_logits_match_single_device(tiny_params, data, model):
    ids = np.array([[2, 10, 25, 48, 7, 31, 5, 99]], dtype=np.int32)
    base = Engine(TINY, tiny_params, compute_dtype=jnp.float32).score(ids)
    mesh = make_mesh(data=data, model=model)
    sharded = Engine(TINY, tiny_params, compute_dtype=jnp.float32,
                     mesh=mesh).score(ids)
    np.testing.assert_allclose(sharded, base, rtol=2e-5, atol=2e-5)


def test_sharded_quantized_logits_match(tiny_params_q4):
    ids = np.array([[2, 10, 25, 48, 7, 31]], dtype=np.int32)
    # pack_q4=False: the mesh path never packs, so compare like-for-like
    base = Engine(TINY, tiny_params_q4, compute_dtype=jnp.float32,
                  pack_q4=False).score(ids)
    mesh = make_mesh(data=1, model=4)
    sharded = Engine(TINY, tiny_params_q4, compute_dtype=jnp.float32,
                     mesh=mesh).score(ids)
    np.testing.assert_allclose(sharded, base, rtol=2e-5, atol=2e-5)


def test_sharded_generation_matches(tiny_params):
    from biogpt_tpu.config import GenerationParams

    gen = GenerationParams(n_predict=8, temp=0.0, stop_at_eos=False)
    prompt = [2, 10, 25, 48]
    base = Engine(TINY, tiny_params, compute_dtype=jnp.float32)
    mesh = make_mesh(data=1, model=4)
    par = Engine(TINY, tiny_params, compute_dtype=jnp.float32, mesh=mesh)
    assert base.generate(prompt, gen).ids == par.generate(prompt, gen).ids


def test_weights_actually_sharded(tiny_params):
    mesh = make_mesh(data=1, model=4)
    sharded = shard_params(tiny_params, mesh)
    L = TINY.n_layer
    w = sharded["layers"]["fc1"]["w"]   # column-parallel (L, d_model, d_ff)
    assert isinstance(w.sharding, NamedSharding)
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    assert shard_shapes == {(L, TINY.d_model, TINY.d_ff // 4)}
    w2 = sharded["layers"]["o"]["w"]    # row-parallel
    assert {s.data.shape for s in w2.addressable_shards} == \
        {(L, TINY.d_model // 4, TINY.d_model)}


def test_quantized_planes_shard_consistently(tiny_params_q4):
    mesh = make_mesh(data=1, model=4)
    sharded = shard_params(tiny_params_q4, mesh)
    L = TINY.n_layer
    qt = sharded["layers"]["fc2"]["w"]   # row-parallel: d_ff sharded
    lv_shapes = {s.data.shape for s in qt.levels.addressable_shards}
    sc_shapes = {s.data.shape for s in qt.scales.addressable_shards}
    assert lv_shapes == {(L, TINY.d_ff // 4, TINY.d_model)}
    assert sc_shapes == {(L, TINY.d_ff // 32 // 4, TINY.d_model)}


def test_spec_tree_matches_param_structure(tiny_params):
    specs = param_pspecs(tiny_params)
    assert set(specs) == set(tiny_params)
    assert set(specs["layers"]) == set(tiny_params["layers"])


# ---------------------------------------------------------- shard_map TP

# Lane-aligned shards at tp=4: local qkv d_out 384, fc1 shard 128 — the
# per-shard packed Pallas kernel engages (d_model=64 TINY shards to 16-wide
# slivers that only exercise the XLA fallback).
TPCFG = BioGptConfig.tiny(d_model=512, d_ff=512, n_head=4, n_layer=2,
                          n_vocab=300, n_positions=64)


@pytest.fixture(scope="module")
def tp_params_q4():
    sd = make_state_dict(TPCFG, seed=13)
    return params_from_state_dict(sd, TPCFG, qtype=codecs.GGML_TYPE_Q4_0)


@pytest.mark.parametrize("data,model", [(1, 4), (2, 4), (1, 1)])
def test_tp_forward_matches_single(tp_params_q4, data, model):
    """shard_map TP forward (XLA per-shard kernels) == single-device."""
    from biogpt_tpu.models.biogpt import forward
    from biogpt_tpu.parallel.tp import (make_tp_forward, pack_params_tp,
                                        shard_params_tp, supports_tp)
    from biogpt_tpu.runtime.cache import init_cache

    assert supports_tp(TPCFG, model)
    mesh = make_mesh(data, model)
    tpp = shard_params_tp(pack_params_tp(tp_params_q4, model), mesh)
    fwd = jax.jit(make_tp_forward(mesh), static_argnames=(
        "config", "compute_dtype", "causal", "logits_mode", "allow_pallas"))
    ids = np.random.RandomState(0).randint(3, 299, size=(2, 6)).astype(np.int32)
    cache = init_cache(TPCFG, batch=2, max_len=32, dtype=jnp.float16)
    base, cache_b = jax.jit(forward, static_argnames=(
        "config", "compute_dtype", "causal", "logits_mode", "allow_pallas"))(
        tp_params_q4, jnp.asarray(ids), cache, jnp.int32(0), TPCFG,
        compute_dtype=jnp.float32, logits_mode="last", allow_pallas=False)
    got, cache_t = fwd(
        tpp, jnp.asarray(ids), cache, jnp.int32(0), TPCFG,
        compute_dtype=jnp.float32, logits_mode="last", allow_pallas=False)
    # packed planes hold bf16 scales (vs f16 unpacked) — small drift
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=2e-2, atol=2e-2)
    assert (np.asarray(got).argmax(-1) == np.asarray(base).argmax(-1)).all()
    np.testing.assert_allclose(
        np.asarray(cache_t.k, np.float32), np.asarray(cache_b.k, np.float32),
        rtol=2e-2, atol=2e-2)


def test_tp_forward_packed_pallas_matches(tp_params_q4):
    """Per-shard PACKED Pallas kernels (forced interpret) == XLA path."""
    from biogpt_tpu.ops.qmatmul import set_pallas_mode
    from biogpt_tpu.parallel.tp import (make_tp_forward, pack_params_tp,
                                        shard_params_tp)
    from biogpt_tpu.runtime.cache import init_cache

    mesh = make_mesh(1, 4)
    tpp = shard_params_tp(pack_params_tp(tp_params_q4, 4), mesh)
    fwd = jax.jit(make_tp_forward(mesh), static_argnames=(
        "config", "compute_dtype", "causal", "logits_mode", "allow_pallas"))
    tok = jnp.asarray([[7]], jnp.int32)
    cache = init_cache(TPCFG, batch=1, max_len=32, dtype=jnp.float16)
    try:
        set_pallas_mode(True)    # decode shape m=1: packed kernel engages
        pall, _ = fwd(tpp, tok, cache, jnp.int32(0), TPCFG,
                      compute_dtype=jnp.bfloat16, logits_mode="last",
                      allow_pallas=True)
        set_pallas_mode(False)
        xla, _ = fwd(tpp, tok, cache, jnp.int32(0), TPCFG,
                     compute_dtype=jnp.bfloat16, logits_mode="last",
                     allow_pallas=True)
    finally:
        set_pallas_mode("auto")
    np.testing.assert_allclose(np.asarray(pall), np.asarray(xla),
                               rtol=5e-2, atol=0.3)
    assert np.asarray(pall).argmax(-1) == np.asarray(xla).argmax(-1)


def test_tp_forward_matches_single_q5(tp_params_q4):
    """Row-parallel chunked 5-bit packing (nibble + fifth-bit plane per
    shard chunk) stays numerically consistent under TP."""
    from biogpt_tpu.models.biogpt import forward
    from biogpt_tpu.parallel.tp import (make_tp_forward, pack_params_tp,
                                        shard_params_tp)
    from biogpt_tpu.runtime.cache import init_cache

    sd = make_state_dict(TPCFG, seed=17)
    params = params_from_state_dict(sd, TPCFG, qtype=codecs.GGML_TYPE_Q5_0)
    mesh = make_mesh(1, 4)
    tpp = shard_params_tp(pack_params_tp(params, 4), mesh)
    assert tpp["layers"]["fc2"]["w"].packed    # 5-bit row-parallel packs
    fwd = jax.jit(make_tp_forward(mesh), static_argnames=(
        "config", "compute_dtype", "causal", "logits_mode", "allow_pallas"))
    ids = np.random.RandomState(2).randint(3, 299, size=(1, 5)).astype(np.int32)
    cache = init_cache(TPCFG, batch=1, max_len=32, dtype=jnp.float16)
    base, _ = jax.jit(forward, static_argnames=(
        "config", "compute_dtype", "causal", "logits_mode", "allow_pallas"))(
        params, jnp.asarray(ids), cache, jnp.int32(0), TPCFG,
        compute_dtype=jnp.float32, logits_mode="last", allow_pallas=False)
    got, _ = fwd(
        tpp, jnp.asarray(ids), cache, jnp.int32(0), TPCFG,
        compute_dtype=jnp.float32, logits_mode="last", allow_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=2e-2, atol=2e-2)
    assert (np.asarray(got).argmax(-1) == np.asarray(base).argmax(-1)).all()


def test_tp_engine_generate_matches(tp_params_q4):
    from biogpt_tpu.config import GenerationParams

    gen = GenerationParams(n_predict=6, temp=0.0, stop_at_eos=False)
    prompt = [2, 10, 25, 48]
    base = Engine(TPCFG, tp_params_q4, compute_dtype=jnp.float32,
                  pack_q4=False)
    mesh = make_mesh(data=1, model=4)
    par = Engine(TPCFG, tp_params_q4, compute_dtype=jnp.float32, mesh=mesh)
    assert par._tp_fwd is not None    # the shard_map TP path is live
    assert base.generate(prompt, gen).ids == par.generate(prompt, gen).ids


@pytest.mark.parametrize("data,model", [(1, 4), (2, 4)])
def test_tp_seq_parallel_prefill_matches(tp_params_q4, data, model):
    """Megatron sequence-parallel prefill (N % tp == 0: residuals/LN run on
    N/tp local rows, reduce_scatter+all_gather at the joins) == the psum
    formulation == single-device. SURVEY §2.1(e) collective overlap."""
    from biogpt_tpu.models.biogpt import forward
    from biogpt_tpu.parallel.tp import (make_tp_forward, pack_params_tp,
                                        shard_params_tp)
    from biogpt_tpu.runtime.cache import init_cache

    mesh = make_mesh(data, model)
    tpp = shard_params_tp(pack_params_tp(tp_params_q4, model), mesh)
    statics = ("config", "compute_dtype", "causal", "logits_mode",
               "allow_pallas")
    fwd_sp = jax.jit(make_tp_forward(mesh), static_argnames=statics)
    fwd_ps = jax.jit(make_tp_forward(mesh, seq_parallel=False),
                     static_argnames=statics)
    # N=8 divides tp=4 -> the sequence-parallel path engages
    ids = np.random.RandomState(1).randint(3, 299, size=(2, 8)).astype(np.int32)
    cache = init_cache(TPCFG, batch=2, max_len=32, dtype=jnp.float16)
    base, cache_b = jax.jit(forward, static_argnames=statics)(
        tp_params_q4, jnp.asarray(ids), cache, jnp.int32(0), TPCFG,
        compute_dtype=jnp.float32, logits_mode="all", allow_pallas=False)
    sp, cache_sp = fwd_sp(
        tpp, jnp.asarray(ids), cache, jnp.int32(0), TPCFG,
        compute_dtype=jnp.float32, logits_mode="all", allow_pallas=False)
    ps, _ = fwd_ps(
        tpp, jnp.asarray(ids), cache, jnp.int32(0), TPCFG,
        compute_dtype=jnp.float32, logits_mode="all", allow_pallas=False)
    # packed planes hold bf16 scales (vs f16 unpacked) — small drift vs base
    np.testing.assert_allclose(np.asarray(sp), np.asarray(base),
                               rtol=2e-2, atol=2e-2)
    # SP vs psum run the SAME packed params: near-exact (reduction order)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(ps),
                               rtol=1e-5, atol=1e-5)
    assert (np.asarray(sp).argmax(-1) == np.asarray(base).argmax(-1)).all()
    np.testing.assert_allclose(
        np.asarray(cache_sp.k, np.float32), np.asarray(cache_b.k, np.float32),
        rtol=2e-2, atol=2e-2)


def test_tp_seq_parallel_emits_reduce_scatter(tp_params_q4):
    """The SP lowering really uses reduce_scatter at the row-parallel joins
    (vs all-reduce in the psum formulation)."""
    from biogpt_tpu.parallel.tp import (make_tp_forward, pack_params_tp,
                                        shard_params_tp)
    from biogpt_tpu.runtime.cache import init_cache

    mesh = make_mesh(1, 4)
    tpp = shard_params_tp(pack_params_tp(tp_params_q4, 4), mesh)
    statics = ("config", "compute_dtype", "causal", "logits_mode",
               "allow_pallas")
    ids = jnp.zeros((1, 8), jnp.int32)
    cache = init_cache(TPCFG, batch=1, max_len=32, dtype=jnp.float16)

    def lower(seq_parallel):
        fwd = jax.jit(make_tp_forward(mesh, seq_parallel=seq_parallel),
                      static_argnames=statics)
        return fwd.lower(
            tpp, ids, cache, jnp.int32(0), TPCFG,
            compute_dtype=jnp.float32, logits_mode="last",
            allow_pallas=False).as_text()

    assert "reduce_scatter" in lower(True)
    assert "reduce_scatter" not in lower(False)


def test_tp_seq_parallel_falls_back_non_divisible(tp_params_q4):
    """N=6 does not divide tp=4: the forward silently uses the psum path
    and still matches single-device (covered by test_tp_forward_matches_
    single) — here just assert no reduce_scatter is emitted."""
    from biogpt_tpu.parallel.tp import (make_tp_forward, pack_params_tp,
                                        shard_params_tp)
    from biogpt_tpu.runtime.cache import init_cache

    mesh = make_mesh(1, 4)
    tpp = shard_params_tp(pack_params_tp(tp_params_q4, 4), mesh)
    statics = ("config", "compute_dtype", "causal", "logits_mode",
               "allow_pallas")
    fwd = jax.jit(make_tp_forward(mesh), static_argnames=statics)
    cache = init_cache(TPCFG, batch=1, max_len=32, dtype=jnp.float16)
    txt = fwd.lower(
        tpp, jnp.zeros((1, 6), jnp.int32), cache, jnp.int32(0), TPCFG,
        compute_dtype=jnp.float32, logits_mode="last",
        allow_pallas=False).as_text()
    assert "reduce_scatter" not in txt


# ------------------------------------------------- TP decode megakernel

@pytest.mark.parametrize("data,model", [(1, 2), (1, 4), (2, 4)])
def test_tp_fused_decode_step_matches_per_op(tp_params_q4, data, model):
    """The TP megakernel (per-layer kernel halves with Megatron psums
    between — ops/pallas_decode_tp.py, interpret mode) produces the same
    decode logits and cache rows as the per-op shard_map TP path on the
    same mesh (VERDICT r3 #3 verification methodology)."""
    from biogpt_tpu.ops.qmatmul import set_pallas_mode
    from biogpt_tpu.parallel.tp import (make_tp_forward, pack_params_tp,
                                        shard_params_tp)
    from biogpt_tpu.runtime.cache import init_cache

    mesh = make_mesh(data, model)
    tpp = shard_params_tp(pack_params_tp(tp_params_q4, model), mesh)
    per_op = make_tp_forward(mesh)
    ids = np.random.RandomState(3).randint(3, 299, size=(2, 6)).astype(
        np.int32)
    cache0 = init_cache(TPCFG, batch=2, max_len=32, dtype=jnp.bfloat16)
    # seed the cache through the per-op prefill (both paths start from it)
    _, cache_pre = per_op(tpp, jnp.asarray(ids), cache0, jnp.int32(0),
                          TPCFG, compute_dtype=jnp.bfloat16,
                          logits_mode="last", allow_pallas=False,
                          kv_window=32)
    tok = jnp.asarray([[7], [12]], jnp.int32)
    base, cache_b = per_op(tpp, tok, cache_pre, jnp.int32(6), TPCFG,
                           compute_dtype=jnp.bfloat16, logits_mode="last",
                           allow_pallas=False, kv_window=32)
    try:
        set_pallas_mode(True)   # CPU: kernels run in interpret mode
        fused_fwd = make_tp_forward(mesh, fused_decode=True)
        got, cache_f = fused_fwd(tpp, tok, cache_pre, jnp.int32(6), TPCFG,
                                 compute_dtype=jnp.bfloat16,
                                 logits_mode="last", allow_pallas=False,
                                 kv_window=32)
    finally:
        set_pallas_mode("auto")
    base, got = np.asarray(base, np.float32), np.asarray(got, np.float32)
    assert (got.argmax(-1) == base.argmax(-1)).all()
    np.testing.assert_allclose(got, base, rtol=5e-2, atol=0.35)
    np.testing.assert_allclose(
        np.asarray(cache_f.k[:, :, :7], np.float32),
        np.asarray(cache_b.k[:, :, :7], np.float32), rtol=2e-2, atol=0.1)


def test_tp_fused_serving_matches_per_op(tp_params_q4):
    """BatchedEngine e2e on a mesh: lockstep serving through the TP
    megakernel (tp_fused_decode=True) equals the per-op TP path
    request-for-request, including a refill wave (refill prefills stay
    per-op in both engines)."""
    from biogpt_tpu.config import GenerationParams
    from biogpt_tpu.ops.qmatmul import set_pallas_mode
    from biogpt_tpu.runtime.serving import BatchedEngine, Request

    mesh = make_mesh(1, 4)

    def reqs():
        return [Request(prompt_ids=p, n_predict=4, request_id=i)
                for i, p in enumerate([[2, 41, 7], [2, 19, 3, 8], [2, 5]])]

    gen = GenerationParams(temp=0.0, stop_at_eos=False)
    plain = BatchedEngine(TPCFG, tp_params_q4, max_batch=2, chunk=2,
                          compute_dtype=jnp.bfloat16, max_seq=32, mesh=mesh)
    base = plain.serve(reqs(), gen)
    try:
        set_pallas_mode(True)   # CPU: kernels run in interpret mode
        fused = BatchedEngine(TPCFG, tp_params_q4, max_batch=2, chunk=2,
                              compute_dtype=jnp.bfloat16, max_seq=32,
                              mesh=mesh, tp_fused_decode=True)
        assert fused._tp_fused and fused.cache_dtype == jnp.bfloat16
        got = fused.serve(reqs(), gen)
    finally:
        set_pallas_mode("auto")
    for i in range(3):
        assert got[i].ids == base[i].ids, i


def test_tp_fused_engine_generate_matches(tp_params_q4):
    """Engine e2e: greedy generation through the TP megakernel equals the
    per-op TP path token-for-token on the same mesh."""
    from biogpt_tpu.config import GenerationParams
    from biogpt_tpu.ops.qmatmul import set_pallas_mode

    gen = GenerationParams(n_predict=6, temp=0.0, stop_at_eos=False)
    prompt = [2, 10, 25, 48]
    mesh = make_mesh(1, 4)
    base = Engine(TPCFG, tp_params_q4, compute_dtype=jnp.bfloat16,
                  mesh=mesh).generate(prompt, gen).ids
    try:
        set_pallas_mode(True)   # CPU: kernels run in interpret mode
        par = Engine(TPCFG, tp_params_q4, compute_dtype=jnp.bfloat16,
                     mesh=mesh, tp_fused_decode=True)
        assert par._tp_fused and par.cache_dtype == jnp.bfloat16
        got = par.generate(prompt, gen).ids
    finally:
        set_pallas_mode("auto")
    assert got == base


def test_tp_fused_decode_step_int8_matches_per_op(tp_params_q4):
    """int8-KV TP megakernel (round 5): the 3-kernel layer (qkv kernel,
    pmax-exact row quantization in XLA, ext-qkv attention kernel, FFN
    kernel) matches the per-op int8 TP path — same logits winners, and
    the written cache row dequantizes to the same values (quantize_rows
    with pmax is the shared contract; exact level identity cannot hold
    because the qkv KERNEL's low-bit numerics differ from the per-op
    projection it replaces)."""
    from biogpt_tpu.ops.qmatmul import set_pallas_mode
    from biogpt_tpu.parallel.tp import (make_tp_forward, pack_params_tp,
                                        shard_params_tp)
    from biogpt_tpu.runtime.cache import init_cache

    mesh = make_mesh(1, 4)
    tpp = shard_params_tp(pack_params_tp(tp_params_q4, 4), mesh)
    per_op = make_tp_forward(mesh)
    ids = np.random.RandomState(3).randint(3, 299, size=(2, 6)).astype(
        np.int32)
    cache0 = init_cache(TPCFG, batch=2, max_len=32, dtype=jnp.int8)
    _, cache_pre = per_op(tpp, jnp.asarray(ids), cache0, jnp.int32(0),
                          TPCFG, compute_dtype=jnp.bfloat16,
                          logits_mode="last", allow_pallas=False,
                          kv_window=32)
    tok = jnp.asarray([[7], [12]], jnp.int32)
    base, cache_b = per_op(tpp, tok, cache_pre, jnp.int32(6), TPCFG,
                           compute_dtype=jnp.bfloat16, logits_mode="last",
                           allow_pallas=False, kv_window=32)
    try:
        set_pallas_mode(True)   # CPU: kernels run in interpret mode
        fused_fwd = make_tp_forward(mesh, fused_decode=True)
        got, cache_f = fused_fwd(tpp, tok, cache_pre, jnp.int32(6), TPCFG,
                                 compute_dtype=jnp.bfloat16,
                                 logits_mode="last", allow_pallas=False,
                                 kv_window=32)
    finally:
        set_pallas_mode("auto")
    base, got = np.asarray(base, np.float32), np.asarray(got, np.float32)
    assert (got.argmax(-1) == base.argmax(-1)).all()
    np.testing.assert_allclose(got, base, rtol=5e-2, atol=0.35)
    # the written row (position 6): dequantized values match
    def row(c, t):
        lv = np.asarray(getattr(c, t)[:, :, 6], np.float32)
        sc = np.asarray(getattr(c, t + "s")[:, :, 0, 6], np.float32)
        return lv * sc[:, :, None]

    np.testing.assert_allclose(row(cache_f, "k"), row(cache_b, "k"),
                               rtol=2e-2, atol=0.1)
    np.testing.assert_allclose(row(cache_f, "v"), row(cache_b, "v"),
                               rtol=2e-2, atol=0.1)


def test_tp_fused_engine_generate_int8_matches(tp_params_q4):
    """Engine e2e: greedy generation through the int8-KV TP megakernel
    equals the per-op int8 TP path token-for-token."""
    from biogpt_tpu.config import GenerationParams
    from biogpt_tpu.ops.qmatmul import set_pallas_mode

    gen = GenerationParams(n_predict=6, temp=0.0, stop_at_eos=False)
    prompt = [2, 10, 25, 48]
    mesh = make_mesh(1, 4)
    base = Engine(TPCFG, tp_params_q4, compute_dtype=jnp.bfloat16,
                  mesh=mesh, kv_quant=True).generate(prompt, gen).ids
    try:
        set_pallas_mode(True)   # CPU: kernels run in interpret mode
        par = Engine(TPCFG, tp_params_q4, compute_dtype=jnp.bfloat16,
                     mesh=mesh, kv_quant=True, tp_fused_decode=True)
        assert par._tp_fused
        got = par.generate(prompt, gen).ids
    finally:
        set_pallas_mode("auto")
    assert got == base
