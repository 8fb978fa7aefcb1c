"""Pallas fused dequant-matmul kernel vs the XLA oracle (interpret mode)."""

import numpy as np
import pytest
import jax.numpy as jnp

from biogpt_tpu.ops import dequantize
from biogpt_tpu.ops.pallas_qmatmul import qmatmul_pallas, supports
from biogpt_tpu.quant import codecs
from biogpt_tpu.quant.layouts import (
    pack_nibble_planes,
    quantize_to_planes,
    unpack_nibble_planes,
)

ALL_QTYPES = [codecs.GGML_TYPE_Q4_0, codecs.GGML_TYPE_Q4_1,
              codecs.GGML_TYPE_Q5_0, codecs.GGML_TYPE_Q5_1,
              codecs.GGML_TYPE_Q8_0]


def _qt(qtype, d_out=256, d_in=128, seed=0):
    rng = np.random.RandomState(seed)
    w = rng.randn(d_out, d_in).astype(np.float32)
    return quantize_to_planes(w, qtype)


def test_pack_unpack_roundtrip():
    qt = _qt(codecs.GGML_TYPE_Q4_0)
    packed = pack_nibble_planes(qt)
    assert packed.packed and packed.levels.dtype == np.uint8
    assert packed.levels.shape == (qt.levels.shape[0] // 2, qt.levels.shape[1])
    back = unpack_nibble_planes(packed)
    np.testing.assert_array_equal(back.levels, qt.levels)


@pytest.mark.parametrize("qtype", [codecs.GGML_TYPE_Q5_0,
                                   codecs.GGML_TYPE_Q5_1])
@pytest.mark.parametrize("chunks", [1, 2])
def test_pack_unpack_roundtrip_5bit(qtype, chunks):
    qt = _qt(qtype, d_out=256, d_in=256)
    packed = pack_nibble_planes(qt, chunks=chunks)
    assert packed.packed and packed.levels.dtype == np.uint8
    # nibble plane (d_in//2) + fifth-bit plane (d_in//8): 0.625 B/weight
    d_in = qt.levels.shape[0]
    assert packed.levels.shape == (d_in // 2 + d_in // 8, qt.levels.shape[1])
    back = unpack_nibble_planes(packed, chunks=chunks)
    np.testing.assert_array_equal(back.levels, qt.levels)


def test_pack_noop_for_q8():
    qt = _qt(codecs.GGML_TYPE_Q8_0)
    assert pack_nibble_planes(qt) is qt


@pytest.mark.parametrize("qtype", ALL_QTYPES)
@pytest.mark.parametrize("m", [1, 8])
def test_kernel_matches_oracle_unpacked(qtype, m):
    qt = _qt(qtype)
    assert supports(qt, m)
    rng = np.random.RandomState(1)
    x = rng.randn(m, 128).astype(np.float32)
    got = np.asarray(qmatmul_pallas(jnp.asarray(x), qt, interpret=True))
    expect = x.astype(np.float32) @ np.asarray(dequantize(qt))
    # kernel feeds bf16 levels/activations to the MXU and applies f32
    # scales to per-block partial sums — same structure as the XLA
    # block-accum path, so it should match that closely and the f32
    # oracle within bf16 accumulation noise
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-1)
    from biogpt_tpu.ops import matmul as xla_matmul
    ref = np.asarray(xla_matmul(jnp.asarray(x), qt,
                                compute_dtype=jnp.bfloat16,
                                allow_pallas=False))
    # (interpret mode upcasts differently than the TPU MXU, so this is a
    # structural check, not a bit match)
    np.testing.assert_allclose(got, ref, rtol=1e-2, atol=8e-2)


@pytest.mark.parametrize("qtype", [codecs.GGML_TYPE_Q4_0,
                                   codecs.GGML_TYPE_Q4_1,
                                   codecs.GGML_TYPE_Q5_0,
                                   codecs.GGML_TYPE_Q5_1])
def test_kernel_matches_oracle_packed(qtype):
    qt = pack_nibble_planes(_qt(qtype, d_out=512, d_in=256, seed=2))
    assert qt.packed
    rng = np.random.RandomState(3)
    x = rng.randn(1, 256).astype(np.float32)
    got = np.asarray(qmatmul_pallas(jnp.asarray(x), qt, interpret=True))
    expect = x @ np.asarray(dequantize(qt))
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-1)


@pytest.mark.parametrize("qtype", [codecs.GGML_TYPE_Q5_0,
                                   codecs.GGML_TYPE_Q5_1])
def test_matmul_dispatch_packed_5bit_xla_fallback(qtype):
    """The jnp fifth-bit unpack (ops.qmatmul._unpack_levels) matches the
    oracle exactly — exercised when Pallas is unavailable."""
    from biogpt_tpu.ops import matmul

    base = _qt(qtype, d_out=512, d_in=256)
    qt = pack_nibble_planes(base)
    rng = np.random.RandomState(4)
    x = rng.randn(3, 256).astype(np.float32)
    got = np.asarray(matmul(jnp.asarray(x), qt))
    expect = x @ np.asarray(dequantize(base))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_supports_rejects_unaligned():
    qt = _qt(codecs.GGML_TYPE_Q4_0, d_out=96)   # not lane-aligned
    assert not supports(qt, 1)
    qt2 = _qt(codecs.GGML_TYPE_Q4_0)
    assert not supports(qt2, 64)                 # prefill-sized M


# ------------------------------------------------- wide-batch (m <= 32)

@pytest.mark.parametrize("qtype", ALL_QTYPES)
@pytest.mark.parametrize("m", [12, 32])
def test_wide_kernel_matches_oracle(qtype, m):
    """The 8 < m <= 32 dequant-then-dot kernel (the B=16/32 serving
    lm_head path) matches the dequantize oracle."""
    from biogpt_tpu.ops.pallas_qmatmul import (qmatmul_pallas_wide,
                                               supports_wide)

    base = _qt(qtype, d_out=512, d_in=256, seed=5)
    qt = pack_nibble_planes(base)
    assert supports_wide(qt, m) and not supports_wide(qt, 8)
    assert not supports_wide(qt, 33)
    rng = np.random.RandomState(6)
    x = rng.randn(m, 256).astype(np.float32)
    got = np.asarray(qmatmul_pallas_wide(jnp.asarray(x), qt, interpret=True))
    expect = x @ np.asarray(dequantize(base))
    # the wide path rounds the dequantized weight to bf16 before the dot
    # (exactly like pallas_decode._qmm_dq) — the same noise band as the
    # batched megakernel's oracle tests (atol covers near-zero outputs
    # whose relative error is unbounded)
    np.testing.assert_allclose(got, expect, rtol=5e-2, atol=0.5)


def test_wide_kernel_dispatch(monkeypatch):
    """ops.matmul routes 8 < m <= 32 through the wide kernel when Pallas
    is forced, and the result matches the XLA fallback path."""
    from biogpt_tpu.ops import matmul
    from biogpt_tpu.ops.qmatmul import set_pallas_mode

    qt = pack_nibble_planes(_qt(codecs.GGML_TYPE_Q4_0, d_out=512,
                                d_in=256, seed=7))
    rng = np.random.RandomState(8)
    x = rng.randn(16, 256).astype(np.float32)
    try:
        set_pallas_mode(True)
        got = np.asarray(matmul(jnp.asarray(x), qt,
                                compute_dtype=jnp.bfloat16))
        set_pallas_mode(False)
        ref = np.asarray(matmul(jnp.asarray(x), qt,
                                compute_dtype=jnp.bfloat16))
    finally:
        set_pallas_mode("auto")
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-1)


def test_matmul_dispatch_packed_xla_fallback():
    """On CPU without forcing pallas, packed tensors go through the jnp
    unpack + block-einsum path and still match the oracle."""
    from biogpt_tpu.ops import matmul

    qt = pack_nibble_planes(_qt(codecs.GGML_TYPE_Q4_0, d_out=512, d_in=256))
    rng = np.random.RandomState(4)
    x = rng.randn(3, 256).astype(np.float32)
    got = np.asarray(matmul(jnp.asarray(x), qt))
    expect = x @ np.asarray(dequantize(qt))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_engine_packs_q4_weights():
    from biogpt_tpu.config import BioGptConfig
    from biogpt_tpu.modelio.checkpoint import params_from_state_dict
    from biogpt_tpu.modelio.synthetic import make_state_dict
    from biogpt_tpu.runtime.engine import Engine

    config = BioGptConfig.tiny(d_model=128, d_ff=256, n_vocab=256)
    sd = make_state_dict(config, seed=5)
    params = params_from_state_dict(sd, config, qtype=codecs.GGML_TYPE_Q4_0)
    engine = Engine(config, params, compute_dtype=jnp.float32, pack_q4=True)
    assert engine.params["layers"]["qkv"]["w"].packed  # q/k/v fused + packed
    assert engine.params["lm_head"].packed  # 256 vocab is lane-aligned
    assert not engine.params["embed_tokens"].packed  # gather path stays flat

    # packed engine scores close to unpacked (packing converts scale planes
    # to bf16 for Mosaic, ~2^-8 relative on the scales)
    plain = Engine(config, params, compute_dtype=jnp.float32, pack_q4=False)
    ids = np.array([[2, 5, 9, 12]], dtype=np.int32)
    a, b = engine.score(ids), plain.score(ids)
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(a.argmax(-1), b.argmax(-1))


@pytest.mark.parametrize("qtype", ALL_QTYPES)
@pytest.mark.parametrize("m", [1, 4])
def test_lm_head_argmax_matches_oracle(qtype, m):
    """Fused final-LN + lm_head + argmax kernel vs LN->qmatmul->argmax,
    including the lane-padding mask (n_valid < d_out)."""
    import jax.numpy as jnp

    from biogpt_tpu.ops.pallas_qmatmul import lm_head_argmax_pallas

    qt = pack_nibble_planes(_qt(qtype, d_out=512, d_in=128, seed=11))
    rng = np.random.RandomState(12)
    x = rng.randn(m, 128).astype(np.float32)
    lnw = rng.randn(128).astype(np.float32)
    lnb = (rng.randn(128) * 0.1).astype(np.float32)
    eps = 1e-5

    mu = x.mean(1, keepdims=True)
    var = x.var(1, keepdims=True)
    xn = (x - mu) / np.sqrt(var + eps) * lnw + lnb
    logits = np.asarray(qmatmul_pallas(jnp.asarray(xn), qt, interpret=True))

    n_valid = 512 - 37  # exercise the pad-column mask
    ref = logits[:, :n_valid].argmax(-1)
    got = np.asarray(lm_head_argmax_pallas(
        jnp.asarray(x), jnp.asarray(lnw), jnp.asarray(lnb), qt,
        n_valid=n_valid, ln_eps=eps, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_lm_head_argmax_single_tile():
    """nT == 1: the init / fold / emit stages all fire on one grid step."""
    import jax.numpy as jnp

    from biogpt_tpu.ops.pallas_qmatmul import lm_head_argmax_pallas

    qt = pack_nibble_planes(_qt(codecs.GGML_TYPE_Q4_0, d_out=128, d_in=64,
                                seed=13))
    rng = np.random.RandomState(14)
    x = rng.randn(2, 64).astype(np.float32)
    lnw = np.ones(64, np.float32)
    lnb = np.zeros(64, np.float32)
    mu = x.mean(1, keepdims=True)
    xn = (x - mu) / np.sqrt(x.var(1, keepdims=True) + 1e-5)
    logits = np.asarray(qmatmul_pallas(jnp.asarray(xn), qt, interpret=True))
    got = np.asarray(lm_head_argmax_pallas(
        jnp.asarray(x), jnp.asarray(lnw), jnp.asarray(lnb), qt,
        n_valid=128, ln_eps=1e-5, interpret=True))
    np.testing.assert_array_equal(got, logits.argmax(-1))


def test_wide_kernel_rejects_chunk_remainder_d_in():
    """d_in > 1024 that is not a multiple of the kernel's chunk would
    silently drop its tail columns — the gate must reject it (review
    finding, round 3; the XLA fallback handles such shapes exactly)."""
    from biogpt_tpu.ops import matmul
    from biogpt_tpu.ops.pallas_qmatmul import supports_wide

    base = _qt(codecs.GGML_TYPE_Q4_0, d_out=256, d_in=1536, seed=9)
    qt = pack_nibble_planes(base)
    assert not supports_wide(qt, 16)
    # and the dispatch produces the EXACT product via the fallback
    rng = np.random.RandomState(10)
    x = rng.randn(16, 1536).astype(np.float32)
    got = np.asarray(matmul(jnp.asarray(x), qt))
    expect = x @ np.asarray(dequantize(base))
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("qtype", [codecs.GGML_TYPE_Q4_0,
                                   codecs.GGML_TYPE_Q4_1])
@pytest.mark.parametrize("m", [12, 32])
def test_lm_head_argmax_wide_matches_oracle(qtype, m):
    """The wide-M (8 < M <= 32) argmax path — dequant-then-dot instead of
    per-row X' passes — vs the wide matmul oracle's argmax, including the
    pad-column mask. This is batched greedy serving's per-step epilogue."""
    import jax.numpy as jnp

    from biogpt_tpu.ops.pallas_qmatmul import (lm_head_argmax_pallas,
                                               qmatmul_pallas_wide)

    qt = pack_nibble_planes(_qt(qtype, d_out=512, d_in=128, seed=21))
    rng = np.random.RandomState(22)
    x = rng.randn(m, 128).astype(np.float32)
    lnw = rng.randn(128).astype(np.float32)
    lnb = (rng.randn(128) * 0.1).astype(np.float32)
    eps = 1e-5

    mu = x.mean(1, keepdims=True)
    var = x.var(1, keepdims=True)
    xn = ((x - mu) / np.sqrt(var + eps) * lnw + lnb).astype(np.float32)
    # same numerics as the kernel: bf16 activations into the wide matmul
    logits = np.asarray(qmatmul_pallas_wide(
        jnp.asarray(xn, jnp.bfloat16), qt, interpret=True))

    n_valid = 512 - 37
    ref = logits[:, :n_valid].argmax(-1)
    got, mv = lm_head_argmax_pallas(
        jnp.asarray(x), jnp.asarray(lnw), jnp.asarray(lnb), qt,
        n_valid=n_valid, ln_eps=eps, interpret=True, with_max=True)
    np.testing.assert_array_equal(np.asarray(got), ref)
    np.testing.assert_allclose(np.asarray(mv),
                               logits[:, :n_valid].max(-1), rtol=1e-6)


@pytest.mark.parametrize("m", [8, 32])
def test_lm_head_argmax_commit_matches_separate(m):
    """The fused epilogue+commit kernel == lm_head_argmax_pallas followed
    by kv_commit_pallas: identical token ids/max values AND identical
    committed caches, at unaligned per-slot positions incl. edges."""
    import jax.numpy as jnp

    from biogpt_tpu.ops.pallas_decode import kv_commit_pallas
    from biogpt_tpu.ops.pallas_qmatmul import (
        lm_head_argmax_commit_pallas, lm_head_argmax_pallas)

    d_in, d_out, L, S = 128, 512, 3, 64
    qt = pack_nibble_planes(_qt(codecs.GGML_TYPE_Q4_0, d_out=d_out,
                                d_in=d_in, seed=31))
    rng = np.random.RandomState(32)
    x = rng.randn(m, d_in).astype(np.float32)
    lnw = rng.randn(d_in).astype(np.float32)
    lnb = (rng.randn(d_in) * 0.1).astype(np.float32)
    k = jnp.asarray(rng.randn(L, m, S, d_in), jnp.bfloat16)
    v = jnp.asarray(rng.randn(L, m, S, d_in), jnp.bfloat16)
    kr = jnp.asarray(rng.randn(m, L, d_in), jnp.float32)
    vr = jnp.asarray(rng.randn(m, L, d_in), jnp.float32)
    past = np.array([(11 * i + 3) % S for i in range(m)], np.int32)
    past[0] = 0
    past[-1] = S - 1
    past = jnp.asarray(past)
    n_valid = d_out - 37

    ref_tok, ref_mv = lm_head_argmax_pallas(
        jnp.asarray(x), jnp.asarray(lnw), jnp.asarray(lnb), qt,
        n_valid=n_valid, interpret=True, with_max=True)
    ref_k, ref_v = kv_commit_pallas(k, v, kr, vr, past, interpret=True)

    tok, mv, k2, v2 = lm_head_argmax_commit_pallas(
        jnp.asarray(x), jnp.asarray(lnw), jnp.asarray(lnb), qt, n_valid,
        k, v, kr, vr, past, interpret=True)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tok))
    np.testing.assert_allclose(np.asarray(mv), np.asarray(ref_mv),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(k2, np.float32),
                                  np.asarray(ref_k, np.float32))
    np.testing.assert_array_equal(np.asarray(v2, np.float32),
                                  np.asarray(ref_v, np.float32))
