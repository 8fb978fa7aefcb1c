"""Quant codec tests: block sizes, round-trip error bounds, exact level math,
plane-layout equivalence, and scalar reference cross-checks.

The scalar reference implementations in this file re-derive the ggml C codec
semantics element by element (independent of the vectorized numpy codecs in
biogpt_tpu.quant.codecs) so the two can cross-validate.
"""

import numpy as np
import pytest

from biogpt_tpu.quant import codecs
from biogpt_tpu.quant.codecs import (
    QK,
    BLOCK_SIZES,
    GGML_TYPE_Q4_0,
    GGML_TYPE_Q4_1,
    GGML_TYPE_Q5_0,
    GGML_TYPE_Q5_1,
    GGML_TYPE_Q8_0,
)
from biogpt_tpu.quant.layouts import to_planes, from_planes, quantize_to_planes

ALL_QTYPES = [GGML_TYPE_Q4_0, GGML_TYPE_Q4_1, GGML_TYPE_Q5_0, GGML_TYPE_Q5_1, GGML_TYPE_Q8_0]


def fp16(x):
    return np.float32(np.float16(np.float32(x)))


# ---------------------------------------------------------------- scalar refs
# Straight transliterations of the ggml block codec semantics, one element at
# a time (deliberately slow and simple).

def ref_q4_0_block(x):
    amax_i = int(np.argmax(np.abs(x)))
    maxv = np.float32(x[amax_i])
    d = np.float32(maxv / np.float32(-8.0))
    inv = np.float32(1.0 / d) if d != 0 else np.float32(0.0)
    qs = []
    for j in range(QK):
        v = np.float32(x[j]) * inv
        qi = min(15, int(np.float32(v + np.float32(8.5))))  # C cast truncation
        qs.append(max(0, qi))
    dq = [(q - 8) * fp16(d) for q in qs]
    return qs, dq


def ref_q4_1_block(x):
    mn = np.float32(np.min(x))
    mx = np.float32(np.max(x))
    d = np.float32((mx - mn) / np.float32(15.0))
    inv = np.float32(1.0 / d) if d != 0 else np.float32(0.0)
    qs = []
    for j in range(QK):
        v = np.float32((np.float32(x[j]) - mn) * inv)
        qi = min(15, int(np.float32(v + np.float32(0.5))))
        qs.append(max(0, qi))
    dq = [q * fp16(d) + fp16(mn) for q in qs]
    return qs, dq


def ref_q5_0_block(x):
    amax_i = int(np.argmax(np.abs(x)))
    maxv = np.float32(x[amax_i])
    d = np.float32(maxv / np.float32(-16.0))
    inv = np.float32(1.0 / d) if d != 0 else np.float32(0.0)
    qs = []
    for j in range(QK):
        v = np.float32(x[j]) * inv
        qi = min(31, int(np.float32(v + np.float32(16.5))))
        qs.append(max(0, qi))
    dq = [(q - 16) * fp16(d) for q in qs]
    return qs, dq


def ref_q5_1_block(x):
    mn = np.float32(np.min(x))
    mx = np.float32(np.max(x))
    d = np.float32((mx - mn) / np.float32(31.0))
    inv = np.float32(1.0 / d) if d != 0 else np.float32(0.0)
    qs = []
    for j in range(QK):
        v = np.float32((np.float32(x[j]) - mn) * inv)
        qi = min(31, int(np.float32(v + np.float32(0.5))))
        qs.append(max(0, qi))
    dq = [q * fp16(d) + fp16(mn) for q in qs]
    return qs, dq


def ref_q8_0_block(x):
    amax = np.float32(np.max(np.abs(x)))
    d = np.float32(amax / np.float32(127.0))
    inv = np.float32(1.0 / d) if d != 0 else np.float32(0.0)
    qs = [int(np.round(np.float32(x[j]) * inv)) if abs(np.float32(x[j]) * inv) % 1 != 0.5
          else int(np.trunc(np.float32(x[j]) * inv + np.copysign(0.5, x[j] * inv)))
          for j in range(QK)]
    # roundf = half away from zero on exact .5 only; np.round is half-even.
    qs = [int(np.trunc(np.float32(x[j]) * inv + np.float32(np.copysign(0.5, np.float32(x[j]) * inv)))) for j in range(QK)]
    dq = [q * fp16(d) for q in qs]
    return qs, dq


SCALAR_REFS = {
    GGML_TYPE_Q4_0: ref_q4_0_block,
    GGML_TYPE_Q4_1: ref_q4_1_block,
    GGML_TYPE_Q5_0: ref_q5_0_block,
    GGML_TYPE_Q5_1: ref_q5_1_block,
    GGML_TYPE_Q8_0: ref_q8_0_block,
}


@pytest.mark.parametrize("qtype", ALL_QTYPES)
def test_block_byte_sizes(qtype):
    x = np.random.RandomState(0).randn(4 * QK).astype(np.float32)
    raw = codecs.quantize_blocks(x, qtype)
    assert raw.shape == (4, BLOCK_SIZES[qtype])


@pytest.mark.parametrize("qtype", ALL_QTYPES)
def test_roundtrip_matches_scalar_reference(qtype):
    rng = np.random.RandomState(42)
    x = (rng.randn(8, QK) * rng.uniform(0.01, 10, size=(8, 1))).astype(np.float32)
    raw = codecs.quantize_blocks(x.reshape(-1), qtype)
    deq = codecs.dequantize_blocks(raw, qtype)
    for b in range(x.shape[0]):
        _, ref_dq = SCALAR_REFS[qtype](x[b])
        np.testing.assert_array_equal(
            deq[b], np.array(ref_dq, dtype=np.float32),
            err_msg=f"block {b} mismatch for qtype {qtype}",
        )


@pytest.mark.parametrize("qtype", ALL_QTYPES)
def test_roundtrip_error_bound(qtype):
    rng = np.random.RandomState(7)
    x = rng.randn(64, 128).astype(np.float32)
    raw = codecs.quantize_rows(x, qtype)
    deq = codecs.dequantize_rows(raw, x.shape, qtype)
    # error per element bounded by ~ the quantization step of its block
    blocks = x.reshape(-1, QK)
    span = blocks.max(axis=1) - blocks.min(axis=1)
    levels = {GGML_TYPE_Q4_0: 16, GGML_TYPE_Q4_1: 15, GGML_TYPE_Q5_0: 32,
              GGML_TYPE_Q5_1: 31, GGML_TYPE_Q8_0: 254}[qtype]
    step = np.maximum(span / levels, 1e-6)
    err = np.abs((deq - x).reshape(-1, QK))
    # allow 1.2 steps of slack for the asymmetric formats' signed-max scaling
    assert np.all(err <= 2.2 * step[:, None] + 1e-5), \
        f"max err {err.max()} vs step {step.max()}"


@pytest.mark.parametrize("qtype", ALL_QTYPES)
def test_zeros_and_constant_blocks(qtype):
    x = np.zeros((2, QK * 2), dtype=np.float32)
    raw = codecs.quantize_rows(x, qtype)
    deq = codecs.dequantize_rows(raw, x.shape, qtype)
    np.testing.assert_array_equal(deq, x)

    c = np.full((1, QK), 3.25, dtype=np.float32)
    raw = codecs.quantize_rows(c, qtype)
    deq = codecs.dequantize_rows(raw, c.shape, qtype)
    # constant blocks reconstruct within fp16 scale precision
    np.testing.assert_allclose(deq, c, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("qtype", ALL_QTYPES)
def test_planes_equal_block_dequant(qtype):
    rng = np.random.RandomState(3)
    w = rng.randn(48, 96).astype(np.float32)  # (d_out, d_in)
    raw = codecs.quantize_rows(w, qtype)
    deq_blocks = codecs.dequantize_rows(raw, w.shape, qtype)  # (d_out, d_in)
    qt = to_planes(raw, w.shape, qtype)
    assert qt.levels.shape == (96, 48)
    assert qt.scales.shape == (96 // QK, 48)
    deq_planes = from_planes(qt)  # (d_in, d_out)
    np.testing.assert_array_equal(deq_planes.T, deq_blocks)


@pytest.mark.parametrize("qtype", ALL_QTYPES)
def test_quantize_to_planes_shortcut(qtype):
    rng = np.random.RandomState(5)
    w = rng.randn(32, 64).astype(np.float32)
    qt = quantize_to_planes(w, qtype)
    raw = codecs.quantize_rows(w, qtype)
    qt2 = to_planes(raw, w.shape, qtype)
    np.testing.assert_array_equal(np.asarray(qt.levels), np.asarray(qt2.levels))
    np.testing.assert_array_equal(np.asarray(qt.scales), np.asarray(qt2.scales))


def test_q8_0_half_away_rounding():
    # Construct values that hit exact .5 scaled levels: amax=127 -> d=1.
    x = np.zeros(QK, dtype=np.float32)
    x[0] = 127.0
    x[1] = 2.5
    x[2] = -2.5
    x[3] = 3.5
    raw = codecs.quantize_blocks(x, GGML_TYPE_Q8_0)
    q = raw[0, 2:].view(np.int8)
    assert q[0] == 127
    assert q[1] == 3     # roundf(2.5) = 3 (away from zero), not 2 (half-even)
    assert q[2] == -3
    assert q[3] == 4


def test_q4_0_extremes_map_correctly():
    # The max-magnitude value must map to level 0 (dequant = max).
    x = np.linspace(-1.0, 0.9, QK).astype(np.float32)
    raw = codecs.quantize_blocks(x, GGML_TYPE_Q4_0)
    deq = codecs.dequantize_blocks(raw, GGML_TYPE_Q4_0)[0]
    assert abs(deq[0] - x[0]) < 1e-3  # -1.0 is the signed absmax
