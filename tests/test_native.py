"""Native C++ codecs vs numpy codecs: bit-exact cross-validation.

Two fully independent implementations of the same block formats — byte-level
equality here is strong evidence both derived the ggml semantics correctly.
"""

import numpy as np
import pytest

from biogpt_tpu.quant import codecs, native

ALL_QTYPES = [codecs.GGML_TYPE_Q4_0, codecs.GGML_TYPE_Q4_1,
              codecs.GGML_TYPE_Q5_0, codecs.GGML_TYPE_Q5_1,
              codecs.GGML_TYPE_Q8_0]

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native codec library unavailable (no toolchain)")


@pytest.mark.parametrize("qtype", ALL_QTYPES)
def test_native_quantize_bit_exact(qtype):
    rng = np.random.RandomState(0)
    for scale in (1.0, 1e-3, 50.0):
        x = (rng.randn(64 * 32) * scale).astype(np.float32)
        a = codecs.quantize_blocks(x, qtype)
        b = native.quantize_blocks(x, qtype)
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("qtype", ALL_QTYPES)
def test_native_dequantize_bit_exact(qtype):
    rng = np.random.RandomState(1)
    x = rng.randn(32 * 32).astype(np.float32)
    raw = codecs.quantize_blocks(x, qtype)
    a = codecs.dequantize_blocks(raw, qtype)
    b = native.dequantize_blocks(raw, qtype)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("qtype", ALL_QTYPES)
def test_native_edge_cases(qtype):
    cases = [
        np.zeros(32, np.float32),
        np.full(32, 7.25, np.float32),
        np.array([np.float32(65504)] + [0.0] * 31, np.float32),  # f16 max
        np.array([-1e-8] * 16 + [1e-8] * 16, np.float32),
        np.linspace(-3, 3, 32).astype(np.float32),
    ]
    for x in cases:
        a = codecs.quantize_blocks(x, qtype)
        b = native.quantize_blocks(x, qtype)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(
            codecs.dequantize_blocks(a, qtype),
            native.dequantize_blocks(a, qtype))


def test_fp16_conversion_corners():
    """The hand-rolled f32<->f16 in C++ must match numpy's over tricky
    values (subnormals, rounding ties, overflow)."""
    vals = np.array([
        0.0, -0.0, 1.0, -1.0, 65504.0, 65520.0, 1e-8, 6e-8, 5.96e-8,
        2.9802322e-08, 6.1035156e-05, 6.0975552e-05, 0.333251953125,
        1e9, -1e9, 3.0517578e-05,
    ], dtype=np.float32)
    # route through Q8_0 scale: d = amax/127 exercises conversion of many values
    for v in vals:
        x = np.full(32, abs(v) if v != 0 else 0.0, np.float32)
        x[0] = abs(v) * 127 if v != 0 else 0.0
        a = codecs.quantize_blocks(x, codecs.GGML_TYPE_Q8_0)
        b = native.quantize_blocks(x, codecs.GGML_TYPE_Q8_0)
        np.testing.assert_array_equal(a[:, :2], b[:, :2], err_msg=f"v={v}")
