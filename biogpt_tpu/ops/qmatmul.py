"""Quantized matmul and embedding lookup — XLA-native reference paths.

These are the correctness oracles (and default fallbacks) for the Pallas
kernels in ``pallas_qmatmul.py``. They replace ggml's fused dequant+matmul
(`ggml_mul_mat` on quantized types, the hot kernel class of the reference,
``/root/reference/biogpt.cpp:705-803``).

Key trick: the dequantized weight is never materialized. With levels L
(d_in, d_out), per-block scales d (nb, d_out) and mins m, and x reshaped to
blocks (..., nb, QK):

  _0 formats:  x @ W = sum_n [ (x_n @ L_n) * d_n ]
  _1 formats:  x @ W = sum_n [ (x_n @ L_n) * d_n + (sum_k x_nk) * m_n ]

i.e. a batched per-block matmul with the scale applied to per-block partial
sums — mathematically identical to dequantize-then-matmul (up to float
associativity), at int8 + fp16-plane memory traffic.

Integer levels are exact in bfloat16 (|level| <= 127 < 2^8), and MXU
bf16xbf16 products accumulate in f32, so the bf16 path loses precision only
through activation rounding.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..quant.codecs import QK, GGML_TYPE_Q5_0, GGML_TYPE_Q5_1
from ..quant.layouts import LEVEL_OFFSET, QuantizedTensor

# Pallas kernel usage: "auto" (TPU + supported shapes), True (force,
# interpret-mode off-TPU), False (XLA paths only).
_PALLAS_MODE = "auto"

# At and above this many activation rows, quantized matmuls dequantize the
# weight and run one dense MXU dot instead of the block-accum einsum (whose
# (m, nb, d_out) partials dominate memory traffic at prefill shapes).
# Crossover: m * (d_in/QK) * 4B of partials vs d_in * 2B of bf16 weight.
_DEQUANT_M_ROWS = 32


def set_pallas_mode(mode) -> None:
    global _PALLAS_MODE
    _PALLAS_MODE = mode


def _unpack_levels(w: QuantizedTensor) -> jax.Array:
    """jnp unpack of a packed byte plane -> centered int8 (d_in, d_out).

    Split-half nibbles for the 4-bit formats; for the 5-bit formats the
    trailing d_in//8 rows are the split-eighth fifth-bit plane (see
    quant.layouts.pack_nibble_planes). Operates on standalone (chunks=1)
    packed tensors — which includes each LOCAL shard of a chunked TP pack.
    """
    packed = jnp.asarray(w.levels)
    five_bit = w.qtype in (GGML_TYPE_Q5_0, GGML_TYPE_Q5_1)
    rows = packed.shape[0]
    d_in = rows * 8 // 5 if five_bit else rows * 2
    nib = packed[:d_in // 2]
    lo = (nib & 0x0F).astype(jnp.int8)
    hi = ((nib >> 4) & 0x0F).astype(jnp.int8)
    lv = jnp.concatenate([lo, hi], axis=0)
    if five_bit:
        plane = packed[d_in // 2:]
        fifth = jnp.concatenate(
            [((plane >> p) & 1).astype(jnp.int8) for p in range(8)], axis=0)
        lv = lv | (fifth << 4)
    return lv - jnp.int8(LEVEL_OFFSET[w.qtype])


def dequantize(w: QuantizedTensor, dtype=jnp.float32) -> jax.Array:
    """Materialize the dequantized kernel (d_in, d_out)."""
    levels = _unpack_levels(w) if w.packed else jnp.asarray(w.levels)
    scales = jnp.repeat(w.scales.astype(dtype), QK, axis=0)
    out = levels.astype(dtype) * scales
    if w.mins is not None:
        out = out + jnp.repeat(w.mins.astype(dtype), QK, axis=0)
    return out


def precision_for(dtype) -> jax.lax.Precision:
    """On TPU, f32 dot defaults to one bf16 MXU pass; request true-f32
    (multi-pass) precision when the compute dtype is float32 so parity-mode
    runs are parity-grade. bf16 inputs are unaffected."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def matmul(
    x: jax.Array,
    w: Any,
    *,
    compute_dtype: Optional[jnp.dtype] = None,
    allow_pallas: bool = True,
) -> jax.Array:
    """y = x @ w for dense (d_in, d_out) or QuantizedTensor weights.

    ``x``: (..., d_in). Output: (..., d_out) in f32 (accumulator dtype).
    ``compute_dtype`` casts the multiplicands (bf16 for MXU speed, f32 for
    parity); defaults to x.dtype for dense and f32 for quantized oracle use.
    """
    if compute_dtype == jnp.bfloat16 and jax.default_backend() == "cpu":
        # CPU XLA lacks the batched bf16 x bf16 -> f32 dot; bf16 only pays
        # on the MXU anyway.
        compute_dtype = jnp.float32

    if not isinstance(w, QuantizedTensor):
        cd = compute_dtype or x.dtype
        return jnp.dot(x.astype(cd), w.astype(cd),
                       preferred_element_type=jnp.float32,
                       precision=precision_for(cd))

    # Pallas fused dequant+matmul on the decode-side shapes
    batch_shape = x.shape[:-1]
    m = 1
    for b in batch_shape:
        m *= b
    if allow_pallas and _PALLAS_MODE is not False:
        from .pallas_qmatmul import (qmatmul_pallas, qmatmul_pallas_wide,
                                     supports, supports_wide)

        on_tpu = jax.default_backend() == "tpu"
        if supports(w, m) and (on_tpu or _PALLAS_MODE is True):
            d_in = w.scales.shape[-2] * QK
            y = qmatmul_pallas(x.reshape(m, d_in), w, interpret=not on_tpu)
            return y.reshape(*batch_shape, y.shape[-1])
        if supports_wide(w, m) and (on_tpu or _PALLAS_MODE is True):
            # wide decode batches (8 < m <= 32): dequant-then-dot in-kernel
            # — the XLA fallback re-materializes the dequantized weight in
            # HBM every step (0.3+ ms for the 42k-vocab lm_head)
            d_in = w.scales.shape[-2] * QK
            y = qmatmul_pallas_wide(x.reshape(m, d_in), w,
                                    interpret=not on_tpu)
            return y.reshape(*batch_shape, y.shape[-1])

    if w.packed:
        w = QuantizedTensor(levels=_unpack_levels(w), scales=w.scales,
                            mins=w.mins, qtype=w.qtype, packed=False)

    cd = compute_dtype or jnp.float32
    d_in, d_out = w.levels.shape
    nb = d_in // QK

    if m >= _DEQUANT_M_ROWS:
        # Prefill shapes: the block-accum formulation below materializes an
        # (m, nb, d_out) f32 partial tensor (268 MB for fc2 at m=512) and
        # its scale-reduce pass is memory-bound — at large m it ran ~14x
        # off the FLOPs roofline. Dequantize-then-dot streams the weight
        # once (elementwise unpack+scale, fused by XLA) and feeds the MXU
        # one dense (m, d_in) x (d_in, d_out) matmul. Dequant happens in
        # f32 and rounds once to the compute dtype — the same numerics as
        # the megakernel's batched formulation (pallas_decode._qmm_dq).
        wd = dequantize(w, dtype=jnp.float32).astype(cd)
        return jnp.dot(x.astype(cd), wd, preferred_element_type=jnp.float32,
                       precision=precision_for(cd))
    xb = x.reshape(*batch_shape, nb, QK).astype(cd)
    levels = w.levels.reshape(nb, QK, d_out).astype(cd)
    # per-block partial sums, f32 accumulation on the MXU
    partial = jnp.einsum(
        "...nk,nko->...no", xb, levels, preferred_element_type=jnp.float32,
        precision=precision_for(cd),
    )
    out = jnp.sum(partial * w.scales.astype(jnp.float32), axis=-2)
    if w.mins is not None:
        xsum = jnp.sum(xb.astype(jnp.float32), axis=-1)  # (..., nb)
        out = out + jnp.einsum(
            "...n,no->...o", xsum, w.mins.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    return out


def embedding_lookup(ids: jax.Array, table: Any, dtype=jnp.float32) -> jax.Array:
    """Row gather from a dense or quantized (row-major planes) embedding.

    ``ids``: int array (...,). Output: (..., d_model). Quantized rows are
    dequantized on the fly — bit-identical values to full dequantization.
    """
    if not isinstance(table, QuantizedTensor):
        return jnp.asarray(table)[ids].astype(dtype)
    lv = table.levels[ids].astype(dtype)                      # (..., D)
    sc = table.scales[ids].astype(dtype)                      # (..., D//QK)
    out = lv * jnp.repeat(sc, QK, axis=-1)
    if table.mins is not None:
        out = out + jnp.repeat(table.mins[ids].astype(dtype), QK, axis=-1)
    return out
