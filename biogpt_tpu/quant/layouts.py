"""TPU-friendly plane layout for quantized weights.

The ggml on-disk layout interleaves scales and packed nibbles per 32-element
block — fine for CPU SIMD, hostile to the MXU. On TPU we re-lay each
quantized 2-D weight out as separate dense *planes* that XLA/Pallas can tile:

  levels : int8   (d_in, d_out)        integer levels, centered where the
                                       format has a zero-point shift
                                       (Q4_0: q-8, Q5_0: q-16, Q8_0: q)
  scales : float16 (d_in // 32, d_out) per-block scale d
  mins   : float16 (d_in // 32, d_out) per-block min m (Q4_1/Q5_1 only)

Dequantization is exactly ``levels * repeat(scales, 32, axis=0)`` for the
_0 formats and ``levels * repeat(scales) + repeat(mins)`` for the _1
formats — bit-identical values to the ggml decode (scales kept in fp16,
widened at use).

Weights are stored transposed relative to torch ((d_in, d_out), "kernel"
orientation) so activations contract over the leading axis: y = x @ w.
Blocks run along d_in, matching the reference codec row semantics
(row length = ne[0] = d_in; ``/root/reference/biogpt.cpp:568``).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import numpy as np
import jax

from . import codecs
from .codecs import (
    QK,
    GGML_TYPE_Q4_0,
    GGML_TYPE_Q4_1,
    GGML_TYPE_Q5_0,
    GGML_TYPE_Q5_1,
    GGML_TYPE_Q8_0,
)

# Zero-point shift applied when centering levels per format.
LEVEL_OFFSET = {
    GGML_TYPE_Q4_0: 8,
    GGML_TYPE_Q4_1: 0,
    GGML_TYPE_Q5_0: 16,
    GGML_TYPE_Q5_1: 0,
    GGML_TYPE_Q8_0: 0,
}


class QuantizedTensor(NamedTuple):
    """A quantized 2-D weight in plane layout. A pytree of arrays + static qtype.

    ``levels``/``scales``/``mins`` may be numpy or jax arrays. ``qtype`` is a
    plain int (ggml_type code) — static metadata, not a leaf.

    When ``packed`` is True (4-bit formats only), ``levels`` is uint8 of
    shape (d_in // 2, d_out) holding two UNCENTERED 4-bit levels per byte in
    split-half order: byte row i carries level row i in its low nibble and
    level row i + d_in//2 in its high nibble. Split-half (not interleaved)
    packing lets a kernel unpack with one concat instead of a row shuffle,
    and both halves stay 32-row block aligned.
    """

    levels: Any                 # int8 (d_in, d_out) | uint8 (d_in//2, d_out) packed
    scales: Any                 # float16 (d_in // QK, d_out)
    mins: Optional[Any]         # float16 (d_in // QK, d_out) or None
    qtype: int
    packed: bool = False

    @property
    def shape(self):
        return self.levels.shape

    @property
    def d_in(self):
        return self.levels.shape[0]

    @property
    def d_out(self):
        return self.levels.shape[1]


# Register as a pytree so QuantizedTensor can live inside params.
def _qt_flatten(qt: QuantizedTensor):
    if qt.mins is None:
        return (qt.levels, qt.scales), (qt.qtype, False, qt.packed)
    return (qt.levels, qt.scales, qt.mins), (qt.qtype, True, qt.packed)


def _qt_unflatten(aux, children):
    qtype, has_mins, packed = aux
    if has_mins:
        levels, scales, mins = children
    else:
        (levels, scales), mins = children, None
    return QuantizedTensor(levels=levels, scales=scales, mins=mins,
                           qtype=qtype, packed=packed)


jax.tree_util.register_pytree_node(QuantizedTensor, _qt_flatten, _qt_unflatten)


def to_planes(raw: bytes | np.ndarray, shape_out_in: tuple[int, int], qtype: int) -> QuantizedTensor:
    """ggml block bytes of a (d_out, d_in)-shaped weight -> plane layout.

    ``shape_out_in`` is the ggml/torch orientation (n_rows=d_out,
    row_len=d_in); the returned planes are transposed to (d_in, d_out).
    """
    d_out, d_in = shape_out_in
    if d_in % QK != 0:
        raise ValueError(f"d_in={d_in} not a multiple of {QK}")
    bs = codecs.BLOCK_SIZES[qtype]
    buf = np.frombuffer(raw, dtype=np.uint8) if isinstance(raw, (bytes, bytearray)) else np.asarray(raw, dtype=np.uint8)
    blocks = buf.reshape(d_out, d_in // QK, bs)

    if qtype in (GGML_TYPE_Q4_0, GGML_TYPE_Q4_1, GGML_TYPE_Q5_0, GGML_TYPE_Q5_1):
        if qtype == GGML_TYPE_Q4_0:
            d_off, m_off, qh_off, qs_off = 0, None, None, 2
        elif qtype == GGML_TYPE_Q4_1:
            d_off, m_off, qh_off, qs_off = 0, 2, None, 4
        elif qtype == GGML_TYPE_Q5_0:
            d_off, m_off, qh_off, qs_off = 0, None, 2, 6
        else:  # Q5_1
            d_off, m_off, qh_off, qs_off = 0, 2, 4, 8
        qs = blocks[:, :, qs_off:]
        lo = qs & 0x0F
        hi = (qs >> 4) & 0x0F
        q = np.concatenate([lo, hi], axis=2).astype(np.uint8)  # (d_out, nb, 32)
        if qh_off is not None:
            qh = np.ascontiguousarray(blocks[:, :, qh_off:qh_off + 4]).view("<u4")[..., 0]
            shifts = np.arange(32, dtype=np.uint32)[None, None, :]
            fifth = ((qh[..., None] >> shifts) & 1).astype(np.uint8)
            q = q | (fifth << 4)
        levels = (q.astype(np.int16) - LEVEL_OFFSET[qtype]).astype(np.int8)
        scales = np.ascontiguousarray(blocks[:, :, d_off:d_off + 2]).view(np.float16)[..., 0]
        mins = None
        if m_off is not None:
            mins = np.ascontiguousarray(blocks[:, :, m_off:m_off + 2]).view(np.float16)[..., 0]
    elif qtype == GGML_TYPE_Q8_0:
        levels = np.ascontiguousarray(blocks[:, :, 2:]).view(np.int8)
        scales = np.ascontiguousarray(blocks[:, :, 0:2]).view(np.float16)[..., 0]
        mins = None
    else:
        raise ValueError(f"not a quantized type: {qtype}")

    # (d_out, nb, 32) -> (d_in, d_out); (d_out, nb) -> (nb, d_out)
    levels_t = levels.reshape(d_out, d_in).T.copy()
    scales_t = scales.T.copy()
    mins_t = mins.T.copy() if mins is not None else None
    return QuantizedTensor(levels=levels_t, scales=scales_t, mins=mins_t, qtype=qtype)


def to_lookup_planes(raw: bytes | np.ndarray, shape_rows_cols: tuple[int, int], qtype: int) -> QuantizedTensor:
    """ggml block bytes of an embedding table -> row-major plane layout.

    Unlike :func:`to_planes` there is no transpose: ``levels`` keeps the
    (n_rows, row_len) table orientation for gather-style lookup, with
    ``scales``/``mins`` of shape (n_rows, row_len // QK).
    """
    qt = to_planes(raw, shape_rows_cols, qtype)
    return QuantizedTensor(
        levels=np.ascontiguousarray(qt.levels.T),
        scales=np.ascontiguousarray(qt.scales.T),
        mins=np.ascontiguousarray(qt.mins.T) if qt.mins is not None else None,
        qtype=qtype,
    )


def quantize_to_planes(w_out_in: np.ndarray, qtype: int) -> QuantizedTensor:
    """float32 (d_out, d_in) weight -> plane layout (through the codec)."""
    raw = codecs.quantize_rows(w_out_in, qtype)
    return to_planes(raw, w_out_in.shape, qtype)


def pack_nibble_planes(qt: QuantizedTensor, chunks: int = 1) -> QuantizedTensor:
    """Pack a 4/5-bit-format plane tensor into a dense byte plane.

    4-bit formats (Q4_0/Q4_1) pack two levels per byte in split-half order:
    byte row i holds level row i (low nibble) and row i + d_in//2 (high
    nibble) — 0.5 B/weight.

    5-bit formats (Q5_0/Q5_1) pack the low 4 bits exactly like Q4 and
    append a FIFTH-BIT plane of d_in//8 byte rows in split-eighth order
    (byte row j, bit p = bit 4 of level row j + p*d_in//8) — 0.625 B/weight
    in one contiguous (d_in//2 + d_in//8, d_out) array. Both sections
    unpack to natural row order with a concat (no row shuffles), which is
    what the Mosaic SWAR unpack needs (ops/pallas_qmatmul._unpack_levels).

    Levels are stored UNCENTERED (0..15 / 0..31); consumers subtract
    ``LEVEL_OFFSET[qtype]`` after unpacking. No-op for Q8_0 (already one
    dense byte per weight).

    ``chunks`` > 1 packs each of ``chunks`` equal d_in chunks independently
    (split-half/eighth WITHIN each chunk): a d_in shard of the result
    unpacks shard-locally — required for row-parallel tensor-parallel
    weights, where each shard owns a contiguous d_in range (parallel/tp.py).
    A chunked-packed tensor must be unpacked with the SAME ``chunks``.
    """
    five_bit = qt.qtype in (GGML_TYPE_Q5_0, GGML_TYPE_Q5_1)
    if qt.packed or qt.qtype not in (GGML_TYPE_Q4_0, GGML_TYPE_Q4_1,
                                     GGML_TYPE_Q5_0, GGML_TYPE_Q5_1):
        return qt
    levels = np.asarray(qt.levels)
    d_in = levels.shape[-2]  # supports layer-stacked (L, d_in, d_out) planes
    if d_in % (chunks * 2 * QK) != 0:
        return qt  # halves wouldn't stay block-aligned; keep unpacked
    uncentered = (levels.astype(np.int16) + LEVEL_OFFSET[qt.qtype]).astype(np.uint8)
    per = d_in // chunks
    half = per // 2
    eighth = per // 8
    pieces = []
    for c in range(chunks):
        u = uncentered[..., c * per:(c + 1) * per, :]
        lo4 = u & 0x0F
        pieces.append(lo4[..., :half, :] | (lo4[..., half:, :] << 4))
        if five_bit:
            bit4 = (u >> 4) & 0x01                     # (.., per, d_out) 0/1
            plane = np.zeros(u.shape[:-2] + (eighth, u.shape[-1]), np.uint8)
            for p in range(8):
                plane |= bit4[..., p * eighth:(p + 1) * eighth, :] << p
            pieces.append(plane)
    packed = pieces[0] if len(pieces) == 1 else np.concatenate(pieces, axis=-2)
    return QuantizedTensor(levels=packed, scales=qt.scales, mins=qt.mins,
                           qtype=qt.qtype, packed=True)


def unpack_nibble_planes(qt: QuantizedTensor, chunks: int = 1) -> QuantizedTensor:
    """Inverse of :func:`pack_nibble_planes` (numpy, same ``chunks``)."""
    if not qt.packed:
        return qt
    five_bit = qt.qtype in (GGML_TYPE_Q5_0, GGML_TYPE_Q5_1)
    packed = np.asarray(qt.levels)
    per_rows = packed.shape[-2] // chunks   # d_in*(5/8 | 1/2)/chunks per chunk
    per = per_rows * 8 // 5 if five_bit else per_rows * 2
    half = per // 2
    eighth = per // 8
    pieces = []
    for c in range(chunks):
        u = packed[..., c * per_rows:(c + 1) * per_rows, :]
        nib = u[..., :half, :]
        lo = (nib & 0x0F).astype(np.int16)
        hi = ((nib >> 4) & 0x0F).astype(np.int16)
        lv = np.concatenate([lo, hi], axis=-2)          # (.., per, d_out)
        if five_bit:
            plane = u[..., half:, :]
            fifth = np.concatenate(
                [((plane >> p) & 0x01).astype(np.int16) for p in range(8)],
                axis=-2)
            lv = lv | (fifth << 4)
        pieces.append(lv)
    levels = (np.concatenate(pieces, axis=-2) if chunks > 1 else pieces[0])
    levels = (levels - LEVEL_OFFSET[qt.qtype]).astype(np.int8)
    return QuantizedTensor(levels=levels, scales=qt.scales, mins=qt.mins,
                           qtype=qt.qtype, packed=False)


def from_planes(qt: QuantizedTensor) -> np.ndarray:
    """Plane layout -> dequantized float32 (d_in, d_out) kernel."""
    qt = unpack_nibble_planes(qt)
    levels = np.asarray(qt.levels).astype(np.float32)
    scales = np.repeat(np.asarray(qt.scales).astype(np.float32), QK, axis=0)
    w = levels * scales
    if qt.mins is not None:
        w = w + np.repeat(np.asarray(qt.mins).astype(np.float32), QK, axis=0)
    return w
