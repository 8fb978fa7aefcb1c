"""Pallas TPU kernel: fused dequantize + matmul for plane-layout weights.

The decode path is HBM-bandwidth-bound: every generated token reads every
weight byte. This kernel replaces ggml's fused dequant ``mul_mat``
(``/root/reference/biogpt.cpp:705-803``'s hot kernel class) with a
TPU-native design:

  grid over d_out tiles; per step the (d_in[, /2], T) level plane tile and
  (nb, T) scale tile stream HBM->VMEM (Pallas double-buffers grid inputs
  automatically), are dequantized on the VPU in f32, cast to bf16, and hit
  the MXU against the resident (M, d_in) activations with f32 accumulation.

For the 4-bit formats the levels arrive PACKED two-per-byte (split-half
order, see quant.layouts.pack_nibble_planes) — halving weight traffic, the
entire win for Q4 decode. Activations stay resident in VMEM across all
tiles (M is small at decode).

Numerics: levels and scales are widened to f32 for the dequant multiply,
then rounded once to bf16 for the MXU — the only deviation from the XLA
oracle path (which applies f32 scales to per-block f32 partial sums), and
~2^-9 relative, far below the quantization error itself. Verified against
the oracle in tests/test_pallas_qmatmul.py.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.codecs import QK, GGML_TYPE_Q5_0, GGML_TYPE_Q5_1
from ..quant.layouts import LEVEL_OFFSET, QuantizedTensor

# How _expand_blocks expands (nb, tile) block scales to (chunk, tile) rows:
#   "dot"   — block-diagonal 0/1 matmul (exact; K=nb_c puts the MXU at
#             nb_c/128 utilization)
#   "bcast" — per-block sublane broadcast + concat (exact; VPU copies)
# Both are numerically identical (each expanded entry IS one bf16 scale).
# Measured (round 3, real chip): the batched kernel runs AT the
# weight+KV traffic roofline with "dot" (0.63 ms/step = 0.28 weights +
# 0.33 KV at B=8, W=128) — the expansion is hidden under DMA, so the
# formulation is not on the critical path; "dot" stays the default.
_SEXP_MODE = _os.environ.get("BIOGPT_SEXP", "dot")


def _expand_blocks(plane, nb_c: int):
    """(nb_c, T) bf16 -> (nb_c*QK, T) f32: row n fills rows n*QK..n*QK+31."""
    if _SEXP_MODE == "bcast":
        T = plane.shape[-1]
        return jnp.concatenate(
            [jnp.broadcast_to(plane[n:n + 1, :].astype(jnp.float32),
                              (QK, T)) for n in range(nb_c)], axis=0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (nb_c * QK, nb_c), 0) // QK
    nn = jax.lax.broadcasted_iota(jnp.int32, (nb_c * QK, nb_c), 1)
    expand = (kk == nn).astype(jnp.bfloat16)              # (chunk, nb_c)
    return jnp.dot(expand, plane, preferred_element_type=jnp.float32)


# lane width of the VPU/MXU — output tiles must align to it
_LANES = 128


def unpack_levels_swar(u, d_in: int, five_bit: bool) -> jax.Array:
    """In-kernel unpack: packed byte tile (rows, T) -> bf16 (d_in, T).

    SWAR through u32 lanes — Mosaic has no u8 shifts, so 4 bytes are
    reinterpreted as one u32, masked/shifted there, and reinterpreted back.
    4-bit formats: split-half nibbles (rows = d_in//2). 5-bit formats: the
    nibble section is followed by a split-eighth fifth-bit plane (rows =
    d_in//2 + d_in//8); each bit p of byte row j is bit 4 of level row
    j + p*d_in//8 (quant.layouts.pack_nibble_planes). Levels come out
    UNCENTERED (0..15 / 0..31) — callers fold LEVEL_OFFSET into their
    epilogue.
    """
    nib = u[:d_in // 2] if five_bit else u
    v = pltpu.bitcast(nib, jnp.uint32)
    lo = pltpu.bitcast(v & jnp.uint32(0x0F0F0F0F), jnp.uint8)
    hi = pltpu.bitcast((v >> 4) & jnp.uint32(0x0F0F0F0F), jnp.uint8)
    low4 = jnp.concatenate([lo, hi], axis=0)            # (d_in, T) 0..15
    if five_bit:
        # fold bit 4 in the INTEGER domain: a bf16 multiply-add per element
        # here costs more VPU time than the packing saves in HBM (measured
        # 0.89 vs 0.25 ms/token at 347M) — the u32-lane OR keeps the only
        # per-element heavy op the same int8->bf16 cast the 4-bit path pays
        b32 = pltpu.bitcast(u[d_in // 2:], jnp.uint32)  # (d_in//8, T/4)
        # extract bit p of each byte PRE-SHIFTED to bit 4 (one shift+mask
        # per piece instead of extract-then-reshift over the full plane)
        fifth4 = jnp.concatenate(
            [pltpu.bitcast(
                ((b32 << (4 - p)) if p <= 4 else (b32 >> (p - 4)))
                & jnp.uint32(0x10101010), jnp.uint8)
             for p in range(8)], axis=0)                # (d_in, T) 0/16
        low4 = pltpu.bitcast(
            pltpu.bitcast(low4, jnp.uint32)
            | pltpu.bitcast(fifth4, jnp.uint32), jnp.uint8)
    return pltpu.bitcast(low4, jnp.int8).astype(jnp.bfloat16)


def _kernel(x_ref, lv_ref, sc_ref, mn_ref, out_ref, *, offset: int,
            packed: bool, five_bit: bool = False):
    """One d_out tile, block-structured to stay off the VPU critical path.

    Naive fused dequant (scale every weight element, then matmul) is
    VPU-bound: d_in*T multiplies per tile at ~1 elem/lane/cycle loses to
    the HBM DMA. Instead:

      X'[n, k] = x[k] if k is in block n else 0        (nb, d_in) "X-prime"
      partial  = X' @ levels_tile                      ONE MXU matmul; free
                                                       at M=1 (same pass
                                                       count as a 1-row dot)
      out[o]   = sum_n (partial[n,o] - offset*xsum[n]) * d[n,o]
                 [+ xsum[n] * m[n,o]]                  VPU on (nb, T) only

    The zero-point offset folds into the epilogue via the per-block
    activation sums, so the only per-element work is the nibble unpack /
    int8->bf16 cast, done in the byte domain.
    """
    M = x_ref.shape[0]
    d_in = x_ref.shape[1]
    nb = d_in // QK

    if packed:
        lv = unpack_levels_swar(lv_ref[:], d_in, five_bit)  # (d_in, T) bf16
    else:
        lv = lv_ref[:].astype(jnp.bfloat16)             # (d_in, T)

    scales = sc_ref[:].astype(jnp.float32)              # (nb, T)
    mins = mn_ref[:].astype(jnp.float32) if mn_ref is not None else None

    # 0/1 block mask built arithmetically — Mosaic mishandles relayout of
    # wide i1 vectors, so avoid boolean intermediates entirely.
    block_of_k = jax.lax.broadcasted_iota(jnp.int32, (nb, d_in), 1) // QK
    block_row = jax.lax.broadcasted_iota(jnp.int32, (nb, d_in), 0)
    offblock = jnp.minimum(jnp.abs(block_of_k - block_row), 1)
    mask = (1 - offblock).astype(jnp.bfloat16)          # (nb, d_in) 0/1

    for m in range(M):
        x_row = x_ref[m, :][None, :]                    # (1, d_in) bf16
        xp = x_row * mask
        partial = jnp.dot(xp, lv, preferred_element_type=jnp.float32)
        if offset or mins is not None:
            xsum = jnp.sum(
                xp.astype(jnp.float32), axis=1, keepdims=True)  # (nb, 1)
            if offset:
                partial = partial - float(offset) * xsum
            acc = partial * scales
            if mins is not None:
                acc = acc + xsum * mins
        else:
            acc = partial * scales
        out_ref[m, :] = jnp.sum(acc, axis=0)


def _pick_tile(d_out: int) -> int:
    for t in (512, 256, _LANES):
        if d_out % t == 0:
            return t
    raise ValueError(f"d_out={d_out} not lane-aligned")


def supports(qt: QuantizedTensor, m: int) -> bool:
    """Whether the Pallas path applies: lane-aligned d_out, block-aligned
    d_in, and a small (decode-side) M. Works on per-layer slices and on
    layer-stacked planes (leading axes ignored)."""
    d_out = qt.scales.shape[-1]
    d_in = qt.scales.shape[-2] * QK
    return (
        d_out % _LANES == 0
        and d_in % (2 * QK) == 0
        and m <= 8  # kernel unrolls over rows; decode-side M only
    )


def supports_wide(qt: QuantizedTensor, m: int) -> bool:
    """The wide-batch (8 < m <= 32) dequant-then-dot kernel's shape gate.

    Same alignment rules as :func:`supports`; the row range covers the
    batched serving decode (B up to 32), where the X'-per-row kernel's
    MXU cost scales with m but dequant-then-dot amortizes the weight
    dequant over all rows (the same tradeoff as
    pallas_decode._qmm vs _qmm_dq). Found on chip (round 3): without
    this, a B=16/32 serving step's lm_head fell to the XLA
    dequantize-then-dot, re-materializing the 42k-vocab weight every
    step."""
    d_out = qt.scales.shape[-1]
    d_in = qt.scales.shape[-2] * QK
    return (
        d_out % _LANES == 0
        and d_in % (2 * QK) == 0
        # the kernel's dequant loop walks d_in in _WIDE_CHUNK pieces and
        # has no remainder path — a 1536-wide input would silently drop
        # its last 512 columns (review-caught; repro'd)
        and (d_in <= _WIDE_CHUNK or d_in % _WIDE_CHUNK == 0)
        and 8 < m <= 32
    )


# chunk of d_in per dequant piece (see pallas_decode._CHUNK_BLOCKS)
_WIDE_CHUNK = 1024


def _kernel_wide(x_ref, lv_ref, sc_ref, mn_ref, out_ref, *, offset: int,
                 packed: bool, five_bit: bool = False):
    """One d_out tile, dequant-then-dot (M up to 32 activation rows).

    The batched-megakernel formulation (pallas_decode._qmm_dq) as a
    standalone matmul: per (chunk, tile) piece the block scales expand to
    rows with an exact block-diagonal matmul, the weight piece
    dequantizes in f32 and rounds once to bf16, and ONE MXU dot serves
    all M rows — weight traffic amortizes over the batch instead of
    paying the X'-trick's per-row MXU pass.
    """
    M, d_in = x_ref.shape
    T = sc_ref.shape[-1]
    chunk = min(d_in, _WIDE_CHUNK)
    n_chunks = d_in // chunk
    nb_c = chunk // QK

    if packed:
        lv = unpack_levels_swar(lv_ref[:], d_in, five_bit)  # (d_in, T) bf16
    else:
        lv = lv_ref[:].astype(jnp.bfloat16)

    acc = None
    for c in range(n_chunks):
        b0 = c * nb_c
        sexp = _expand_blocks(
            sc_ref[b0:b0 + nb_c, :].astype(jnp.bfloat16), nb_c)
        w = (lv[c * chunk:(c + 1) * chunk, :].astype(jnp.float32)
             - float(offset)) * sexp
        if mn_ref is not None:
            w = w + _expand_blocks(
                mn_ref[b0:b0 + nb_c, :].astype(jnp.bfloat16), nb_c)
        part = jnp.dot(x_ref[:, c * chunk:(c + 1) * chunk],
                       w.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def qmatmul_pallas_wide(x: jax.Array, qt: QuantizedTensor,
                        interpret: bool = False) -> jax.Array:
    """y = x @ dequant(qt) for 8 < M <= 32 rows -> (M, d_out) f32."""
    d_in = qt.scales.shape[-2] * QK
    d_out = qt.scales.shape[-1]
    M = x.shape[0]
    T = _pick_tile(d_out)
    nb = d_in // QK
    offset = LEVEL_OFFSET[qt.qtype] if qt.packed else 0
    five_bit = qt.packed and qt.qtype in (GGML_TYPE_Q5_0, GGML_TYPE_Q5_1)
    lv_rows = qt.levels.shape[0]

    in_specs = [
        pl.BlockSpec((M, d_in), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((lv_rows, T), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, T), lambda j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [x.astype(jnp.bfloat16), qt.levels, qt.scales]
    if qt.mins is not None:
        in_specs.append(pl.BlockSpec((nb, T), lambda j: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(qt.mins)
        kernel = functools.partial(_kernel_wide, offset=offset,
                                   packed=qt.packed, five_bit=five_bit)
    else:
        def kernel(x_ref, lv_ref, sc_ref, out_ref):
            _kernel_wide(x_ref, lv_ref, sc_ref, None, out_ref,
                         offset=offset, packed=qt.packed, five_bit=five_bit)

    level_bytes = lv_rows * d_out * qt.levels.dtype.itemsize
    cost = pl.CostEstimate(
        flops=2 * M * d_in * d_out + 2 * d_in * (d_in // QK) * d_out // QK,
        bytes_accessed=level_bytes + nb * d_out * 2 + M * d_in * 2
        + M * d_out * 4,
        transcendentals=0,
    )

    return pl.pallas_call(
        kernel,
        grid=(d_out // T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((M, T), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, d_out), jnp.float32),
        cost_estimate=cost,
        interpret=interpret,
    )(*args)


def _ln_lmhead_tile(x_ref, lnw_ref, lnb_ref, lv_ref, sc_ref, mn_ref, *,
                    offset: int, packed: bool, five_bit: bool, eps: float):
    """Shared epilogue tile body: final LN (recomputed per tile — ~3*M*d_in
    VPU flops, noise against the tile's DMA) + one lm_head vocab tile's
    logits via the X'-block (M <= 8) or dequant-then-dot (M > 8)
    formulation. Returns the (M, T) f32 logits tile."""
    M = x_ref.shape[0]
    d_in = x_ref.shape[1]
    nb = d_in // QK

    x32 = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    xn = (y * lnw_ref[:].astype(jnp.float32)
          + lnb_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)

    if packed:
        lv = unpack_levels_swar(lv_ref[:], d_in, five_bit)
    else:
        lv = lv_ref[:].astype(jnp.bfloat16)
    scales = sc_ref[:].astype(jnp.float32)
    mins = mn_ref[:].astype(jnp.float32) if mn_ref is not None else None

    if M > 8:
        # wide rows (batched serving): dequant-then-dot — the per-row X'
        # loop costs M MXU passes per tile (built for B=1 decode), while
        # one dequantized tile serves all M rows (same formulation/
        # numerics as _kernel_wide)
        chunk = min(d_in, _WIDE_CHUNK)
        n_chunks = d_in // chunk
        nb_c = chunk // QK
        acc2 = None
        for c in range(n_chunks):
            b0 = c * nb_c
            sexp = _expand_blocks(
                sc_ref[b0:b0 + nb_c, :].astype(jnp.bfloat16), nb_c)
            w = (lv[c * chunk:(c + 1) * chunk, :].astype(jnp.float32)
                 - float(offset)) * sexp
            if mn_ref is not None:
                w = w + _expand_blocks(
                    mn_ref[b0:b0 + nb_c, :].astype(jnp.bfloat16), nb_c)
            part = jnp.dot(xn[:, c * chunk:(c + 1) * chunk],
                           w.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            acc2 = part if acc2 is None else acc2 + part
        return acc2                                     # (M, T) f32

    block_of_k = jax.lax.broadcasted_iota(jnp.int32, (nb, d_in), 1) // QK
    block_row = jax.lax.broadcasted_iota(jnp.int32, (nb, d_in), 0)
    offblock = jnp.minimum(jnp.abs(block_of_k - block_row), 1)
    mask = (1 - offblock).astype(jnp.bfloat16)

    rows = []
    for m in range(M):
        xp = xn[m, :][None, :] * mask
        partial = jnp.dot(xp, lv, preferred_element_type=jnp.float32)
        if offset or mins is not None:
            xsum = jnp.sum(xp.astype(jnp.float32), axis=1, keepdims=True)
            if offset:
                partial = partial - float(offset) * xsum
            acc = partial * scales
            if mins is not None:
                acc = acc + xsum * mins
        else:
            acc = partial * scales
        rows.append(jnp.sum(acc, axis=0, keepdims=True))
    return jnp.concatenate(rows, axis=0)                # (M, T) f32


def _argmax_kernel(x_ref, lnw_ref, lnb_ref, lv_ref, sc_ref, mn_ref,
                   out_ref, mv_ref, bv_ref, bi_ref, *, offset: int,
                   packed: bool, five_bit: bool, n_valid: int, T: int,
                   nT: int, eps: float):
    """Fused final-LN + lm_head dequant-matmul + greedy argmax.

    Greedy decode never needs the (B, n_vocab) logits on HBM — only the
    winning column index. Each grid step dequantizes one vocab tile,
    computes its logits via the same X'-block formulation as ``_kernel``,
    and folds the tile's (max, argmax) into a running best carried in VMEM
    scratch (TPU grids run sequentially); only the final (M, 1) token ids
    are ever written. This removes the last XLA ops of the decode step
    (final LN, logits materialization/slice, 42k-wide argmax) — the
    reference's per-token epilogue is ``biogpt.cpp:798-806`` + host argmax.

    Ties resolve to the lowest index (first occurrence), matching
    ``jnp.argmax`` on the oracle logits.
    """
    j = pl.program_id(0)
    M = x_ref.shape[0]

    logits = _ln_lmhead_tile(x_ref, lnw_ref, lnb_ref, lv_ref, sc_ref,
                             mn_ref, offset=offset, packed=packed,
                             five_bit=five_bit, eps=eps)

    col = j * T + jax.lax.broadcasted_iota(jnp.int32, (M, T), 1)
    # mask the lane-padding columns (zero scales would win over all-negative
    # real logits otherwise)
    logits = jnp.where(col < n_valid, logits, -1e30)
    tmax = jnp.max(logits, axis=1, keepdims=True)       # (M, 1)
    targ = jnp.min(jnp.where(logits >= tmax, col, jnp.int32(2 ** 30)),
                   axis=1, keepdims=True)
    # All-NaN logits (a poisoned checkpoint — the health lane's failure
    # mode) make `logits >= tmax` false everywhere, leaving the 2**30
    # sentinel. Clamp so emitted ids stay in-vocab even when numerics are
    # broken; detection is owned by the max-value output (a NaN'd hidden
    # state NaNs EVERY tile's tmax, so the j==0 init pins bv to NaN and
    # the health lane sees it — runtime/health.py).
    targ = jnp.minimum(targ, jnp.int32(n_valid - 1))

    @pl.when(j == 0)
    def _init():
        bv_ref[:, :] = tmax
        bi_ref[:, :] = targ

    @pl.when(j > 0)
    def _fold():
        better = tmax > bv_ref[:, :]                    # strict: keep first
        bv_ref[:, :] = jnp.where(better, tmax, bv_ref[:, :])
        bi_ref[:, :] = jnp.where(better, targ, bi_ref[:, :])

    @pl.when(j == nT - 1)
    def _emit():
        out_ref[:, :] = bi_ref[:, :]
        mv_ref[:, :] = bv_ref[:, :]


def _argmax_commit_kernel(past_ref, x_ref, lnw_ref, lnb_ref, lv_ref, sc_ref,
                          mn_ref, krt, vrt, kc_in, vc_in,
                          out_ref, mv_ref, kc, vc,
                          bv_ref, bi_ref, kbuf, vbuf, sems, *,
                          B: int, **kw):
    """``_argmax_kernel`` + the batched KV-row commit in ONE launch.

    The greedy serving epilogue and the cache commit are independent, so
    their costs can overlap instead of adding: the commit's aligned-RMW
    tile reads (see ops.pallas_decode.kv_commit_pallas for the scheme)
    start at grid step 0, the lm_head vocab tiles compute while those DMAs
    fly, and the fold + write-back runs at the LAST grid step — the ~80
    vocab tiles give the reads the whole kernel to land. Standalone, the
    commit kernel measured 0.36 ms/step at B=32 against ~0.16 ms of pure
    RMW traffic (bench_step32); fused, its issue/wait time hides behind
    the epilogue's MXU work.
    """
    del kc_in, vc_in   # aliased to kc/vc
    j = pl.program_id(0)
    nT = kw["nT"]
    L, D = krt.shape[1], krt.shape[2]

    def rw(b, outward):
        t_off = pl.multiple_of((past_ref[0, b] // 8) * 8, 8)
        kt, vt = kc.at[:, b, pl.ds(t_off, 8), :], vc.at[:, b,
                                                        pl.ds(t_off, 8), :]
        if outward:
            return (t_off,
                    pltpu.make_async_copy(kbuf.at[b], kt, sems.at[0, b]),
                    pltpu.make_async_copy(vbuf.at[b], vt, sems.at[1, b]))
        return (t_off,
                pltpu.make_async_copy(kt, kbuf.at[b], sems.at[0, b]),
                pltpu.make_async_copy(vt, vbuf.at[b], sems.at[1, b]))

    @pl.when(j == 0)
    def _start_reads():
        for b in range(B):
            _, ck, cv = rw(b, outward=False)
            ck.start()
            cv.start()

    _argmax_kernel(x_ref, lnw_ref, lnb_ref, lv_ref, sc_ref, mn_ref,
                   out_ref, mv_ref, bv_ref, bi_ref, **kw)

    @pl.when(j == nT - 1)
    def _fold_commit():
        row_ix = jax.lax.broadcasted_iota(jnp.int32, (L, 8, D), 1)
        writes = []
        for b in range(B):
            t_off, ck, cv = rw(b, outward=False)
            ck.wait()
            cv.wait()
            r = past_ref[0, b] - t_off
            kbuf[b] = jnp.where(row_ix == r,
                                krt[b][:, None, :].astype(kbuf.dtype),
                                kbuf[b])
            vbuf[b] = jnp.where(row_ix == r,
                                vrt[b][:, None, :].astype(vbuf.dtype),
                                vbuf[b])
            _, wk, wv = rw(b, outward=True)
            wk.start()
            wv.start()
            writes.append((wk, wv))
        for wk, wv in writes:
            wk.wait()
            wv.wait()


def _logits_gmax_commit_kernel(past_ref, x_ref, lnw_ref, lnb_ref, lv_ref,
                               sc_ref, mn_ref, krt, vrt, kc_in, vc_in,
                               out_ref, gmax_ref, kc, vc,
                               kbuf, vbuf, sems, *, B: int, offset: int,
                               packed: bool, five_bit: bool, n_valid: int,
                               T: int, nT: int, eps: float):
    """Sampled-serving epilogue: final LN + lm_head logits + per-128-lane
    GROUP MAXES + the batched KV commit, one launch.

    The sampled lockstep step previously ran the commit as its own kernel
    (0.36 ms/step at B=32 standalone) plus an XLA final LN and the wide
    lm_head kernel; here the commit's RMW DMAs start at vocab tile 0 and
    land under the lm_head MXU work exactly as in the greedy
    ``_argmax_commit_kernel``. The (M, d_out/128) group maxima are free
    while each tile is in VMEM and are stage 1 of the exact
    gather-top-k sampler (runtime.sampling.topk_gather) — the sampler
    never re-reads the full-width logits to rank groups. Pad columns
    (>= n_valid) are masked to -1e30 in BOTH outputs, so downstream code
    may use the padded width directly; health rides isfinite(gmax).
    """
    del kc_in, vc_in   # aliased to kc/vc
    j = pl.program_id(0)
    L, D = krt.shape[1], krt.shape[2]
    M = x_ref.shape[0]

    def rw(b, outward):
        t_off = pl.multiple_of((past_ref[0, b] // 8) * 8, 8)
        kt = kc.at[:, b, pl.ds(t_off, 8), :]
        vt = vc.at[:, b, pl.ds(t_off, 8), :]
        return (t_off,
                pltpu.make_async_copy(*((kbuf.at[b], kt) if outward
                                        else (kt, kbuf.at[b])),
                                      sems.at[0, b]),
                pltpu.make_async_copy(*((vbuf.at[b], vt) if outward
                                        else (vt, vbuf.at[b])),
                                      sems.at[1, b]))

    @pl.when(j == 0)
    def _start_reads():
        for b in range(B):
            _, ck, cv = rw(b, outward=False)
            ck.start()
            cv.start()

    logits = _ln_lmhead_tile(x_ref, lnw_ref, lnb_ref, lv_ref, sc_ref,
                             mn_ref, offset=offset, packed=packed,
                             five_bit=five_bit, eps=eps)
    col = j * T + jax.lax.broadcasted_iota(jnp.int32, (M, T), 1)
    logits = jnp.where(col < n_valid, logits, -1e30)
    out_ref[:, :] = logits

    # gmax accumulates in the FULL (M, Gpad) output block (constant index
    # map -> the block persists in VMEM across the sequential grid and
    # flushes once; Mosaic rejects narrow per-tile blocks). This tile's
    # T/128 group maxes land in their lanes via a one-hot MXU dot +
    # masked select — full-width ops only, no dynamic-lane stores.
    Gt = T // 128
    Gpad = gmax_ref.shape[1]
    tile_vals = jnp.concatenate(
        [jnp.max(logits[:, p * 128:(p + 1) * 128], axis=1, keepdims=True)
         for p in range(Gt)], axis=1)                   # (M, Gt)
    ohp = jax.lax.broadcasted_iota(jnp.int32, (Gt, Gpad), 0)
    ohc = jax.lax.broadcasted_iota(jnp.int32, (Gt, Gpad), 1)
    oh = (ohc == j * Gt + ohp).astype(jnp.float32)
    contrib = jnp.dot(tile_vals, oh,
                      preferred_element_type=jnp.float32)  # (M, Gpad)
    gcol = jax.lax.broadcasted_iota(jnp.int32, (M, Gpad), 1)
    sel = (gcol >= j * Gt) & (gcol < (j + 1) * Gt)

    @pl.when(j == 0)
    def _init_gmax():
        gmax_ref[:, :] = jnp.full((M, Gpad), -1e30, jnp.float32)

    gmax_ref[:, :] = jnp.where(sel, contrib, gmax_ref[:, :])

    @pl.when(j == nT - 1)
    def _fold_commit():
        row_ix = jax.lax.broadcasted_iota(jnp.int32, (L, 8, D), 1)
        writes = []
        for b in range(B):
            t_off, ck, cv = rw(b, outward=False)
            ck.wait()
            cv.wait()
            r = past_ref[0, b] - t_off
            kbuf[b] = jnp.where(row_ix == r,
                                krt[b][:, None, :].astype(kbuf.dtype),
                                kbuf[b])
            vbuf[b] = jnp.where(row_ix == r,
                                vrt[b][:, None, :].astype(vbuf.dtype),
                                vbuf[b])
            _, wk, wv = rw(b, outward=True)
            wk.start()
            wv.start()
            writes.append((wk, wv))
        for wk, wv in writes:
            wk.wait()
            wv.wait()


@functools.partial(jax.jit,
                   static_argnames=("n_valid", "ln_eps", "interpret"))
def lm_head_logits_gmax_commit_pallas(
        x: jax.Array, ln_w: jax.Array, ln_b: jax.Array,
        qt: QuantizedTensor, n_valid: int,
        k_cache: jax.Array, v_cache: jax.Array,
        k_rows_t: jax.Array, v_rows_t: jax.Array, past: jax.Array,
        ln_eps: float = 1e-5, interpret: bool = False):
    """Fused sampled epilogue + KV commit: returns ``(logits (M, d_out)
    f32 [pad cols = -1e30], gmax (M, d_out//128), k_cache', v_cache')``
    with the new K/V rows committed at each slot's own position (caches
    donated). ``k_rows_t``/``v_rows_t`` arrive SLOT-MAJOR (B, L, D)."""
    d_in = qt.scales.shape[-2] * QK
    d_out = qt.scales.shape[-1]
    M = x.shape[0]
    T = _pick_tile(d_out)
    nb = d_in // QK
    nT = d_out // T
    offset = LEVEL_OFFSET[qt.qtype] if qt.packed else 0
    five_bit = qt.packed and qt.qtype in (GGML_TYPE_Q5_0, GGML_TYPE_Q5_1)
    lv_rows = qt.levels.shape[0]
    L, B, S, D = k_cache.shape
    assert M == B and S % 8 == 0 and d_out % 128 == 0
    # gmax lanes pad to a 128 multiple (the accumulator block is the full
    # array; callers slice [:, :d_out//128])
    G_PAD = -(-(d_out // 128) // 128) * 128

    full = lambda shape: pl.BlockSpec(shape, lambda j: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    past_row = jnp.broadcast_to(
        jnp.atleast_1d(jnp.asarray(past, jnp.int32)), (B,)).reshape(1, B)
    in_specs = [
        pl.BlockSpec((1, B), lambda j: (0, 0), memory_space=pltpu.SMEM),
        full((M, d_in)),
        full((1, d_in)),
        full((1, d_in)),
        pl.BlockSpec((lv_rows, T), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, T), lambda j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [past_row, x.astype(jnp.float32), ln_w.reshape(1, d_in),
            ln_b.reshape(1, d_in), qt.levels, qt.scales]
    kw = dict(offset=offset, packed=qt.packed, five_bit=five_bit,
              n_valid=n_valid, T=T, nT=nT, eps=ln_eps, B=B)
    if qt.mins is not None:
        in_specs.append(pl.BlockSpec((nb, T), lambda j: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(qt.mins)
        kernel = functools.partial(_logits_gmax_commit_kernel, **kw)
        n_pre = 7
    else:
        def kernel(past_ref, x_ref, lnw_ref, lnb_ref, lv_ref, sc_ref,
                   krt, vrt, kc_in, vc_in, out_ref, gmax_ref, kc, vc,
                   kbuf, vbuf, sems):
            _logits_gmax_commit_kernel(past_ref, x_ref, lnw_ref, lnb_ref,
                                       lv_ref, sc_ref, None, krt, vrt,
                                       kc_in, vc_in, out_ref, gmax_ref,
                                       kc, vc, kbuf, vbuf, sems, **kw)
        n_pre = 6
    in_specs += [full((B, L, D)), full((B, L, D)), any_spec, any_spec]
    args += [k_rows_t.astype(k_cache.dtype), v_rows_t.astype(v_cache.dtype),
             k_cache, v_cache]

    level_bytes = lv_rows * d_out * qt.levels.dtype.itemsize
    rmw = 2 * 2 * L * B * 8 * D * k_cache.dtype.itemsize
    cost = pl.CostEstimate(
        flops=2 * M * d_in * d_out,
        bytes_accessed=(level_bytes + nb * d_out * 2 + M * d_in * 4
                        + M * d_out * 4 + rmw),
        transcendentals=0,
    )

    logits, gmax, kc, vc = pl.pallas_call(
        kernel,
        grid=(nT,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((M, T), lambda j: (0, j),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((M, G_PAD), lambda j: (0, 0),
                                memory_space=pltpu.VMEM),
                   any_spec, any_spec],
        out_shape=[jax.ShapeDtypeStruct((M, d_out), jnp.float32),
                   jax.ShapeDtypeStruct((M, G_PAD), jnp.float32),
                   jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
                   jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype)],
        input_output_aliases={n_pre + 2: 2, n_pre + 3: 3},
        scratch_shapes=[pltpu.VMEM((B, L, 8, D), k_cache.dtype),
                        pltpu.VMEM((B, L, 8, D), v_cache.dtype),
                        pltpu.SemaphoreType.DMA((2, B))],
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return logits, gmax[:, :d_out // 128], kc, vc


@functools.partial(jax.jit,
                   static_argnames=("n_valid", "ln_eps", "interpret"))
def lm_head_argmax_commit_pallas(x: jax.Array, ln_w: jax.Array,
                                 ln_b: jax.Array, qt: QuantizedTensor,
                                 n_valid: int,
                                 k_cache: jax.Array, v_cache: jax.Array,
                                 k_rows_t: jax.Array, v_rows_t: jax.Array,
                                 past: jax.Array,
                                 ln_eps: float = 1e-5,
                                 interpret: bool = False):
    """Fused greedy epilogue + KV commit: returns
    ``(token_ids (M,), max_vals (M,), k_cache', v_cache')`` with the new
    K/V rows committed at each slot's own position (caches donated).
    ``k_rows_t``/``v_rows_t`` arrive SLOT-MAJOR (B, L, D) — the same
    contract as ops.pallas_decode.kv_commit_pallas."""
    d_in = qt.scales.shape[-2] * QK
    d_out = qt.scales.shape[-1]
    M = x.shape[0]
    T = _pick_tile(d_out)
    nb = d_in // QK
    nT = d_out // T
    offset = LEVEL_OFFSET[qt.qtype] if qt.packed else 0
    five_bit = qt.packed and qt.qtype in (GGML_TYPE_Q5_0, GGML_TYPE_Q5_1)
    lv_rows = qt.levels.shape[0]
    L, B, S, D = k_cache.shape
    assert M == B and S % 8 == 0

    full = lambda shape: pl.BlockSpec(shape, lambda j: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    past_row = jnp.broadcast_to(
        jnp.atleast_1d(jnp.asarray(past, jnp.int32)), (B,)).reshape(1, B)
    in_specs = [
        pl.BlockSpec((1, B), lambda j: (0, 0), memory_space=pltpu.SMEM),
        full((M, d_in)),
        full((1, d_in)),
        full((1, d_in)),
        pl.BlockSpec((lv_rows, T), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, T), lambda j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [past_row, x.astype(jnp.float32), ln_w.reshape(1, d_in),
            ln_b.reshape(1, d_in), qt.levels, qt.scales]
    kw = dict(offset=offset, packed=qt.packed, five_bit=five_bit,
              n_valid=n_valid, T=T, nT=nT, eps=ln_eps, B=B)
    if qt.mins is not None:
        in_specs.append(pl.BlockSpec((nb, T), lambda j: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(qt.mins)
        kernel = functools.partial(_argmax_commit_kernel, **kw)
        n_pre = 7
    else:
        def kernel(past_ref, x_ref, lnw_ref, lnb_ref, lv_ref, sc_ref,
                   krt, vrt, kc_in, vc_in, out_ref, mv_ref, kc, vc,
                   bv_ref, bi_ref, kbuf, vbuf, sems):
            _argmax_commit_kernel(past_ref, x_ref, lnw_ref, lnb_ref,
                                  lv_ref, sc_ref, None, krt, vrt, kc_in,
                                  vc_in, out_ref, mv_ref, kc, vc, bv_ref,
                                  bi_ref, kbuf, vbuf, sems, **kw)
        n_pre = 6
    in_specs += [full((B, L, D)), full((B, L, D)), any_spec, any_spec]
    args += [k_rows_t.astype(k_cache.dtype), v_rows_t.astype(v_cache.dtype),
             k_cache, v_cache]

    level_bytes = lv_rows * d_out * qt.levels.dtype.itemsize
    rmw = 2 * 2 * L * B * 8 * D * k_cache.dtype.itemsize
    cost = pl.CostEstimate(
        flops=2 * M * d_in * d_out,
        bytes_accessed=(level_bytes + nb * d_out * 2 + M * d_in * 4
                        + M * 4 + rmw),
        transcendentals=0,
    )

    out, mv, kc, vc = pl.pallas_call(
        kernel,
        grid=(nT,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((M, 1), lambda j: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((M, 1), lambda j: (0, 0),
                                memory_space=pltpu.VMEM),
                   any_spec, any_spec],
        out_shape=[jax.ShapeDtypeStruct((M, 1), jnp.int32),
                   jax.ShapeDtypeStruct((M, 1), jnp.float32),
                   jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
                   jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype)],
        input_output_aliases={n_pre + 2: 2, n_pre + 3: 3},
        scratch_shapes=[pltpu.VMEM((M, 1), jnp.float32),
                        pltpu.VMEM((M, 1), jnp.int32),
                        pltpu.VMEM((B, L, 8, D), k_cache.dtype),
                        pltpu.VMEM((B, L, 8, D), v_cache.dtype),
                        pltpu.SemaphoreType.DMA((2, B))],
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out[:, 0], mv[:, 0], kc, vc


@functools.partial(jax.jit,
                   static_argnames=("n_valid", "ln_eps", "interpret",
                                    "with_max"))
def lm_head_argmax_pallas(x: jax.Array, ln_w: jax.Array, ln_b: jax.Array,
                          qt: QuantizedTensor, n_valid: int,
                          ln_eps: float = 1e-5,
                          interpret: bool = False,
                          with_max: bool = False):
    """argmax(layer_norm(x) @ dequant(qt)) over the first ``n_valid``
    columns. x: (M, d_model) float -> (M,) int32 token ids; with
    ``with_max`` also the (M,) f32 winning logit values (the health lane's
    NaN probe — a poisoned hidden state NaNs them)."""
    d_in = qt.scales.shape[-2] * QK
    d_out = qt.scales.shape[-1]
    M = x.shape[0]
    T = _pick_tile(d_out)
    nb = d_in // QK
    nT = d_out // T
    offset = LEVEL_OFFSET[qt.qtype] if qt.packed else 0
    five_bit = qt.packed and qt.qtype in (GGML_TYPE_Q5_0, GGML_TYPE_Q5_1)
    lv_rows = qt.levels.shape[0]

    full = lambda shape: pl.BlockSpec(shape, lambda j: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    in_specs = [
        full((M, d_in)),
        full((1, d_in)),
        full((1, d_in)),
        pl.BlockSpec((lv_rows, T), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, T), lambda j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [x.astype(jnp.float32), ln_w.reshape(1, d_in),
            ln_b.reshape(1, d_in), qt.levels, qt.scales]
    kw = dict(offset=offset, packed=qt.packed, five_bit=five_bit,
              n_valid=n_valid, T=T, nT=nT, eps=ln_eps)
    if qt.mins is not None:
        in_specs.append(pl.BlockSpec((nb, T), lambda j: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(qt.mins)
        kernel = functools.partial(_argmax_kernel, **kw)
    else:
        def kernel(x_ref, lnw_ref, lnb_ref, lv_ref, sc_ref, out_ref,
                   mv_ref, bv_ref, bi_ref):
            _argmax_kernel(x_ref, lnw_ref, lnb_ref, lv_ref, sc_ref, None,
                           out_ref, mv_ref, bv_ref, bi_ref, **kw)

    level_bytes = lv_rows * d_out * qt.levels.dtype.itemsize
    cost = pl.CostEstimate(
        flops=2 * M * d_in * d_out,
        bytes_accessed=level_bytes + nb * d_out * 2 + M * d_in * 4 + M * 4,
        transcendentals=0,
    )

    out, mv = pl.pallas_call(
        kernel,
        grid=(nT,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((M, 1), lambda j: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((M, 1), lambda j: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((M, 1), jnp.int32),
                   jax.ShapeDtypeStruct((M, 1), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((M, 1), jnp.float32),
                        pltpu.VMEM((M, 1), jnp.int32)],
        cost_estimate=cost,
        interpret=interpret,
    )(*args)
    if with_max:
        return out[:, 0], mv[:, 0]
    return out[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def qmatmul_pallas(x: jax.Array, qt: QuantizedTensor, interpret: bool = False) -> jax.Array:
    """y = x @ dequant(qt). x: (M, d_in) any float dtype -> (M, d_out) f32."""
    d_in = qt.scales.shape[-2] * QK
    d_out = qt.scales.shape[-1]
    M = x.shape[0]
    T = _pick_tile(d_out)
    nb = d_in // QK
    offset = LEVEL_OFFSET[qt.qtype] if qt.packed else 0
    five_bit = qt.packed and qt.qtype in (GGML_TYPE_Q5_0, GGML_TYPE_Q5_1)

    # d_in (unpacked), d_in//2 (4-bit packed), d_in//2 + d_in//8 (5-bit)
    lv_rows = qt.levels.shape[0]
    grid = (d_out // T,)

    in_specs = [
        pl.BlockSpec((M, d_in), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((lv_rows, T), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, T), lambda j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [x.astype(jnp.bfloat16), qt.levels, qt.scales]
    if qt.mins is not None:
        in_specs.append(pl.BlockSpec((nb, T), lambda j: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(qt.mins)
        kernel = functools.partial(_kernel, offset=offset, packed=qt.packed,
                                   five_bit=five_bit)
    else:
        def kernel(x_ref, lv_ref, sc_ref, out_ref):
            _kernel(x_ref, lv_ref, sc_ref, None, out_ref,
                    offset=offset, packed=qt.packed, five_bit=five_bit)

    level_bytes = lv_rows * d_out * qt.levels.dtype.itemsize
    cost = pl.CostEstimate(
        flops=2 * M * d_in * d_out,
        bytes_accessed=level_bytes + nb * d_out * 2 + M * d_in * 2 + M * d_out * 4,
        transcendentals=0,
    )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((M, T), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, d_out), jnp.float32),
        cost_estimate=cost,
        interpret=interpret,
    )(*args)
