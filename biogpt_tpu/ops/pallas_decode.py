"""Pallas TPU megakernel: the ENTIRE multi-layer decode step as one kernel.

Round-1 profiling (tools/profile_decode.py) showed single-token decode is
op-issue bound: ~610 device ops x ~2.3 us dispatch each, while the actual
weight traffic is ~0.19 ms at this chip's HBM bandwidth. The reference
builds its whole per-token graph as one unit too (biogpt.cpp:688-796) — the
TPU-native equivalent is one ``pallas_call`` covering all layers:

  grid = (n_layer, n_kv_blocks).  Step (l, j) processes KV block j of layer
  l; Pallas's automatic pipelining double-buffers the next block's weight
  planes HBM->VMEM while the current one computes (v5e VMEM is large enough
  to hold two full layers). Per layer:

    j == 0:   LN0 -> fused qkv dequant-matmul (X'-trick, one MXU op per
              tile) -> per-head blockdiag Q -> reset online-softmax state
    every j:  scores for KV block j via ONE MXU dot over the flat (KVB, D)
              cache block; numerically-stable online softmax accumulation
              (so the kernel is blockwise over the KV window — long-context
              ready, SURVEY §5)
    last j:   fold in the current token's k/v (computed in-kernel, never
              round-tripped), o-proj, LN1, fc1 -> exact GELU -> fc2,
              residuals; the new K/V rows stream out for a single
              dynamic_update_slice per cache tensor outside.

  The residual stream lives in a VMEM scratch that persists across grid
  steps; only x0 enters and x_final/k_rows/v_rows leave.

Quantized matmuls use the same block-structured X' formulation as
``pallas_qmatmul`` (see that module): a block-masked activation matrix
turns per-block partial sums into one MXU matmul, zero-point offsets fold
into the epilogue via per-block activation sums, and 4-bit levels arrive
packed two-per-byte (SWAR-unpacked through u32 lanes — Mosaic has no u8
shifts).

Attention avoids per-head kernels entirely: Q is expanded to a
block-diagonal (H, D) matrix so scores for ALL heads come from a single
(H, D) x (KVB, D)^T MXU dot against the cache block in its natural flat
layout, and the context (H, D) collapses back to (1, D) with a head-mask
multiply + sublane reduction. No head-batched dot_general (which Mosaic
rejects), no (…, H, Dk) relayouts.

GELU is exact-erf GELU (HF BioGPT parity) via the Abramowitz-Stegun 7.1.26
polynomial (|erf err| < 1.5e-7 — far below bf16 activation rounding);
Mosaic has no native erf.

Batched serving (2 <= B <= 32) runs the same grid with a batched kernel
variant: per-slot positions arrive as an SMEM vector, attention runs one
2-D MXU dot per slot against its own cache rows (head-batched AND
batch-batched dot_general are both Mosaic-hostile), and the online-softmax
state is carried for all B*H head-rows at once. The quantized matmuls
switch formulation: at M rows the X'-trick costs M times the MXU work, so
the batched path materializes the dequantized weight tile in VMEM instead
— scales expand to rows via a block-diagonal 0/1 expansion matmul (exact:
each output is a sum of ONE scale term) and a single (M, d_in) x (d_in,
tile) dot serves all rows, amortizing dequant over the batch. Weight bytes
amortize over slots, so per-slot-token cost falls nearly linearly until KV
reads dominate (measured round 3: 0.078 ms/slot-token at B=8 -> 0.038 at
B=16, W=128).

Constraints: batch <= 32, N=1 (decode), bf16 KV cache, lane-aligned dims.
Prefill keeps the per-op paths.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.codecs import QK, GGML_TYPE_Q5_0, GGML_TYPE_Q5_1
from ..quant.layouts import LEVEL_OFFSET, QuantizedTensor
from .pallas_qmatmul import _expand_blocks, unpack_levels_swar

_LANES = 128
# Unpacked-weight-tile VMEM budget per matmul step (bytes of bf16).
_TILE_BYTES = 4 * 1024 * 1024


def _pick_tile(d_in: int, d_out: int) -> int:
    """Largest lane-aligned d_out tile whose unpacked (d_in, tile) bf16
    buffer stays within the per-matmul VMEM budget."""
    cap = max(_LANES, _TILE_BYTES // (2 * d_in))
    for t in (4096, 2048, 1024, 512, 256, _LANES):
        if t <= cap and d_out % t == 0:
            return t
    return d_out  # small test shapes (< one lane tile)


def _gelu_erf(x: jax.Array) -> jax.Array:
    """Exact GELU via polynomial erf (Abramowitz & Stegun 7.1.26).

    max |erf error| 1.5e-7 — Mosaic lacks erf/erfc; the tanh-approx GELU
    would break parity with HF BioGPT (exact-gelu activation).
    """
    z = x * 0.7071067811865476
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf_a = 1.0 - poly * jnp.exp(-a * a)
    erf = jnp.where(z < 0, -erf_a, erf_a)
    return 0.5 * x * (1.0 + erf)


def _fake_quant_rows(x: jax.Array) -> jax.Array:
    """Per-row absmax int8 quantize->dequantize (matches
    runtime.cache.quantize_rows). In int8-KV mode the CURRENT token's k/v
    pass through this so attention sees exactly the representation the
    cache stores — and exactly what the per-op path (which reads the row
    back from the cache) computes."""
    s = jnp.max(jnp.abs(x), axis=1, keepdims=True) * (1.0 / 127.0)
    safe = jnp.maximum(s, 1e-12)
    return jnp.clip(jnp.round(x / safe), -127, 127) * safe


def _ln(x: jax.Array, w: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * w.astype(jnp.float32) + b.astype(jnp.float32)


# X' rows per matmul chunk: blocks-per-chunk. 32 blocks x QK=32 gives
# (32, 1024) X' chunks — enough sublanes to feed the MXU without inflating
# FLOPs by the full block count of wide inputs (fc2's d_in=4096 has 128
# blocks; unchunked that is 4x the necessary MXU work).
_CHUNK_BLOCKS = 32


def _block_mask(nb: int, width: int) -> jax.Array:
    """(nb, width) bf16 0/1 mask: mask[n, k] = (k // QK == n)."""
    blk = jax.lax.broadcasted_iota(jnp.int32, (nb, width), 1) // QK
    row = jax.lax.broadcasted_iota(jnp.int32, (nb, width), 0)
    return (blk == row).astype(jnp.bfloat16)


def _qmm(h_bf, lv_ref, sc_ref, mn_ref, *, offset: int, packed: bool,
         five_bit: bool = False):
    """(1, d_in) bf16 @ quantized planes -> (1, d_out) f32 (no bias).

    Same math as pallas_qmatmul._kernel: X' = block_mask * h makes the
    per-block partial sums ONE MXU matmul per (d_in chunk, d_out tile);
    scales apply to the (nb, tile) partials; the zero-point offset and
    _1-format mins fold in via per-block activation sums.
    """
    d_in = h_bf.shape[-1]
    d_out = sc_ref.shape[-1]
    tile = _pick_tile(d_in, d_out)
    chunk = min(d_in, _CHUNK_BLOCKS * QK)
    n_chunks = d_in // chunk
    nb_c = chunk // QK
    mask = _block_mask(nb_c, chunk)

    xps = [mask * h_bf[:, c * chunk:(c + 1) * chunk]      # (nb_c, chunk) bf16
           for c in range(n_chunks)]
    need_xsum = bool(offset) or mn_ref is not None
    xsums = ([jnp.sum(xp.astype(jnp.float32), axis=1, keepdims=True)
              for xp in xps] if need_xsum else None)

    outs = []
    for t0 in range(0, d_out, tile):
        if packed:
            lvt = unpack_levels_swar(lv_ref[0, :, t0:t0 + tile], d_in,
                                     five_bit)            # (d_in, tile) bf16
        else:
            lvt = lv_ref[0, :, t0:t0 + tile].astype(jnp.bfloat16)
        col = None
        for c in range(n_chunks):
            partial = jnp.dot(xps[c], lvt[c * chunk:(c + 1) * chunk, :],
                              preferred_element_type=jnp.float32)
            if offset:
                partial = partial - float(offset) * xsums[c]
            b0 = c * nb_c
            acc = partial * sc_ref[0, b0:b0 + nb_c, t0:t0 + tile].astype(
                jnp.float32)
            if mn_ref is not None:
                acc = acc + xsums[c] * mn_ref[0, b0:b0 + nb_c,
                                              t0:t0 + tile].astype(jnp.float32)
            part = jnp.sum(acc, axis=0, keepdims=True)    # (1, tile)
            col = part if col is None else col + part
        outs.append(col)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _qmm_dq(h_bf, lv_ref, sc_ref, mn_ref, *, offset: int, packed: bool,
            five_bit: bool = False):
    """(M, d_in) bf16 @ quantized planes -> (M, d_out) f32, dequant-then-dot.

    The M>1 formulation (see module docstring): per (chunk, tile) piece the
    scales expand to d_in rows (``_expand_blocks`` — each expanded entry is
    exactly one bf16 scale, so the expansion is EXACT), the weight piece
    dequantizes in f32, rounds once to bf16 (same numerics as
    pallas_qmatmul), and one MXU dot serves all M activation rows.
    """
    M, d_in = h_bf.shape
    d_out = sc_ref.shape[-1]
    tile = _pick_tile(d_in, d_out)
    chunk = min(d_in, _CHUNK_BLOCKS * QK)
    n_chunks = d_in // chunk
    nb_c = chunk // QK

    outs = []
    for t0 in range(0, d_out, tile):
        if packed:
            lvt = unpack_levels_swar(lv_ref[0, :, t0:t0 + tile], d_in,
                                     five_bit)            # (d_in, tile) bf16
        else:
            lvt = lv_ref[0, :, t0:t0 + tile].astype(jnp.bfloat16)
        acc = None
        for c in range(n_chunks):
            b0 = c * nb_c
            sexp = _expand_blocks(
                sc_ref[0, b0:b0 + nb_c, t0:t0 + tile].astype(jnp.bfloat16),
                nb_c)
            w = (lvt[c * chunk:(c + 1) * chunk, :].astype(jnp.float32)
                 - float(offset)) * sexp
            if mn_ref is not None:
                w = w + _expand_blocks(
                    mn_ref[0, b0:b0 + nb_c, t0:t0 + tile].astype(
                        jnp.bfloat16), nb_c)
            part = jnp.dot(h_bf[:, c * chunk:(c + 1) * chunk],
                           w.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        outs.append(acc)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


_NT = (((1,), (1,)), ((), ()))  # A @ B^T


def _head_mask(H: int, D: int) -> jax.Array:
    """(H, D) bf16 0/1: mask[h, d] = (d // (D//H) == h) — block-diagonal Q
    expansion and context collapse."""
    Dk = D // H
    col = jax.lax.broadcasted_iota(jnp.int32, (H, D), 1) // Dk
    row = jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
    return (col == row).astype(jnp.bfloat16)


def _make_kernel(names, *, D, H, KVB, eps, offset, packed, five_bit,
                 has_mins, kv_quant=False):
    scale = 1.0 / math.sqrt(D // H)

    def kernel(*refs):
        r = dict(zip(names, refs))
        n_in = len(names)
        xout_ref, krow_ref, vrow_ref = refs[n_in:n_in + 3]
        xres, qbd, kcur, vcur, msc, lsc, accsc = refs[n_in + 3:]

        lyr = pl.program_id(0)
        j = pl.program_id(1)
        nW = pl.num_programs(1)
        past = r["past"][0, 0]

        def mn(name):
            return r[name + "_mn"] if has_mins else None

        def vec(name):
            # per-layer vectors ship as (L, 1, d) so TPU block shapes stay
            # legal; the block is (1, 1, d) -> read the (1, d) row
            return r[name][0]

        # ---- layer entry: LN0 + fused qkv projection, reset softmax state
        @pl.when(j == 0)
        def _start_layer():
            @pl.when(lyr == 0)
            def _():
                xres[:] = r["x0"][:]

            h = _ln(xres[:], vec("ln0w"), vec("ln0b"), eps)
            h_bf = h.astype(jnp.bfloat16)
            qkv = _qmm(h_bf, r["qkv_lv"], r["qkv_sc"], mn("qkv"),
                       offset=offset, packed=packed, five_bit=five_bit)
            qkv = qkv + vec("qkv_b").astype(jnp.float32)
            q = qkv[:, :D] * scale
            k = qkv[:, D:2 * D]
            v = qkv[:, 2 * D:]
            # raw rows leave for the cache write (the caller quantizes them
            # with the same rounding); attention sees the quantized values
            krow_ref[0] = k.astype(krow_ref.dtype)
            vrow_ref[0] = v.astype(vrow_ref.dtype)
            kcur[:] = _fake_quant_rows(k) if kv_quant else k
            vcur[:] = _fake_quant_rows(v) if kv_quant else v
            # block-diagonal Q: row h carries q_h in its head's columns
            qbd[:] = _head_mask(H, D) * q.astype(jnp.bfloat16)
            msc[:] = jnp.full_like(msc, -1e30)
            lsc[:] = jnp.zeros_like(lsc)
            accsc[:] = jnp.zeros_like(accsc)

        # ---- one KV block: scores + online-softmax accumulation
        kblk = r["kcache"][0, 0]                           # (KVB, D) bf16/int8
        vblk = r["vcache"][0, 0]
        if kv_quant:
            # int8 rows: fold the per-row dequant scale into the SCORE
            # columns (H*KVB multiplies) instead of the K block (KVB*D)
            kblk = kblk.astype(jnp.bfloat16)
            vblk = vblk.astype(jnp.bfloat16)
        scores = jax.lax.dot_general(
            qbd[:], kblk, _NT, preferred_element_type=jnp.float32)  # (H, KVB)
        if kv_quant:
            scores = scores * r["kcache_s"][0, 0]          # (1, KVB) bcast
        idx = jax.lax.broadcasted_iota(jnp.int32, (H, KVB), 1) + j * KVB
        valid = idx < past                                 # slot `past` is
        masked = jnp.where(valid, scores, -1e30)           # the current token
        m_prev = msc[:]
        m_new = jnp.maximum(m_prev, jnp.max(masked, axis=1, keepdims=True))
        p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        lsc[:] = lsc[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        # V's per-row dequant scale folds into the attention WEIGHTS of the
        # accumulator dot only — the softmax denominator above uses raw p
        p_v = p * r["vcache_s"][0, 0] if kv_quant else p
        accsc[:] = accsc[:] * alpha + jnp.dot(
            p_v.astype(jnp.bfloat16), vblk, preferred_element_type=jnp.float32)
        msc[:] = m_new

        # ---- layer exit: current token, o-proj, FFN, residuals
        @pl.when(j == nW - 1)
        def _finish_layer():
            # current token's score: qbd is block-diagonal, so a plain
            # elementwise product with k_cur reduces to the per-head dot
            cur = jnp.sum(qbd[:].astype(jnp.float32) * kcur[:],
                          axis=1, keepdims=True)            # (H, 1)
            m_prev2 = msc[:]
            m_fin = jnp.maximum(m_prev2, cur)
            alpha2 = jnp.exp(m_prev2 - m_fin)
            p_cur = jnp.exp(cur - m_fin)
            l_all = lsc[:] * alpha2 + p_cur
            acc = accsc[:] * alpha2 + p_cur * vcur[:]       # (H, D) f32
            ctx = acc / l_all
            ctx_flat = jnp.sum(ctx * _head_mask(H, D).astype(jnp.float32),
                               axis=0, keepdims=True)       # (1, D)
            attn = _qmm(ctx_flat.astype(jnp.bfloat16), r["o_lv"], r["o_sc"],
                        mn("o"), offset=offset, packed=packed, five_bit=five_bit)
            x = xres[:] + attn + vec("o_b").astype(jnp.float32)

            h2 = _ln(x, vec("ln1w"), vec("ln1b"), eps).astype(jnp.bfloat16)
            f = _qmm(h2, r["fc1_lv"], r["fc1_sc"], mn("fc1"),
                     offset=offset, packed=packed, five_bit=five_bit)
            f = _gelu_erf(f + vec("fc1_b").astype(jnp.float32))
            out = _qmm(f.astype(jnp.bfloat16), r["fc2_lv"], r["fc2_sc"],
                       mn("fc2"), offset=offset, packed=packed, five_bit=five_bit)
            xres[:] = x + out + vec("fc2_b").astype(jnp.float32)

            @pl.when(lyr == pl.num_programs(0) - 1)
            def _():
                xout_ref[:] = xres[:]

    return kernel


def _make_kernel_batched(names, *, B, D, H, KVB, eps, offset, packed,
                         five_bit, has_mins, kv_quant=False, staged=False,
                         groups=1):
    """Batched (B <= 32) variant of :func:`_make_kernel`.

    Differences from the single-stream kernel: ``past`` is a per-slot SMEM
    vector; Q/K/V rows are (B, D); the block-diagonal Q trick is applied
    per slot (qbd row b*H+h carries slot b's head h) and scores come from
    one 2-D MXU dot PER SLOT against that slot's cache block — the
    online-softmax state then updates for all B*H head-rows at once.
    Matmuls use the dequant-then-dot formulation (:func:`_qmm_dq`).

    ``groups`` > 1: group-clamped KV streaming (mixed-length serving).
    The cache arrives as ``groups`` independent input streams of
    (1, B/groups, KVB, D) blocks whose index maps clamp the KV-block
    index to each group's own live block count (scalar-prefetched) —
    Pallas skips the HBM->VMEM copy when a block index repeats (the same
    revisit rule that already keeps layer weights resident across j), so
    a group of short slots stops paying KV traffic at ITS window while
    the grid keeps the lockstep (L, nW) shape. Stale (revisited) blocks
    are fully masked by the ``idx < past`` validity test, which uses the
    GRID block index — the math is exactly the lockstep kernel's. This
    is the round-5 answer to per-slot paged KV's failure mode: elision
    without per-block grid-step or DMA-sequencing overhead (paged
    measured −36% at B=32; see RESULTS.md).

    ``staged``: chunk-local KV staging (the serving scan). Rows written
    during the current chunk live in a small (L, B, C, D) staging buffer
    instead of the big cache — the caller writes it with ONE
    slot-agnostic dynamic_update_slice per step and commits per chunk,
    instead of 2·B per-slot cache writes per step (xprof measured those
    at ~0.25 ms/step at B=32, 20% of the step). The kernel then attends
    to cache rows below the CHUNK-START length (``past[b] - stepi``) plus
    staged rows below the step index (``j < stepi``); values and masking
    are identical to the unstaged path, so the math is bit-identical.
    """
    scale = 1.0 / math.sqrt(D // H)
    Dk = D // H
    BH = B * H

    def kernel(*refs):
        r = dict(zip(names, refs))
        n_in = len(names)
        xout_ref, krow_ref, vrow_ref = refs[n_in:n_in + 3]
        xres, qbd, kcur, vcur, msc, lsc, accsc = refs[n_in + 3:]

        lyr = pl.program_id(0)
        j = pl.program_id(1)
        nW = pl.num_programs(1)

        def mn(name):
            return r[name + "_mn"] if has_mins else None

        def vec(name):
            return r[name][0]

        # arithmetic 0/1 masks (Mosaic mishandles wide i1 relayouts)
        col_h = jax.lax.broadcasted_iota(jnp.int32, (BH, D), 1) // Dk
        row_h = jax.lax.broadcasted_iota(jnp.int32, (BH, D), 0) % H
        hm_t = (col_h == row_h).astype(jnp.bfloat16)      # tiled head mask
        rep_c = jax.lax.broadcasted_iota(jnp.int32, (BH, B), 1)
        rep_r = jax.lax.broadcasted_iota(jnp.int32, (BH, B), 0) // H
        rep = (rep_c == rep_r).astype(jnp.float32)        # (BH, B) slot-rep

        # ---- layer entry: LN0 + fused qkv projection, reset softmax state
        @pl.when(j == 0)
        def _start_layer():
            @pl.when(lyr == 0)
            def _():
                xres[:] = r["x0"][:]

            h = _ln(xres[:], vec("ln0w"), vec("ln0b"), eps)     # (B, D)
            qkv = _qmm_dq(h.astype(jnp.bfloat16), r["qkv_lv"], r["qkv_sc"],
                          mn("qkv"), offset=offset, packed=packed, five_bit=five_bit)
            qkv = qkv + vec("qkv_b").astype(jnp.float32)
            q = qkv[:, :D] * scale
            k = qkv[:, D:2 * D]
            v = qkv[:, 2 * D:]
            krow_ref[0] = k.astype(krow_ref.dtype)
            vrow_ref[0] = v.astype(vrow_ref.dtype)
            kcur[:] = _fake_quant_rows(k) if kv_quant else k
            vcur[:] = _fake_quant_rows(v) if kv_quant else v
            q_rep = jnp.dot(rep, q, preferred_element_type=jnp.float32)
            qbd[:] = hm_t * q_rep.astype(jnp.bfloat16)
            msc[:] = jnp.full_like(msc, -1e30)
            lsc[:] = jnp.zeros_like(lsc)
            accsc[:] = jnp.zeros_like(accsc)

        # ---- one KV block: per-slot scores + shared softmax accumulation
        GB = B // groups

        def kv_ref(tensor, b):
            # grouped streaming: slot b's block lives in its group's input
            if groups > 1:
                return r[f"{tensor}_g{b // GB}"][0, b % GB]
            return r[tensor][0, b]

        def kblk_of(b):
            blk = kv_ref("kcache", b)                        # (KVB, D)
            return blk.astype(jnp.bfloat16) if kv_quant else blk

        scores = jnp.concatenate(
            [jax.lax.dot_general(qbd[b * H:(b + 1) * H, :], kblk_of(b),
                                 _NT, preferred_element_type=jnp.float32)
             for b in range(B)], axis=0)                     # (BH, KVB)
        if kv_quant:
            # per-slot (1, KVB) K scales, repeated to that slot's H rows
            scores = scores * jnp.concatenate(
                [jnp.broadcast_to(kv_ref("kcache_s", b), (H, KVB))
                 for b in range(B)], axis=0)
        idx = jax.lax.broadcasted_iota(jnp.int32, (BH, KVB), 1) + j * KVB
        past_col = jnp.concatenate(
            [jnp.full((H, 1), r["past"][0, b], jnp.int32) for b in range(B)],
            axis=0)                                          # (BH, 1)
        if staged:
            # rows written this chunk are in the STAGING buffer, not the
            # cache: the cache is valid only below the chunk-start length
            past_col = past_col - r["stepi"][0, 0]
        valid = idx < past_col
        masked = jnp.where(valid, scores, -1e30)
        m_prev = msc[:]
        m_new = jnp.maximum(m_prev, jnp.max(masked, axis=1, keepdims=True))
        p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        lsc[:] = lsc[:] * alpha + jnp.sum(p, axis=1, keepdims=True)

        def pv_of(b):
            # V's per-row scale folds into the attention weights (the
            # denominator above uses raw p)
            pb = p[b * H:(b + 1) * H, :]
            if kv_quant:
                pb = pb * kv_ref("vcache_s", b)
            vb = kv_ref("vcache", b)
            return jnp.dot(pb.astype(jnp.bfloat16),
                           vb.astype(jnp.bfloat16) if kv_quant else vb,
                           preferred_element_type=jnp.float32)

        accsc[:] = accsc[:] * alpha + jnp.concatenate(
            [pv_of(b) for b in range(B)], axis=0)
        msc[:] = m_new

        # ---- layer exit: current token, o-proj, FFN, residuals
        @pl.when(j == nW - 1)
        def _finish_layer():
            if staged:
                # fold the chunk's staged rows (steps [0, stepi) of this
                # chunk, written by the caller after each step). Round 4:
                # ONE flattened block-diagonal dot instead of a per-slot
                # loop — the (BH, B*C) score matrix masks cross-slot
                # entries to a no-op, so 2 MXU dots replace 2*B small
                # ones per layer (the per-slot loop's 768 dot issues per
                # step were why round 3 measured staging neutral)
                C = r["kstage"].shape[-2]
                stepi = r["stepi"][0, 0]
                ks_flat = r["kstage"][0].reshape(B * C, D).astype(
                    jnp.bfloat16)
                vs_flat = r["vstage"][0].reshape(B * C, D).astype(
                    jnp.bfloat16)
                scores_s = jax.lax.dot_general(
                    qbd[:], ks_flat, _NT,
                    preferred_element_type=jnp.float32)      # (BH, B*C)
                col = jax.lax.broadcasted_iota(jnp.int32, (BH, B * C), 1)
                row_slot = jax.lax.broadcasted_iota(
                    jnp.int32, (BH, B * C), 0) // H
                valid_s = (col // C == row_slot) & (col % C < stepi)
                masked_s = jnp.where(valid_s, scores_s, -1e30)
                m_prev_s = msc[:]
                m_new_s = jnp.maximum(
                    m_prev_s, jnp.max(masked_s, axis=1, keepdims=True))
                p_s = jnp.where(valid_s, jnp.exp(scores_s - m_new_s), 0.0)
                alpha_s = jnp.exp(m_prev_s - m_new_s)
                lsc[:] = lsc[:] * alpha_s + jnp.sum(p_s, axis=1,
                                                    keepdims=True)
                accsc[:] = accsc[:] * alpha_s + jnp.dot(
                    p_s.astype(jnp.bfloat16), vs_flat,
                    preferred_element_type=jnp.float32)
                msc[:] = m_new_s

            kcur_rep = jnp.dot(rep, kcur[:],
                               preferred_element_type=jnp.float32)
            vcur_rep = jnp.dot(rep, vcur[:],
                               preferred_element_type=jnp.float32)
            cur = jnp.sum(qbd[:].astype(jnp.float32) * kcur_rep,
                          axis=1, keepdims=True)             # (BH, 1)
            m_prev2 = msc[:]
            m_fin = jnp.maximum(m_prev2, cur)
            alpha2 = jnp.exp(m_prev2 - m_fin)
            p_cur = jnp.exp(cur - m_fin)
            l_all = lsc[:] * alpha2 + p_cur
            acc = accsc[:] * alpha2 + p_cur * vcur_rep       # (BH, D)
            ctx = acc / l_all
            # collapse (BH, D) head-rows to (B, D): select each slot's rows
            # with rep^T, head columns already disjoint via the mask
            ctx_flat = jnp.dot(rep.T.astype(jnp.float32),
                               ctx * hm_t.astype(jnp.float32),
                               preferred_element_type=jnp.float32)
            attn = _qmm_dq(ctx_flat.astype(jnp.bfloat16), r["o_lv"],
                           r["o_sc"], mn("o"), offset=offset, packed=packed, five_bit=five_bit)
            x = xres[:] + attn + vec("o_b").astype(jnp.float32)

            h2 = _ln(x, vec("ln1w"), vec("ln1b"), eps).astype(jnp.bfloat16)
            f = _qmm_dq(h2, r["fc1_lv"], r["fc1_sc"], mn("fc1"),
                        offset=offset, packed=packed, five_bit=five_bit)
            f = _gelu_erf(f + vec("fc1_b").astype(jnp.float32))
            out = _qmm_dq(f.astype(jnp.bfloat16), r["fc2_lv"], r["fc2_sc"],
                          mn("fc2"), offset=offset, packed=packed, five_bit=five_bit)
            xres[:] = x + out + vec("fc2_b").astype(jnp.float32)

            @pl.when(lyr == pl.num_programs(0) - 1)
            def _():
                xout_ref[:] = xres[:]

    return kernel


def _make_kernel_paged(names, *, B, D, H, KVB, eps, offset, packed,
                       five_bit, has_mins, kv_quant=False):
    """Per-slot-KV ("paged") variant of :func:`_make_kernel_batched`.

    Grid is (L, B): step (l, b) runs slot b's WHOLE attention as an
    in-kernel ``fori_loop`` over the slot's live block count (a scalar-
    prefetched vector), manually double-buffering each (KVB, D) K/V block
    HBM->VMEM with ``pltpu.make_async_copy``. A slot at position p streams
    ceil(p/KVB) blocks instead of the batch-wide window, so ragged batches
    skip real fractions of the dominant byte stream of lockstep decode (KV
    is ~2.3x the packed-weight bytes at S=512). An earlier (L, B, nW)-grid
    formulation achieved the same elision through clamped BlockSpec index
    maps but spent ~1.2 us of grid-step overhead per block step — more
    than it saved; the in-kernel loop makes a block cost a loop iteration
    instead of a grid step.

    The per-block compute runs at full (B*H)-row width with non-slot rows
    masked to a no-op (alpha=1, p=0): an (H,)-row dot and a (B*H,)-row dot
    cost the same MXU passes (row granularity is 128), and masking avoids
    dynamically slicing the softmax-state scratch at traced offsets.
    """
    scale = 1.0 / math.sqrt(D // H)
    Dk = D // H
    BH = B * H

    def kernel(nb_ref, *refs):
        r = dict(zip(names, refs))
        n_in = len(names)
        xout_ref, krow_ref, vrow_ref = refs[n_in:n_in + 3]
        (xres, qbd, kcur, vcur, msc, lsc, accsc,
         kbuf, vbuf, ksem, vsem) = refs[n_in + 3:]

        lyr = pl.program_id(0)
        b = pl.program_id(1)

        def mn(name):
            return r[name + "_mn"] if has_mins else None

        def vec(name):
            return r[name][0]

        col_h = jax.lax.broadcasted_iota(jnp.int32, (BH, D), 1) // Dk
        row_h = jax.lax.broadcasted_iota(jnp.int32, (BH, D), 0) % H
        hm_t = (col_h == row_h).astype(jnp.bfloat16)      # tiled head mask
        rep_c = jax.lax.broadcasted_iota(jnp.int32, (BH, B), 1)
        rep_r = jax.lax.broadcasted_iota(jnp.int32, (BH, B), 0) // H
        rep = (rep_c == rep_r).astype(jnp.float32)        # (BH, B) slot-rep

        # ---- layer entry: LN0 + fused qkv projection for ALL slots
        @pl.when(b == 0)
        def _start_layer():
            @pl.when(lyr == 0)
            def _():
                xres[:] = r["x0"][:]

            h = _ln(xres[:], vec("ln0w"), vec("ln0b"), eps)     # (B, D)
            qkv = _qmm_dq(h.astype(jnp.bfloat16), r["qkv_lv"], r["qkv_sc"],
                          mn("qkv"), offset=offset, packed=packed,
                          five_bit=five_bit)
            qkv = qkv + vec("qkv_b").astype(jnp.float32)
            q = qkv[:, :D] * scale
            k = qkv[:, D:2 * D]
            v = qkv[:, 2 * D:]
            krow_ref[0] = k.astype(krow_ref.dtype)
            vrow_ref[0] = v.astype(vrow_ref.dtype)
            kcur[:] = _fake_quant_rows(k) if kv_quant else k
            vcur[:] = _fake_quant_rows(v) if kv_quant else v
            q_rep = jnp.dot(rep, q, preferred_element_type=jnp.float32)
            qbd[:] = hm_t * q_rep.astype(jnp.bfloat16)
            msc[:] = jnp.full_like(msc, -1e30)
            lsc[:] = jnp.zeros_like(lsc)
            accsc[:] = jnp.zeros_like(accsc)

        # ---- slot b's live KV blocks: double-buffered manual DMA loop
        nb = nb_ref[b]
        past_b = r["past"][0, b]

        def cp_k(j, slot):
            return pltpu.make_async_copy(
                r["kcache"].at[lyr, b, pl.ds(j * KVB, KVB), :],
                kbuf.at[slot], ksem.at[slot])

        def cp_v(j, slot):
            return pltpu.make_async_copy(
                r["vcache"].at[lyr, b, pl.ds(j * KVB, KVB), :],
                vbuf.at[slot], vsem.at[slot])

        cp_k(0, 0).start()
        cp_v(0, 0).start()

        rows = jax.lax.broadcasted_iota(jnp.int32, (BH, KVB), 0) // H
        cols = jax.lax.broadcasted_iota(jnp.int32, (BH, KVB), 1)

        def body(j, carry):
            m_prev, l_prev, a_prev = carry
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < nb)
            def _():
                nslot = jax.lax.rem(j + 1, 2)
                cp_k(j + 1, nslot).start()
                cp_v(j + 1, nslot).start()

            cp_k(j, slot).wait()
            cp_v(j, slot).wait()
            kblk = kbuf[slot]
            vblk = vbuf[slot]
            if kv_quant:
                kblk = kblk.astype(jnp.bfloat16)
                vblk = vblk.astype(jnp.bfloat16)
            scores = jax.lax.dot_general(
                qbd[:], kblk, _NT,
                preferred_element_type=jnp.float32)        # (BH, KVB)
            if kv_quant:
                ksl = jax.lax.dynamic_slice_in_dim(
                    r["kcache_s"][0, 0, 0], j * KVB, KVB)
                scores = scores * ksl[None, :]
            # rows of other slots are masked to a state no-op: their masked
            # scores are -1e30, so m_new == m_prev, alpha == 1, p == 0
            valid = (rows == b) & (cols + j * KVB < past_b)
            masked = jnp.where(valid, scores, -1e30)
            m_new = jnp.maximum(m_prev,
                                jnp.max(masked, axis=1, keepdims=True))
            p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            if kv_quant:
                vsl = jax.lax.dynamic_slice_in_dim(
                    r["vcache_s"][0, 0, 0], j * KVB, KVB)
                p = p * vsl[None, :]
            a_new = a_prev * alpha + jnp.dot(
                p.astype(jnp.bfloat16), vblk,
                preferred_element_type=jnp.float32)
            return m_new, l_new, a_new

        m_fin, l_fin, a_fin = jax.lax.fori_loop(
            0, nb, body, (msc[:], lsc[:], accsc[:]))
        msc[:] = m_fin
        lsc[:] = l_fin
        accsc[:] = a_fin

        # ---- layer exit: current token, o-proj, FFN, residuals
        @pl.when(b == B - 1)
        def _finish_layer():
            kcur_rep = jnp.dot(rep, kcur[:],
                               preferred_element_type=jnp.float32)
            vcur_rep = jnp.dot(rep, vcur[:],
                               preferred_element_type=jnp.float32)
            cur = jnp.sum(qbd[:].astype(jnp.float32) * kcur_rep,
                          axis=1, keepdims=True)             # (BH, 1)
            m_prev2 = msc[:]
            m_fin = jnp.maximum(m_prev2, cur)
            alpha2 = jnp.exp(m_prev2 - m_fin)
            p_cur = jnp.exp(cur - m_fin)
            l_all = lsc[:] * alpha2 + p_cur
            acc = accsc[:] * alpha2 + p_cur * vcur_rep       # (BH, D)
            ctx = acc / l_all
            ctx_flat = jnp.dot(rep.T.astype(jnp.float32),
                               ctx * hm_t.astype(jnp.float32),
                               preferred_element_type=jnp.float32)
            attn = _qmm_dq(ctx_flat.astype(jnp.bfloat16), r["o_lv"],
                           r["o_sc"], mn("o"), offset=offset, packed=packed,
                           five_bit=five_bit)
            x = xres[:] + attn + vec("o_b").astype(jnp.float32)

            h2 = _ln(x, vec("ln1w"), vec("ln1b"), eps).astype(jnp.bfloat16)
            f = _qmm_dq(h2, r["fc1_lv"], r["fc1_sc"], mn("fc1"),
                        offset=offset, packed=packed, five_bit=five_bit)
            f = _gelu_erf(f + vec("fc1_b").astype(jnp.float32))
            out = _qmm_dq(f.astype(jnp.bfloat16), r["fc2_lv"], r["fc2_sc"],
                          mn("fc2"), offset=offset, packed=packed,
                          five_bit=five_bit)
            xres[:] = x + out + vec("fc2_b").astype(jnp.float32)

            @pl.when(lyr == pl.num_programs(0) - 1)
            def _():
                xout_ref[:] = xres[:]

    return kernel


def kv_commit_pallas(k_cache, v_cache, k_rows_t, v_rows_t, past,
                     *, interpret: bool = False):
    """Commit each slot's new K/V rows at its own cache position — ONE
    kernel instead of 2·B dynamic_update_slices.

    The 2·B per-slot DUS ops measured 0.58 ms/step at B=32 on this
    runtime (64 serially-chained op launches, bench_step32.py); a single
    batched XLA scatter measured 10× worse, and a direct width-1 row DMA
    is unlowerable (ANY-space cache memrefs carry (8,128) tiling on
    (S, D) — probe_inkernel_writes.py). This kernel threads the needle
    with aligned read-modify-write: per (tensor, slot) it DMAs the
    8-row-aligned (L, 8, D) cache tile containing the slot's position
    (``pl.multiple_of`` proves the dynamic offset's alignment), folds the
    new row in with a vector select, and DMAs the tile back — ~48 MB of
    RMW traffic at B=32 (~60 µs at HBM bandwidth) plus 4·B DMA issues,
    all inside one launch. Caches are donated (input/output aliased).

    ``k_rows_t``/``v_rows_t`` arrive SLOT-MAJOR (B, L, D): per-slot
    extraction from the kernel-native (L, B, D) would slice the tiled B
    dim (Mosaic rejects); the caller's one cheap transpose keeps every
    in-kernel slice a dim-0 collapse.
    """
    L, B, S, D = k_cache.shape
    assert S % 8 == 0

    def kernel(past_ref, krt, vrt, kc_in, vc_in, kc, vc, kbuf, vbuf, sems):
        del kc_in, vc_in   # aliased to kc/vc; all access goes via outputs
        reads = []
        for b in range(B):
            t_off = pl.multiple_of((past_ref[0, b] // 8) * 8, 8)
            ck = pltpu.make_async_copy(
                kc.at[:, b, pl.ds(t_off, 8), :], kbuf.at[b], sems.at[0, b])
            cv = pltpu.make_async_copy(
                vc.at[:, b, pl.ds(t_off, 8), :], vbuf.at[b], sems.at[1, b])
            ck.start()
            cv.start()
            reads.append((t_off, ck, cv))
        row_ix = jax.lax.broadcasted_iota(jnp.int32, (L, 8, D), 1)
        writes = []
        for b in range(B):
            t_off, ck, cv = reads[b]
            ck.wait()
            cv.wait()
            r = past_ref[0, b] - t_off
            kbuf[b] = jnp.where(row_ix == r,
                                krt[b][:, None, :].astype(kbuf.dtype),
                                kbuf[b])
            vbuf[b] = jnp.where(row_ix == r,
                                vrt[b][:, None, :].astype(vbuf.dtype),
                                vbuf[b])
            wk = pltpu.make_async_copy(
                kbuf.at[b], kc.at[:, b, pl.ds(t_off, 8), :], sems.at[0, b])
            wv = pltpu.make_async_copy(
                vbuf.at[b], vc.at[:, b, pl.ds(t_off, 8), :], sems.at[1, b])
            wk.start()
            wv.start()
            writes.append((wk, wv))
        for wk, wv in writes:
            wk.wait()
            wv.wait()

    past_row = jnp.broadcast_to(
        jnp.atleast_1d(jnp.asarray(past, jnp.int32)), (B,)).reshape(1, B)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    kc, vc = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((1, B), memory_space=pltpu.SMEM),
                  pl.BlockSpec((B, L, D), memory_space=pltpu.VMEM),
                  pl.BlockSpec((B, L, D), memory_space=pltpu.VMEM),
                  any_spec, any_spec],
        out_specs=[any_spec, any_spec],
        out_shape=[jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
                   jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype)],
        input_output_aliases={3: 0, 4: 1},
        scratch_shapes=[pltpu.VMEM((B, L, 8, D), k_cache.dtype),
                        pltpu.VMEM((B, L, 8, D), v_cache.dtype),
                        pltpu.SemaphoreType.DMA((2, B))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(past_row, k_rows_t.astype(k_cache.dtype),
      v_rows_t.astype(v_cache.dtype), k_cache, v_cache)
    return kc, vc


def kv_commit_quant_pallas(k_cache, v_cache, ks, vs,
                           kq_t, vq_t, ksc_t, vsc_t, past,
                           *, interpret: bool = False):
    """int8-KV variant of :func:`kv_commit_pallas`: commit each slot's new
    quantized K/V rows AND their per-row dequant scales in ONE kernel.

    The int8 cache path otherwise pays 4·B serially-chained
    dynamic_update_slices per step (two level rows + two scale scalars per
    slot — 128 op launches at B=32, ~2× the bf16 path's measured
    0.58 ms/step). Levels RMW exactly like the bf16 kernel (8-row-aligned
    (L, 8, D) tiles, int8 select widened through i32 — Mosaic has no i8
    select on this toolchain). Scales live in (L, B, 1, S) lane-major
    planes, so each slot's scalar lands via a 128-lane-aligned (L, 1, 128)
    tile RMW (``pl.multiple_of`` proves both alignments). All four cache
    arrays are donated (input/output aliased).

    Rows arrive SLOT-MAJOR: ``kq_t``/``vq_t`` (B, L, D) int8,
    ``ksc_t``/``vsc_t`` (B, L, 1) f32 — same reasoning as the bf16 kernel
    (per-slot extraction must be a dim-0 collapse).
    """
    L, B, S, D = k_cache.shape
    assert S % 128 == 0 and D % 128 == 0

    def kernel(past_ref, krt, vrt, kst, vst, kc_in, vc_in, ks_in, vs_in,
               kc, vc, ksc, vsc, kbuf, vbuf, ksbuf, vsbuf, sems):
        del kc_in, vc_in, ks_in, vs_in   # aliased to the outputs
        reads = []
        for b in range(B):
            t_off = pl.multiple_of((past_ref[0, b] // 8) * 8, 8)
            s_off = pl.multiple_of((past_ref[0, b] // 128) * 128, 128)
            cks = [
                pltpu.make_async_copy(kc.at[:, b, pl.ds(t_off, 8), :],
                                      kbuf.at[b], sems.at[0, b]),
                pltpu.make_async_copy(vc.at[:, b, pl.ds(t_off, 8), :],
                                      vbuf.at[b], sems.at[1, b]),
                pltpu.make_async_copy(ksc.at[:, b, :, pl.ds(s_off, 128)],
                                      ksbuf.at[b], sems.at[2, b]),
                pltpu.make_async_copy(vsc.at[:, b, :, pl.ds(s_off, 128)],
                                      vsbuf.at[b], sems.at[3, b]),
            ]
            for c in cks:
                c.start()
            reads.append((t_off, s_off, cks))
        row_ix = jax.lax.broadcasted_iota(jnp.int32, (L, 8, D), 1)
        lane_ix = jax.lax.broadcasted_iota(jnp.int32, (L, 1, 128), 2)
        writes = []
        for b in range(B):
            t_off, s_off, cks = reads[b]
            for c in cks:
                c.wait()
            r = past_ref[0, b] - t_off
            rl = past_ref[0, b] - s_off
            # i8 select is unsupported on this Mosaic: widen through i32
            kbuf[b] = jnp.where(
                row_ix == r, krt[b][:, None, :].astype(jnp.int32),
                kbuf[b].astype(jnp.int32)).astype(jnp.int8)
            vbuf[b] = jnp.where(
                row_ix == r, vrt[b][:, None, :].astype(jnp.int32),
                vbuf[b].astype(jnp.int32)).astype(jnp.int8)
            ksbuf[b] = jnp.where(lane_ix == rl, kst[b][:, :, None],
                                 ksbuf[b])
            vsbuf[b] = jnp.where(lane_ix == rl, vst[b][:, :, None],
                                 vsbuf[b])
            wks = [
                pltpu.make_async_copy(kbuf.at[b],
                                      kc.at[:, b, pl.ds(t_off, 8), :],
                                      sems.at[0, b]),
                pltpu.make_async_copy(vbuf.at[b],
                                      vc.at[:, b, pl.ds(t_off, 8), :],
                                      sems.at[1, b]),
                pltpu.make_async_copy(ksbuf.at[b],
                                      ksc.at[:, b, :, pl.ds(s_off, 128)],
                                      sems.at[2, b]),
                pltpu.make_async_copy(vsbuf.at[b],
                                      vsc.at[:, b, :, pl.ds(s_off, 128)],
                                      sems.at[3, b]),
            ]
            for w in wks:
                w.start()
            writes.append(wks)
        for wks in writes:
            for w in wks:
                w.wait()

    past_row = jnp.broadcast_to(
        jnp.atleast_1d(jnp.asarray(past, jnp.int32)), (B,)).reshape(1, B)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    kc, vc, ksc, vsc = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((1, B), memory_space=pltpu.SMEM),
                  pl.BlockSpec((B, L, D), memory_space=pltpu.VMEM),
                  pl.BlockSpec((B, L, D), memory_space=pltpu.VMEM),
                  pl.BlockSpec((B, L, 1), memory_space=pltpu.VMEM),
                  pl.BlockSpec((B, L, 1), memory_space=pltpu.VMEM),
                  any_spec, any_spec, any_spec, any_spec],
        out_specs=[any_spec, any_spec, any_spec, any_spec],
        out_shape=[jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
                   jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
                   jax.ShapeDtypeStruct(ks.shape, ks.dtype),
                   jax.ShapeDtypeStruct(vs.shape, vs.dtype)],
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        scratch_shapes=[pltpu.VMEM((B, L, 8, D), k_cache.dtype),
                        pltpu.VMEM((B, L, 8, D), v_cache.dtype),
                        pltpu.VMEM((B, L, 1, 128), ks.dtype),
                        pltpu.VMEM((B, L, 1, 128), vs.dtype),
                        pltpu.SemaphoreType.DMA((4, B))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(past_row, kq_t, vq_t, ksc_t, vsc_t, k_cache, v_cache, ks, vs)
    return kc, vc, ksc, vsc


# Per-KV-tensor VMEM budget for one buffering level of the lockstep
# window block (Pallas double-buffers it, and k and v each hold one).
_KV_WINDOW_BYTES = 8 * 1024 * 1024


def _kv_block(window: int, batch: int = 1, d_model: int = 1024) -> int:
    """KV block size: the largest power-of-two piece of the window whose
    (1, B, KVB, D) bf16 VMEM window fits the budget — wide batches force
    smaller blocks (B=32 at W=512 otherwise wants 128 MB of VMEM for KV
    alone and fails to compile). Floor 128 (DMA efficiency), cap 512;
    falls back to one block for odd windows (engine buckets are powers of
    two, so this is the normal case)."""
    kvb = window
    while (kvb % 2 == 0 and kvb > 128
           and (kvb > 512 or batch * kvb * d_model * 2 > _KV_WINDOW_BYTES)):
        kvb //= 2
    return kvb


# Per-slot ("paged") KV block: finer than the lockstep block so short slots
# in a ragged batch skip real fractions of the window (skip granularity ==
# the block size). 128 rows x 1024 lanes of bf16 = a 256 KB DMA — plenty to
# run at full HBM bandwidth.
_PAGED_KVB = 128


def _kv_block_paged(window: int) -> int:
    if window % _PAGED_KVB == 0:
        return _PAGED_KVB
    return _kv_block(window)


def supports_layers(layers: dict, cache_dtype, batch: int, n_new: int) -> bool:
    """Whether the megakernel path applies to these engine-packed layers."""
    if not 1 <= batch <= 32 or n_new != 1 or cache_dtype != jnp.bfloat16:
        return False
    if "qkv" not in layers:
        return False
    qts = [layers[k]["w"] for k in ("qkv", "o", "fc1", "fc2")]
    if not all(isinstance(w, QuantizedTensor) for w in qts):
        return False
    q0 = qts[0]
    if not all(w.qtype == q0.qtype and w.packed == q0.packed for w in qts):
        return False
    if not all((w.mins is None) == (q0.mins is None) for w in qts):
        return False
    chunk = _CHUNK_BLOCKS * QK
    for w in qts:
        d_out = w.scales.shape[-1]
        d_in = w.scales.shape[-2] * QK
        if d_out % _LANES != 0 or (w.packed and d_in % (2 * QK) != 0):
            return False
        # the in-kernel matmuls walk d_in in _CHUNK_BLOCKS*QK pieces with
        # no remainder path — a d_in like 1536 would silently drop its
        # tail (same gate as pallas_qmatmul.supports_wide)
        if d_in > chunk and d_in % chunk != 0:
            return False
    return True


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "window", "ln_eps", "interpret", "kv_block",
                     "per_slot_kv", "kv_groups"))
def decode_step_fused(
    x0: jax.Array,
    layers: dict,
    k_cache: jax.Array,
    v_cache: jax.Array,
    past: jax.Array,
    *,
    n_head: int,
    window: int,
    ln_eps: float = 1e-5,
    interpret: bool = False,
    kv_block: int | None = None,  # override KV block size (tests)
    k_scales: jax.Array | None = None,  # (L, B, 1, S) f32: int8-KV mode —
    v_scales: jax.Array | None = None,  # caches are int8 levels, per-row
                                        # scales fold in at the score/weight
                                        # stage (halves KV HBM traffic)
    per_slot_kv: bool = False,   # paged path: each slot streams only its
                                 # own live KV blocks (see _make_kernel_paged)
    k_stage: jax.Array | None = None,  # (L, B, C, D) chunk-local staging:
    v_stage: jax.Array | None = None,  # rows written this chunk (see
                                       # _make_kernel_batched ``staged``)
    step_i: jax.Array | None = None,   # scalar: step index within the chunk
    kv_groups: int | None = None,  # group-clamped KV streaming: slots
                                   # split into kv_groups groups, each
                                   # streaming only its own live blocks
                                   # (see _make_kernel_batched ``groups``)
):
    """One full decode step over all layers (see module docstring).

    Returns (x_final (B, D) f32, k_rows (L, B, D), v_rows (L, B, D) in
    cache dtype — f32 in int8-KV mode: the CALLER quantizes the new rows).
    ``k_cache``/``v_cache`` are flat-D views (L, B, S, D); ``past`` is a
    scalar (B=1) or per-slot (B,) vector of positions; the caller writes
    each slot's returned rows at its own position (into the staging
    buffer at ``step_i`` when staging is active — cache rows then need
    only ONE commit per chunk).
    """
    L, B, S, D = k_cache.shape
    kv_quant = k_scales is not None
    H = n_head
    qkv: QuantizedTensor = layers["qkv"]["w"]
    F = layers["fc1"]["w"].scales.shape[-1]
    packed = qkv.packed
    has_mins = qkv.mins is not None
    offset = LEVEL_OFFSET[qkv.qtype] if packed else 0
    five_bit = packed and qkv.qtype in (GGML_TYPE_Q5_0, GGML_TYPE_Q5_1)
    W = min(window, S)
    KVB = kv_block or (_kv_block_paged(W) if per_slot_kv
                       else _kv_block(W, B, D))
    if W % KVB != 0:
        raise ValueError(f"window {W} not divisible by kv_block {KVB}")
    nW = W // KVB
    grouped = (kv_groups is not None and kv_groups > 1 and B > 1
               and not per_slot_kv and nW > 1)
    if grouped:
        if B % kv_groups != 0:
            raise ValueError(
                f"batch {B} not divisible by kv_groups {kv_groups}")
        if k_stage is not None:
            raise ValueError("kv_groups and staged KV do not compose")

    if per_slot_kv or grouped:
        # index maps gain the scalar-prefetch arg: per-slot block counts
        # (paged: grid (L, B), in-kernel DMA loop) or per-GROUP block
        # counts (grouped: grid (L, nW), clamped cache index maps)
        def const(shape):
            return pl.BlockSpec(shape, lambda l, b, nb: (0,) * len(shape),
                                memory_space=pltpu.VMEM)

        def per_layer(shape):
            return pl.BlockSpec((1,) + shape,
                                lambda l, b, nb: (l,) + (0,) * len(shape),
                                memory_space=pltpu.VMEM)
    else:
        def const(shape):
            return pl.BlockSpec(shape, lambda l, j: (0,) * len(shape),
                                memory_space=pltpu.VMEM)

        def per_layer(shape):
            return pl.BlockSpec((1,) + shape,
                                lambda l, j: (l,) + (0,) * len(shape),
                                memory_space=pltpu.VMEM)

    def as_rows(a):
        # per-layer vectors (L, d) -> (L, 1, d): TPU block shapes must have
        # their last two dims (8, 128)-aligned or equal to the array dims
        return jnp.asarray(a).reshape(a.shape[0], 1, a.shape[-1])

    names = ["past", "x0", "ln0w", "ln0b", "ln1w", "ln1b"]
    past_vec = jnp.broadcast_to(
        jnp.atleast_1d(jnp.asarray(past, jnp.int32)), (B,))
    past_row = past_vec.reshape(1, B)
    past_spec = (pl.BlockSpec((1, B), lambda l, b, nb: (0, 0),
                              memory_space=pltpu.SMEM)
                 if (per_slot_kv or grouped) else
                 pl.BlockSpec((1, B), lambda l, j: (0, 0),
                              memory_space=pltpu.SMEM))
    args = [past_row,
            x0.astype(jnp.float32),
            as_rows(layers["ln0"]["w"]), as_rows(layers["ln0"]["b"]),
            as_rows(layers["ln1"]["w"]), as_rows(layers["ln1"]["b"])]
    in_specs = [past_spec,
                const((B, D)),
                per_layer((1, D)), per_layer((1, D)),
                per_layer((1, D)), per_layer((1, D))]

    for name in ("qkv", "o", "fc1", "fc2"):
        w: QuantizedTensor = layers[name]["w"]
        lv_rows, d_out = w.levels.shape[-2], w.levels.shape[-1]
        nb = w.scales.shape[-2]
        names += [f"{name}_lv", f"{name}_sc"]
        args += [w.levels, w.scales]
        in_specs += [per_layer((lv_rows, d_out)), per_layer((nb, d_out))]
        if has_mins:
            names.append(f"{name}_mn")
            args.append(w.mins)
            in_specs.append(per_layer((nb, d_out)))
        names.append(f"{name}_b")
        args.append(as_rows(layers[name]["b"]))
        in_specs.append(per_layer((1, d_out)))

    if grouped:
        # the cache enters as kv_groups independent block streams; each
        # group's index map clamps the block index to its own live count
        # (nbg, scalar-prefetched), so Pallas's revisit rule elides the
        # HBM copy for every block past the group's window
        GB = B // kv_groups

        def g_spec(g):
            return pl.BlockSpec(
                (1, GB, KVB, D),
                lambda l, j, nbg, g=g: (l, g, jnp.minimum(j, nbg[g] - 1), 0),
                memory_space=pltpu.VMEM)

        for g in range(kv_groups):
            names += [f"kcache_g{g}", f"vcache_g{g}"]
            args += [k_cache, v_cache]
            in_specs += [g_spec(g), g_spec(g)]
        if kv_quant:
            def gs_spec(g):
                return pl.BlockSpec(
                    (1, GB, 1, KVB),
                    lambda l, j, nbg, g=g: (l, g, 0,
                                            jnp.minimum(j, nbg[g] - 1)),
                    memory_space=pltpu.VMEM)

            for g in range(kv_groups):
                names += [f"kcache_s_g{g}", f"vcache_s_g{g}"]
                args += [k_scales, v_scales]
                in_specs += [gs_spec(g), gs_spec(g)]
    else:
        names += ["kcache", "vcache"]
        args += [k_cache, v_cache]
        if per_slot_kv:
            # the kernel DMAs (KVB, D) blocks out of the full HBM-resident
            # cache itself — only the blocks below each slot's live count
            # move
            kv_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        else:
            kv_spec = pl.BlockSpec((1, B, KVB, D),
                                   lambda l, j: (l, 0, j, 0),
                                   memory_space=pltpu.VMEM)
        in_specs += [kv_spec, kv_spec]
        if kv_quant:
            names += ["kcache_s", "vcache_s"]
            args += [k_scales, v_scales]
            if per_slot_kv:
                # the whole per-slot scale row (S f32 = 4 KB at
                # n_positions): the kernel slices the live KVB pieces out
                # of VMEM
                s_spec = pl.BlockSpec(
                    (1, 1, 1, k_scales.shape[-1]),
                    lambda l, b, nb: (l, b, 0, 0),
                    memory_space=pltpu.VMEM)
            else:
                s_spec = pl.BlockSpec((1, B, 1, KVB),
                                      lambda l, j: (l, 0, 0, j),
                                      memory_space=pltpu.VMEM)
            in_specs += [s_spec, s_spec]

    staged = k_stage is not None
    if staged:
        assert not per_slot_kv and not kv_quant and B > 1, (
            "staged KV is the batched lockstep serving path")
        C = k_stage.shape[2]
        names += ["stepi", "kstage", "vstage"]
        args += [jnp.asarray(step_i, jnp.int32).reshape(1, 1),
                 k_stage, v_stage]
        in_specs += [
            pl.BlockSpec((1, 1), lambda l, j: (0, 0),
                         memory_space=pltpu.SMEM),
            per_layer((B, C, D)),
            per_layer((B, C, D)),
        ]

    # int8-KV mode: the kernel's new K/V rows leave in f32 so the caller's
    # row quantization sees full precision
    cache_dtype = jnp.float32 if kv_quant else k_cache.dtype
    if per_slot_kv or grouped:
        row_spec = pl.BlockSpec((1, B, D), lambda l, b, nb: (l, 0, 0),
                                memory_space=pltpu.VMEM)
        out_specs = [
            pl.BlockSpec((B, D), lambda l, b, nb: (0, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
            row_spec,
        ]
    else:
        row_spec = pl.BlockSpec((1, B, D), lambda l, j: (l, 0, 0),
                                memory_space=pltpu.VMEM)
        out_specs = [
            pl.BlockSpec((B, D), lambda l, j: (0, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
            row_spec,
        ]
    out_shape = [
        jax.ShapeDtypeStruct((B, D), jnp.float32),
        jax.ShapeDtypeStruct((L, B, D), cache_dtype),
        jax.ShapeDtypeStruct((L, B, D), cache_dtype),
    ]

    scratch = [
        pltpu.VMEM((B, D), jnp.float32),       # xres — residual stream
        pltpu.VMEM((B * H, D), jnp.bfloat16),  # qbd — block-diagonal Q
        pltpu.VMEM((B, D), jnp.float32),       # kcur
        pltpu.VMEM((B, D), jnp.float32),       # vcur
        pltpu.VMEM((B * H, 1), jnp.float32),   # msc — running max
        pltpu.VMEM((B * H, 1), jnp.float32),   # lsc — running denom
        pltpu.VMEM((B * H, D), jnp.float32),   # accsc — running P@V
    ]

    if per_slot_kv:
        kernel = _make_kernel_paged(
            names, B=B, D=D, H=H, KVB=KVB, eps=ln_eps, offset=offset,
            packed=packed, five_bit=five_bit, has_mins=has_mins,
            kv_quant=kv_quant)
    elif B == 1:
        kernel = _make_kernel(names, D=D, H=H, KVB=KVB, eps=ln_eps,
                              offset=offset, packed=packed,
                              five_bit=five_bit, has_mins=has_mins,
                              kv_quant=kv_quant)
    else:
        kernel = _make_kernel_batched(
            names, B=B, D=D, H=H, KVB=KVB, eps=ln_eps, offset=offset,
            packed=packed, five_bit=five_bit, has_mins=has_mins,
            kv_quant=kv_quant, staged=staged,
            groups=kv_groups if grouped else 1)

    # bytes: levels+scales+biases per layer, KV window, outputs
    wbytes = sum(int(jnp.size(layers[n]["w"].levels))
                 * layers[n]["w"].levels.dtype.itemsize
                 + int(jnp.size(layers[n]["w"].scales)) * 2
                 for n in ("qkv", "o", "fc1", "fc2"))
    kv_bytes = 2 * L * B * W * (D * k_cache.dtype.itemsize
                                + (4 if kv_quant else 0))
    cost = pl.CostEstimate(
        flops=2 * L * B * (D * 3 * D + D * D + 2 * D * F + 2 * H * W * D),
        bytes_accessed=wbytes + kv_bytes,
        transcendentals=L * B * (H * W + F),
    )

    if per_slot_kv:
        # live block count per slot: ceil(past / KVB), >= 1 (the current
        # token is handled in-kernel; cache reads cover idx < past only)
        nblocks = jnp.clip((past_vec + KVB - 1) // KVB, 1, nW).astype(
            jnp.int32)
        kv_buf_dtype = k_cache.dtype
        scratch = scratch + [
            pltpu.VMEM((2, KVB, D), kv_buf_dtype),   # kbuf (double-buffered)
            pltpu.VMEM((2, KVB, D), kv_buf_dtype),   # vbuf
            pltpu.SemaphoreType.DMA((2,)),           # ksem
            pltpu.SemaphoreType.DMA((2,)),           # vsem
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, B),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        x_out, k_rows, v_rows = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(nblocks, *args)
        return x_out, k_rows, v_rows

    if grouped:
        # per-GROUP live block count: ceil(max past in group / KVB),
        # clamped to [1, nW] (the current token is handled in-kernel;
        # cache reads cover idx < past only, and garbage slots' positions
        # may exceed the window)
        gmax = jnp.max(past_vec.reshape(kv_groups, B // kv_groups), axis=1)
        nbg = jnp.clip((gmax + KVB - 1) // KVB, 1, nW).astype(jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, nW),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        x_out, k_rows, v_rows = pl.pallas_call(
            lambda nbg_ref, *refs: kernel(*refs),
            grid_spec=grid_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(nbg, *args)
        return x_out, k_rows, v_rows

    x_out, k_rows, v_rows = pl.pallas_call(
        kernel,
        grid=(L, nW),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return x_out, k_rows, v_rows
