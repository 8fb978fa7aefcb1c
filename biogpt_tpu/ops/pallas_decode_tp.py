"""Tensor-parallel decode megakernel: per-shard kernel halves with the
Megatron collectives between them.

The single-device megakernel (ops/pallas_decode.py) runs ALL layers as one
``pallas_call`` — impossible under tensor parallelism because the o-proj
and fc2 joins need cross-shard psums, and collectives cannot run inside a
kernel. This module splits each layer at exactly those joins (the "two
kernel halves" TP formulation):

  kernel A (attention half): LN0 -> local fused qkv (column shard) ->
    per-slot online-softmax attention over the LOCAL head group and LOCAL
    KV shard -> ctx @ o_shard  — a PARTIAL (B, D) sum, no bias
  psum over the model axis; residual + o bias
  kernel B (FFN half): LN1 -> local fc1 (column) -> exact GELU ->
    local fc2 (row) — PARTIAL (B, D), no bias
  psum; residual + fc2 bias

A ``lax.scan`` walks the layer stack; each half reads its own layer's
weight planes straight from HBM through scalar-prefetch-indexed BlockSpecs
(the layer index is the scan variable), so no per-layer weight slices ever
materialize — per-step HBM traffic is the same packed-plane bytes the
single-device megakernel reads, plus 2 psums/layer (the textbook Megatron
count; they ride ICI on a real slice). New K/V rows stack across the scan
for the caller's per-slot cache writes, exactly like the single-device
kernel's (L, B, D) row outputs.

Runs as the per-shard body of ``parallel/tp.py``'s shard_map (weights
pre-packed per shard by ``pack_params_tp``: qkv fused shard-interleaved,
row-parallel planes nibble-packed per chunk). bf16 KV cache only; the
int8-KV mesh path stays per-op. The per-op shard_map TP decode measured
3.2x the single-device megakernel (RESULTS.md round 3) — this path exists
so real multi-chip rounds do not start from that penalty; its numerics
are verified on virtual meshes in interpret mode (tests/test_sharding.py)
exactly like every other kernel here.

No reference counterpart (single-process CPU, /root/reference/biogpt.cpp);
north-star scope, SURVEY §2.1(b).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.codecs import QK, GGML_TYPE_Q5_0, GGML_TYPE_Q5_1
from ..quant.layouts import LEVEL_OFFSET, QuantizedTensor
from .pallas_decode import (_CHUNK_BLOCKS, _gelu_erf, _kv_block, _ln,
                            _qmm_dq, _LANES, _NT)


def supports_layers_tp(layers: dict, tp: int, batch: int) -> bool:
    """Whether the TP megakernel applies to these TP-packed layers.

    Mirrors ``pallas_decode.supports_layers`` but checks the LOCAL shard
    widths: column-parallel weights (qkv, fc1) shard d_out, row-parallel
    ones (o, fc2) shard d_in (their planes are packed per-chunk so the
    local rows unpack shard-locally — parallel/tp.pack_params_tp).
    """
    if not 1 <= batch <= 32 or tp < 1:
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
    col_parallel = {"qkv", "fc1"}
    for name, w in zip(("qkv", "o", "fc1", "fc2"), qts):
        d_out = w.scales.shape[-1]
        d_in = w.scales.shape[-2] * QK
        if name in col_parallel:
            if d_out % tp != 0:
                return False
            d_out //= tp
        else:
            if d_in % tp != 0:
                return False
            d_in //= tp
        if d_out % _LANES != 0 or (w.packed and d_in % (2 * QK) != 0):
            return False
        if d_in > chunk and d_in % chunk != 0:
            return False
    return True


def _make_attn_kernel_tp(names, *, B, Dfull, Dloc, Hloc, KVB, eps, offset,
                         packed, five_bit, has_mins, kv_quant=False,
                         ext_qkv=False):
    """Attention half: LN0 + local qkv + local-head attention + partial o.

    Same per-slot online-softmax structure as
    ``pallas_decode._make_kernel_batched`` but over the LOCAL head group
    (Hloc = n_head/tp heads, Dloc = d_model/tp cache columns); the o
    projection emits the shard's PARTIAL (B, Dfull) contribution (the
    caller psums and adds the replicated bias).

    ``kv_quant``: int8 cache blocks — per-row dequant scales fold into
    the score columns / attention weights exactly as in the single-device
    kernel (pallas_decode._make_kernel_batched).

    ``ext_qkv``: the current token's q / (dequantized) k / v arrive as
    kernel INPUTS instead of being projected in-kernel, and the raw-row
    outputs are dropped. Required by int8-KV under TP: the row scale is
    the FULL-row absmax, which needs a pmax over the model axis —
    a collective, impossible inside a kernel — so the caller runs the
    qkv projection as its own kernel, quantizes with the pmax-completed
    scale (bit-identical to the per-op path's cache contents), and feeds
    the dequantized rows back in.
    """
    Dk = Dloc // Hloc
    scale = 1.0 / math.sqrt(Dk)
    BH = B * Hloc

    def kernel(li_ref, *refs):
        del li_ref   # consumed by the BlockSpec index maps only
        r = dict(zip(names, refs))
        n_in = len(names)
        if ext_qkv:
            apart_ref = refs[n_in]
            qbd, kcur, vcur, msc, lsc, accsc = refs[n_in + 1:]
        else:
            apart_ref, krow_ref, vrow_ref = refs[n_in:n_in + 3]
            qbd, kcur, vcur, msc, lsc, accsc = refs[n_in + 3:]

        j = pl.program_id(0)
        nW = pl.num_programs(0)

        def mn(name):
            return r[name + "_mn"] if has_mins else None

        def vec(name):
            return r[name][0]

        col_h = jax.lax.broadcasted_iota(jnp.int32, (BH, Dloc), 1) // Dk
        row_h = jax.lax.broadcasted_iota(jnp.int32, (BH, Dloc), 0) % Hloc
        hm_t = (col_h == row_h).astype(jnp.bfloat16)      # tiled head mask
        rep_c = jax.lax.broadcasted_iota(jnp.int32, (BH, B), 1)
        rep_r = jax.lax.broadcasted_iota(jnp.int32, (BH, B), 0) // Hloc
        rep = (rep_c == rep_r).astype(jnp.float32)        # (BH, B) slot-rep

        @pl.when(j == 0)
        def _start():
            if ext_qkv:
                q = r["q"][:].astype(jnp.float32)   # pre-scaled by caller
                kcur[:] = r["kdq"][:].astype(jnp.float32)
                vcur[:] = r["vdq"][:].astype(jnp.float32)
            else:
                h = _ln(r["x"][:], vec("ln0w"), vec("ln0b"), eps)  # (B, Dfull)
                qkv = _qmm_dq(h.astype(jnp.bfloat16), r["qkv_lv"],
                              r["qkv_sc"], mn("qkv"), offset=offset,
                              packed=packed, five_bit=five_bit)
                qkv = qkv + vec("qkv_b").astype(jnp.float32)  # (q|k|v)_s
                q = qkv[:, :Dloc] * scale
                k = qkv[:, Dloc:2 * Dloc]
                v = qkv[:, 2 * Dloc:]
                krow_ref[:] = k.astype(krow_ref.dtype)
                vrow_ref[:] = v.astype(vrow_ref.dtype)
                kcur[:] = k
                vcur[:] = v
            q_rep = jnp.dot(rep, q, preferred_element_type=jnp.float32)
            qbd[:] = hm_t * q_rep.astype(jnp.bfloat16)
            msc[:] = jnp.full_like(msc, -1e30)
            lsc[:] = jnp.zeros_like(lsc)
            accsc[:] = jnp.zeros_like(accsc)

        # ---- one KV block: per-slot scores + shared softmax accumulation
        def kblk_of(b):
            blk = r["kcache"][0, b]
            return blk.astype(jnp.bfloat16) if kv_quant else blk

        scores = jnp.concatenate(
            [jax.lax.dot_general(qbd[b * Hloc:(b + 1) * Hloc, :],
                                 kblk_of(b), _NT,
                                 preferred_element_type=jnp.float32)
             for b in range(B)], axis=0)                  # (BH, KVB)
        if kv_quant:
            # per-slot (1, KVB) K scales, repeated to the slot's Hloc rows
            scores = scores * jnp.concatenate(
                [jnp.broadcast_to(r["kcache_s"][0, b], (Hloc, KVB))
                 for b in range(B)], axis=0)
        idx = jax.lax.broadcasted_iota(jnp.int32, (BH, KVB), 1) + j * KVB
        past_col = jnp.concatenate(
            [jnp.full((Hloc, 1), r["past"][0, b], jnp.int32)
             for b in range(B)], axis=0)                  # (BH, 1)
        valid = idx < past_col
        masked = jnp.where(valid, scores, -1e30)
        m_prev = msc[:]
        m_new = jnp.maximum(m_prev, jnp.max(masked, axis=1, keepdims=True))
        p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        lsc[:] = lsc[:] * alpha + jnp.sum(p, axis=1, keepdims=True)

        def pv_of(b):
            pb = p[b * Hloc:(b + 1) * Hloc, :]
            if kv_quant:
                pb = pb * r["vcache_s"][0, b]
            vb = r["vcache"][0, b]
            return jnp.dot(pb.astype(jnp.bfloat16),
                           vb.astype(jnp.bfloat16) if kv_quant else vb,
                           preferred_element_type=jnp.float32)

        accsc[:] = accsc[:] * alpha + jnp.concatenate(
            [pv_of(b) for b in range(B)], axis=0)
        msc[:] = m_new

        @pl.when(j == nW - 1)
        def _finish():
            kcur_rep = jnp.dot(rep, kcur[:],
                               preferred_element_type=jnp.float32)
            vcur_rep = jnp.dot(rep, vcur[:],
                               preferred_element_type=jnp.float32)
            cur = jnp.sum(qbd[:].astype(jnp.float32) * kcur_rep,
                          axis=1, keepdims=True)          # (BH, 1)
            m_prev2 = msc[:]
            m_fin = jnp.maximum(m_prev2, cur)
            alpha2 = jnp.exp(m_prev2 - m_fin)
            p_cur = jnp.exp(cur - m_fin)
            l_all = lsc[:] * alpha2 + p_cur
            acc = accsc[:] * alpha2 + p_cur * vcur_rep    # (BH, Dloc)
            ctx = acc / l_all
            ctx_flat = jnp.dot(rep.T.astype(jnp.float32),
                               ctx * hm_t.astype(jnp.float32),
                               preferred_element_type=jnp.float32)  # (B, Dloc)
            apart_ref[:] = _qmm_dq(
                ctx_flat.astype(jnp.bfloat16), r["o_lv"], r["o_sc"],
                mn("o"), offset=offset, packed=packed, five_bit=five_bit)

    return kernel


def _make_qkv_kernel_tp(names, *, eps, offset, packed, five_bit, has_mins):
    """LN0 + local fused qkv projection (bias included), one grid step.

    The int8-KV TP path runs this as its own kernel so the caller can
    quantize the new K/V rows with the pmax-completed full-row absmax
    between this and the attention kernel (see _make_attn_kernel_tp
    ``ext_qkv``)."""

    def kernel(li_ref, *refs):
        del li_ref
        r = dict(zip(names, refs))
        out_ref = refs[len(names)]

        def mn(name):
            return r[name + "_mn"] if has_mins else None

        def vec(name):
            return r[name][0]

        h = _ln(r["x"][:], vec("ln0w"), vec("ln0b"), eps)
        qkv = _qmm_dq(h.astype(jnp.bfloat16), r["qkv_lv"], r["qkv_sc"],
                      mn("qkv"), offset=offset, packed=packed,
                      five_bit=five_bit)
        out_ref[:] = qkv + vec("qkv_b").astype(jnp.float32)

    return kernel


def _make_ffn_kernel_tp(names, *, eps, offset, packed, five_bit, has_mins):
    """FFN half: LN1 + local fc1 + GELU + partial fc2 (no bias)."""

    def kernel(li_ref, *refs):
        del li_ref
        r = dict(zip(names, refs))
        out_ref = refs[len(names)]

        def mn(name):
            return r[name + "_mn"] if has_mins else None

        def vec(name):
            return r[name][0]

        h2 = _ln(r["x"][:], vec("ln1w"), vec("ln1b"), eps).astype(
            jnp.bfloat16)
        f = _qmm_dq(h2, r["fc1_lv"], r["fc1_sc"], mn("fc1"),
                    offset=offset, packed=packed, five_bit=five_bit)
        f = _gelu_erf(f + vec("fc1_b").astype(jnp.float32))
        out_ref[:] = _qmm_dq(f.astype(jnp.bfloat16), r["fc2_lv"],
                             r["fc2_sc"], mn("fc2"), offset=offset,
                             packed=packed, five_bit=five_bit)

    return kernel


def decode_step_fused_tp(
    x0: jax.Array,               # (B, Dfull) f32 — embedded input
    layers: dict,                # TP-packed LOCAL layer shards, stacked (L,…)
    k_cache: jax.Array,          # (L, B, S, Dloc) bf16 LOCAL KV shard
    v_cache: jax.Array,
    past: jax.Array,             # (B,) per-slot positions
    *,
    n_head: int,                 # FULL head count
    tp_size: int,
    tp_axis: str,                # shard_map model-axis name (for the psums)
    window: int,
    ln_eps: float = 1e-5,
    interpret: bool = False,
    kv_block: int | None = None,
    k_scales: jax.Array | None = None,  # (L, B, 1, S) f32: int8-KV mode
    v_scales: jax.Array | None = None,  # (levels shard Dloc, scales
                                        # replicate — runtime.cache)
):
    """One full TP decode step (see module docstring).

    Must run inside a shard_map over ``tp_axis``. Returns
    ``(x_final (B, Dfull) f32 — replicated across shards,
    k_rows (L, B, Dloc), v_rows (L, B, Dloc) in cache dtype)``; the caller
    writes each slot's rows at its own position into the LOCAL cache shard.

    int8-KV mode (``k_scales`` given): each layer runs THREE kernels —
    LN0+qkv, then the attention half consuming externally-quantized
    current rows, then the FFN half — because the row scale is the
    FULL-row absmax (a pmax over ``tp_axis``, impossible in-kernel).
    Quantization matches runtime.cache.quantize_rows bit-for-bit, so the
    sharded int8 cache stays identical to the per-op TP path's. Returns
    ``(x_final, kq (L, B, Dloc) int8, vq, ksc (L, B) f32, vsc)``.
    """
    L, B, S, Dloc = k_cache.shape
    Dfull = x0.shape[-1]
    Hloc = n_head // tp_size
    qkv: QuantizedTensor = layers["qkv"]["w"]
    packed = qkv.packed
    has_mins = qkv.mins is not None
    offset = LEVEL_OFFSET[qkv.qtype] if packed else 0
    five_bit = packed and qkv.qtype in (GGML_TYPE_Q5_0, GGML_TYPE_Q5_1)
    W = min(window, S)
    KVB = kv_block or _kv_block(W, B, Dloc)
    if W % KVB != 0:
        raise ValueError(f"window {W} not divisible by kv_block {KVB}")
    nW = W // KVB

    past_row = jnp.broadcast_to(
        jnp.atleast_1d(jnp.asarray(past, jnp.int32)), (B,)).reshape(1, B)

    def as_rows(a):
        return jnp.asarray(a).reshape(a.shape[0], 1, a.shape[-1])

    def build(names, args, in_specs, weight_names):
        """Append the quantized planes + (column-parallel) biases of
        ``weight_names`` to the arg lists with layer-indexed BlockSpecs."""
        def per_layer(shape):
            return pl.BlockSpec(
                (1,) + shape,
                (lambda *ix: (ix[-1][0],) + (0,) * len(shape)),
                memory_space=pltpu.VMEM)

        for name, with_bias in weight_names:
            w: QuantizedTensor = layers[name]["w"]
            lv_rows, d_out = w.levels.shape[-2], w.levels.shape[-1]
            nb = w.scales.shape[-2]
            names += [f"{name}_lv", f"{name}_sc"]
            args += [w.levels, w.scales]
            in_specs += [per_layer((lv_rows, d_out)),
                         per_layer((nb, d_out))]
            if has_mins:
                names.append(f"{name}_mn")
                args.append(w.mins)
                in_specs.append(per_layer((nb, d_out)))
            if with_bias:
                names.append(f"{name}_b")
                args.append(as_rows(layers[name]["b"]))
                in_specs.append(per_layer((1, d_out)))
        return names, args, in_specs

    def per_layer_spec(shape):
        return pl.BlockSpec((1,) + shape,
                            (lambda *ix: (ix[-1][0],) + (0,) * len(shape)),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, (lambda *ix: (0,) * len(shape)),
                            memory_space=pltpu.VMEM)

    kv_quant = k_scales is not None
    BH = B * Hloc
    attn_scratch = [
        pltpu.VMEM((BH, Dloc), jnp.bfloat16),   # qbd
        pltpu.VMEM((B, Dloc), jnp.float32),     # kcur
        pltpu.VMEM((B, Dloc), jnp.float32),     # vcur
        pltpu.VMEM((BH, 1), jnp.float32),       # msc
        pltpu.VMEM((BH, 1), jnp.float32),       # lsc
        pltpu.VMEM((BH, Dloc), jnp.float32),    # accsc
    ]
    kv_spec = pl.BlockSpec((1, B, KVB, Dloc),
                           (lambda j, li: (li[0], 0, j, 0)),
                           memory_space=pltpu.VMEM)

    # ---- kernel A: attention half (grid over KV blocks)
    if kv_quant:
        # ext_qkv form: q/kdq/vdq are data inputs (quantized between the
        # qkv kernel and this one); cache blocks are int8 + scale planes
        namesA = ["past", "q", "kdq", "vdq"]
        in_specsA = [pl.BlockSpec((1, B), (lambda *ix: (0, 0)),
                                  memory_space=pltpu.SMEM),
                     const_spec((B, Dloc)), const_spec((B, Dloc)),
                     const_spec((B, Dloc))]
        staticA = []
        namesA, staticA, in_specsA = build(
            namesA, staticA, in_specsA, [("o", False)])
        namesA += ["kcache", "vcache", "kcache_s", "vcache_s"]
        staticA += [k_cache, v_cache, k_scales, v_scales]
        s_spec = pl.BlockSpec((1, B, 1, KVB),
                              (lambda j, li: (li[0], 0, 0, j)),
                              memory_space=pltpu.VMEM)
        in_specsA += [kv_spec, kv_spec, s_spec, s_spec]

        kernelA = _make_attn_kernel_tp(
            namesA, B=B, Dfull=Dfull, Dloc=Dloc, Hloc=Hloc, KVB=KVB,
            eps=ln_eps, offset=offset, packed=packed, five_bit=five_bit,
            has_mins=has_mins, kv_quant=True, ext_qkv=True)
        grid_specA = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nW,),
            in_specs=in_specsA,
            out_specs=[pl.BlockSpec((B, Dfull), (lambda j, li: (0, 0)),
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=attn_scratch,
        )
        attn_call = pl.pallas_call(
            kernelA,
            grid_spec=grid_specA,
            out_shape=[jax.ShapeDtypeStruct((B, Dfull), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )

        # LN0 + qkv as its own kernel (see _make_qkv_kernel_tp)
        namesQ = ["x", "ln0w", "ln0b"]
        in_specsQ = [const_spec((B, Dfull)),
                     per_layer_spec((1, Dfull)), per_layer_spec((1, Dfull))]
        staticQ = [as_rows(layers["ln0"]["w"]), as_rows(layers["ln0"]["b"])]
        namesQ, staticQ, in_specsQ = build(
            namesQ, staticQ, in_specsQ, [("qkv", True)])
        kernelQ = _make_qkv_kernel_tp(
            namesQ, eps=ln_eps, offset=offset, packed=packed,
            five_bit=five_bit, has_mins=has_mins)
        grid_specQ = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=in_specsQ,
            out_specs=[pl.BlockSpec((B, 3 * Dloc), (lambda i, li: (0, 0)),
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=[],
        )
        qkv_call = pl.pallas_call(
            kernelQ,
            grid_spec=grid_specQ,
            out_shape=[jax.ShapeDtypeStruct((B, 3 * Dloc), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )
    else:
        namesA = ["past", "x", "ln0w", "ln0b"]
        in_specsA = [pl.BlockSpec((1, B), (lambda *ix: (0, 0)),
                                  memory_space=pltpu.SMEM),
                     const_spec((B, Dfull)),
                     per_layer_spec((1, Dfull)), per_layer_spec((1, Dfull))]
        staticA = [as_rows(layers["ln0"]["w"]), as_rows(layers["ln0"]["b"])]
        namesA, staticA, in_specsA = build(
            namesA, staticA, in_specsA, [("qkv", True), ("o", False)])
        namesA += ["kcache", "vcache"]
        staticA += [k_cache, v_cache]
        in_specsA += [kv_spec, kv_spec]

        kernelA = _make_attn_kernel_tp(
            namesA, B=B, Dfull=Dfull, Dloc=Dloc, Hloc=Hloc, KVB=KVB,
            eps=ln_eps, offset=offset, packed=packed, five_bit=five_bit,
            has_mins=has_mins)
        grid_specA = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nW,),
            in_specs=in_specsA,
            out_specs=[
                pl.BlockSpec((B, Dfull), (lambda j, li: (0, 0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, Dloc), (lambda j, li: (0, 0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, Dloc), (lambda j, li: (0, 0)),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=attn_scratch,
        )
        attn_call = pl.pallas_call(
            kernelA,
            grid_spec=grid_specA,
            out_shape=[
                jax.ShapeDtypeStruct((B, Dfull), jnp.float32),
                jax.ShapeDtypeStruct((B, Dloc), k_cache.dtype),
                jax.ShapeDtypeStruct((B, Dloc), k_cache.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )

    # ---- kernel B: FFN half (single grid step)
    namesB = ["x", "ln1w", "ln1b"]
    in_specsB = [const_spec((B, Dfull)),
                 per_layer_spec((1, Dfull)), per_layer_spec((1, Dfull))]
    staticB = [as_rows(layers["ln1"]["w"]), as_rows(layers["ln1"]["b"])]
    namesB, staticB, in_specsB = build(
        namesB, staticB, in_specsB, [("fc1", True), ("fc2", False)])

    kernelB = _make_ffn_kernel_tp(
        namesB, eps=ln_eps, offset=offset, packed=packed,
        five_bit=five_bit, has_mins=has_mins)
    grid_specB = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=in_specsB,
        out_specs=[pl.BlockSpec((B, Dfull), (lambda i, li: (0, 0)),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[],
    )
    ffn_call = pl.pallas_call(
        kernelB,
        grid_spec=grid_specB,
        out_shape=[jax.ShapeDtypeStruct((B, Dfull), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    o_b = jnp.asarray(layers["o"]["b"])
    fc2_b = jnp.asarray(layers["fc2"]["b"])
    qscale = 1.0 / math.sqrt(Dloc // Hloc)

    if kv_quant:
        from ..runtime.cache import quantize_rows

        def body(x, li):
            li1 = li[None]
            (qkv,) = qkv_call(li1, x, *staticQ)
            q = qkv[:, :Dloc] * qscale
            k = qkv[:, Dloc:2 * Dloc]
            v = qkv[:, 2 * Dloc:]
            # full-row absmax scale via pmax — bit-identical to the
            # per-op TP path's cache contents (runtime.cache)
            kq, ksc = quantize_rows(k, tp_axis)
            vq, vsc = quantize_rows(v, tp_axis)
            kdq = kq.astype(jnp.float32) * ksc[:, None]
            vdq = vq.astype(jnp.float32) * vsc[:, None]
            (apart,) = attn_call(li1, past_row, q, kdq, vdq, *staticA)
            attn = jax.lax.psum(apart, tp_axis)
            x = x + attn + o_b[li].astype(jnp.float32)
            (fpart,) = ffn_call(li1, x, *staticB)
            ffn = jax.lax.psum(fpart, tp_axis)
            x = x + ffn + fc2_b[li].astype(jnp.float32)
            return x, (kq, vq, ksc, vsc)

        x_fin, (kq_rows, vq_rows, ks_rows, vs_rows) = jax.lax.scan(
            body, x0.astype(jnp.float32), jnp.arange(L, dtype=jnp.int32))
        return x_fin, kq_rows, vq_rows, ks_rows, vs_rows

    def body(x, li):
        li1 = li[None]
        apart, krow, vrow = attn_call(li1, past_row, x, *staticA)
        attn = jax.lax.psum(apart, tp_axis)
        x = x + attn + o_b[li].astype(jnp.float32)
        (fpart,) = ffn_call(li1, x, *staticB)
        ffn = jax.lax.psum(fpart, tp_axis)
        x = x + ffn + fc2_b[li].astype(jnp.float32)
        return x, (krow, vrow)

    x_fin, (k_rows, v_rows) = jax.lax.scan(
        body, x0.astype(jnp.float32), jnp.arange(L, dtype=jnp.int32))
    return x_fin, k_rows, v_rows
