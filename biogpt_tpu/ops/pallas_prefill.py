"""Pallas TPU prefill megakernel: the whole fresh-cache prompt forward.

Round-5 xprof put serving REFILL prefills at ~42% of the mixed serve's
device time: every refill program pays the XLA dequant pipeline's
~3.5 ms floor (weight-traffic-bound) no matter how few prompt tokens it
processes. A refill prefill starts from an EMPTY cache, so its attention
is pure causal self-attention within each prompt — no KV streaming at
all — and the whole forward collapses to one packed-plane pass:

  grid = (n_layer,).  Step l streams layer l's packed planes HBM->VMEM
  (Pallas pipelines layer l+1's while l computes — the same per-layer
  axis as the decode megakernel) and computes, for all R prompts x T
  padded tokens at once:

    LN0 -> fused qkv dequant-matmul (dequant-then-dot, m = R*T rows)
    per-prompt causal attention: for each prompt row, ONE MXU dot of the
      block-diagonal Q expansion (T*H, D) against that row's K (T, D)
      gives every head's (T, T) scores; causal mask by iota; FULL
      softmax (T <= 128 so the whole score tile sits in VMEM — no online
      accumulation needed); (T*H, T) @ V -> context, head-mask collapse
    o-proj + residual -> LN1 -> fc1 -> exact-erf GELU -> fc2 + residual

  K/V rows for every (prompt, position) leave as (L, R*T, D) outputs for
  the caller's cache merge; the final hidden state leaves once.

Constraints: R*T <= 512 for long-padded shapes, <= 1024 when T <= 128
(VMEM: the fc1 activation is (R*T, d_ff) f32 and the per-prompt
attention slabs scale with T*H), lane-aligned dims, bf16-compute
quantized layers (same supports gate as the decode megakernel). The
serving refill routes through this whenever the shape fits
(runtime/serving.py); the 32-row long-prompt initial wave keeps the
XLA MXU path, which is the right tool at m ~ 16k rows.

Reference counterpart: the prompt loop of /root/reference/main.cpp (one
eval per prompt batch); this is its TPU-native packed form.
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
from .pallas_decode import _gelu_erf, _ln, _qmm_dq, _NT, supports_layers

# VMEM budget caps on flattened rows (fc1 activations are (RT, d_ff)
# f32). The attention temporaries scale with T*H per unrolled prompt
# (q_rep/qbd are (T*H, D); scores (T*H, T)), so SHORT-padded shapes
# afford twice the flattened rows: at T <= 128 the per-prompt slabs stay
# <= 8 MB and RT = 1024 covers the uniform serve's full 32x32 refill
# wave and 8-row medium-prompt refills, both previously on the ~3.5 ms
# XLA floor.
_MAX_RT = 512
_MAX_RT_SHORT = 1024
_SHORT_T = 128


def supports_prefill(layers: dict, rows: int, padded: int,
                     d_model: int) -> bool:
    """Shape gate for the prefill megakernel (refill-shaped prompts)."""
    rt = rows * padded
    cap = _MAX_RT_SHORT if padded <= _SHORT_T else _MAX_RT
    if rt > cap or padded % 8 != 0 or d_model % 128 != 0:
        return False
    return supports_layers(layers, jnp.bfloat16, batch=1, n_new=1)


def _make_prefill_kernel(names, *, R, T, D, H, eps, offset, packed,
                         five_bit, has_mins):
    scale = 1.0 / math.sqrt(D // H)
    RT = R * T
    TH = T * H
    Dk = D // H

    def kernel(*refs):
        r = dict(zip(names, refs))
        n_in = len(names)
        xout_ref, krow_ref, vrow_ref = refs[n_in:n_in + 3]
        (xres,) = refs[n_in + 3:]

        lyr = pl.program_id(0)

        def mn(name):
            return r[name + "_mn"] if has_mins else None

        def vec(name):
            return r[name][0]

        @pl.when(lyr == 0)
        def _():
            xres[:] = r["x0"][:]

        h = _ln(xres[:], vec("ln0w"), vec("ln0b"), eps)      # (RT, D)
        qkv = _qmm_dq(h.astype(jnp.bfloat16), r["qkv_lv"], r["qkv_sc"],
                      mn("qkv"), offset=offset, packed=packed,
                      five_bit=five_bit)
        qkv = qkv + vec("qkv_b").astype(jnp.float32)
        q = qkv[:, :D] * scale
        k = qkv[:, D:2 * D]
        v = qkv[:, 2 * D:]
        krow_ref[0] = k.astype(krow_ref.dtype)
        vrow_ref[0] = v.astype(vrow_ref.dtype)

        # block-diagonal Q expansion masks (shared across prompt rows):
        # qbd row t*H + h carries token t's head-h query in head h's
        # columns; rep maps token t of the (T, D) q slab onto its H rows
        col_h = jax.lax.broadcasted_iota(jnp.int32, (TH, D), 1) // Dk
        row_h = jax.lax.broadcasted_iota(jnp.int32, (TH, D), 0) % H
        hm = (col_h == row_h).astype(jnp.bfloat16)
        rep_c = jax.lax.broadcasted_iota(jnp.int32, (TH, T), 1)
        rep_r = jax.lax.broadcasted_iota(jnp.int32, (TH, T), 0) // H
        rep = (rep_c == rep_r).astype(jnp.float32)           # (TH, T)
        # causal: token t attends positions <= t
        c_col = jax.lax.broadcasted_iota(jnp.int32, (TH, T), 1)
        c_row = jax.lax.broadcasted_iota(jnp.int32, (TH, T), 0) // H
        causal = c_col <= c_row

        ctxs = []
        for p in range(R):
            qp = q[p * T:(p + 1) * T, :]                     # (T, D)
            kp = k[p * T:(p + 1) * T, :]
            vp = v[p * T:(p + 1) * T, :]
            q_rep = jnp.dot(rep, qp, preferred_element_type=jnp.float32)
            qbd = hm * q_rep.astype(jnp.bfloat16)            # (TH, D)
            scores = jax.lax.dot_general(
                qbd, kp.astype(jnp.bfloat16), _NT,
                preferred_element_type=jnp.float32)          # (TH, T)
            masked = jnp.where(causal, scores, -1e30)
            m = jnp.max(masked, axis=1, keepdims=True)
            pw = jnp.where(causal, jnp.exp(scores - m), 0.0)
            pw = pw / jnp.sum(pw, axis=1, keepdims=True)
            acc = jnp.dot(pw.astype(jnp.bfloat16),
                          vp.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)  # (TH, D)
            # collapse heads: select each token's rows via rep^T, head
            # columns already disjoint through the mask
            ctxs.append(jnp.dot(rep.T.astype(jnp.float32),
                                acc * hm.astype(jnp.float32),
                                preferred_element_type=jnp.float32))
        ctx = jnp.concatenate(ctxs, axis=0)                  # (RT, D)

        attn = _qmm_dq(ctx.astype(jnp.bfloat16), r["o_lv"], r["o_sc"],
                       mn("o"), offset=offset, packed=packed,
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


@functools.partial(
    jax.jit, static_argnames=("rows", "padded", "n_head", "ln_eps",
                              "interpret", "cache_dtype"))
def prefill_fused(
    x0: jax.Array,               # (R*T, d_model) f32 — embedded prompt
    layers: dict,                # engine-packed stacked (L, …) planes
    *,
    rows: int,
    padded: int,
    n_head: int,
    ln_eps: float = 1e-5,
    interpret: bool = False,
    cache_dtype=jnp.bfloat16,
):
    """Whole-prompt forward for fresh-cache refills (see module
    docstring). Returns ``(x_final (R*T, D) f32, k_rows (L, R*T, D),
    v_rows (L, R*T, D) in cache_dtype)`` — position t of prompt p lives
    at flattened row p*padded + t."""
    R, T = rows, padded
    RT = R * T
    D = x0.shape[-1]
    H = n_head
    qkv: QuantizedTensor = layers["qkv"]["w"]
    L = layers["ln0"]["w"].shape[0]
    packed = qkv.packed
    has_mins = qkv.mins is not None
    offset = LEVEL_OFFSET[qkv.qtype] if packed else 0
    five_bit = packed and qkv.qtype in (GGML_TYPE_Q5_0, GGML_TYPE_Q5_1)

    def const(shape):
        return pl.BlockSpec(shape, lambda l: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_layer(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda l: (l,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def as_rows(a):
        return jnp.asarray(a).reshape(a.shape[0], 1, a.shape[-1])

    names = ["x0", "ln0w", "ln0b", "ln1w", "ln1b"]
    args = [x0.astype(jnp.float32),
            as_rows(layers["ln0"]["w"]), as_rows(layers["ln0"]["b"]),
            as_rows(layers["ln1"]["w"]), as_rows(layers["ln1"]["b"])]
    in_specs = [const((RT, D)),
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

    kernel = _make_prefill_kernel(
        names, R=R, T=T, D=D, H=H, eps=ln_eps, offset=offset,
        packed=packed, five_bit=five_bit, has_mins=has_mins)

    row_spec = pl.BlockSpec((1, RT, D), lambda l: (l, 0, 0),
                            memory_space=pltpu.VMEM)
    wbytes = sum(int(jnp.size(layers[n]["w"].levels))
                 * layers[n]["w"].levels.dtype.itemsize
                 + int(jnp.size(layers[n]["w"].scales)) * 2
                 for n in ("qkv", "o", "fc1", "fc2"))
    F = layers["fc1"]["w"].scales.shape[-1]
    cost = pl.CostEstimate(
        flops=2 * L * RT * (3 * D * D + D * D + 2 * D * F)
        + 2 * L * R * T * T * D * 2,
        bytes_accessed=wbytes + 3 * L * RT * D * 2,
        transcendentals=L * RT * (H * T + F),
    )
    x_out, k_rows, v_rows = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((RT, D), lambda l: (0, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
            row_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((RT, D), jnp.float32),
            jax.ShapeDtypeStruct((L, RT, D), cache_dtype),
            jax.ShapeDtypeStruct((L, RT, D), cache_dtype),
        ],
        scratch_shapes=[pltpu.VMEM((RT, D), jnp.float32)],
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return x_out, k_rows, v_rows
