"""Pallas TPU kernel: fused decode attention (single query position).

Decode on this runtime is op-issue bound (~610 device ops x ~2.3 us per
step; see tools/profile_decode.py), so the attention chain — scores einsum,
mask fusions, softmax, context einsum, dtype converts: ~8-10 ops per layer —
collapses into ONE kernel per layer:

  grid over batch; per step the full KV window of all heads streams
  HBM->VMEM, per-head scores come from a head-batched dot_general,
  positions > past are masked arithmetically, a numerically-stable softmax
  runs in f32, and the attention-weighted context rows come back out.

Requires a bfloat16 KV cache (Mosaic has no f16 vectors on this
toolchain); the engine selects cache dtype accordingly. N=1 (decode) only —
prefill keeps the XLA einsum path, which is compute-bound there anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# EXPERIMENTAL: measured 3.1 vs 1.4 ms/token at 347M on the dev chip — the
# single-step grid gives no DMA/compute overlap and the per-head dots
# serialize. Kept for the round-2 megakernel work (correctness is tested);
# enable explicitly to experiment.
ENABLED = False


def _kernel(past_ref, q_ref, k_ref, v_ref, o_ref):
    """One batch row: attend q (H, Dk) over K/V (W, H, Dk), all heads.

    Head-batched dots don't lower in Mosaic (no free lhs dims), so scores
    and context use broadcast-multiply + reductions on the VPU — at decode
    sizes (W*H*Dk ~ 0.5M elements) that's microseconds and stays in VMEM.
    """
    b = pl.program_id(0)
    H = q_ref.shape[1]

    # per-head scores via 2-D dots (Mosaic rejects head-batched dot_general
    # and lane-dim reductions down to H lanes); the python loop unrolls
    # inside this single kernel
    rows = []
    for h in range(H):
        qh = q_ref[0, h:h + 1, :]                          # (1, Dk) bf16
        kh = k_ref[0, :, h, :]                             # (W, Dk) bf16
        rows.append(jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))           # (1, W)
    scores = jnp.concatenate(rows, axis=0)                 # (H, W) f32

    W = scores.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    past = past_ref[0, b]
    scores = scores + jnp.where(idx > past, -1e30, 0.0).astype(jnp.float32)

    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    p = (e / jnp.sum(e, axis=1, keepdims=True)).astype(jnp.bfloat16)

    outs = []
    for h in range(H):
        vh = v_ref[0, :, h, :]                             # (W, Dk) bf16
        outs.append(jax.lax.dot_general(
            p[h:h + 1, :], vh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))           # (1, Dk)
    o_ref[0] = jnp.concatenate(outs, axis=0)               # (H, Dk)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(
    q: jax.Array,        # (B, 1, H, Dk) float32/bf16, pre-scaled
    k_win: jax.Array,    # (B, W, H, Dk) bfloat16 cache window
    v_win: jax.Array,    # (B, W, H, Dk) bfloat16
    past: jax.Array,     # (B,) int32 — last valid cache slot is `past`
    interpret: bool = False,
) -> jax.Array:
    """Returns ctx (B, 1, H, Dk) float32."""
    B, _, H, Dk = q.shape
    W = k_win.shape[1]

    past_2d = jnp.broadcast_to(jnp.atleast_1d(past).astype(jnp.int32),
                               (B,))[None, :]            # (1, B) SMEM

    ctx = pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, B), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H, Dk), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, H, Dk), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, H, Dk), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, Dk), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Dk), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * W * Dk,
            bytes_accessed=2 * B * W * H * Dk * 2 + B * H * Dk * 8,
            transcendentals=B * H * W,
        ),
        interpret=interpret,
    )(past_2d, q[:, 0].astype(jnp.bfloat16), k_win, v_win)
    return ctx[:, None].astype(jnp.float32)
