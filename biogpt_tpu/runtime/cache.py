"""KV cache as a pytree of preallocated arrays.

Replaces the reference's two flat F32 slabs (``memory_k``/``memory_v``,
``/root/reference/biogpt.cpp:323-357``) with shaped, dtype-configurable
arrays updated functionally via ``lax.dynamic_update_slice``:

  k, v: (n_layer, batch, max_len, d_model)

The feature axis is stored FLAT (d_model, not (n_head, d_kv)): heads are
contiguous in d_model, so per-head views are a cheap reshape where needed,
while the flat layout is the TPU-native one — a (…, 16, 64) minor-dim pair
wastes half of every (sublane, 128-lane) tile and forces relayout copies,
whereas (…, 1024) tiles exactly. The decode megakernel consumes the cache
in this layout directly; tensor parallelism shards the d_model axis (head
groups are contiguous, so this is head sharding).

Default dtype float16 (the north-star upgrade over the reference's F32 —
half the HBM traffic on the decode attention path); bfloat16 when the
Pallas megakernel is active (Mosaic has no f16 vectors).

``QuantKVCache`` (opt-in, ``Engine(kv_quant=True)``) stores K/V as int8
with one f32 absmax scale per written row — halving KV HBM traffic again
(at a 512-token window the B=8 lockstep step reads ~400 MB of bf16 KV vs
~170 MB of packed weights, so KV dominates long-window serving). The
per-row scale rides in a lane-major (L, B, 1, S) plane so kernels read it
as a (1, S) row. Dequantization is exact-in-bf16 per row: |level| <= 127.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import BioGptConfig


class KVCache(NamedTuple):
    k: jax.Array  # (n_layer, batch, max_len, d_model)
    v: jax.Array

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @property
    def batch(self) -> int:
        return self.k.shape[1]


class QuantKVCache(NamedTuple):
    k: jax.Array   # (n_layer, batch, max_len, d_model) int8
    v: jax.Array   # int8
    ks: jax.Array  # (n_layer, batch, 1, max_len) float32 per-row scales
    vs: jax.Array

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @property
    def batch(self) -> int:
        return self.k.shape[1]


def init_cache(
    config: BioGptConfig,
    batch: int = 1,
    max_len: int | None = None,
    dtype=jnp.float16,
) -> KVCache:
    shape = (config.n_layer, batch, max_len or config.n_positions,
             config.d_model)
    if dtype == jnp.int8:
        sshape = shape[:2] + (1, shape[2])
        return QuantKVCache(
            k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
            ks=jnp.zeros(sshape, jnp.float32),
            vs=jnp.zeros(sshape, jnp.float32))
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def quantize_rows(x: jax.Array, tp_axis: str | None = None):
    """(…, D) float -> (int8 levels, (…,) f32 scales): per-row absmax/127.

    ``tp_axis``: under shard_map tensor parallelism each shard holds a
    d_model slice of the row, so the absmax is completed with a ``pmax``
    over the model axis — every shard then quantizes its slice with the
    SAME (full-row) scale, making the sharded int8 cache bit-identical to
    the single-device one (max is order-independent, unlike a sum)."""
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1)
    if tp_axis is not None:
        amax = jax.lax.pmax(amax, tp_axis)
    scale = amax / 127.0
    safe = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(x / safe[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def dequant_layer(cache: QuantKVCache, layer: int, S: int, dtype):
    """Layer views (batch, S, d_model) of a quantized cache, dequantized.

    XLA fuses the int8 widen + per-row scale into the consuming dot's
    operand stream; the materialized copy only exists tile-by-tile.
    """
    # level * scale in f32, ONE rounding to the target dtype (scales can be
    # tiny; rounding them to bf16 before the product costs real precision)
    k = cache.k[layer][:, :S].astype(jnp.float32)
    v = cache.v[layer][:, :S].astype(jnp.float32)
    ks = jnp.swapaxes(cache.ks[layer][:, :, :S], 1, 2)
    vs = jnp.swapaxes(cache.vs[layer][:, :, :S], 1, 2)
    return (k * ks).astype(dtype), (v * vs).astype(dtype)


def update_layer(
    cache: KVCache, layer: int, k_new: jax.Array, v_new: jax.Array,
    past: jax.Array, tp_axis: str | None = None,
) -> KVCache:
    """Write (batch, n_new, d_model) into one layer's cache.

    ``past`` may be a scalar (all rows at the same offset — single-sequence
    decode/prefill) or a (batch,) vector of per-sequence offsets
    (continuous batching: each slot has its own length). ``tp_axis`` names
    the shard_map model axis for int8-KV row quantization (see
    :func:`quantize_rows`); dense caches ignore it (their writes are
    shard-local by construction).
    """
    past = jnp.asarray(past, jnp.int32)
    if isinstance(cache, QuantKVCache):
        return _update_layer_quant(cache, layer, k_new, v_new, past,
                                   tp_axis=tp_axis)
    if past.ndim == 0:
        # uniform offset: one contiguous dynamic_update_slice
        k_new = k_new.astype(cache.k.dtype)[None]
        v_new = v_new.astype(cache.v.dtype)[None]
        zero = jnp.zeros((), jnp.int32)
        idx = (jnp.asarray(layer, jnp.int32), zero, past, zero)
        return KVCache(
            k=jax.lax.dynamic_update_slice(cache.k, k_new, idx),
            v=jax.lax.dynamic_update_slice(cache.v, v_new, idx),
        )

    # Per-row offsets: one dynamic_update_slice per batch row (unrolled — B
    # is static and small). Each write touches only its (n_new, d_model)
    # slice. The alternatives are much worse on TPU: vmapped
    # dynamic_update_slice lowers to a scatter, and a masked merge streams
    # the WHOLE cache buffer every step.
    B = k_new.shape[0]
    zero = jnp.zeros((), jnp.int32)
    lix = jnp.asarray(layer, jnp.int32)
    k_buf, v_buf = cache.k, cache.v
    k_new = k_new.astype(cache.k.dtype)
    v_new = v_new.astype(cache.v.dtype)
    for b in range(B):
        bix = jnp.asarray(b, jnp.int32)
        idx = (lix, bix, past[b], zero)
        k_buf = jax.lax.dynamic_update_slice(k_buf, k_new[b][None, None], idx)
        v_buf = jax.lax.dynamic_update_slice(v_buf, v_new[b][None, None], idx)
    return KVCache(k=k_buf, v=v_buf)


def _update_layer_quant(
    cache: QuantKVCache, layer: int, k_new: jax.Array, v_new: jax.Array,
    past: jax.Array, tp_axis: str | None = None,
) -> QuantKVCache:
    """Quantize (batch, n_new, d_model) rows and write levels + scales."""
    kq, ksc = quantize_rows(k_new, tp_axis)             # (B, N) scales
    vq, vsc = quantize_rows(v_new, tp_axis)
    zero = jnp.zeros((), jnp.int32)
    lix = jnp.asarray(layer, jnp.int32)
    if past.ndim == 0:
        idx = (lix, zero, past, zero)
        sidx = (lix, zero, zero, past)
        return QuantKVCache(
            k=jax.lax.dynamic_update_slice(cache.k, kq[None], idx),
            v=jax.lax.dynamic_update_slice(cache.v, vq[None], idx),
            ks=jax.lax.dynamic_update_slice(
                cache.ks, ksc[None, :, None, :], sidx),
            vs=jax.lax.dynamic_update_slice(
                cache.vs, vsc[None, :, None, :], sidx),
        )
    B = k_new.shape[0]
    k_buf, v_buf, ks_buf, vs_buf = cache
    for b in range(B):
        bix = jnp.asarray(b, jnp.int32)
        idx = (lix, bix, past[b], zero)
        sidx = (lix, bix, zero, past[b])
        k_buf = jax.lax.dynamic_update_slice(k_buf, kq[b][None, None], idx)
        v_buf = jax.lax.dynamic_update_slice(v_buf, vq[b][None, None], idx)
        ks_buf = jax.lax.dynamic_update_slice(
            ks_buf, ksc[b][None, None, None, :], sidx)
        vs_buf = jax.lax.dynamic_update_slice(
            vs_buf, vsc[b][None, None, None, :], sidx)
    return QuantKVCache(k=k_buf, v=v_buf, ks=ks_buf, vs=vs_buf)
