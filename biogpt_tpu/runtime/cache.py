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


def init_cache(
    config: BioGptConfig,
    batch: int = 1,
    max_len: int | None = None,
    dtype=jnp.float16,
) -> KVCache:
    shape = (config.n_layer, batch, max_len or config.n_positions,
             config.d_model)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def update_layer(
    cache: KVCache, layer: int, k_new: jax.Array, v_new: jax.Array, past: jax.Array
) -> KVCache:
    """Write (batch, n_new, d_model) into one layer's cache.

    ``past`` may be a scalar (all rows at the same offset — single-sequence
    decode/prefill) or a (batch,) vector of per-sequence offsets
    (continuous batching: each slot has its own length).
    """
    past = jnp.asarray(past, jnp.int32)
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
