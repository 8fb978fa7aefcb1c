"""Token samplers.

``sample_top_k_top_p`` mirrors the reference sampler's math
(``/root/reference/biogpt.cpp:908-980``): logits / temp -> take top-k ->
softmax over the survivors -> truncate at the first index where the
cumulative probability reaches top_p (inclusive) -> renormalize -> draw.
The draw uses JAX's counter-based PRNG rather than std::mt19937 +
discrete_distribution (implementation-defined; parity tests use greedy).

Everything is jit-compatible and batched over the leading axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def greedy(logits: jax.Array) -> jax.Array:
    """(B, V) -> (B,) argmax token ids."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("top_k",))
def top_k_top_p_probs(
    logits: jax.Array,           # (B, V)
    top_k: int,
    top_p: float,
    temp: float,
) -> tuple[jax.Array, jax.Array]:
    """Returns (probs (B, top_k), token_ids (B, top_k)) after the reference's
    top-k/top-p filtering, sorted by descending probability."""
    scaled = logits.astype(jnp.float32) / jnp.maximum(temp, 1e-8)
    top_logits, top_ids = jax.lax.top_k(scaled, top_k)          # sorted desc
    probs = jax.nn.softmax(top_logits, axis=-1)
    # keep index i iff the cumulative sum *before* i is still < top_p (the
    # reference keeps through the first index reaching top_p); top_p >= 1
    # keeps everything, so the mask is applied unconditionally (top_p is a
    # traced value).
    cumsum = jnp.cumsum(probs, axis=-1)
    keep = ((cumsum - probs) < top_p) | (top_p >= 1.0)
    probs = jnp.where(keep, probs, 0.0)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    return probs, top_ids


@partial(jax.jit, static_argnames=("top_k",))
def sample_top_k_top_p(
    rng: jax.Array,
    logits: jax.Array,           # (B, V)
    top_k: int = 40,
    top_p: float = 0.9,
    temp: float = 0.9,
) -> jax.Array:
    """(B,) sampled token ids. Requires temp > 0 (callers route temp <= 0
    to :func:`greedy` on the host — temp is a traced value here)."""
    probs, top_ids = top_k_top_p_probs(logits, top_k, top_p, temp)
    choice = jax.random.categorical(rng, jnp.log(jnp.maximum(probs, 1e-38)), axis=-1)
    return jnp.take_along_axis(top_ids, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)


@partial(jax.jit, static_argnames=("max_top_k",))
def sample_per_request(
    rng: jax.Array,
    logits: jax.Array,           # (B, V)
    top_k: jax.Array,            # (B,) int32  — per-request k (<= max_top_k)
    top_p: jax.Array,            # (B,) float32
    temp: jax.Array,             # (B,) float32; <= 0 means greedy for that row
    max_top_k: int = 64,
) -> jax.Array:
    """(B,) token ids with PER-REQUEST sampling parameters.

    Continuous batching mixes requests with different temp/top_k/top_p in
    one lockstep step (no reference counterpart — the reference has no
    batching at all). Same truncation semantics as sample_top_k_top_p,
    vectorized with masks: take the static max_top_k candidates, mask rows
    beyond each request's own top_k, apply its top_p cut, and route
    temp <= 0 rows to argmax.
    """
    B, V = logits.shape
    k_max = min(max_top_k, V)
    temp = jnp.broadcast_to(jnp.asarray(temp, jnp.float32), (B,))[:, None]
    top_p = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (B,))[:, None]
    top_k = jnp.broadcast_to(jnp.asarray(top_k, jnp.int32), (B,))[:, None]

    scaled = logits.astype(jnp.float32) / jnp.maximum(temp, 1e-8)
    top_logits, top_ids = jax.lax.top_k(scaled, k_max)           # sorted desc
    rank = jnp.arange(k_max, dtype=jnp.int32)[None, :]
    in_k = rank < jnp.minimum(top_k, k_max)
    top_logits = jnp.where(in_k, top_logits, -jnp.inf)
    probs = jax.nn.softmax(top_logits, axis=-1)
    cumsum = jnp.cumsum(probs, axis=-1)
    keep = (((cumsum - probs) < top_p) | (top_p >= 1.0)) & in_k
    probs = jnp.where(keep, probs, 0.0)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    choice = jax.random.categorical(
        rng, jnp.log(jnp.maximum(probs, 1e-38)), axis=-1)
    sampled = jnp.take_along_axis(top_ids, choice[:, None], axis=-1)[:, 0]
    return jnp.where(temp[:, 0] <= 0.0, greedy(logits), sampled).astype(jnp.int32)
