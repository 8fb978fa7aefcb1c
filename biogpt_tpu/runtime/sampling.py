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


def topk_gather(x: jax.Array, k: int, gmax: jax.Array | None = None):
    """EXACT top-k via group-max ranking + slab gather (round 5).

    Stage 1 ranks 128-lane GROUPS by a cheap max-reduce (no sorting
    network ever touches the full vocab width), stage 2 gathers the top-k
    groups' 128-wide slabs and runs ONE ``lax.top_k`` over k*128 columns
    — ~5x less partial-sort work than the direct form at 42k vocab.

    Exact including ties: an element of the true top-k whose group were
    excluded would need k groups ranked above its group, each of which
    contributes an element beating it in (value, -index) order — ranked
    groups tie-break to the lower group index, which covers strictly
    lower global indices (selected group ids are re-sorted ascending
    before the gather so stage 2's index-stability preserves the global
    lowest-index-wins rule).

    ``gmax``: optionally the precomputed (B, ceil(V/128)) group maxima —
    the fused serving epilogue kernel emits them for free while the
    lm_head tiles are in VMEM, removing stage 1's HBM re-read.
    """
    B, V = x.shape
    G = -(-V // 128)
    if G < k:   # tiny vocabs (tests): fewer groups than k — no stage 1
        return jax.lax.top_k(x, k)
    pad = G * 128 - V
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    xg = x.reshape(B, G, 128)
    if gmax is None:
        gmax = jnp.max(xg, axis=-1)                        # (B, G) cheap
    _, gi = jax.lax.top_k(gmax, k)                         # (B, k) tiny
    gi = jnp.sort(gi, axis=-1).astype(jnp.int32)
    slab = jnp.take_along_axis(xg, gi[:, :, None], axis=1)  # (B, k, 128)
    vals, sel = jax.lax.top_k(slab.reshape(B, k * 128), k)
    cols = (gi[:, :, None] * 128
            + jnp.arange(128, dtype=jnp.int32)[None, None, :]).reshape(B, -1)
    idx = jnp.take_along_axis(cols, sel, axis=1)
    return vals, idx


def topk_2stage(x: jax.Array, k: int, groups: int = 16):
    """EXACT top-k over a wide minor axis (drop-in for ``jax.lax.top_k``).

    The formulation ranking is CONTEXT-DEPENDENT on this chip and was
    measured in rounds 4-5 (same process, medians, in the REAL serving
    scan — megakernel + epilogue + sampler under lax.scan,
    tools/bench/bench_step32.py STEP_SAMPLER_AB=1):

    - round 4: direct 2.73 ms/step vs grouped-sort 2.26 (grouped 0.47
      cheaper in-scan, though the standalone probe ranks direct 2.7x
      faster — XLA schedules the op differently against the surrounding
      program).
    - round 5: ``topk_gather`` (group-max rank + slab gather, no full-
      width sorting network) replaces the grouped-sort default.

    ``BIOGPT_TOPK=direct|grouped|gather`` forces a form for
    re-measurement. All are exact including tie-breaking (equal values
    resolve to the lowest global index).
    """
    import os

    B, V = x.shape
    mode = os.environ.get("BIOGPT_TOPK", "gather")
    if mode == "direct" or V < 128 * k * 2:
        # small vocabs: grouping can't pay (and gather needs >= k groups)
        return jax.lax.top_k(x, k)
    if mode == "gather":
        return topk_gather(x, k)
    # lane-align each group's width (a 2649-wide minor axis forces
    # relayouts that cost more than the grouping saves)
    W = -(-V // groups)
    W = -(-W // 128) * 128
    pad = W * groups - V
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    v_g, i_g = jax.lax.top_k(x.reshape(B, groups, W), k)   # (B, G, k)
    base = (jnp.arange(groups, dtype=jnp.int32) * W)[None, :, None]
    cand_v = v_g.reshape(B, groups * k)
    cand_i = (i_g.astype(jnp.int32) + base).reshape(B, groups * k)
    vals, sel = jax.lax.top_k(cand_v, k)
    idx = jnp.take_along_axis(cand_i, sel, axis=1)
    return vals, idx


@partial(jax.jit, static_argnames=("top_k",))
def top_k_top_p_probs(
    logits: jax.Array,           # (B, V)
    top_k: int,
    top_p: float,
    temp: float,
) -> tuple[jax.Array, jax.Array]:
    """Returns (probs (B, top_k), token_ids (B, top_k)) after the reference's
    top-k/top-p filtering, sorted by descending probability."""
    # top-k commutes with the (positive) temperature scale — select on the
    # raw logits (grouped two-stage, ~35% cheaper at 42k vocab) and scale
    # only the k survivors
    raw, top_ids = topk_2stage(logits.astype(jnp.float32), top_k)
    top_logits = raw / jnp.maximum(temp, 1e-8)
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
    gmax: jax.Array | None = None,  # (B, ceil(V/128)) precomputed group
                                 # maxima (the fused epilogue kernel emits
                                 # them) — skips gather-top-k's stage-1
                                 # full-width reduce
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

    # select on raw logits (top-k commutes with the positive temperature
    # scale; the 42k-wide selection is the sampler's dominant cost — see
    # topk_2stage) and scale only the survivors; temp <= 0 rows divide by
    # 1e-8 which is also monotone, and they take the argmax branch below
    if gmax is not None:
        raw, top_ids = topk_gather(logits.astype(jnp.float32), k_max,
                                   gmax=gmax)
    else:
        raw, top_ids = topk_2stage(logits.astype(jnp.float32), k_max)
    top_logits = raw / jnp.maximum(temp, 1e-8)
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
    # top_ids[:, 0] IS the argmax (top_k is index-stable), so the temp <= 0
    # fallback costs nothing — a second full-vocab argmax measured ~30% of
    # the sampler
    return jnp.where(temp[:, 0] <= 0.0, top_ids[:, 0],
                     sampled).astype(jnp.int32)
