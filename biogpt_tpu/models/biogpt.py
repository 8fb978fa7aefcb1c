"""The BioGPT decoder as pure functions over a params pytree.

Architecture (OPT-style decoder-only transformer, per the reference graph
builder ``/root/reference/biogpt.cpp:624-810`` and HF BioGptForCausalLM):

  - token embedding scaled by sqrt(d_model)            (biogpt.cpp:664-665)
  - learned positions with +2 offset                   (biogpt.cpp:672)
  - pre-LN blocks, eps 1e-5                            (biogpt.cpp:692-701)
  - per-head query pre-scaled by 1/sqrt(d_kv)          (biogpt.cpp:710)
  - attention over the full KV cache
  - GELU FFN, residuals around attention and FFN
  - final LN, untied lm_head                           (biogpt.cpp:798-803)

Unlike the reference (which omits it, SURVEY §8 Q1), prefill applies a
correct causal mask by default; ``causal=False`` reproduces the reference's
unmasked behavior for parity experiments.

One ``forward`` serves prefill (n_new > 1) and decode (n_new == 1) under
jit: shapes are static per (batch, n_new) bucket, positions are traced.
All matmuls route through ops.matmul so dense and quantized weights are
interchangeable leaf-by-leaf.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import BioGptConfig
from ..modelio.checkpoint import layer_slice
from ..ops import matmul, embedding_lookup
from ..ops.qmatmul import precision_for
from ..runtime.cache import (KVCache, QuantKVCache, dequant_layer,
                             update_layer)


def _layer_norm(x: jax.Array, w: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return y * w.astype(jnp.float32) + b.astype(jnp.float32)


def _project(x, wb, compute_dtype, allow_pallas=True, psum_axis=None,
             seq_scatter: bool = False):
    """x @ w [+ psum over a row-parallel shard axis] + b.

    ``psum_axis``: under shard_map tensor parallelism the row-parallel
    projections (o, fc2) hold a d_in shard, so each shard's matmul is a
    partial sum — reduced here BEFORE the (replicated) bias is added.

    ``seq_scatter``: sequence-parallel prefill (Megatron-SP): reduce the
    partial sums with ``psum_scatter`` over the sequence axis instead of a
    full ``psum`` — each shard keeps only its own N/tp rows, halving the
    collective bytes (an all-reduce = reduce_scatter + all_gather) and
    letting XLA overlap the scatter with the next shard-local compute.
    """
    y = matmul(x, wb["w"], compute_dtype=compute_dtype,
               allow_pallas=allow_pallas)
    if psum_axis is not None:
        if seq_scatter:
            y = jax.lax.psum_scatter(y, psum_axis, scatter_dimension=1,
                                     tiled=True)
        else:
            y = jax.lax.psum(y, psum_axis)
    return y + wb["b"].astype(jnp.float32)


def _attention(
    layer_params: dict,
    x: jax.Array,                # (B, N, D) float32
    cache: KVCache,
    layer_ix: int,
    past: jax.Array,             # scalar int32: tokens already in cache
    config: BioGptConfig,
    compute_dtype,
    causal: bool,
    n_valid: jax.Array,          # scalar int32: real (unpadded) new-token count
    allow_pallas: bool,
    kv_window: Optional[int],    # static: attend over cache[:kv_window] only
    tp_axis: Optional[str] = None,   # shard_map model axis (TP)
    tp_size: int = 1,
    tp_seq_shard: bool = False,  # sequence-parallel residuals (Megatron-SP)
) -> Tuple[jax.Array, KVCache]:
    B, N, D = x.shape
    # Under shard_map TP each shard owns n_head/tp contiguous heads: q/k/v
    # are column-parallel so the local projection emits exactly those rows,
    # and attention below is entirely shard-local.
    H, Dk = config.n_head // tp_size, config.d_kv
    scaling = 1.0 / math.sqrt(Dk)

    if "qkv" in layer_params:   # engine-fused projection (one kernel)
        qkv = _project(x, layer_params["qkv"], compute_dtype, allow_pallas)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q * scaling
    else:
        q = (_project(x, layer_params["q"], compute_dtype, allow_pallas) * scaling)
        k = _project(x, layer_params["k"], compute_dtype, allow_pallas)
        v = _project(x, layer_params["v"], compute_dtype, allow_pallas)

    # the cache keeps the flat (B, N, D) rows (heads are contiguous in D)
    cache = update_layer(cache, layer_ix, k, v, past, tp_axis=tp_axis)
    q = q.reshape(B, N, H, Dk)
    k = k.reshape(B, N, H, Dk)
    v = v.reshape(B, N, H, Dk)
    # Attend over a static prefix window of the cache: reading all
    # n_positions slots costs ~96 MB/token at 347M; the engine buckets the
    # window to the live length (a handful of compiled variants).
    S = cache.max_len if kv_window is None else min(kv_window, cache.max_len)
    # (A standalone per-layer fused decode-attention Pallas kernel lived
    # here in round 1, permanently gated off because it lost to XLA; the
    # whole-model megakernel — ops/pallas_decode.py, which fuses attention
    # together with everything else — subsumed and replaced it.)

    if isinstance(cache, QuantKVCache):
        # int8 KV: dequantize per-row (levels * absmax scale) into the dot's
        # operand stream; compute dtype follows the mode
        dq = jnp.float32 if compute_dtype == jnp.float32 else jnp.bfloat16
        k_flat, v_flat = dequant_layer(cache, layer_ix, S, dq)
        k_all = k_flat.reshape(B, S, H, Dk)
        v_all = v_flat.reshape(B, S, H, Dk)
        q_dot = q if compute_dtype == jnp.float32 else q.astype(dq)
    elif compute_dtype == jnp.float32:
        # parity mode: widen the fp16 cache before the dots
        k_all = cache.k[layer_ix][:, :S].reshape(B, S, H, Dk).astype(jnp.float32)
        v_all = cache.v[layer_ix][:, :S].reshape(B, S, H, Dk).astype(jnp.float32)
        q_dot = q
    else:
        # fast mode: feed the fp16 cache straight into the dots (f32
        # accumulation) — materializing a widened copy costs ~144 MB/token
        # of fusion traffic at 347M
        k_all = cache.k[layer_ix][:, :S].reshape(B, S, H, Dk)
        v_all = cache.v[layer_ix][:, :S].reshape(B, S, H, Dk)
        q_dot = q.astype(cache.k.dtype)

    prec = precision_for(compute_dtype)
    scores = jnp.einsum("bnhd,bshd->bhns", q_dot, k_all,
                        preferred_element_type=jnp.float32, precision=prec)

    # past may be scalar or per-sequence (B,) for continuous batching
    past_b = jnp.broadcast_to(
        jnp.atleast_1d(jnp.asarray(past, jnp.int32)), (B,))[:, None, None, None]
    pos_s = jnp.arange(S, dtype=jnp.int32)[None, None, None, :]       # cache slot
    if causal:
        pos_n = past_b + jnp.arange(N, dtype=jnp.int32)[None, None, :, None]
        valid = pos_s <= pos_n
    else:
        # reference-compat: every new token sees the whole written range of
        # REAL tokens (bucket padding must stay invisible); n_valid may be
        # scalar or per-row (B,)
        nv = jnp.broadcast_to(jnp.atleast_1d(n_valid), (B,))[:, None, None, None]
        valid = pos_s < past_b + nv
    scores = jnp.where(valid, scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1)

    # cast the softmax weights to the (DEQUANTIZED) value dtype — not the
    # raw cache dtype: with an int8 cache that would truncate every weight
    # below 1.0 to zero and collapse the context
    attn_dot = attn if compute_dtype == jnp.float32 else attn.astype(v_all.dtype)
    ctx = jnp.einsum("bhns,bshd->bnhd", attn_dot, v_all,
                     preferred_element_type=jnp.float32, precision=prec)
    ctx = ctx.reshape(B, N, H * Dk)
    out = _project(ctx, layer_params["o"], compute_dtype, allow_pallas,
                   psum_axis=tp_axis, seq_scatter=tp_seq_shard)
    return out, cache


def forward(
    params: dict,
    tokens: jax.Array,           # (B, N) int32
    cache: KVCache,
    past: jax.Array,             # scalar int32
    config: BioGptConfig,
    compute_dtype=jnp.float32,
    causal: bool = True,
    logits_mode: str = "last",   # "last" | "all"
    allow_pallas: bool = True,
    kv_window: Optional[int] = None,  # static: attention reads only
                                      # cache[:kv_window] (must cover past+N)
    last_index: Optional[jax.Array] = None,  # for "last": position of the
                                             # real final token (padded prefill)
    tp_axis: Optional[str] = None,    # shard_map model-parallel axis name
    tp_size: int = 1,                 # static size of that axis
    tp_seq_shard: bool = False,       # sequence-parallel prefill (Megatron-SP)
) -> Tuple[jax.Array, KVCache]:
    """One forward step (prefill or decode). Pure; jit at the call site with
    ``static_argnames=("config", "compute_dtype", "causal", "logits_mode")``.

    Returns (logits, cache): logits (B, n_vocab) for "last" or (B, N,
    n_vocab) for "all" — the reference extracts last-position logits only
    (biogpt.cpp:842-844); "all" serves scoring/perplexity.

    ``tp_axis``: when called as the per-shard body of a ``shard_map``
    (parallel/tp.py), names the Megatron tensor-parallel mesh axis —
    q/k/v/fc1/lm_head are column-parallel shards and run local, o/fc2 are
    row-parallel and psum at their joins, logits all_gather at the end.

    ``tp_seq_shard`` (requires ``tp_axis``, N % tp_size == 0): Megatron
    sequence parallelism for prefill — the residual stream, LayerNorms and
    residual adds run on each shard's own N/tp sequence rows; activations
    ``all_gather`` (tiled over N) right before the column-parallel matmuls
    and the row-parallel joins ``psum_scatter`` back to local rows. Same
    math, half the collective bytes of a psum (all-reduce = RS + AG), no
    redundant LN/residual compute, and the RS/AG pairs are XLA-async — the
    collective-overlap scheduling of SURVEY §2.1(e). Attention itself stays
    head-parallel over the full sequence (its K/V need every position).
    """
    B, N = tokens.shape
    emb = embedding_lookup(tokens, params["embed_tokens"]) * math.sqrt(config.d_model)
    past_rows = jnp.broadcast_to(
        jnp.atleast_1d(jnp.asarray(past, jnp.int32)), (B,))[:, None]
    positions = past_rows + jnp.arange(N, dtype=jnp.int32)[None, :] + config.pos_offset
    pos_emb = embedding_lookup(positions, params["embed_positions"])
    x = emb + pos_emb  # (B, N, D) float32

    if tp_seq_shard:
        assert tp_axis is not None and N % tp_size == 0 and N > 1
        nloc = N // tp_size
        x = jax.lax.dynamic_slice_in_dim(
            x, jax.lax.axis_index(tp_axis) * nloc, nloc, axis=1)

    def gather_seq(h):
        # local N/tp rows -> full sequence, right before a column-parallel op
        return (jax.lax.all_gather(h, tp_axis, axis=1, tiled=True)
                if tp_seq_shard else h)

    n_valid = jnp.asarray(N if last_index is None else last_index + 1, jnp.int32)
    for i in range(config.n_layer):
        layer = layer_slice(params["layers"], i)
        h = _layer_norm(x, layer["ln0"]["w"], layer["ln0"]["b"], config.ln_eps)
        attn_out, cache = _attention(
            layer, gather_seq(h), cache, i, past, config, compute_dtype,
            causal, n_valid, allow_pallas, kv_window, tp_axis=tp_axis,
            tp_size=tp_size, tp_seq_shard=tp_seq_shard)
        x = x + attn_out
        h = _layer_norm(x, layer["ln1"]["w"], layer["ln1"]["b"], config.ln_eps)
        h = _project(gather_seq(h), layer["fc1"], compute_dtype, allow_pallas)
        h = jax.nn.gelu(h, approximate=False)
        h = _project(h, layer["fc2"], compute_dtype, allow_pallas,
                     psum_axis=tp_axis, seq_scatter=tp_seq_shard)
        x = x + h

    # final LN is row-independent: run it on local rows, THEN gather
    x = gather_seq(_layer_norm(
        x, params["final_ln"]["w"], params["final_ln"]["b"], config.ln_eps))
    if logits_mode == "last":
        idx = jnp.asarray(N - 1 if last_index is None else last_index, jnp.int32)
        if idx.ndim == 0:
            x = jax.lax.dynamic_slice_in_dim(x, idx, 1, axis=1)
        else:
            # per-row last positions (batched mixed-length prefill): one
            # gather along the sequence axis
            x = jnp.take_along_axis(
                x, jnp.broadcast_to(idx[:, None, None], (B, 1, x.shape[-1])),
                axis=1)
    logits = matmul(x, params["lm_head"], compute_dtype=compute_dtype,
                    allow_pallas=allow_pallas)
    if tp_axis is not None:
        # column-parallel lm_head: gather the vocab shards (tiny vs a
        # replicated 42k-vocab matmul; rides ICI)
        logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
    # the lm_head may be lane-padded for the Pallas kernel; keep real vocab
    logits = logits[..., :config.n_vocab]
    if logits_mode == "last":
        logits = logits[:, 0, :]
    return logits, cache


def forward_fused_decode(
    params: dict,
    tokens: jax.Array,           # (B, 1) int32, B <= 32
    cache: KVCache,
    past: jax.Array,             # scalar int32, or (B,) per-slot positions
    config: BioGptConfig,
    compute_dtype=jnp.bfloat16,
    kv_window: int = 128,        # static, >= max(past) + 1
    interpret: bool = False,
    kv_block: Optional[int] = None,  # KV block-size override (tests)
    per_slot_kv: bool = False,   # paged KV: each slot streams only its own
                                 # live blocks (mixed-length serving batches)
    kv_groups: Optional[int] = None,  # group-clamped KV streaming: slot
                                 # groups stop paying KV traffic at their
                                 # own live window (mixed-length serving)
) -> Tuple[jax.Array, KVCache]:
    """Single-token decode through the whole-model Pallas megakernel.

    Semantics match ``forward(..., N=1, causal=True, logits_mode="last")``
    but the layer stack runs as ONE kernel (ops/pallas_decode.py): only
    embedding, the KV-row writes, final LN, lm_head and the logits slice
    remain as XLA ops — decode is op-issue bound on this runtime. Batched
    serving (B <= 32) passes per-slot ``past`` positions.
    """
    x, cache = _fused_decode_hidden(
        params, tokens, cache, past, config, kv_window=kv_window,
        interpret=interpret, kv_block=kv_block, per_slot_kv=per_slot_kv,
        kv_groups=kv_groups)
    x = _layer_norm(x, params["final_ln"]["w"], params["final_ln"]["b"],
                    config.ln_eps)
    logits = matmul(x, params["lm_head"], compute_dtype=compute_dtype,
                    allow_pallas=True)
    logits = logits[..., :config.n_vocab]
    return logits, cache


def forward_fused_decode_greedy(
    params: dict,
    tokens: jax.Array,           # (B, 1) int32, B <= 32
    cache: KVCache,
    past: jax.Array,             # scalar int32, or (B,) per-slot positions
    config: BioGptConfig,
    kv_window: int = 128,
    interpret: bool = False,
    kv_block: Optional[int] = None,
    per_slot_kv: bool = False,
    with_health: bool = False,
    health_per_row: bool = False,
    kv_groups: Optional[int] = None,
):
    """Greedy decode with the lm_head folded into the kernel chain.

    Same layer stack as ``forward_fused_decode`` (including the paged
    ``per_slot_kv`` variant for mixed-length serving batches), but the
    epilogue (final LN + lm_head matmul + argmax, the reference's per-token
    tail ``biogpt.cpp:798-806`` + host argmax) runs as a second Pallas
    kernel (ops.pallas_qmatmul.lm_head_argmax_pallas) that never
    materializes the (B, n_vocab) logits — it returns the (B,) winning
    token ids directly. Requires a packed/lane-padded quantized lm_head
    (Engine prepares one).

    ``with_health`` additionally returns a scalar bool that is False when
    the winning logit values are non-finite (a poisoned hidden state NaNs
    every vocab tile, so the kernel's max-value output carries the NaN out
    without materializing logits — runtime/health.py's lane for this path).
    ``health_per_row`` returns the (B,) per-row finite bits instead, for
    batched serving where only LIVE slots' health matters (free slots
    compute garbage by design).
    """
    from ..ops.pallas_qmatmul import (lm_head_argmax_commit_pallas,
                                      lm_head_argmax_pallas)

    B = tokens.shape[0]
    L, _, S, D = cache.k.shape
    if (B > 1 and D % 128 == 0 and S % 8 == 0
            and not isinstance(cache, QuantKVCache)):
        # batched greedy serving: the epilogue kernel ALSO commits the
        # KV rows — the commit's RMW DMAs start at vocab tile 0 and hide
        # behind the lm_head's MXU work (a separate commit launch
        # measured 0.36 ms/step at B=32, ~2x its pure traffic)
        x, k_rows, v_rows = _fused_decode_hidden(
            params, tokens, cache, past, config, kv_window=kv_window,
            interpret=interpret, kv_block=kv_block,
            per_slot_kv=per_slot_kv, kv_groups=kv_groups, commit=False)
        past_vec = jnp.broadcast_to(
            jnp.atleast_1d(jnp.asarray(past, jnp.int32)), (B,))
        tok, mv, k_new, v_new = lm_head_argmax_commit_pallas(
            x, params["final_ln"]["w"], params["final_ln"]["b"],
            params["lm_head"], config.n_vocab,
            cache.k, cache.v,
            jnp.transpose(k_rows, (1, 0, 2)),
            jnp.transpose(v_rows, (1, 0, 2)), past_vec,
            ln_eps=config.ln_eps, interpret=interpret)
        cache = KVCache(k=k_new, v=v_new)
        if with_health:
            ok = jnp.isfinite(mv)
            return tok, cache, (ok if health_per_row else ok.all())
        return tok, cache

    x, cache = _fused_decode_hidden(
        params, tokens, cache, past, config, kv_window=kv_window,
        interpret=interpret, kv_block=kv_block, per_slot_kv=per_slot_kv,
        kv_groups=kv_groups)
    out = lm_head_argmax_pallas(
        x, params["final_ln"]["w"], params["final_ln"]["b"],
        params["lm_head"], n_valid=config.n_vocab, ln_eps=config.ln_eps,
        interpret=interpret, with_max=with_health)
    if with_health:
        tok, mv = out
        ok = jnp.isfinite(mv)
        return tok, cache, (ok if health_per_row else ok.all())
    return out, cache


def forward_prefill_fused(
    params: dict,
    ids: jax.Array,              # (R, T) int32 padded prompts, past = 0
    config: BioGptConfig,
    last_index: jax.Array,       # (R,) each prompt's real final position
    compute_dtype=jnp.bfloat16,
    cache_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Fresh-cache prompt forward through the prefill megakernel.

    The serving-refill counterpart of ``forward_fused_decode``: all L
    layers of the (R, T) prompt batch run as ONE packed-plane kernel
    (ops/pallas_prefill.py — causal self-attention within each prompt,
    no KV streaming), leaving embedding, the per-prompt last-logits
    gather, final LN and the lm_head as XLA ops. Returns
    ``(logits (R, n_vocab), small_cache)`` with the small cache shaped
    exactly like ``init_cache(batch=R, max_len=T)`` — rows beyond each
    prompt's true length hold causally-computed padding values that no
    consumer reads (idx < past masking downstream), matching the per-op
    refill's contract. int8 ``cache_dtype`` quantizes rows with the
    standard per-row absmax contract (runtime.cache.quantize_rows).
    """
    from ..ops.pallas_prefill import prefill_fused
    from ..runtime.cache import QuantKVCache, quantize_rows

    R, T = ids.shape
    D = config.d_model
    emb = embedding_lookup(ids, params["embed_tokens"]) * math.sqrt(D)
    pos = (jnp.arange(T, dtype=jnp.int32) + config.pos_offset)[None, :]
    pos_emb = embedding_lookup(jnp.broadcast_to(pos, (R, T)),
                               params["embed_positions"])
    x0 = (emb + pos_emb).reshape(R * T, D)

    # int8: the kernel emits bf16 rows and quantize_rows runs in XLA.
    # f32 row planes pushed the RT=1024 shapes 2.4 MB past the 104 MB
    # scoped-vmem ceiling on v5e; quantizing from bf16 instead moves the
    # int8 levels by at most one bf16 rounding (<= 0.4%), inside the
    # cache contract's tolerance (tests/test_pallas_prefill.py).
    kv_quant = cache_dtype == jnp.int8
    x, k_rows, v_rows = prefill_fused(
        x0, params["layers"], rows=R, padded=T, n_head=config.n_head,
        ln_eps=config.ln_eps, interpret=interpret,
        cache_dtype=jnp.bfloat16 if kv_quant else cache_dtype)
    L = k_rows.shape[0]

    sel = jnp.arange(R, dtype=jnp.int32) * T + jnp.asarray(
        last_index, jnp.int32)
    xl = x[sel]                                            # (R, D)
    xl = _layer_norm(xl, params["final_ln"]["w"], params["final_ln"]["b"],
                     config.ln_eps)
    logits = matmul(xl[:, None, :], params["lm_head"],
                    compute_dtype=compute_dtype, allow_pallas=True)
    logits = logits[:, 0, :config.n_vocab]

    if kv_quant:
        kq, ksc = quantize_rows(k_rows)                    # (L, RT)
        vq, vsc = quantize_rows(v_rows)
        small = QuantKVCache(
            k=kq.reshape(L, R, T, D), v=vq.reshape(L, R, T, D),
            ks=ksc.reshape(L, R, 1, T), vs=vsc.reshape(L, R, 1, T))
    else:
        small = KVCache(k=k_rows.reshape(L, R, T, D),
                        v=v_rows.reshape(L, R, T, D))
    return logits, small


def forward_fused_decode_sampled(
    params: dict,
    tokens: jax.Array,           # (B, 1) int32, 2 <= B <= 32
    cache: KVCache,
    past: jax.Array,             # (B,) per-slot positions
    config: BioGptConfig,
    kv_window: int = 128,
    interpret: bool = False,
    kv_block: Optional[int] = None,
    kv_groups: Optional[int] = None,
):
    """Sampled batched decode with the epilogue + KV commit fused.

    The sampled serving step's tail was: commit kernel + XLA final LN +
    wide lm_head kernel + full-width sampler stage 1. Here one kernel
    (ops.pallas_qmatmul.lm_head_logits_gmax_commit_pallas) runs final LN
    + lm_head + the KV commit (RMW DMAs hidden under the lm_head MXU
    work, as in the greedy argmax+commit fusion) and ALSO emits the
    per-128-lane-group logit maxima — stage 1 of the exact gather-top-k
    sampler (runtime.sampling.topk_gather) — while each vocab tile is
    still in VMEM.

    Returns ``(logits (B, d_out_padded) f32, gmax (B, d_out//128),
    cache')``. Pad columns carry -1e30 (in gmax too), so the sampler can
    run on the PADDED width; emitted ids stay < n_vocab. bf16 cache only.
    """
    from ..ops.pallas_qmatmul import lm_head_logits_gmax_commit_pallas

    B = tokens.shape[0]
    x, k_rows, v_rows = _fused_decode_hidden(
        params, tokens, cache, past, config, kv_window=kv_window,
        interpret=interpret, kv_block=kv_block, kv_groups=kv_groups,
        commit=False)
    past_vec = jnp.broadcast_to(
        jnp.atleast_1d(jnp.asarray(past, jnp.int32)), (B,))
    logits, gmax, k_new, v_new = lm_head_logits_gmax_commit_pallas(
        x, params["final_ln"]["w"], params["final_ln"]["b"],
        params["lm_head"], config.n_vocab,
        cache.k, cache.v,
        jnp.transpose(k_rows, (1, 0, 2)),
        jnp.transpose(v_rows, (1, 0, 2)), past_vec,
        ln_eps=config.ln_eps, interpret=interpret)
    return logits, gmax, KVCache(k=k_new, v=v_new)


def forward_fused_decode_staged(
    params: dict,
    tokens: jax.Array,           # (B, 1) int32, 2 <= B <= 32
    cache: KVCache,              # read-only here: rows [0, past - step_i)
    k_stage: jax.Array,          # (L, B, C, D) chunk-local staged rows
    v_stage: jax.Array,
    past: jax.Array,             # (B,) CURRENT per-slot lengths
    step_i: jax.Array,           # scalar: step index within the chunk
    config: BioGptConfig,
    compute_dtype=jnp.bfloat16,
    kv_window: int = 128,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Serving decode step with chunk-local KV staging.

    Attention reads cache rows below the chunk-start length plus staged
    rows below ``step_i`` (bit-identical values to the unstaged path —
    see ops.pallas_decode._make_kernel_batched). Returns
    ``(logits, k_rows, v_rows)``; the CALLER writes the rows into the
    staging buffer at ``step_i`` (one slot-agnostic update per step) and
    commits the staging into the cache once per chunk — replacing 2·B
    per-slot cache writes per step with 2 per step + 2·B per chunk.
    """
    from ..ops.pallas_decode import decode_step_fused

    B, N = tokens.shape
    assert N == 1 and 2 <= B <= 32
    emb = embedding_lookup(tokens, params["embed_tokens"]) * math.sqrt(config.d_model)
    past_vec = jnp.broadcast_to(
        jnp.atleast_1d(jnp.asarray(past, jnp.int32)), (B,))
    pos = past_vec.reshape(B, 1) + config.pos_offset
    pos_emb = embedding_lookup(pos, params["embed_positions"])
    x0 = (emb + pos_emb).reshape(B, config.d_model)

    x, k_rows, v_rows = decode_step_fused(
        x0, params["layers"], cache.k, cache.v, past_vec,
        n_head=config.n_head, window=kv_window, ln_eps=config.ln_eps,
        interpret=interpret, k_stage=k_stage, v_stage=v_stage,
        step_i=step_i)
    x = _layer_norm(x, params["final_ln"]["w"], params["final_ln"]["b"],
                    config.ln_eps)
    logits = matmul(x, params["lm_head"], compute_dtype=compute_dtype,
                    allow_pallas=True)
    logits = logits[..., :config.n_vocab]
    return logits, k_rows, v_rows


def _fused_decode_hidden(
    params: dict,
    tokens: jax.Array,
    cache: KVCache,
    past: jax.Array,
    config: BioGptConfig,
    kv_window: int = 128,
    interpret: bool = False,
    kv_block: Optional[int] = None,
    per_slot_kv: bool = False,
    kv_groups: Optional[int] = None,
    commit: bool = True,
) -> Tuple[jax.Array, KVCache]:
    """Megakernel layer stack + KV-row writes; returns the pre-final-LN
    hidden state (B, d_model) f32 and the updated cache.

    ``commit=False`` skips the cache-row commit and returns
    ``(x, k_rows, v_rows)`` instead — for callers that fold the commit
    into their own epilogue kernel (forward_fused_decode_greedy)."""
    from ..ops.pallas_decode import decode_step_fused

    B, N = tokens.shape
    assert N == 1 and B <= 32, "megakernel path is decode with B <= 32"
    emb = embedding_lookup(tokens, params["embed_tokens"]) * math.sqrt(config.d_model)
    past_vec = jnp.broadcast_to(
        jnp.atleast_1d(jnp.asarray(past, jnp.int32)), (B,))
    pos = past_vec.reshape(B, 1) + config.pos_offset
    pos_emb = embedding_lookup(pos, params["embed_positions"])
    x0 = (emb + pos_emb).reshape(B, config.d_model)

    L, _, S, D = cache.k.shape
    kv_quant = isinstance(cache, QuantKVCache)
    x_out, k_rows, v_rows = decode_step_fused(
        x0, params["layers"], cache.k, cache.v,
        past_vec, n_head=config.n_head, window=kv_window,
        ln_eps=config.ln_eps, interpret=interpret, kv_block=kv_block,
        k_scales=cache.ks if kv_quant else None,
        v_scales=cache.vs if kv_quant else None,
        per_slot_kv=per_slot_kv, kv_groups=kv_groups)

    if not commit:
        return x_out, k_rows, v_rows

    # ONE cache write per (tensor, slot): every layer's new row for slot b
    # lands at that slot's own position
    zero = jnp.zeros((), jnp.int32)
    if kv_quant:
        from ..runtime.cache import quantize_rows
        kq, ksc = quantize_rows(k_rows)      # (L, B, D) -> int8 + (L, B)
        vq, vsc = quantize_rows(v_rows)
        k_new, v_new, ks_new, vs_new = cache
        if B > 1 and D % 128 == 0 and S % 128 == 0:
            # batched int8: ONE aligned-RMW commit kernel for levels AND
            # scale planes instead of 4·B serially-chained
            # dynamic_update_slices (ops/pallas_decode.kv_commit_quant_pallas)
            from ..ops.pallas_decode import kv_commit_quant_pallas
            k_new, v_new, ks_new, vs_new = kv_commit_quant_pallas(
                k_new, v_new, ks_new, vs_new,
                jnp.transpose(kq, (1, 0, 2)), jnp.transpose(vq, (1, 0, 2)),
                jnp.transpose(ksc, (1, 0))[..., None],
                jnp.transpose(vsc, (1, 0))[..., None],
                past_vec, interpret=interpret)
        else:
            for b in range(B):
                idx = (zero, jnp.int32(b), past_vec[b], zero)
                sidx = (zero, jnp.int32(b), zero, past_vec[b])
                k_new = jax.lax.dynamic_update_slice(
                    k_new, kq[:, b].reshape(L, 1, 1, D), idx)
                v_new = jax.lax.dynamic_update_slice(
                    v_new, vq[:, b].reshape(L, 1, 1, D), idx)
                ks_new = jax.lax.dynamic_update_slice(
                    ks_new, ksc[:, b].reshape(L, 1, 1, 1), sidx)
                vs_new = jax.lax.dynamic_update_slice(
                    vs_new, vsc[:, b].reshape(L, 1, 1, 1), sidx)
        cache = QuantKVCache(k=k_new, v=v_new, ks=ks_new, vs=vs_new)
    else:
        if B > 1 and D % 128 == 0:
            # batched: ONE aligned-RMW commit kernel instead of 2·B
            # serially-chained dynamic_update_slices (0.58 ms/step at
            # B=32 on this runtime — ops.pallas_decode.kv_commit_pallas)
            from ..ops.pallas_decode import kv_commit_pallas
            k_new, v_new = kv_commit_pallas(
                cache.k, cache.v,
                jnp.transpose(k_rows, (1, 0, 2)),
                jnp.transpose(v_rows, (1, 0, 2)),
                past_vec, interpret=interpret)
        else:
            k_new, v_new = cache.k, cache.v
            for b in range(B):
                idx = (zero, jnp.int32(b), past_vec[b], zero)
                k_new = jax.lax.dynamic_update_slice(
                    k_new,
                    k_rows[:, b:b + 1].reshape(L, 1, 1, D).astype(
                        k_new.dtype), idx)
                v_new = jax.lax.dynamic_update_slice(
                    v_new,
                    v_rows[:, b:b + 1].reshape(L, 1, 1, D).astype(
                        v_new.dtype), idx)
        cache = KVCache(k=k_new, v=v_new)

    return x_out, cache


def logits_for_tokens(
    params: dict,
    tokens: jax.Array,           # (B, N)
    config: BioGptConfig,
    compute_dtype=jnp.float32,
    cache_dtype=jnp.float16,
) -> jax.Array:
    """Full-sequence logits (B, N, V) in one pass — for scoring/perplexity."""
    from ..runtime.cache import init_cache

    B, N = tokens.shape
    cache = init_cache(config, batch=B, max_len=N, dtype=cache_dtype)
    logits, _ = forward(
        params, tokens, cache, jnp.int32(0), config,
        compute_dtype=compute_dtype, logits_mode="all",
    )
    return logits
