"""Continuous-batching serving engine.

The reference decodes strictly batch=1 sequentially (SURVEY §2.1 — no
batched serving exists). This engine is the TPU-native replacement: a fixed
pool of B cache slots decodes in lockstep with per-slot positions; finished
slots are refilled from the request queue without stopping the batch
(continuous batching). All per-slot state — positions, done flags, sampled
tokens, sampling parameters — lives on device; the host only drains a token
block once per chunk and schedules refills.

Design choices for one chip:
  - decode steps run the packed Pallas dequant-matmul kernels (the fused
    qkv/fc planes support m <= 8); prefill shapes fall back to XLA
    automatically via the matmul dispatch
  - refills that arrive together prefill as ONE batched forward per prompt
    bucket (not B sequential prefills), then insert into their slots
  - each request carries its own temp/top_k/top_p; the lockstep sampler
    applies them per row on device (runtime/sampling.sample_per_request)

Single-host implementation; the mesh-parallel engine shards the same cache
over ("data", "model") axes, so scaling this scheduler across hosts is a
data-axis extension (each host owns a shard of slots).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BioGptConfig, GenerationParams
from ..models.biogpt import forward, forward_fused_decode
from .cache import KVCache, init_cache
from .health import DrainStallError, ModelHealthError
from .metrics import ServingMetrics
from .sampling import greedy, sample_per_request


def _bucket(n: int, floor: int = 8) -> int:
    b = floor
    while b < n:
        b *= 2
    return b


@dataclass
class Request:
    prompt_ids: List[int]
    n_predict: int = 64
    request_id: int = 0
    # per-request sampling (None -> inherit the serve() defaults)
    temp: Optional[float] = None
    top_k: Optional[int] = None
    top_p: Optional[float] = None


@dataclass
class RequestResult:
    request_id: int
    ids: List[int] = field(default_factory=list)    # prompt + generated
    prompt_len: int = 0

    @property
    def new_ids(self) -> List[int]:
        return self.ids[self.prompt_len:]


class BatchedEngine:
    """Lockstep batched decode over B slots with continuous refill."""

    MAX_TOP_K = 64   # static cap for the per-request top-k kernel

    def __init__(
        self,
        config: BioGptConfig,
        params,
        max_batch: int = 8,
        compute_dtype=jnp.bfloat16,
        cache_dtype=None,
        max_seq: Optional[int] = None,
        chunk: int = 16,
        pack_q4: bool = True,
        pipeline: int = 2,
        mesh=None,
        kv_quant: bool = False,
        paged_kv: Optional[bool] = None,
        staged_kv: bool = False,
        health_check: bool = True,
        watchdog_s: Optional[float] = None,
        tp_fused_decode: bool = False,
        kv_groups: Optional[int] = None,
    ):
        self.config = config
        self.B = max_batch
        self.compute_dtype = compute_dtype
        self.max_seq = max_seq or config.n_positions
        self.chunk = chunk
        self.mesh = mesh
        # failure detection (runtime/health.py): the decode scan always
        # computes the on-device finite check (keeping ONE program shape);
        # health_check gates whether a tripped bit fails the serve.
        # watchdog_s (None = off: the first deeply-queued run of a new
        # program on this runtime can legitimately take minutes) bounds how
        # long launched chunks may go undrained before DrainStallError.
        self.health_check = health_check
        self.watchdog_s = watchdog_s
        self.metrics = ServingMetrics()
        # in-flight chunk fetches before the host blocks on a drain: at
        # depth 2 a fetch has had ~2 chunk periods for device compute + the
        # ~26 ms device->host RTT, so drains come back essentially free
        self.pipeline = max(1, pipeline)
        # Mesh path: the lockstep decode/prefill steps run as the shard_map
        # TP forward (parallel/tp.py) — per-shard packed Pallas kernels at
        # decode shapes, Megatron joins, sequence-parallel prefill. The
        # single-device megakernel does not apply (its o-proj/FFN would
        # need mid-kernel psums), so mesh serving uses the per-op path.
        self._fwd = forward
        self._tp = False
        self._tp_fused = False
        if mesh is not None and pack_q4:
            from ..parallel.mesh import MODEL_AXIS
            from ..parallel.tp import (make_tp_forward, pack_params_tp,
                                       supports_tp)
            tp = mesh.shape[MODEL_AXIS]
            if supports_tp(config, tp):
                params = pack_params_tp(params, tp)
                # opt-in TP megakernel (VERDICT r3 #3): the lockstep decode
                # steps (N == 1) route through the per-layer kernel halves
                # + Megatron psums (ops/pallas_decode_tp.py); refill
                # prefills keep the per-op sequence-parallel path. Needs a
                # bf16 cache — forced below.
                self._tp_fused = tp_fused_decode   # incl. int8 KV (round 5)
                self._fwd = make_tp_forward(
                    mesh, fused_decode=self._tp_fused)
                self._tp = True
        elif pack_q4:
            from .engine import _pack_matmul_weights
            params = _pack_matmul_weights(params)
        # int8 KV (opt-in): halves KV HBM traffic — the dominant byte
        # stream of long-window lockstep decode (~400 MB/step of bf16 KV at
        # B=8, S=512 vs ~170 MB of packed weights). Mesh-capable: levels
        # shard over d_model, scale planes replicate (exact — see
        # cache.quantize_rows).
        if kv_quant:
            if cache_dtype not in (None, jnp.int8):
                raise ValueError("kv_quant forces an int8 cache")
            cache_dtype = jnp.int8
        # (downstream dispatch keys on cache_dtype / the cache pytree type)
        # Batched whole-model megakernel (ops/pallas_decode.py): the B<=32
        # lockstep decode step runs ALL layers as one kernel with per-slot
        # positions. Needs a bf16/int8 cache and fused+packed weights.
        from ..ops.pallas_decode import supports_layers
        self._fused_decode = (
            mesh is None and pack_q4 and compute_dtype != jnp.float32
            and cache_dtype in (None, jnp.bfloat16, jnp.int8)
            and supports_layers(params.get("layers", {}), jnp.bfloat16,
                                batch=self.B, n_new=1))
        # Paged (per-slot) KV reads in the lockstep megakernel: each slot
        # streams only its own live KV blocks instead of the batch-wide
        # window (pallas_decode._make_kernel_paged). Opt-in: the elision
        # savings are real and scale with raggedness, but per-block
        # sequencing (~1 us/block in both the grid and manual-DMA
        # formulations) exceeds the bandwidth they can save under BioGPT's
        # 1024-position cap (measurements: tools/bench/
        # bench_paged_kernel.py, RESULTS.md) — a feature for longer
        # contexts than this model family has.
        if paged_kv is None:
            paged_kv = False
        self._paged_kv = bool(paged_kv) and self._fused_decode
        # Group-clamped KV streaming (round 5): slots split into kv_groups
        # groups; the megakernel fetches each group's KV stream clamped at
        # that group's own live block count, so a batch where only a few
        # slots hold long-prompt requests stops paying the batch-wide
        # window for everyone (the structural cause of the round-4
        # uniform-vs-mixed serving gap). Pure elision — the kernel's grid
        # and math are unchanged (ops/pallas_decode._make_kernel_batched
        # ``groups``), and _assign_slots gives the scheduler length
        # affinity at group granularity so longs cluster. None -> auto
        # (BIOGPT_KV_GROUPS env, else 16 when the shape allows: the
        # kernel A/B table (RESULTS round 5) has G=16 equal to G=8 with
        # affinity-clustered longs but recovering -28% even when longs
        # SCATTER across slots — finer groups make the elision robust to
        # assignment; uniform overhead stays ~1%).
        if kv_groups is None:
            kv_groups = int(os.environ.get("BIOGPT_KV_GROUPS", "-1"))
            if kv_groups < 0:
                kv_groups = (16 if self.B % 16 == 0
                             else 8 if self.B % 8 == 0 else 1)
        self._kv_groups = (kv_groups if kv_groups > 1
                           and self._fused_decode and not self._paged_kv
                           and self.B % kv_groups == 0 else None)
        # Chunk-local KV staging (opt-in): replaces the 2·B per-slot cache
        # writes per step (xprof: ~0.25 ms/step at B=32) with one
        # slot-agnostic staging write per step + a per-chunk commit, and
        # the kernel attends to staging rows. Measured NEUTRAL on this
        # chip (the saved update-slice issue time is offset by the staging
        # read traffic and the extra in-kernel fold — RESULTS.md round 3),
        # so it defaults off; kept because the tradeoff may flip on
        # hardware without this runtime's dispatch costs.
        self._staged_kv = bool(staged_kv) and self._fused_decode
        if cache_dtype is None:
            cache_dtype = (jnp.bfloat16
                           if self._fused_decode or self._tp_fused
                           else jnp.float16)
        self.cache_dtype = cache_dtype
        if self._tp:
            from ..parallel.tp import shard_params_tp
            self.params = shard_params_tp(params, mesh)
        elif mesh is not None:
            from ..parallel.sharding import shard_params
            self.params = shard_params(params, mesh)
        else:
            self.params = jax.device_put(params)
        # decode shapes (m = B <= 8) ride the packed Pallas kernels; matmul
        # dispatch falls back to XLA for prefill shapes automatically. On a
        # mesh WITHOUT the shard_map TP path, weights are GSPMD-sharded and
        # GSPMD cannot partition a custom Pallas kernel — same gate as
        # Engine (engine.py): pallas only single-device or under shard_map.
        self._interpret = jax.default_backend() != "tpu"
        self.allow_pallas = (pack_q4 and not self._interpret
                             and (mesh is None or self._tp))
        # Greedy tail fusion for the lockstep step (the serving analog of
        # Engine._fused_greedy): when every bound request is greedy, final
        # LN + lm_head + argmax run as ONE kernel that never materializes
        # the (B, n_vocab) logits — at B=32 that removes a ~5 MB f32
        # logits round-trip plus XLA's 42k-wide argmax and isfinite
        # reduce from every step. Health rides the kernel's per-row
        # winning-logit values instead (NaN'd hidden states NaN them).
        from ..ops.pallas_qmatmul import supports as _psup
        from ..ops.pallas_qmatmul import supports_wide as _psup_wide
        from ..quant.layouts import QuantizedTensor as _QT
        lm = params.get("lm_head") if isinstance(params, dict) else None
        self._fused_greedy = (
            self._fused_decode and isinstance(lm, _QT) and lm.packed
            and (_psup(lm, self.B) or _psup_wide(lm, self.B)))
        # Sampled tail fusion (round 5): the per-request-sampling step
        # (every live-intake serve, and all mixed traffic) runs final LN +
        # lm_head + KV commit as ONE kernel that also emits the
        # per-128-lane-group logit maxima — stage 1 of the exact
        # gather-top-k sampler — so the step drops the standalone commit
        # launch AND the sampler's full-width stage-1
        # (ops/pallas_qmatmul.lm_head_logits_gmax_commit_pallas).
        self._fused_sampled = (
            self._fused_greedy and not self._paged_kv
            and self.cache_dtype == jnp.bfloat16
            and config.d_model % 128 == 0 and self.max_seq % 8 == 0)
        # Prefill megakernel for REFILLS (round 5): xprof put refill
        # prefill programs at ~42% of the mixed serve's device time —
        # each pays the XLA dequant pipeline's ~3.5 ms weight-traffic
        # floor however few tokens it processes. Refills start from an
        # empty cache (pure causal self-attention, no KV streaming), so
        # shapes with rows*padded <= 512 (<= 1024 at padded <= 128) run
        # as ONE packed-plane pass (ops/pallas_prefill.py); the 32-row
        # long-prompt initial wave keeps the XLA MXU path. Off in
        # interpret mode: the CPU fused-vs-per-op
        # parity tests rely on both engines sharing the XLA refill, and
        # the kernel has its own oracle tests + the on-chip identity
        # gate. BIOGPT_PREFILL_FUSED=0 is the operator A/B kill-switch
        # (the int8-KV mixed delta sits inside chip-hour variance —
        # RESULTS.md round 5 — so ops may want to re-measure on their
        # hardware).
        self._prefill_fused = bool(
            self._fused_decode and not self._interpret
            and os.environ.get("BIOGPT_PREFILL_FUSED", "1") != "0")

        def refill_commit(params, ids, cache, last, src_row, mask, rng,
                          toks, lengths, first_buf, temps, top_ps, top_ks,
                          n_temps, n_tps, n_tks, lens_b):
            """Prefill a refill group AND commit it as ONE program.

            Prefill forward on a BUCKET-SIZED temp cache, per-request
            first-token sampling, slot-row merge into the big cache
            (prefix rows only), and the per-slot vector scatter — fused
            into a single compiled program per prompt bucket. The previous
            4-program shape (prefill / sample / insert / apply) paid fixed
            relay dispatch latency per program AND its full-size temp
            cache streamed ~1.2 GB per wave (zero-init + whole-cache
            gather/select); the bucket-sized cache makes the merge touch
            only rows [0, padded).

            ``src_row`` (B,) int32: for slot s, which prefill row fills
            it; ``mask`` (B,) bool: whether slot s is refilled at all —
            the slot-side vectors keep fixed (B,) shapes for every refill
            pattern, while the prefill side is (n_rows, padded) with
            n_rows bucketed to a power of two <= B: per-pattern shapes
            compile-stormed through the 20-40 s/program remote compiler,
            but always padding rows to B made a 1-request refill into a
            32-slot pool prefill 32x the tokens it needed.
            """
            nr, padded = ids.shape
            from ..ops.pallas_prefill import supports_prefill
            if (self._prefill_fused
                    and supports_prefill(params.get("layers", {}), nr,
                                         padded, self.config.d_model)):
                # prefill megakernel: the whole fresh-cache prompt
                # forward as one packed-plane pass (no KV streaming —
                # see ops/pallas_prefill.py). Turns a ~3.5 ms
                # weight-bound XLA program into ~0.6 ms for the small
                # refill shapes that dominate staggered mixed traffic.
                from ..models.biogpt import forward_prefill_fused
                logits, small = forward_prefill_fused(
                    params, ids, self.config, last,
                    compute_dtype=self.compute_dtype,
                    cache_dtype=self.cache_dtype,
                    interpret=self._interpret)
            else:
                # large shapes (the initial 32-row wave): the XLA
                # dequant-then-dot MXU path is the right tool at
                # m ~ 16k activation rows. (Routing merely the small
                # refills through the packed MATMUL kernels alone —
                # without the whole-forward fusion — measured flat,
                # 6,852 vs 6,848 tok/s: per-op overheads dominate.)
                small = init_cache(self.config, batch=nr,
                                   max_len=padded, dtype=self.cache_dtype)
                logits, small = self._fwd(
                    params, ids, small, jnp.int32(0), self.config,
                    compute_dtype=self.compute_dtype, allow_pallas=False,
                    logits_mode="last", last_index=last)
            rng, sub = jax.random.split(rng)
            firsts = sample_per_request(sub, logits, n_tks, n_tps, n_temps,
                                        max_top_k=self.MAX_TOP_K)
            m_rows = mask[None, :, None, None]

            def merge_rows(big_f, small_f, axis):
                # gather each slot's prefill row, select under the mask,
                # write back over the big buffer's [0, padded) prefix
                seg = jax.lax.slice_in_dim(big_f, 0, padded, axis=axis)
                sel_ = jnp.where(m_rows, small_f[:, src_row], seg)
                return jax.lax.dynamic_update_slice(
                    big_f, sel_.astype(big_f.dtype),
                    (jnp.zeros((), jnp.int32),) * big_f.ndim)

            from .cache import QuantKVCache
            if isinstance(cache, QuantKVCache):
                cache = QuantKVCache(
                    k=merge_rows(cache.k, small.k, 2),
                    v=merge_rows(cache.v, small.v, 2),
                    ks=merge_rows(cache.ks, small.ks, 3),
                    vs=merge_rows(cache.vs, small.vs, 3))
            else:
                cache = KVCache(k=merge_rows(cache.k, small.k, 2),
                                v=merge_rows(cache.v, small.v, 2))

            def sel(new, old):
                return jnp.where(mask, new[src_row], old)

            toks = jnp.where(mask[:, None], firsts[src_row][:, None], toks)
            return (cache, toks, sel(lens_b, lengths), sel(firsts, first_buf),
                    sel(n_temps, temps), sel(n_tps, top_ps),
                    sel(n_tks, top_ks), rng)

        self._refill_jit = jax.jit(
            refill_commit,
            donate_argnames=("cache", "toks", "lengths", "first_buf",
                             "temps", "top_ps", "top_ks"))

        def sample_emit(logits, lengths, rng, temps, top_ps, top_ks,
                        out_buf, out_ix, live, health, all_greedy):
            """Shared per-step epilogue: health fold, per-request sampling
            (or the all-greedy shortcut), token-ring write."""
            health = jnp.logical_and(
                health, jnp.all(jnp.isfinite(logits) | ~live[:, None]))
            if all_greedy:
                nxt = greedy(logits)
            else:
                rng, sub = jax.random.split(rng)
                nxt = sample_per_request(sub, logits, top_ks, top_ps, temps,
                                         max_top_k=self.MAX_TOP_K)
            out_buf = jax.lax.dynamic_update_slice(
                out_buf, nxt[None, :], (out_ix, jnp.zeros((), jnp.int32)))
            return nxt, lengths + 1, rng, out_buf, out_ix + 1, health

        def batched_step(params, toks, cache, lengths, rng, temps, top_ps,
                         top_ks, out_buf, out_ix, live, health, kv_window,
                         use_fused, all_greedy):
            """One lockstep decode step over all B slots.

            toks (B, 1); lengths (B,) per-slot positions; temps/top_ps/
            top_ks (B,) per-request sampling params; tokens land in
            out_buf[out_ix] (a (chunk, B) device ring the host drains).
            ``live`` (B,) bool marks slots bound to a request this chunk;
            ``health`` () bool accumulates an on-device finite check of
            the live slots' logits (runtime/health.py — one ~2 µs reduce
            per step that rides home with the token drain, so numeric
            failure detection costs no extra host<->device traffic).
            """
            if use_fused and all_greedy and self._fused_greedy:
                # greedy tail fusion: token ids come straight out of the
                # LN+lm_head+argmax kernel; the (B, V) logits never exist
                from ..models.biogpt import forward_fused_decode_greedy
                nxt, cache, ok_rows = forward_fused_decode_greedy(
                    params, toks, cache, lengths, self.config,
                    kv_window=kv_window, interpret=self._interpret,
                    per_slot_kv=self._paged_kv, with_health=True,
                    health_per_row=True, kv_groups=self._kv_groups)
                health = jnp.logical_and(health,
                                         jnp.all(ok_rows | ~live))
                out_buf = jax.lax.dynamic_update_slice(
                    out_buf, nxt[None, :],
                    (out_ix, jnp.zeros((), jnp.int32)))
                return (nxt[:, None], cache, lengths + 1, rng, out_buf,
                        out_ix + 1, health)
            if use_fused and not all_greedy and self._fused_sampled:
                # sampled tail fusion: LN + lm_head + commit in one
                # kernel; logits come back PADDED (-1e30 pad cols) with
                # their group maxima, health rides isfinite(gmax)
                from ..models.biogpt import forward_fused_decode_sampled
                logits, gmax, cache = forward_fused_decode_sampled(
                    params, toks, cache, lengths, self.config,
                    kv_window=kv_window, interpret=self._interpret,
                    kv_groups=self._kv_groups)
                health = jnp.logical_and(
                    health, jnp.all(jnp.isfinite(gmax) | ~live[:, None]))
                rng, sub = jax.random.split(rng)
                nxt = sample_per_request(sub, logits, top_ks, top_ps,
                                         temps, max_top_k=self.MAX_TOP_K,
                                         gmax=gmax)
                out_buf = jax.lax.dynamic_update_slice(
                    out_buf, nxt[None, :],
                    (out_ix, jnp.zeros((), jnp.int32)))
                return (nxt[:, None], cache, lengths + 1, rng, out_buf,
                        out_ix + 1, health)
            if use_fused:
                logits, cache = forward_fused_decode(
                    params, toks, cache, lengths, self.config,
                    compute_dtype=self.compute_dtype, kv_window=kv_window,
                    interpret=self._interpret, per_slot_kv=self._paged_kv,
                    kv_groups=self._kv_groups)
            else:
                logits, cache = self._fwd(
                    params, toks, cache, lengths, self.config,
                    compute_dtype=self.compute_dtype,
                    allow_pallas=self.allow_pallas, logits_mode="last",
                    kv_window=kv_window)
            nxt, lengths, rng, out_buf, out_ix, health = sample_emit(
                logits, lengths, rng, temps, top_ps, top_ks, out_buf,
                out_ix, live, health, all_greedy)
            return (nxt[:, None], cache, lengths, rng, out_buf,
                    out_ix, health)

        def step_scan(params, toks, cache, lengths, rng, temps, top_ps,
                      top_ks, first_buf, live, *, n_steps: int,
                      kv_window: int, use_fused: bool, all_greedy: bool,
                      staged: bool):
            """``n_steps`` lockstep steps under ONE dispatch (argument
            binding costs ~0.7 ms/call on this runtime — see engine).

            Returns the drain-ready ``fetch`` vector directly — first
            tokens, the (n_steps, B) token block, and the chunk's health
            bit in one flat array — so the host launches exactly one
            program per chunk (the previous zeros+concatenate pair cost
            two more dispatches per chunk).

            ``staged`` (megakernel only): the chunk's new KV rows collect
            in a small (L, B, n_steps, D) staging buffer written with ONE
            slot-agnostic update per step (the kernel attends to it — see
            forward_fused_decode_staged) and commit to the cache once at
            chunk end — replacing 2·B per-slot cache writes per step,
            xprof-measured at ~0.25 ms/step (20%) at B=32."""
            # slots with no bound request keep decoding garbage; without a
            # reset their positions ratchet up forever, inflating the
            # group-clamped KV windows (and the bound-only window bucket)
            # with dead slots. Zeroing them is safe: a past=0 slot attends
            # only its current token (same as a fresh slot), commits its
            # garbage rows at [0, n_steps) of its OWN slot, and a later
            # refill overwrites [0, prompt) before any row is read.
            lengths = jnp.where(live, lengths, 0)
            out_buf = jnp.zeros((n_steps, self.B), jnp.int32)
            if staged:
                from ..models.biogpt import forward_fused_decode_staged

                L, Bc, S, D = cache.k.shape
                kst = jnp.zeros((L, Bc, n_steps, D), cache.k.dtype)
                vst = jnp.zeros_like(kst)
                lengths0 = lengths   # chunk-start positions (commit bases)

                def body(carry, i):
                    (toks, lengths, rng, out_buf, out_ix, health,
                     kst, vst) = carry
                    logits, k_rows, v_rows = forward_fused_decode_staged(
                        params, toks, cache, kst, vst, lengths, i,
                        self.config, compute_dtype=self.compute_dtype,
                        kv_window=kv_window, interpret=self._interpret)
                    zero = jnp.zeros((), jnp.int32)
                    kst = jax.lax.dynamic_update_slice(
                        kst, k_rows[:, :, None, :].astype(kst.dtype),
                        (zero, zero, i, zero))
                    vst = jax.lax.dynamic_update_slice(
                        vst, v_rows[:, :, None, :].astype(vst.dtype),
                        (zero, zero, i, zero))
                    nxt, lengths, rng, out_buf, out_ix, health = sample_emit(
                        logits, lengths, rng, temps, top_ps, top_ks,
                        out_buf, out_ix, live, health, all_greedy)
                    return (nxt[:, None], lengths, rng, out_buf, out_ix,
                            health, kst, vst), None

                init = (toks, lengths, rng, out_buf, jnp.int32(0),
                        jnp.bool_(True), kst, vst)
                (toks, lengths, rng, out_buf, _, health, kst,
                 vst), _ = jax.lax.scan(
                    body, init, jnp.arange(n_steps, dtype=jnp.int32))
                # commit the chunk's staged rows: ONE contiguous write per
                # (tensor, slot) at that slot's chunk-start position
                k_new, v_new = cache.k, cache.v
                zero = jnp.zeros((), jnp.int32)
                for b in range(self.B):
                    idx = (zero, jnp.int32(b), lengths0[b], zero)
                    k_new = jax.lax.dynamic_update_slice(
                        k_new, kst[:, b:b + 1], idx)
                    v_new = jax.lax.dynamic_update_slice(
                        v_new, vst[:, b:b + 1], idx)
                cache = KVCache(k=k_new, v=v_new)
            else:
                def body(carry, _):
                    toks, cache, lengths, rng, out_buf, out_ix, health = carry
                    return batched_step(params, toks, cache, lengths, rng,
                                        temps, top_ps, top_ks, out_buf,
                                        out_ix, live, health, kv_window,
                                        use_fused, all_greedy), None
                init = (toks, cache, lengths, rng, out_buf, jnp.int32(0),
                        jnp.bool_(True))
                (toks, cache, lengths, rng, out_buf, _,
                 health), _ = jax.lax.scan(body, init, None, length=n_steps)
            fetch = jnp.concatenate(
                [first_buf, out_buf.reshape(-1),
                 health.astype(jnp.int32)[None]])
            return toks, cache, lengths, rng, fetch

        self._step_scan = jax.jit(
            step_scan, static_argnames=("n_steps", "kv_window", "use_fused",
                                        "all_greedy", "staged"),
            donate_argnames=("cache",))


    def _use_fused(self) -> bool:
        """Megakernel gate, evaluated per call (honors set_pallas_mode)."""
        from ..ops.qmatmul import _PALLAS_MODE
        if not self._fused_decode or _PALLAS_MODE is False:
            return False
        return (not self._interpret) or _PALLAS_MODE is True

    def new_cache(self) -> KVCache:
        cache = init_cache(self.config, batch=self.B, max_len=self.max_seq,
                           dtype=self.cache_dtype)
        if self.mesh is not None:
            from ..parallel.sharding import shard_cache
            cache = shard_cache(cache, self.mesh)
        return cache

    # ------------------------------------------------------------- prefill

    def _prefill_group(self, pairs, cache: KVCache, rng, gen, slot_state):
        """Prefill + commit several (slot, request) pairs as ONE program.

        The batch is always padded to B rows and prompts pad to the group's
        bucket, so serving compiles exactly ONE refill program per prompt
        bucket (the remote compiler costs 20-40 s/program — per-group-size
        shapes compile-stormed). Per-row last_index extracts each prompt's
        real final logits; dummy rows are masked out of the cache merge and
        the per-slot vector scatter. First tokens are sampled with each
        request's own params inside the program (_refill_jit).

        ``slot_state`` = (toks, lengths, first_buf, temps, top_ps, top_ks)
        device vectors; returns (cache, new_slot_state, lens, rng).
        """
        lens = [len(req.prompt_ids) for _, req in pairs]
        n = len(pairs)
        padded = min(_bucket(max(lens)), self.max_seq)
        # prefill rows bucket to a power of two (<= B): a partial refill —
        # the common case under live intake — prefills only ~n rows
        # instead of always paying all B
        nr = min(_bucket(n, floor=1), self.B)
        ids = np.zeros((nr, padded), dtype=np.int32)
        last = np.zeros((nr,), dtype=np.int32)
        for r, (_, req) in enumerate(pairs):
            ids[r, :lens[r]] = req.prompt_ids
            last[r] = lens[r] - 1
        # slot s <- prefill row src_row[s] where masked
        src_row = np.zeros((self.B,), dtype=np.int32)
        mask = np.zeros((self.B,), dtype=bool)
        for r, (slot, _) in enumerate(pairs):
            src_row[slot] = r
            mask[slot] = True
        reqs = [req for _, req in pairs]
        # pad the sampling vectors to the row bucket (dummy rows sample
        # from dummy logits; never emitted)
        n_temps, n_tps, n_tks = self._gen_vectors(
            reqs + [Request(prompt_ids=[0])] * (nr - n), gen)
        lens_b = np.zeros((nr,), dtype=np.int32)
        lens_b[:n] = lens
        (cache, toks, lengths, first_buf, temps, top_ps, top_ks,
         rng) = self._refill_jit(
            self.params, jnp.asarray(ids), cache, jnp.asarray(last),
            jnp.asarray(src_row), jnp.asarray(mask), rng, *slot_state,
            n_temps, n_tps, n_tks, jnp.asarray(lens_b))
        return (cache, (toks, lengths, first_buf, temps, top_ps, top_ks),
                lens, rng)

    def _split_refill_groups(self, pairs):
        """Partition one refill wave into length-bucket prefill groups.

        Cost model (both terms in padded prompt tokens — prefill runs at a
        roughly constant token rate once MXU-bound): a group of n rows
        padded to bucket P costs ``bucket_rows(n) * P``; every extra
        program costs ``REFILL_SPLIT_COST`` more (its full packed-weight
        dequant traffic + dispatch, ~3-4 ms ≈ 350-400 prefill-rate tokens
        on this chip; default 512 is deliberately conservative). Rows
        sort by descending bucket and groups may only cut at bucket
        boundaries (cutting inside a bucket can't reduce padding), so with
        <= 5 distinct power-of-two buckets the exact optimum over <= 3
        groups is a tiny brute force.

        Uniform waves (one bucket) always yield ONE group — the round-2
        finding that per-bucket splitting loses on uniform workloads is
        preserved by the cost model itself.
        """
        split_cost = int(os.environ.get("BIOGPT_REFILL_SPLIT_COST", "512"))
        dec = sorted(pairs, key=lambda p: len(p[1].prompt_ids),
                     reverse=True)
        buckets = [min(_bucket(len(req.prompt_ids)), self.max_seq)
                   for _, req in dec]
        # candidate cut points: indices where the bucket shrinks
        cuts = [i for i in range(1, len(dec)) if buckets[i] != buckets[i - 1]]

        def group_cost(i, j):   # rows dec[i:j] as one program
            return min(_bucket(j - i, floor=1), self.B) * buckets[i]

        best = (group_cost(0, len(dec)), [])
        from itertools import combinations
        for k in (1, 2):
            for cs in combinations(cuts, k):
                edges = [0, *cs, len(dec)]
                cost = sum(group_cost(edges[e], edges[e + 1])
                           for e in range(len(edges) - 1)) + k * split_cost
                if cost < best[0]:
                    best = (cost, list(cs))
        edges = [0, *best[1], len(dec)]
        return [dec[edges[e]:edges[e + 1]] for e in range(len(edges) - 1)]

    @staticmethod
    def _gen_vectors(reqs, gen: GenerationParams):
        temps = jnp.asarray(
            [gen.temp if r.temp is None else r.temp for r in reqs],
            jnp.float32)
        top_ps = jnp.asarray(
            [gen.top_p if r.top_p is None else r.top_p for r in reqs],
            jnp.float32)
        top_ks = jnp.asarray(
            [gen.top_k if r.top_k is None else r.top_k for r in reqs],
            jnp.int32)
        return temps, top_ps, top_ks

    # --------------------------------------------------------------- serve

    def serve(
        self,
        requests: List[Request],
        gen: GenerationParams | None = None,
        more=None,
        on_complete=None,
        on_token=None,
        is_aborted=None,
        decision_sync=None,
    ) -> Dict[int, RequestResult]:
        """Run all requests to completion with continuous slot refill.

        ``gen`` provides the default sampling parameters and the EOS rule;
        each request may override temp/top_k/top_p; lengths are per-request.

        ``more``: optional zero-arg callable polled once per scheduling
        iteration for newly-arrived requests (continuous intake — the
        ServingScheduler feeds its live queue through this, so requests
        submitted while a batch decodes join it at the next free slot
        instead of waiting for the whole batch to finish). serve() returns
        once ``more`` yields nothing AND all accepted work has drained.

        ``on_complete``: optional ``f(request_id, RequestResult)`` invoked
        as soon as a request's final token has DRAINED to the host (not
        merely been scheduled) — completion latency instead of batch
        latency for callers awaiting individual requests.

        ``on_token``: optional ``f(request_id, token_id)`` invoked per
        generated token as its drain lands (tokens arrive in bursts of up
        to ``chunk`` per request, ``pipeline`` chunks behind the device —
        streaming with bounded latency, not per-step host sync).

        ``is_aborted``: optional ``f(request_id) -> bool`` polled wherever
        completion is checked; a True answer (one-way: never un-abort)
        stops emission, frees the slot at the next scheduling check, and
        completes the request with whatever drained — so a disconnected
        client stops burning a slot. Queued requests abort without ever
        taking a slot.

        ``decision_sync``: optional ``f(mask: list[bool]) -> list[bool]``
        applied to the per-iteration slot-freeness mask. Multi-controller
        SPMD callers (runtime/dist_serving.py) use it to replicate
        process 0's view — the EOS part of slot freeing reads drained
        token values whose arrival timing is process-local, and a
        divergent mask would make processes launch different global-mesh
        programs (hang/corruption). Everything control-flow- or
        device-input-relevant derives from the synced mask.

        Three mechanisms keep the host off the critical path (a
        device->host fetch costs a ~26-55 ms sync RPC on this runtime,
        ~2-4x a 16-step chunk's device compute):

        1. SCHEDULING-BASED REFILL — a slot is freed as soon as the host
           has *scheduled* enough tokens for its request (first token +
           launched chunks), not when those tokens have drained. The
           remaining in-flight tokens route to the old request via the
           bindings snapshotted at each launch, so refills have zero drain
           latency. Only EOS-based early exit (and nothing else) depends
           on drained token values, and acts a few chunks late.
        2. THREADED DRAINS — each chunk's token block is fetched by a
           small fetcher POOL (the fetch RPC releases the GIL and
           parallelizes ~linearly across threads; one thread still
           serializes ~35-70 ms RPCs) and emitted strictly in launch order
           through a reorder buffer. Profiling showed inline drains capped
           aggregate serving at almost exactly chunk_tokens/RPC
           (~3,600 tok/s at B=8, chunk=16) while the device needed only
           ~10 ms/chunk. ``on_token``/``on_complete`` callbacks fire from
           the fetcher threads.
        3. ASYNC COPIES — each fetch is additionally started with a
           launch-time ``copy_to_host_async`` so the drain thread's RPC
           finds the bytes already in flight.

        ``pipeline`` bounds how many undrained chunks may be outstanding
        (backpressure: the scheduler blocks when the drain thread falls
        more than ~2x that far behind).
        """
        gen = gen or GenerationParams(temp=0.0)
        seed = gen.seed if gen.seed >= 0 else int(time.time())
        rng = jax.random.PRNGKey(seed)
        t_serve = time.perf_counter()
        tokens_before = self.metrics.snapshot()["tokens_emitted"]

        def is_greedy(r: Request) -> bool:
            return (gen.temp if r.temp is None else r.temp) <= 0

        # static sampling shortcut: when every request in this serve() call
        # is greedy, the scan skips the per-step full-vocab top-k entirely.
        # With live intake (`more`) the full set is unknown, so the flag is
        # recomputed per chunk launch from the slots actually bound.
        all_greedy = more is None and all(is_greedy(r) for r in requests)

        queue = list(requests)
        results: Dict[int, RequestResult] = {}
        reqs_by_id: Dict[int, Request] = {}
        # capacity-truncated requests: request_id -> the number of new
        # tokens that will ever drain for it (scheduled before its slot hit
        # the KV-capacity rule). Without this, a truncated request never
        # reaches n_predict/EOS, so on_complete would never fire for it.
        capped: Dict[int, int] = {}
        cache = self.new_cache()

        # host-side request state is shared between this scheduling thread
        # and the drain thread; the lock covers every mutation and every
        # multi-step read of results/reqs_by_id/capped
        import queue as _queue
        import threading

        state_lock = threading.Lock()
        accept_t: Dict[int, float] = {}   # rid -> accept time (monotonic)

        def emit_token(rid: int, tid: int) -> None:
            """Deliver one token (under state_lock). Also the per-request
            latency taps: first generated token = TTFT, completing token =
            end-to-end — measured at DRAIN time (when a caller could see
            the token), not at schedule time."""
            res = results[rid]
            res.ids.append(tid)
            if on_token is not None:
                on_token(rid, tid)
            t0 = accept_t.get(rid)
            if t0 is None:
                return
            now = time.monotonic()
            if len(res.ids) - res.prompt_len == 1:
                self.metrics.observe_latency("ttft", now - t0)
            req = reqs_by_id.get(rid)
            if req is not None and req_done(req):
                accept_t.pop(rid, None)
                self.metrics.observe_latency("e2e", now - t0)

        def notify() -> None:
            """Fire on_complete for requests whose final token has drained.

            Completed requests leave ``reqs_by_id`` (this scan must not
            grow with the total ever served); under live intake (``more``)
            their results are also EVICTED from the returned dict — a
            long-lived serve() otherwise accumulates every past request —
            so with ``more`` + ``on_complete`` the callback is the one
            delivery channel. Runs on the drain thread; callbacks fire
            outside the state lock.
            """
            if on_complete is None:
                return
            with state_lock:
                done_ids = [rid for rid, req in reqs_by_id.items()
                            if req_done(req)]
                done = []
                for rid in done_ids:
                    del reqs_by_id[rid]
                    done.append((rid, results[rid]))
                    if more is not None:
                        results.pop(rid)
                        capped.pop(rid, None)
            self.metrics.inc("requests_completed", len(done))
            for rid, res in done:
                on_complete(rid, res)

        # host-side slot table
        slot_req: List[Optional[Request]] = [None] * self.B
        lengths_host = [0] * self.B   # device position mirror (prompt+decoded)
        sched_new = [0] * self.B      # tokens SCHEDULED for the slot's request
        fresh_slots: List[int] = []   # refilled since the last chunk launch

        # ---- drain fetcher pool: the device->host fetch is a ~35-70 ms
        # sync RPC on this runtime but PARALLELIZES almost perfectly across
        # threads (4 threads measured ~8.7x one), and each fetch releases
        # the GIL — so a small pool keeps the RPC latency entirely off the
        # scheduling thread AND off each other's critical path. Fetched
        # chunks are emitted strictly in launch order through a reorder
        # buffer (token order per request must be preserved). maxsize gives
        # backpressure: the scheduler stalls only when the fetchers fall
        # well behind.
        # pool/queue sizing: one fetch RPC costs ~70 ms of pure latency on
        # this relay regardless of payload, and a chunk computes in ~10 ms,
        # so the pool must hold several RPCs in flight per chunk-time and
        # the queue must not stall the scheduler while they land (measured:
        # 4 fetchers + maxsize 5 left the device idling on backpressure)
        n_fetchers = 2 * self.pipeline + 4
        drain_q: "_queue.Queue" = _queue.Queue(maxsize=2 * n_fetchers)
        drain_errors: List[BaseException] = []
        emit_cv = threading.Condition()
        done_map: Dict[int, tuple] = {}   # seq -> (vals, bound, fbound)
        next_emit = [0]                   # next seq to emit (under emit_cv)
        launched = [0]                    # chunks handed to the pool
        last_land = [time.monotonic()]    # watchdog: last drain landing

        def emit_chunk(seq, vals, bound, fbound) -> None:
            """Emit one fetched chunk against the bindings snapshotted at
            its launch. ``req_done`` re-checks per token so n_predict/EOS
            cut emission mid-chunk. The trailing health lane (the chunk's
            on-device finite check over live slots) fails the whole serve
            BEFORE any of its tokens are delivered."""
            if self.health_check and int(vals[-1]) == 0:
                self.metrics.inc("health_failures")
                raise ModelHealthError(
                    f"non-finite logits in decode chunk {seq} (live slots: "
                    f"{[b for b in range(self.B) if bound[b] is not None]})")
            firsts = vals[:self.B]
            block = vals[self.B:self.B + self.chunk * self.B].reshape(
                self.chunk, self.B)
            emitted = 0
            with state_lock:
                for b in range(self.B):
                    if fbound[b] is not None and not req_done(fbound[b]):
                        emit_token(fbound[b].request_id, int(firsts[b]))
                        emitted += 1
                for step_row in block:
                    for b in range(self.B):
                        req = bound[b]
                        if req is not None and not req_done(req):
                            emit_token(req.request_id, int(step_row[b]))
                            emitted += 1
            self.metrics.inc("tokens_emitted", emitted)

        def drain_worker() -> None:
            while True:
                item = drain_q.get()
                try:
                    if item is None:
                        return
                    seq, fetch, bound, fbound = item
                    # np.asarray blocks (GIL released): a full RPC unless
                    # the launch-time copy_to_host_async already landed
                    vals = np.asarray(fetch)
                    self.metrics.inc("drains_landed")
                    last_land[0] = time.monotonic()
                    with emit_cv:
                        done_map[seq] = (vals, bound, fbound)
                        while next_emit[0] in done_map:
                            s = next_emit[0]
                            emit_chunk(s, *done_map.pop(s))
                            next_emit[0] += 1
                        emit_cv.notify_all()
                    notify()
                except BaseException as e:  # surfaced by the scheduler loop
                    drain_errors.append(e)
                    with emit_cv:
                        emit_cv.notify_all()
                finally:
                    drain_q.task_done()

        drain_threads = [
            threading.Thread(target=drain_worker, name=f"biogpt-drain-{i}",
                             daemon=True)
            for i in range(n_fetchers)]
        for t in drain_threads:
            t.start()

        def flush_drains() -> None:
            """Wait until every launched chunk has drained AND emitted (EOS
            bookkeeping and final tokens depend on it); re-raise errors.
            With ``watchdog_s`` set, a drain pool that stops landing chunks
            for that long (hung device / dead relay) raises DrainStallError
            instead of hanging every client forever."""
            deadline_base = time.monotonic()
            with emit_cv:
                while next_emit[0] < launched[0] and not drain_errors:
                    emit_cv.wait(timeout=0.1)
                    if self.watchdog_s is not None:
                        quiet = time.monotonic() - max(last_land[0],
                                                       deadline_base)
                        if quiet > self.watchdog_s:
                            raise DrainStallError(
                                f"no decode chunk drained for {quiet:.1f}s "
                                f"(watchdog {self.watchdog_s}s): "
                                f"{next_emit[0]}/{launched[0]} chunks "
                                f"emitted")
            if drain_errors:
                raise drain_errors[0]

        toks = jnp.zeros((self.B, 1), jnp.int32)
        lengths = jnp.zeros((self.B,), jnp.int32)
        # per-slot sampling params live on device; inactive slots keep
        # whatever params they had (their tokens are never emitted)
        temps = jnp.zeros((self.B,), jnp.float32)
        top_ps = jnp.ones((self.B,), jnp.float32)
        top_ks = jnp.ones((self.B,), jnp.int32)
        # prefill-sampled first tokens stay on device; they ride along with
        # the next drain (a device->host transfer per refill would dominate)
        first_buf = jnp.zeros((self.B,), jnp.int32)

        def req_done(req: Optional[Request]) -> bool:
            """Request complete: n_predict reached, EOS emitted, or the
            caller aborted it (``is_aborted`` — a disconnected client must
            not keep burning a slot).

            Monotonic (a done request never becomes live again; aborts are
            one-way), which is what makes draining against a launch-time
            snapshot safe.
            """
            if req is None:
                return True
            if is_aborted is not None and is_aborted(req.request_id):
                return True
            res = results.get(req.request_id)
            if res is None:   # completed and evicted (live-intake mode)
                return True
            n_new = len(res.ids) - res.prompt_len
            cap = capped.get(req.request_id)
            if cap is not None and n_new >= cap:
                return True   # capacity-truncated: all its tokens drained
            if n_new >= req.n_predict:
                return True
            return (gen.stop_at_eos and n_new > 0
                    and res.ids[-1] == gen.eos_token_id)

        def slot_free(slot: int) -> bool:
            """Slot can take a new request.

            Free when (a) enough tokens are SCHEDULED for its request (the
            tail is still in flight and drains to the old request via the
            launch snapshots), (b) the KV capacity can't fit another full
            chunk (the request truncates — lengths_host mirrors the DEVICE
            position, so the next chunk would write cache rows
            [pos, pos+chunk)), or (c) the drained results show the request
            done early (EOS) — information that arrives ``pipeline`` chunks
            late."""
            req = slot_req[slot]
            if req is None:
                return True
            if sched_new[slot] >= req.n_predict:
                return True
            if lengths_host[slot] + self.chunk > self.max_seq:
                return True
            return req_done(req)

        def assign_slots(free_slots: List[int], reqs: List[Request]):
            """Map accepted requests onto free slots, length-affine at KV-
            group granularity (best-fit decreasing).

            With group-clamped KV streaming (``kv_groups``) the KV bytes a
            chunk reads are the sum of per-GROUP windows, so WHERE a long
            request sits matters: packing longs into the group that is
            already tallest keeps the other groups' windows short. Each
            request's expected final length (prompt + n_predict) is placed
            into the group whose running max grows least; among groups it
            already fits, the tightest (best fit). Without grouping the
            assignment is the old first-free-slot order."""
            G = self._kv_groups
            if not G or not reqs:
                return list(zip(free_slots, reqs))
            GB = self.B // G
            cur_max = [0] * G
            for b in range(self.B):
                if slot_req[b] is not None:   # freed slots were cleared
                    g = b // GB
                    cur_max[g] = max(cur_max[g], lengths_host[b])
            free_by_g: Dict[int, List[int]] = {}
            for s in sorted(free_slots):
                free_by_g.setdefault(s // GB, []).append(s)
            order = sorted(
                reqs, key=lambda r: -(len(r.prompt_ids) + r.n_predict))
            pairs = []
            for req in order:
                rlen = min(len(req.prompt_ids) + req.n_predict,
                           self.max_seq)
                best_g, best_key = None, None
                for g, slots in free_by_g.items():
                    if not slots:
                        continue
                    inc = max(cur_max[g], rlen) - cur_max[g]
                    key = (inc, cur_max[g])
                    if best_key is None or key < best_key:
                        best_g, best_key = g, key
                slot = free_by_g[best_g].pop(0)
                cur_max[best_g] = max(cur_max[best_g], rlen)
                pairs.append((slot, req))
            return pairs

        def refill(free_slots: List[int]):
            """Fill free slots from the queue with one batched prefill per
            prompt bucket."""
            nonlocal cache, toks, lengths, rng, first_buf
            nonlocal temps, top_ps, top_ks
            accepted: List[Request] = []
            n_reg = 0
            with state_lock:   # notify() iterates/evicts these dicts
                while queue:
                    req = queue.pop(0)
                    n_reg += 1
                    results[req.request_id] = RequestResult(
                        request_id=req.request_id, ids=list(req.prompt_ids),
                        prompt_len=len(req.prompt_ids))
                    reqs_by_id[req.request_id] = req
                    accept_t[req.request_id] = time.monotonic()
                    if (is_aborted is not None
                            and is_aborted(req.request_id)):
                        # aborted while queued: registered (so notify()
                        # completes its future with an empty result) but
                        # never given a slot or a prefill
                        continue
                    if len(accepted) == len(free_slots):
                        queue.insert(0, req)
                        del reqs_by_id[req.request_id]
                        del results[req.request_id]
                        accept_t.pop(req.request_id, None)
                        n_reg -= 1
                        break
                    accepted.append(req)
            pairs = assign_slots(free_slots, accepted)
            self.metrics.inc("requests_accepted", n_reg)
            if not pairs:
                return []
            # Length-bucketed programs per refill wave. Round 2 measured a
            # per-bucket split WORSE on the uniform workload (every program
            # pays the full packed-weight dequant traffic, ~3-4 ms device,
            # and uniform prompts share a bucket anyway) — but on MIXED
            # waves one 512-bucket prompt forced every 8-token prompt to
            # pad 64x, and the wasted prefill FLOPs dwarf an extra
            # program's weight traffic. _split_refill_groups balances the
            # two costs exactly; uniform waves still yield ONE program.
            # Bucket shapes stay the same power-of-two family either way,
            # so no extra programs compile.
            refilled = []
            for gp in self._split_refill_groups(pairs):
                self.metrics.inc("refill_programs", 1)
                slot_state = (toks, lengths, first_buf, temps, top_ps,
                              top_ks)
                cache, slot_state, lens, rng = self._prefill_group(
                    gp, cache, rng, gen, slot_state)
                (toks, lengths, first_buf, temps, top_ps, top_ks) = \
                    slot_state
                for r, (slot, req) in enumerate(gp):
                    slot_req[slot] = req
                    lengths_host[slot] = lens[r]
                    sched_new[slot] = 1   # the prefill-sampled first token
                    fresh_slots.append(slot)
                    refilled.append(slot)
            return refilled

        try:
            drained_once = False
            while True:
                if drain_errors:
                    raise drain_errors[0]
                if more is not None:
                    queue.extend(more())
                # a slot at the KV-capacity rule schedules no further chunks:
                # cap its request at the already-scheduled count so req_done /
                # notify treat it as complete once those tokens drain
                with state_lock:
                    for b in range(self.B):
                        req = slot_req[b]
                        if (req is not None
                                and lengths_host[b] + self.chunk > self.max_seq
                                and sched_new[b] < req.n_predict):
                            capped.setdefault(req.request_id, sched_new[b])
                # ONE slot-freeness decision per scheduling iteration. The
                # EOS part of slot_free reads DRAINED results whose arrival
                # time is process-local — under multi-controller SPMD
                # (runtime/dist_serving.py) that would diverge the global-
                # mesh program sequence across processes, so the caller may
                # supply ``decision_sync`` to replicate process 0's view.
                # Everything control-flow- or device-input-relevant below
                # (refill, the done check, the live mask, sched_new) derives
                # from this one mask.
                free_mask = [slot_free(b) for b in range(self.B)]
                if decision_sync is not None:
                    free_mask = decision_sync(free_mask)
                # refill free slots (one batched prefill per wave); freeing is
                # scheduling-based, so n_predict-terminated requests refill
                # with ZERO drain latency (only EOS early-exit lags)
                free = [b for b in range(self.B) if queue and free_mask[b]]
                # refill hysteresis (A/B, VERDICT r4 #7): with >1, small
                # refills defer until that many slots are free, batching
                # staggered completions into fewer/fuller refill programs
                # (each pays the full packed-weight dequant traffic) at the
                # cost of slots idling meanwhile. Never defers when nothing
                # is busy (the batch would stall forever).
                min_refill = int(os.environ.get("BIOGPT_REFILL_MIN", "1"))
                if (free and len(free) < min_refill
                        and not all(free_mask)):
                    free = []
                for b in free:
                    slot_req[b] = None
                refilled = refill(free)
                busy = [(not free_mask[b]) or b in refilled
                        for b in range(self.B)]

                if not any(busy):
                    if not drained_once:
                        # all scheduled: wait for the drain thread to land the
                        # in-flight chunks (their values may reveal EOS for the
                        # bookkeeping), then re-check once
                        flush_drains()
                        drained_once = True
                        continue
                    drained_once = False
                    if fresh_slots:
                        # prompt filled the cache to within one chunk: no decode
                        # chunk will run, but the prefill-sampled first token is
                        # still owed
                        vals = np.asarray(first_buf)
                        with state_lock:
                            for b in fresh_slots:
                                if not req_done(slot_req[b]):
                                    emit_token(slot_req[b].request_id,
                                               int(vals[b]))
                        fresh_slots.clear()
                        notify()
                        continue
                    break
                drained_once = False

                # decode a chunk in lockstep under ONE scan dispatch (per-step
                # dispatch + argument binding dominates otherwise); inactive
                # slots compute garbage that the host simply doesn't emit
                # (their device positions reset to 0 at launch — see
                # step_scan — so they can't inflate the window buckets).
                # floor 128: a 64 floor was measured (round 3) and bought
                # nothing — the B=8 step is not KV-bandwidth-bound below
                # ~128 live rows — so the extra compiled scan per serve
                # shape isn't paid for. The bucket covers BOUND slots only
                # (round 5): before this, one drained-but-unrefilled slot's
                # ratcheting host mirror pinned every chunk at the max
                # window for the rest of the serve.
                bound_lens = [lengths_host[b] for b in range(self.B)
                              if busy[b]]
                window = min(_bucket(max(bound_lens) + self.chunk,
                                     floor=128), self.max_seq)
                # live intake always runs the per-request sampler (it handles
                # greedy rows): flipping the static all_greedy flag when a
                # sampled request joined a greedy batch would stall EVERY
                # in-flight request on a 20-40 s remote compile per window
                greedy_now = all_greedy if more is None else False
                # launch-time binding snapshot (also the kernel's live
                # mask — a DEVICE INPUT, so it derives from the synced
                # free_mask: only bound slots' logits are health-checked;
                # free slots compute garbage by design)
                bound = [slot_req[b] if busy[b] else None
                         for b in range(self.B)]
                live = jnp.asarray([r is not None for r in bound])
                # ONE program per chunk; its ``fetch`` output carries first
                # tokens + the whole chunk block + the chunk's health bit.
                # Slots already free at launch snapshot as unbound so their
                # garbage lanes can't reach a truncated request.
                use_fused = self._use_fused()
                # chunk-local KV staging: megakernel lockstep only (the
                # int8 cache would need staged scales; paged streams
                # per-slot; B=1 pays only 2 writes/step anyway)
                staged = (self._staged_kv and use_fused and self.B > 1
                          and not self._paged_kv
                          and self.cache_dtype == jnp.bfloat16)
                toks, cache, lengths, rng, fetch = self._step_scan(
                    self.params, toks, cache, lengths, rng, temps, top_ps,
                    top_ks, first_buf, live, n_steps=self.chunk,
                    kv_window=window, use_fused=use_fused,
                    all_greedy=greedy_now, staged=staged)
                try:
                    # start the device->host copy NOW (behind this chunk only);
                    # by drain time next iteration it is already in flight
                    fetch.copy_to_host_async()
                except Exception:   # pragma: no cover - backend-dependent
                    pass
                for b in range(self.B):
                    if bound[b] is not None:
                        sched_new[b] += self.chunk
                # firsts bind separately: a fresh slot whose prompt fills the
                # cache to within one chunk has no valid chunk lanes but is
                # still owed its prefill-sampled first token
                fbound = [slot_req[b] if b in fresh_slots else None
                          for b in range(self.B)]
                fresh_slots.clear()
                # hand the fetch to the drain pool (blocks only when the
                # fetchers have fallen 2*pipeline chunks behind)
                drain_q.put((launched[0], fetch, bound, fbound))
                launched[0] += 1
                self.metrics.inc("chunks_launched")
                for b in range(self.B):
                    lengths_host[b] += self.chunk
        finally:
            # always stop the drain pool (a long-lived scheduler
            # would otherwise leak blocked threads per failure)
            for _ in drain_threads:
                drain_q.put(None)
            for t in drain_threads:
                t.join()
        if drain_errors:
            raise drain_errors[0]
        notify()
        if on_complete is None:
            # no callback: notify() never ran its completion scan
            self.metrics.inc("requests_completed", len(results))
        self.metrics.serve_finished(
            time.perf_counter() - t_serve,
            self.metrics.snapshot()["tokens_emitted"] - tokens_before)
        return results


class ServingScheduler:
    """Long-lived continuous-batching front over one :class:`BatchedEngine`.

    ``submit()`` from any thread returns a ``concurrent.futures.Future``; a
    dedicated worker thread keeps a ``serve()`` loop fed through its live-
    intake hook, so requests submitted while a batch is decoding join it at
    the next free slot (true continuous batching, not wave batching), and
    each future resolves as soon as its request's final token drains.

    The reference processes one prompt per process invocation
    (/root/reference/main.cpp); this is north-star serving scope.
    """

    def __init__(self, engine: BatchedEngine,
                 gen: GenerationParams | None = None,
                 poll_s: float = 0.05):
        import queue as _queue
        import threading

        self.engine = engine
        self.gen = gen or GenerationParams(temp=0.0)
        self._queue: "_queue.Queue" = _queue.Queue()
        self._aborted: set = set()   # one-way; GIL-atomic add/contains
        self._next_id = 0
        # guards _stop vs submit: without it a submit could pass the closed
        # check, close()'s worker could exit on an empty queue, and the
        # late-enqueued future would hang forever
        self._lock = threading.Lock()
        self._poll_s = poll_s
        self._stop = False
        self._wake = threading.Event()
        self._thread = threading.Thread(
            target=self._run, name="biogpt-serving", daemon=True)
        self._thread.start()

    def submit(self, prompt_ids: List[int], n_predict: int = 64,
               temp: Optional[float] = None, top_k: Optional[int] = None,
               top_p: Optional[float] = None, on_token=None):
        """Enqueue one generation; returns a Future[RequestResult].

        ``on_token``: optional ``f(token_id)`` streamed per generated token
        (called from the worker thread, in bursts as drains land)."""
        from concurrent.futures import Future

        fut: Future = Future()
        with self._lock:
            if self._stop:
                raise RuntimeError("scheduler is closed")
            rid = self._next_id
            self._next_id += 1
            req = Request(prompt_ids=list(prompt_ids), n_predict=n_predict,
                          request_id=rid, temp=temp, top_k=top_k, top_p=top_p)
            self._queue.put((req, fut, on_token))
        fut.request_id = rid   # for abort() by callers holding the future
        self._wake.set()
        return fut

    def abort(self, request_id: int) -> None:
        """Stop generating for a submitted request (one-way; idempotent).

        The request's slot frees at the next scheduling check and its
        Future resolves with whatever tokens had drained (possibly none) —
        the mechanism behind client-disconnect cleanup: an abandoned
        stream must not keep burning a batch slot to n_predict."""
        if request_id not in self._aborted:
            self._aborted.add(request_id)
            self.engine.metrics.inc("requests_aborted")
        self._wake.set()

    def stats(self) -> dict:
        """Live observability snapshot (served by ``GET /stats``): the
        engine's ServingMetrics counters plus this scheduler's queue
        depth and in-flight request count."""
        out = self.engine.metrics.snapshot()
        out["queued"] = self._queue.qsize()
        out["in_flight"] = max(
            0, out["requests_accepted"] - out["requests_completed"])
        out["batch_slots"] = self.engine.B
        out["closed"] = self._stop
        return out

    def close(self, timeout: Optional[float] = 30.0) -> None:
        """Stop accepting work; wait for in-flight requests to finish."""
        with self._lock:
            self._stop = True
        self._wake.set()
        self._thread.join(timeout=timeout)
        # fail (rather than hang) anything still queued when the worker died
        for _, fut, _ in self._take_pending():
            fut.set_exception(RuntimeError("scheduler closed"))

    # ------------------------------------------------------------- worker

    def _take_pending(self):
        import queue as _queue

        out = []
        while True:
            try:
                out.append(self._queue.get_nowait())
            except _queue.Empty:
                return out

    def _run(self) -> None:
        while True:
            self._wake.wait(timeout=self._poll_s)
            self._wake.clear()
            batch = self._take_pending()
            if not batch:
                if self._stop:
                    return
                continue
            futures = {req.request_id: fut for req, fut, _ in batch}
            streams = {req.request_id: cb for req, _, cb in batch
                       if cb is not None}

            def more():
                extra = self._take_pending()
                for req, fut, cb in extra:
                    futures[req.request_id] = fut
                    if cb is not None:
                        streams[req.request_id] = cb
                return [req for req, _, _ in extra]

            def on_complete(rid, result):
                streams.pop(rid, None)
                # completed ids never recur (monotonic id allocation), so
                # the abort set can forget them — a long-lived server with
                # disconnect-heavy traffic must not grow it unboundedly
                self._aborted.discard(rid)
                fut = futures.pop(rid, None)
                if fut is not None:
                    fut.set_result(result)

            def on_token(rid, tid):
                cb = streams.get(rid)
                if cb is not None:
                    cb(tid)

            try:
                results = self.engine.serve(
                    [req for req, _, _ in batch], self.gen,
                    more=more, on_complete=on_complete, on_token=on_token,
                    is_aborted=self._aborted.__contains__)
                for rid, fut in list(futures.items()):
                    # safety net: every request must have been notified;
                    # resolve-or-fail so no waiter can hang
                    if rid in results:
                        fut.set_result(results[rid])
                    else:
                        fut.set_exception(RuntimeError(
                            f"request {rid} not completed by serve()"))
                    futures.pop(rid)
            except Exception as e:   # propagate to waiters, keep serving
                for fut in futures.values():
                    fut.set_exception(e)
