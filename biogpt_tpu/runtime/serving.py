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

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BioGptConfig, GenerationParams
from ..models.biogpt import forward
from .cache import KVCache, init_cache
from .sampling import sample_per_request


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
        cache_dtype=jnp.float16,
        max_seq: Optional[int] = None,
        chunk: int = 16,
        pack_q4: bool = True,
    ):
        self.config = config
        self.B = max_batch
        self.compute_dtype = compute_dtype
        self.cache_dtype = cache_dtype
        self.max_seq = max_seq or config.n_positions
        self.chunk = chunk
        if pack_q4:
            from .engine import _pack_matmul_weights
            params = _pack_matmul_weights(params)
        self.params = jax.device_put(params)
        # decode shapes (m = B <= 8) ride the packed Pallas kernels; matmul
        # dispatch falls back to XLA for prefill shapes automatically
        self._interpret = jax.default_backend() != "tpu"
        self.allow_pallas = pack_q4 and not self._interpret

        static = ("config", "compute_dtype", "causal", "logits_mode",
                  "allow_pallas")

        self._prefill_jit = jax.jit(
            forward, static_argnames=static, donate_argnames=("cache",))

        def insert_slots(big: KVCache, small: KVCache, slots):
            """Copy prefilled rows of a batched temp cache into their slots.

            slots: static tuple of slot indices; row r of ``small`` goes to
            slot slots[r]. Unrolled — refill groups are <= B rows."""
            zero = jnp.zeros((), jnp.int32)
            k, v = big.k, big.v
            for r, slot in enumerate(slots):
                idx = (zero, jnp.asarray(slot, jnp.int32), zero, zero)
                k = jax.lax.dynamic_update_slice(k, small.k[:, r:r + 1], idx)
                v = jax.lax.dynamic_update_slice(v, small.v[:, r:r + 1], idx)
            return KVCache(k=k, v=v)

        self._insert_slots = jax.jit(
            insert_slots, static_argnames=("slots",), donate_argnames=("big",))

        def batched_step(params, toks, cache, lengths, rng, temps, top_ps,
                         top_ks, out_buf, out_ix):
            """One lockstep decode step over all B slots.

            toks (B, 1); lengths (B,) per-slot positions; temps/top_ps/
            top_ks (B,) per-request sampling params; tokens land in
            out_buf[out_ix] (a (chunk, B) device ring the host drains).
            """
            logits, cache = forward(
                params, toks, cache, lengths, self.config,
                compute_dtype=self.compute_dtype,
                allow_pallas=self.allow_pallas, logits_mode="last")
            rng, sub = jax.random.split(rng)
            nxt = sample_per_request(sub, logits, top_ks, top_ps, temps,
                                     max_top_k=self.MAX_TOP_K)
            out_buf = jax.lax.dynamic_update_slice(
                out_buf, nxt[None, :], (out_ix, jnp.zeros((), jnp.int32)))
            return (nxt[:, None], cache, lengths + 1, rng, out_buf,
                    out_ix + 1)

        self._step = jax.jit(
            batched_step, donate_argnames=("cache", "out_buf"))

    def new_cache(self) -> KVCache:
        return init_cache(self.config, batch=self.B, max_len=self.max_seq,
                          dtype=self.cache_dtype)

    # ------------------------------------------------------------- prefill

    def _prefill_group(self, pairs, cache: KVCache, rng, gen):
        """Prefill several (slot, request) pairs as ONE batched forward.

        All prompts pad to the group's bucket; per-row last_index extracts
        each prompt's real final logits. Returns (cache, first_tokens (n,),
        lengths (n,), rng) — first tokens sampled with each request's own
        params.
        """
        slots = tuple(slot for slot, _ in pairs)
        lens = [len(req.prompt_ids) for _, req in pairs]
        n = len(pairs)
        padded = min(_bucket(max(lens)), self.max_seq)
        ids = np.zeros((n, padded), dtype=np.int32)
        for r, (_, req) in enumerate(pairs):
            ids[r, :lens[r]] = req.prompt_ids
        small = init_cache(self.config, batch=n, max_len=self.max_seq,
                           dtype=self.cache_dtype)
        logits, small = self._prefill_jit(
            self.params, jnp.asarray(ids), small, jnp.int32(0), self.config,
            compute_dtype=self.compute_dtype, allow_pallas=False,
            logits_mode="last",
            last_index=jnp.asarray(np.asarray(lens) - 1, jnp.int32))
        cache = self._insert_slots(cache, small, slots)
        temps, top_ps, top_ks = self._gen_vectors(
            [req for _, req in pairs], gen)
        rng, sub = jax.random.split(rng)
        firsts = sample_per_request(sub, logits, top_ks, top_ps, temps,
                                    max_top_k=self.MAX_TOP_K)
        return cache, firsts, lens, rng

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
    ) -> Dict[int, RequestResult]:
        """Run all requests to completion with continuous slot refill.

        ``gen`` provides the default sampling parameters and the EOS rule;
        each request may override temp/top_k/top_p; lengths are per-request.
        """
        gen = gen or GenerationParams(temp=0.0)
        seed = gen.seed if gen.seed >= 0 else int(time.time())
        rng = jax.random.PRNGKey(seed)

        queue = list(requests)
        results: Dict[int, RequestResult] = {}
        cache = self.new_cache()

        # host-side slot table
        slot_req: List[Optional[Request]] = [None] * self.B
        slot_emitted = [0] * self.B
        lengths_host = [0] * self.B
        fresh_slots: List[int] = []   # refilled since the last drain

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

        def refill(free_slots: List[int]):
            """Fill free slots from the queue with one batched prefill per
            prompt bucket."""
            nonlocal cache, toks, lengths, rng, first_buf
            nonlocal temps, top_ps, top_ks
            pairs = []
            for slot in free_slots:
                if not queue:
                    break
                req = queue.pop(0)
                results[req.request_id] = RequestResult(
                    request_id=req.request_id, ids=list(req.prompt_ids),
                    prompt_len=len(req.prompt_ids))
                pairs.append((slot, req))
            if not pairs:
                return
            # group by padded bucket so each group is one forward
            by_bucket: Dict[int, list] = {}
            for slot, req in pairs:
                b = _bucket(len(req.prompt_ids))
                by_bucket.setdefault(b, []).append((slot, req))
            for group in by_bucket.values():
                cache, firsts, lens, rng = self._prefill_group(
                    group, cache, rng, gen)
                g_slots = [slot for slot, _ in group]
                g_temps, g_tps, g_tks = self._gen_vectors(
                    [req for _, req in group], gen)
                sl = jnp.asarray(g_slots, jnp.int32)
                toks = toks.at[sl, 0].set(firsts)
                lengths = lengths.at[sl].set(jnp.asarray(lens, jnp.int32))
                first_buf = first_buf.at[sl].set(firsts)
                temps = temps.at[sl].set(g_temps)
                top_ps = top_ps.at[sl].set(g_tps)
                top_ks = top_ks.at[sl].set(g_tks)
                for r, (slot, req) in enumerate(group):
                    slot_req[slot] = req
                    slot_emitted[slot] = 0
                    lengths_host[slot] = lens[r]
                    fresh_slots.append(slot)

        def slot_done(slot: int) -> bool:
            req = slot_req[slot]
            if req is None:
                return True
            if slot_emitted[slot] >= req.n_predict:
                return True
            # Capacity: lengths_host mirrors the DEVICE position (prompt +
            # decoded so far); the next chunk writes cache rows
            # [pos, pos+chunk), so the slot is full once that would overrun.
            # (slot_emitted must NOT be added here — those tokens are already
            # counted inside lengths_host; double-counting truncated requests
            # at roughly half capacity.)
            if lengths_host[slot] + self.chunk > self.max_seq:
                return True
            res = results[req.request_id]
            return (gen.stop_at_eos and len(res.new_ids) > 0
                    and res.new_ids[-1] == gen.eos_token_id)

        while queue or any(not slot_done(b) for b in range(self.B)):
            # refill free slots (one batched prefill per bucket)
            free = [b for b in range(self.B) if queue and slot_done(b)]
            for b in free:
                slot_req[b] = None
            refill(free)

            if all(slot_done(b) for b in range(self.B)):
                break

            # decode a chunk in lockstep; inactive slots compute garbage
            # that the host simply doesn't emit
            out_buf = jnp.zeros((self.chunk, self.B), jnp.int32)
            out_ix = jnp.int32(0)
            for _ in range(self.chunk):
                toks, cache, lengths, rng, out_buf, out_ix = self._step(
                    self.params, toks, cache, lengths, rng, temps, top_ps,
                    top_ks, out_buf, out_ix)
            # ONE transfer fetches first tokens + the whole chunk block
            fetched = np.asarray(jax.block_until_ready(
                jnp.concatenate([first_buf, out_buf.reshape(-1)])))
            firsts, block = fetched[:self.B], fetched[self.B:].reshape(
                self.chunk, self.B)
            for b in fresh_slots:
                self._emit(b, int(firsts[b]), slot_req, slot_emitted,
                           results, gen)
            fresh_slots.clear()
            for step_row in block:
                for b in range(self.B):
                    if not slot_done(b):
                        self._emit(b, int(step_row[b]), slot_req,
                                   slot_emitted, results, gen)
            for b in range(self.B):
                lengths_host[b] += self.chunk

        return results

    @staticmethod
    def _emit(slot, tok_id, slot_req, slot_emitted, results, gen):
        req = slot_req[slot]
        if req is None:
            return
        res = results[req.request_id]
        res.ids.append(tok_id)
        slot_emitted[slot] += 1
