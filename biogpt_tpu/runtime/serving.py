"""Continuous-batching serving engine.

The reference decodes strictly batch=1 sequentially (SURVEY §2.1 — no
batched serving exists). This engine is the TPU-native replacement: a fixed
pool of B cache slots decodes in lockstep with per-slot positions; finished
slots are refilled from the request queue without stopping the batch
(continuous batching). All per-slot state — positions, done flags, sampled
tokens — lives on device; the host only drains a token block once per chunk
and schedules refills.

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
from .sampling import greedy, sample_top_k_top_p


@dataclass
class Request:
    prompt_ids: List[int]
    n_predict: int = 64
    request_id: int = 0


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

    def __init__(
        self,
        config: BioGptConfig,
        params,
        max_batch: int = 8,
        compute_dtype=jnp.bfloat16,
        cache_dtype=jnp.float16,
        max_seq: Optional[int] = None,
        chunk: int = 16,
    ):
        self.config = config
        self.B = max_batch
        self.compute_dtype = compute_dtype
        self.cache_dtype = cache_dtype
        self.max_seq = max_seq or config.n_positions
        self.chunk = chunk
        self.params = jax.device_put(params)

        static = ("config", "compute_dtype", "causal", "logits_mode",
                  "allow_pallas")

        self._prefill_one = jax.jit(
            forward, static_argnames=static, donate_argnames=("cache",))

        def insert_slot(big: KVCache, small: KVCache, slot, length):
            """Copy a prefilled single-sequence cache into slot b and set
            its length."""
            zero = jnp.zeros((), jnp.int32)
            idx = (zero, jnp.asarray(slot, jnp.int32), zero, zero)
            return KVCache(
                k=jax.lax.dynamic_update_slice(big.k, small.k, idx),
                v=jax.lax.dynamic_update_slice(big.v, small.v, idx),
            )

        self._insert_slot = jax.jit(insert_slot, donate_argnames=("big",))

        def batched_step(params, toks, cache, lengths, rng, temp, top_p,
                         out_buf, out_ix, *, top_k: int, use_greedy: bool):
            """One lockstep decode step over all B slots.

            toks (B, 1); lengths (B,) per-slot positions; tokens land in
            out_buf[out_ix] (a (chunk, B) device ring the host drains).
            """
            logits, cache = forward(
                params, toks, cache, lengths, self.config,
                compute_dtype=self.compute_dtype,
                allow_pallas=False, logits_mode="last")
            if use_greedy:
                nxt = greedy(logits)
            else:
                rng, sub = jax.random.split(rng)
                nxt = sample_top_k_top_p(sub, logits, top_k=top_k,
                                         top_p=top_p, temp=temp)
            out_buf = jax.lax.dynamic_update_slice(
                out_buf, nxt[None, :], (out_ix, jnp.zeros((), jnp.int32)))
            return (nxt[:, None], cache, lengths + 1, rng, out_buf,
                    out_ix + 1)

        self._step = jax.jit(
            batched_step, static_argnames=("top_k", "use_greedy"),
            donate_argnames=("cache", "out_buf"))

    def new_cache(self) -> KVCache:
        return init_cache(self.config, batch=self.B, max_len=self.max_seq,
                          dtype=self.cache_dtype)

    def _prefill_request(self, req: Request, cache: KVCache, slot: int,
                         rng, gen: GenerationParams) -> tuple:
        """Prefill one request on a temp batch=1 cache and insert at slot.

        Returns (cache, first_token (1,1) array, length, rng). The first
        token is sampled with the same temp/top_k/top_p as decode steps
        (greedy only when gen.temp <= 0) — matching Engine.generate."""
        ids = np.asarray(req.prompt_ids, dtype=np.int32)[None, :]
        n = ids.shape[1]
        small = init_cache(self.config, batch=1, max_len=self.max_seq,
                           dtype=self.cache_dtype)
        logits, small = self._prefill_one(
            self.params, jnp.asarray(ids), small, jnp.int32(0), self.config,
            compute_dtype=self.compute_dtype, allow_pallas=False,
            logits_mode="last", last_index=jnp.int32(n - 1))
        cache = self._insert_slot(cache, small, slot, n)
        if gen.temp <= 0:
            first = greedy(logits)[:, None]
        else:
            rng, sub = jax.random.split(rng)
            first = sample_top_k_top_p(sub, logits, top_k=gen.top_k,
                                       top_p=gen.top_p, temp=gen.temp)[:, None]
        return cache, first, n, rng

    def serve(
        self,
        requests: List[Request],
        gen: GenerationParams | None = None,
    ) -> Dict[int, RequestResult]:
        """Run all requests to completion with continuous slot refill.

        Sampling parameters (temp/top_k/top_p/eos) come from ``gen`` and are
        shared across the batch; lengths are per-request.
        """
        gen = gen or GenerationParams(temp=0.0)
        use_greedy = gen.temp <= 0
        seed = gen.seed if gen.seed >= 0 else int(time.time())
        rng = jax.random.PRNGKey(seed)
        temp = jnp.float32(max(gen.temp, 1e-8))
        top_p = jnp.float32(gen.top_p)

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
        # prefill-sampled first tokens stay on device; they ride along with
        # the next drain (a device->host transfer per refill would dominate)
        first_buf = jnp.zeros((self.B,), jnp.int32)

        def refill(slot: int):
            nonlocal cache, toks, lengths, rng, first_buf
            req = queue.pop(0)
            results[req.request_id] = RequestResult(
                request_id=req.request_id, ids=list(req.prompt_ids),
                prompt_len=len(req.prompt_ids))
            cache, first_tok, n, rng = self._prefill_request(
                req, cache, slot, rng, gen)
            slot_req[slot] = req
            slot_emitted[slot] = 0
            lengths_host[slot] = n
            toks = toks.at[slot].set(first_tok[0])
            lengths = lengths.at[slot].set(n)
            first_buf = first_buf.at[slot].set(first_tok[0, 0])
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
            # refill free slots
            for b in range(self.B):
                if queue and slot_done(b):
                    slot_req[b] = None
                    refill(b)

            if all(slot_done(b) for b in range(self.B)):
                break

            # decode a chunk in lockstep; inactive slots compute garbage
            # that the host simply doesn't emit
            out_buf = jnp.zeros((self.chunk, self.B), jnp.int32)
            out_ix = jnp.int32(0)
            for _ in range(self.chunk):
                toks, cache, lengths, rng, out_buf, out_ix = self._step(
                    self.params, toks, cache, lengths, rng, temp, top_p,
                    out_buf, out_ix, top_k=gen.top_k, use_greedy=use_greedy)
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
