"""Multi-host continuous-batching front: SPMD serving with one front door.

SURVEY §2.1(d) requires continuous batching of generation requests
"across hosts". The execution side already works multi-host — the engine
and :class:`~.serving.BatchedEngine` run SPMD over a global mesh
(tests/_dist_worker.py proves token-identity) — but SPMD means EVERY
process must run the same scheduling decisions on the same request
stream, and real requests arrive at one place (an HTTP port on one
host). This module closes that gap:

- Process 0 is the front door: ``submit()`` returns a
  ``concurrent.futures.Future`` exactly like
  :class:`~.serving.ServingScheduler` (the HTTP server binds to it
  unchanged).
- Every process runs the same serve loop; once per scheduling tick the
  pending requests are replicated with ONE small
  ``broadcast_one_to_all`` (requests encode to a fixed int32 buffer, so
  the collective's shape is static). The engine's scheduling loop is
  deterministic given the intake sequence, so all processes stay in
  lockstep — the same jitted programs with the same global arrays, in
  the same order.
- Generation results are replicated device arrays; process 0 resolves
  futures/streams tokens, workers discard them.

Failure model: fail-fast SPMD (any process error kills the job — the
jax.distributed baseline). The reference has no counterpart
(single-process CPU, /root/reference/main.cpp); north-star scope.
"""

from __future__ import annotations

import threading
import time
from typing import List, Optional

import numpy as np

from ..config import GenerationParams
from .serving import BatchedEngine, Request

# per-request header fields in the broadcast buffer:
# request_id, prompt_len, n_predict, top_k(-1=inherit),
# temp(f32 bits, -1=inherit), top_p(f32 bits, -1=inherit)
_F = 6
_NONE = -1


def _f32_bits(x: float) -> int:
    return int(np.float32(x).view(np.int32))


def _bits_f32(b: int) -> float:
    return float(np.int32(b).view(np.float32))


def _encode(reqs: List[Request], stop: bool, aborts: List[int],
            max_reqs: int, max_prompt: int) -> np.ndarray:
    """[n_reqs, stop, n_aborts] header + abort ids + request rows, flat."""
    buf = np.full((max_reqs, _F + max_prompt), _NONE, np.int32)
    for r, req in enumerate(reqs):
        ids = req.prompt_ids
        buf[r, 0] = req.request_id
        buf[r, 1] = len(ids)
        buf[r, 2] = req.n_predict
        buf[r, 3] = _NONE if req.top_k is None else req.top_k
        buf[r, 4] = _NONE if req.temp is None else _f32_bits(req.temp)
        buf[r, 5] = _NONE if req.top_p is None else _f32_bits(req.top_p)
        buf[r, _F:_F + len(ids)] = ids
    head = np.array([len(reqs), int(stop), len(aborts)], np.int32)
    ab = np.full((max_reqs,), _NONE, np.int32)
    ab[:len(aborts)] = aborts
    return np.concatenate([head, ab, buf.ravel()])


def _decode(flat: np.ndarray, max_reqs: int, max_prompt: int):
    n, stop, n_ab = int(flat[0]), bool(flat[1]), int(flat[2])
    aborts = [int(x) for x in flat[3:3 + max_reqs][:n_ab]]
    buf = flat[3 + max_reqs:].reshape(max_reqs, _F + max_prompt)
    reqs = []
    for r in range(n):
        plen = int(buf[r, 1])
        reqs.append(Request(
            prompt_ids=[int(t) for t in buf[r, _F:_F + plen]],
            n_predict=int(buf[r, 2]),
            request_id=int(buf[r, 0]),
            top_k=None if buf[r, 3] == _NONE else int(buf[r, 3]),
            temp=None if buf[r, 4] == _NONE else _bits_f32(buf[r, 4]),
            top_p=None if buf[r, 5] == _NONE else _bits_f32(buf[r, 5]),
        ))
    return reqs, stop, aborts


class DistributedScheduler:
    """Long-lived multi-host serving loop over one :class:`BatchedEngine`.

    Every process constructs this with the SAME engine configuration and
    calls :meth:`run` (workers block in it; process 0 runs it on an
    internal thread automatically). Process 0 additionally calls
    :meth:`submit` / :meth:`close` — the same surface as
    :class:`~.serving.ServingScheduler`, so ``server.BioGptServer`` works
    on top unchanged.

    ``max_reqs_per_tick`` × ``max_prompt`` fixes the broadcast buffer
    shape (one collective compiles once); ``poll_s`` paces the idle tick
    and doubles up to ``idle_max_s`` while no requests flow (each idle
    tick is a cross-host collective — an idle pod must not broadcast at
    20 Hz forever). The backoff schedule is a pure function of the tick
    outcomes, which every process decodes identically, so the
    collectives stay matched; worst-case added intake latency is one
    ``idle_max_s``.
    """

    def __init__(self, engine: BatchedEngine,
                 gen: GenerationParams | None = None,
                 max_reqs_per_tick: int = 8,
                 max_prompt: Optional[int] = None,
                 poll_s: float = 0.05,
                 idle_max_s: float = 0.5):
        import dataclasses

        import jax

        self.engine = engine
        gen = gen or GenerationParams(temp=0.0)
        # SPMD determinism: every process must use the same sampling seed
        # (serve() falls back to time() for seed<0, which diverges across
        # hosts) — broadcast process 0's choice once at construction.
        # The caller's GenerationParams is never mutated (copied).
        from jax.experimental import multihost_utils
        seed = gen.seed if gen.seed >= 0 else int(time.time())
        self.gen = dataclasses.replace(gen, seed=int(
            multihost_utils.broadcast_one_to_all(np.int32(seed))))
        self.max_reqs = max_reqs_per_tick
        self.max_prompt = max_prompt or engine.max_seq
        self.poll_s = poll_s
        self.idle_max_s = max(idle_max_s, poll_s)
        self._idle_s = poll_s   # current idle sleep (observable in tests)
        self.is_primary = jax.process_index() == 0

        self._lock = threading.Lock()
        self._pending: List = []     # (Request, Future, on_token) — proc 0
        self._pending_aborts: List[int] = []   # proc 0, drained into ticks
        self._abort_set: set = set()  # every process, fed FROM ticks (the
                                      # SPMD loops must agree on aborts)
        self._futures = {}
        self._streams = {}
        self._next_id = 0
        self._stop = False
        self._thread: Optional[threading.Thread] = None
        if self.is_primary:
            self._thread = threading.Thread(
                target=self.run, name="biogpt-dist-serving", daemon=True)
            self._thread.start()

    # ------------------------------------------------------------- intake

    def submit(self, prompt_ids: List[int], n_predict: int = 64,
               temp: Optional[float] = None, top_k: Optional[int] = None,
               top_p: Optional[float] = None, on_token=None):
        """Process 0 only: enqueue one generation -> Future[RequestResult].

        Prompts longer than ``max_prompt`` and floods beyond the tick
        buffer are back-pressured by the fixed broadcast shape (extras
        wait for the next tick)."""
        from concurrent.futures import Future

        if not self.is_primary:
            raise RuntimeError("submit() is process-0 only (the front door)")
        if len(prompt_ids) > self.max_prompt:
            raise ValueError(
                f"prompt ({len(prompt_ids)} tokens) exceeds max_prompt "
                f"({self.max_prompt})")
        fut: Future = Future()
        with self._lock:
            if self._stop:
                raise RuntimeError("scheduler is closed")
            rid = self._next_id
            self._next_id += 1
            req = Request(prompt_ids=list(prompt_ids), n_predict=n_predict,
                          request_id=rid, temp=temp, top_k=top_k,
                          top_p=top_p)
            self._pending.append((req, fut, on_token))
        fut.request_id = rid
        return fut

    def abort(self, request_id: int) -> None:
        """Process 0: stop generating for a request. The abort rides the
        next tick broadcast so every process's SPMD loop frees the slot at
        the same scheduling point (a process-local abort would diverge the
        lockstep); the Future resolves with whatever drained."""
        if not self.is_primary:
            raise RuntimeError("abort() is process-0 only (the front door)")
        with self._lock:
            if (request_id not in self._abort_set
                    and request_id not in self._pending_aborts):
                self._pending_aborts.append(request_id)
                self.engine.metrics.inc("requests_aborted")

    def _tick(self) -> tuple:
        """ONE broadcast: process 0's pending batch (bounded by the tick
        buffer) + the stop flag, replicated to every process. Called at
        the same loop points on all processes (collective)."""
        from jax.experimental import multihost_utils

        taken = []
        if self.is_primary:
            with self._lock:
                take = self._pending[:self.max_reqs]
                del self._pending[:len(take)]
                aborts = self._pending_aborts[:self.max_reqs]
                del self._pending_aborts[:len(aborts)]
                stop = self._stop and not take and not self._pending
                for req, fut, cb in take:
                    self._futures[req.request_id] = fut
                    if cb is not None:
                        self._streams[req.request_id] = cb
                taken = [req for req, _, _ in take]
            flat = _encode(taken, stop, aborts, self.max_reqs,
                           self.max_prompt)
        else:
            flat = _encode([], False, [], self.max_reqs, self.max_prompt)
        flat = np.asarray(multihost_utils.broadcast_one_to_all(flat))
        reqs, stop, aborts = _decode(flat, self.max_reqs, self.max_prompt)
        self._abort_set.update(aborts)   # every process, identically
        return reqs, stop

    # -------------------------------------------------------------- serve

    def run(self) -> None:
        """The SPMD serve loop — every process executes this (workers call
        it directly and block; process 0 runs it on its own thread)."""
        def on_complete(rid, result):
            if not self.is_primary:
                return
            with self._lock:
                self._streams.pop(rid, None)
                fut = self._futures.pop(rid, None)
            if fut is not None and not fut.done():
                try:
                    fut.set_result(result)
                except Exception:   # closed concurrently
                    pass

        def on_token(rid, tid):
            if not self.is_primary:
                return
            cb = self._streams.get(rid)
            if cb is not None:
                cb(tid)

        while True:
            reqs, stop = self._tick()
            if stop:
                return
            if not reqs:
                # idle backoff: sleep doubles toward idle_max_s so an idle
                # cluster stops paying a 20 Hz broadcast; every process
                # derives the same schedule from the same (empty) ticks
                time.sleep(self._idle_s)
                self._idle_s = min(self._idle_s * 2, self.idle_max_s)
                continue
            self._idle_s = self.poll_s

            def more():
                more_reqs, more_stop = self._tick()
                if more_stop:   # close() while serving: drain, then exit
                    self._saw_stop = True
                return more_reqs

            def decision_sync(mask):
                # slot freeing consults DRAINED results (EOS) whose timing
                # is process-local; replicate process 0's view so every
                # process's SPMD loop launches the same program sequence
                from jax.experimental import multihost_utils

                arr = np.asarray(mask, np.int32)
                if not self.is_primary:
                    arr = np.zeros_like(arr)
                out = multihost_utils.broadcast_one_to_all(arr)
                return [bool(v) for v in np.asarray(out)]

            self._saw_stop = False
            try:
                self.engine.serve(reqs, self.gen, more=more,
                                  on_complete=on_complete,
                                  on_token=on_token,
                                  is_aborted=self._abort_set.__contains__,
                                  decision_sync=decision_sync)
            except Exception as e:
                if self.is_primary:
                    with self._lock:
                        futs = list(self._futures.values())
                        self._futures.clear()
                    for fut in futs:
                        fut.set_exception(e)
                raise   # fail-fast SPMD: every process dies together
            if self._saw_stop:
                return

    def stats(self) -> dict:
        """Live observability snapshot (served by ``GET /stats``): the
        engine's ServingMetrics counters plus this front door's queue
        depth and in-flight count (process-0 view)."""
        out = self.engine.metrics.snapshot()
        with self._lock:
            out["queued"] = len(self._pending)
            out["in_flight"] = len(self._futures)
            out["closed"] = self._stop
        out["batch_slots"] = self.engine.B
        out["processes"] = __import__("jax").process_count()
        return out

    def close(self, timeout: Optional[float] = 60.0) -> None:
        """Process 0: stop accepting work, drain, stop every process's
        loop (the stop flag rides the same tick broadcast)."""
        if not self.is_primary:
            raise RuntimeError("close() is process-0 only")
        with self._lock:
            self._stop = True
        if self._thread is not None:
            self._thread.join(timeout=timeout)
        # the join may have TIMED OUT with the loop still draining:
        # snapshot under the lock and skip futures that complete
        # concurrently (set_result on an already-failed future raises
        # InvalidStateError inside the drain path otherwise)
        with self._lock:
            leftovers = list(self._futures.values())
            self._futures.clear()
        for fut in leftovers:
            if not fut.done():
                try:
                    fut.set_exception(RuntimeError("scheduler closed"))
                except Exception:   # completed between the check and here
                    pass
