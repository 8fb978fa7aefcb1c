"""Continuous-batching engine tests: batched lockstep decode must reproduce
single-request generation; slots refill; EOS and length limits respected."""

import numpy as np
import pytest
import jax.numpy as jnp

from biogpt_tpu.config import BioGptConfig, GenerationParams
from biogpt_tpu.modelio.checkpoint import params_from_state_dict
from biogpt_tpu.modelio.synthetic import make_state_dict
from biogpt_tpu.runtime.engine import Engine
from biogpt_tpu.runtime.serving import BatchedEngine, Request

TINY = BioGptConfig.tiny()


@pytest.fixture(scope="module")
def tiny_params():
    return params_from_state_dict(make_state_dict(TINY, seed=21), TINY)


@pytest.fixture(scope="module")
def single_engine(tiny_params):
    return Engine(TINY, tiny_params, compute_dtype=jnp.float32)


def _expected(single_engine, prompt, n_predict):
    gen = GenerationParams(n_predict=n_predict, temp=0.0, stop_at_eos=False)
    return single_engine.generate(prompt, gen).ids


def test_batched_matches_single(tiny_params, single_engine):
    prompts = [[2, 5, 9], [2, 11, 30, 41, 8], [2, 7]]
    be = BatchedEngine(TINY, tiny_params, max_batch=4,
                       compute_dtype=jnp.float32, chunk=4)
    reqs = [Request(prompt_ids=p, n_predict=6, request_id=i)
            for i, p in enumerate(prompts)]
    results = be.serve(reqs, GenerationParams(temp=0.0, stop_at_eos=False))
    for i, p in enumerate(prompts):
        expect = _expected(single_engine, p, 6)
        assert results[i].ids == expect, (i, results[i].ids, expect)


def test_more_requests_than_slots(tiny_params, single_engine):
    prompts = [[2, i + 3, i + 11] for i in range(5)]
    be = BatchedEngine(TINY, tiny_params, max_batch=2,
                       compute_dtype=jnp.float32, chunk=3)
    reqs = [Request(prompt_ids=p, n_predict=4, request_id=i)
            for i, p in enumerate(prompts)]
    results = be.serve(reqs, GenerationParams(temp=0.0, stop_at_eos=False))
    assert len(results) == 5
    for i, p in enumerate(prompts):
        assert results[i].ids == _expected(single_engine, p, 4)


def test_abort_frees_slot_and_resolves_partial(tiny_params, single_engine):
    """Aborting a running request frees its slot (the queued request runs)
    and resolves its future with the tokens drained so far — the client-
    disconnect path must not burn a slot to n_predict."""
    import time

    from biogpt_tpu.runtime.serving import ServingScheduler

    be = BatchedEngine(TINY, tiny_params, max_batch=1,
                       compute_dtype=jnp.float32, chunk=4)
    sched = ServingScheduler(
        be, GenerationParams(temp=0.0, stop_at_eos=False))
    toks = []
    f1 = sched.submit([2, 5, 9], n_predict=50, on_token=toks.append)
    f2 = sched.submit([2, 7], n_predict=4)
    deadline = time.monotonic() + 60
    while not toks and time.monotonic() < deadline:
        time.sleep(0.005)
    assert toks, "no tokens drained within 60s"
    sched.abort(f1.request_id)
    r1 = f1.result(timeout=120)
    r2 = f2.result(timeout=120)
    assert 0 < len(r1.new_ids) < 50, len(r1.new_ids)
    assert r2.ids == _expected(single_engine, [2, 7], 4)
    sched.close()
    assert be.metrics.snapshot()["requests_aborted"] == 1


def test_abort_queued_request_never_takes_a_slot(tiny_params, single_engine):
    """A request aborted while still queued completes with zero generated
    tokens and never costs a prefill."""
    from biogpt_tpu.runtime.serving import ServingScheduler

    be = BatchedEngine(TINY, tiny_params, max_batch=1,
                       compute_dtype=jnp.float32, chunk=4)
    sched = ServingScheduler(
        be, GenerationParams(temp=0.0, stop_at_eos=False))
    f1 = sched.submit([2, 5, 9], n_predict=12)
    f2 = sched.submit([2, 7], n_predict=8)
    sched.abort(f2.request_id)   # before it can take the single slot
    r1 = f1.result(timeout=120)
    r2 = f2.result(timeout=120)
    assert r1.ids == _expected(single_engine, [2, 5, 9], 12)
    assert r2.new_ids == []
    sched.close()


def test_distributed_scheduler_single_process(tiny_params, single_engine):
    """DistributedScheduler degenerates cleanly to one process (the tick
    broadcast is a no-op): same submit/close surface as ServingScheduler,
    live intake, token streaming, results == single-stream."""
    from biogpt_tpu.runtime.dist_serving import DistributedScheduler

    be = BatchedEngine(TINY, tiny_params, max_batch=2,
                       compute_dtype=jnp.float32, chunk=4)
    sched = DistributedScheduler(
        be, GenerationParams(temp=0.0, seed=3, stop_at_eos=False),
        max_reqs_per_tick=4, poll_s=0.01)
    toks = []
    futs = [sched.submit([2, 5, 9], n_predict=5, on_token=toks.append),
            sched.submit([2, 7], n_predict=4)]
    results = [f.result(timeout=120) for f in futs]
    assert results[0].ids == _expected(single_engine, [2, 5, 9], 5)
    assert results[1].ids == _expected(single_engine, [2, 7], 4)
    assert toks == results[0].new_ids
    sched.close()
    with pytest.raises(RuntimeError):
        sched.submit([2, 5], n_predict=2)


def test_distributed_scheduler_idle_backoff(tiny_params, single_engine):
    """An idle scheduler's tick sleep doubles to idle_max_s (an idle pod
    must not broadcast at 20 Hz forever) and recovers: a request submitted
    after the backoff reached its cap still serves, and serving resets the
    sleep to poll_s."""
    import time

    from biogpt_tpu.runtime.dist_serving import DistributedScheduler

    be = BatchedEngine(TINY, tiny_params, max_batch=2,
                       compute_dtype=jnp.float32, chunk=4)
    sched = DistributedScheduler(
        be, GenerationParams(temp=0.0, seed=3, stop_at_eos=False),
        poll_s=0.01, idle_max_s=0.08)
    deadline = time.time() + 30
    while sched._idle_s < 0.08 and time.time() < deadline:
        time.sleep(0.01)
    assert sched._idle_s == 0.08   # reached the cap while idle
    f = sched.submit([2, 5, 9], n_predict=4)
    assert f.result(timeout=120).ids == _expected(single_engine, [2, 5, 9], 4)
    sched.close()


def test_distributed_scheduler_serves_http(tiny_params):
    """The HTTP front-end binds to DistributedScheduler unchanged (same
    submit surface) — the multi-host front door is the same server."""
    import json
    import urllib.request

    from biogpt_tpu.runtime.dist_serving import DistributedScheduler
    from biogpt_tpu.server import BioGptServer

    be = BatchedEngine(TINY, tiny_params, max_batch=2,
                       compute_dtype=jnp.float32, chunk=4)
    sched = DistributedScheduler(
        be, GenerationParams(temp=0.0, seed=3, stop_at_eos=False),
        poll_s=0.01)
    srv = BioGptServer(sched, tokenizer=None)
    srv.start()
    try:
        body = json.dumps({"prompt_ids": [2, 5, 9], "n_predict": 4}).encode()
        r = urllib.request.urlopen(urllib.request.Request(
            f"http://{srv.host}:{srv.port}/generate", data=body,
            headers={"Content-Type": "application/json"}), timeout=120)
        out = json.loads(r.read())
        assert len(out["new_ids"]) == 4
        stats = json.loads(urllib.request.urlopen(
            f"http://{srv.host}:{srv.port}/stats", timeout=30).read())
        assert stats["processes"] == 1 and stats["batch_slots"] == 2
    finally:
        srv._httpd.shutdown()
        sched.close()


def test_wide_slot_pool_matches_single(tiny_params, single_engine):
    """B=12 slots (past the old B<=8 kernel cap): the lockstep scheduler,
    refill scatter, and drain bindings stay correct with a wide pool and
    more requests than slots."""
    prompts = [[2, 3 + i, 11 + (i % 7), 5 + (i % 3)] for i in range(18)]
    be = BatchedEngine(TINY, tiny_params, max_batch=12,
                       compute_dtype=jnp.float32, chunk=3)
    reqs = [Request(prompt_ids=p, n_predict=5, request_id=i)
            for i, p in enumerate(prompts)]
    results = be.serve(reqs, GenerationParams(temp=0.0, stop_at_eos=False))
    assert len(results) == 18
    for i, p in enumerate(prompts):
        assert results[i].ids == _expected(single_engine, p, 5), i


def test_n_predict_respected(tiny_params):
    be = BatchedEngine(TINY, tiny_params, max_batch=2,
                       compute_dtype=jnp.float32, chunk=4)
    reqs = [Request(prompt_ids=[2, 5], n_predict=3, request_id=0),
            Request(prompt_ids=[2, 9], n_predict=7, request_id=1)]
    results = be.serve(reqs, GenerationParams(temp=0.0, stop_at_eos=False))
    assert len(results[0].new_ids) == 3
    assert len(results[1].new_ids) == 7


def test_eos_stops_request(tiny_params, single_engine):
    # find which token the model emits first, then declare it EOS
    probe = _expected(single_engine, [2, 5], 1)
    eos = probe[-1]
    be = BatchedEngine(TINY, tiny_params, max_batch=2,
                       compute_dtype=jnp.float32, chunk=4)
    reqs = [Request(prompt_ids=[2, 5], n_predict=8, request_id=0)]
    gen = GenerationParams(temp=0.0, stop_at_eos=True, eos_token_id=eos)
    results = be.serve(reqs, gen)
    assert results[0].new_ids[-1] == eos
    assert len(results[0].new_ids) <= 2


def test_per_request_sampling_params(tiny_params, single_engine):
    """A greedy request (temp=0 override) must match single-engine greedy
    even when batched alongside a high-temperature request."""
    be = BatchedEngine(TINY, tiny_params, max_batch=2,
                       compute_dtype=jnp.float32, chunk=4)
    reqs = [Request(prompt_ids=[2, 5, 9], n_predict=6, request_id=0,
                    temp=0.0),
            Request(prompt_ids=[2, 7, 11], n_predict=6, request_id=1,
                    temp=1.5, top_k=50, top_p=0.95)]
    # serve defaults are sampled — request 0 overrides to greedy
    results = be.serve(reqs, GenerationParams(temp=0.9, seed=3,
                                              stop_at_eos=False))
    assert results[0].ids == _expected(single_engine, [2, 5, 9], 6)
    assert len(results[1].new_ids) == 6
    # sampled request produces valid token ids
    assert all(0 <= t < TINY.n_vocab for t in results[1].new_ids)


def test_sampled_serving_deterministic_by_seed(tiny_params):
    be = BatchedEngine(TINY, tiny_params, max_batch=2,
                       compute_dtype=jnp.float32, chunk=4)
    reqs = [Request(prompt_ids=[2, 5, 9], n_predict=5, request_id=0),
            Request(prompt_ids=[2, 8], n_predict=5, request_id=1)]
    gen = GenerationParams(temp=0.8, seed=42, stop_at_eos=False)
    a = be.serve(list(reqs), gen)
    b = be.serve(list(reqs), gen)
    assert {k: v.ids for k, v in a.items()} == {k: v.ids for k, v in b.items()}


def test_batched_refill_mixed_lengths(tiny_params, single_engine):
    """Startup refill prefills mixed-length prompts as bucketed batches;
    results must still match single-request greedy."""
    prompts = [[2, 5], [2, 6, 7, 8, 9, 10, 11], [2, 3, 4], [2, 9, 1, 2]]
    be = BatchedEngine(TINY, tiny_params, max_batch=4,
                       compute_dtype=jnp.float32, chunk=4)
    reqs = [Request(prompt_ids=p, n_predict=5, request_id=i)
            for i, p in enumerate(prompts)]
    results = be.serve(reqs, GenerationParams(temp=0.0, stop_at_eos=False))
    for i, p in enumerate(prompts):
        assert results[i].ids == _expected(single_engine, p, 5), i


def test_pipeline_depth_invariant(tiny_params, single_engine):
    """Results must be identical at every drain-pipeline depth (the depth
    only changes WHEN blocks are fetched, never what they contain)."""
    prompts = [[2, 5, 9], [2, 11, 30, 41, 8], [2, 7], [2, 31], [2, 13, 17]]
    outs = []
    for depth in (1, 2, 4):
        be = BatchedEngine(TINY, tiny_params, max_batch=2,
                           compute_dtype=jnp.float32, chunk=3,
                           pipeline=depth)
        reqs = [Request(prompt_ids=p, n_predict=5, request_id=i)
                for i, p in enumerate(prompts)]
        results = be.serve(reqs, GenerationParams(temp=0.0,
                                                  stop_at_eos=False))
        outs.append({i: results[i].ids for i in range(len(prompts))})
    assert outs[0] == outs[1] == outs[2]
    for i, p in enumerate(prompts):
        assert outs[0][i] == _expected(single_engine, p, 5)


def test_capacity_truncates_at_chunk_boundary(tiny_params, single_engine):
    """A request that cannot fit another full chunk in the KV cache is
    truncated (not silently wrapped) and its slot refills for the queue."""
    be = BatchedEngine(TINY, tiny_params, max_batch=1,
                       compute_dtype=jnp.float32, chunk=4, max_seq=16)
    reqs = [Request(prompt_ids=[2, 5, 9], n_predict=40, request_id=0),
            Request(prompt_ids=[2, 7], n_predict=3, request_id=1)]
    results = be.serve(reqs, GenerationParams(temp=0.0, stop_at_eos=False))
    # slot positions: prompt 3 + first + chunks of 4 while 3+4k+4 <= 16
    n0 = len(results[0].new_ids)
    assert 0 < n0 < 40
    # truncated tokens must still match the single-stream prefix
    expect = _expected(single_engine, [2, 5, 9], n0)
    assert results[0].ids == expect
    # the freed slot served the queued request to completion
    assert results[1].ids == _expected(single_engine, [2, 7], 3)


@pytest.mark.parametrize("data,model", [(1, 4), (2, 2)])
def test_mesh_serving_matches_single(tiny_params, single_engine, data, model):
    """Continuous batching over a ("data","model") mesh: shard_map TP when
    the config divides, GSPMD otherwise — same tokens as single-device."""
    from biogpt_tpu.parallel import make_mesh

    prompts = [[2, 5, 9], [2, 11, 30, 41, 8], [2, 7]]
    be = BatchedEngine(TINY, tiny_params, max_batch=4,
                       compute_dtype=jnp.float32, chunk=4,
                       mesh=make_mesh(data=data, model=model))
    reqs = [Request(prompt_ids=p, n_predict=6, request_id=i)
            for i, p in enumerate(prompts)]
    results = be.serve(reqs, GenerationParams(temp=0.0, stop_at_eos=False))
    for i, p in enumerate(prompts):
        expect = _expected(single_engine, p, 6)
        assert results[i].ids == expect, (i, results[i].ids, expect)


def test_capacity_truncated_request_fires_on_complete(tiny_params):
    """A KV-capacity-truncated request must still be reported complete via
    on_complete once its scheduled tokens drain (a live scheduler future
    would otherwise hang under sustained traffic)."""
    be = BatchedEngine(TINY, tiny_params, max_batch=1,
                       compute_dtype=jnp.float32, chunk=4, max_seq=16)
    done = []
    reqs = [Request(prompt_ids=[2, 5, 9], n_predict=40, request_id=0),
            Request(prompt_ids=[2, 7], n_predict=3, request_id=1)]
    results = be.serve(reqs, GenerationParams(temp=0.0, stop_at_eos=False),
                       on_complete=lambda rid, res: done.append(rid))
    assert sorted(done) == [0, 1]
    assert 0 < len(results[0].new_ids) < 40   # truncated, and notified


def test_split_refill_groups_cost_model(tiny_params):
    """The wave splitter: uniform waves stay ONE program; a wave mixing
    one long prompt with many short ones splits at the bucket boundary;
    splits that can't recoup the per-program cost don't happen."""
    be = BatchedEngine(TINY, tiny_params, max_batch=32,
                       compute_dtype=jnp.float32, max_seq=512)

    def mk(n, plen, base=0):
        return [(base + i,
                 Request(prompt_ids=[2] * plen, request_id=base + i))
                for i in range(n)]

    # uniform: one group regardless of width
    assert len(be._split_refill_groups(mk(32, 20))) == 1
    # 1 long (bucket 512) + 20 short (bucket 32): folding the shorts pads
    # 20*(512-32) ~ 9600 tokens >> split cost -> split into two programs,
    # long group first
    gps = be._split_refill_groups(mk(1, 500) + mk(20, 20, base=1))
    assert len(gps) == 2
    assert len(gps[0]) == 1 and len(gps[0][0][1].prompt_ids) == 500
    assert len(gps[1]) == 20
    # 2 rows at bucket 64 + 1 at bucket 32: saving 1*(64-32)=32 tokens
    # can't pay for a program -> one group
    assert len(be._split_refill_groups(mk(2, 60) + mk(1, 20, base=2))) == 1
    # three widely-spread buckets can use up to three programs
    gps = be._split_refill_groups(
        mk(2, 500) + mk(8, 120, base=2) + mk(20, 8, base=10))
    assert len(gps) == 3


def test_split_refill_token_identity(tiny_params, single_engine):
    """Splitting a mixed refill wave into length-bucket programs must not
    change a single emitted token (vs the one-program wave, forced via a
    huge split cost)."""
    import os
    prompts = ([[2] + list(range(3, 30))] +            # long
               [[2, 5 + i] for i in range(5)])         # short
    reqs = lambda: [Request(prompt_ids=list(p), n_predict=4, request_id=i)
                    for i, p in enumerate(prompts)]
    gen = GenerationParams(temp=0.0, stop_at_eos=False)

    be = BatchedEngine(TINY, tiny_params, max_batch=8,
                       compute_dtype=jnp.float32, chunk=4)
    split = {k: v.ids for k, v in be.serve(reqs(), gen).items()}

    os.environ["BIOGPT_REFILL_SPLIT_COST"] = "1000000"
    try:
        be2 = BatchedEngine(TINY, tiny_params, max_batch=8,
                            compute_dtype=jnp.float32, chunk=4)
        merged = {k: v.ids for k, v in be2.serve(reqs(), gen).items()}
    finally:
        del os.environ["BIOGPT_REFILL_SPLIT_COST"]
    assert split == merged
    for i, p in enumerate(prompts):
        assert split[i] == _expected(single_engine, p, 4), i
