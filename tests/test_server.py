"""ServingScheduler (live continuous batching) + HTTP front-end tests."""

import http.client
import json
import threading

import jax.numpy as jnp
import pytest

from biogpt_tpu.config import BioGptConfig, GenerationParams
from biogpt_tpu.modelio.checkpoint import params_from_state_dict
from biogpt_tpu.modelio.synthetic import make_state_dict
from biogpt_tpu.runtime.engine import Engine
from biogpt_tpu.runtime.serving import BatchedEngine, ServingScheduler

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


@pytest.fixture()
def scheduler(tiny_params):
    be = BatchedEngine(TINY, tiny_params, max_batch=2,
                       compute_dtype=jnp.float32, chunk=4)
    sched = ServingScheduler(
        be, GenerationParams(temp=0.0, stop_at_eos=False), poll_s=0.01)
    yield sched
    sched.close()


def test_scheduler_matches_single(scheduler, single_engine):
    prompts = [[2, 5, 9], [2, 11, 30, 41, 8], [2, 7]]
    futs = [scheduler.submit(p, n_predict=5) for p in prompts]
    for p, f in zip(prompts, futs):
        assert f.result(timeout=120).ids == _expected(single_engine, p, 5)


def test_scheduler_sequential_waves(scheduler, single_engine):
    """A second submission after the first completes starts a new serve
    wave on the same worker thread."""
    a = scheduler.submit([2, 5, 9], n_predict=4).result(timeout=120)
    b = scheduler.submit([2, 7], n_predict=4).result(timeout=120)
    assert a.ids == _expected(single_engine, [2, 5, 9], 4)
    assert b.ids == _expected(single_engine, [2, 7], 4)


def test_scheduler_live_intake(scheduler, single_engine):
    """Requests submitted WHILE a batch is decoding produce correct results
    (they join via serve()'s `more` hook — B=2 slots, 5 requests, staggered
    submission from another thread)."""
    prompts = [[2, i + 3, i + 11] for i in range(5)]
    futs = [scheduler.submit(prompts[0], n_predict=6)]
    done = threading.Event()

    def late_submitter():
        for p in prompts[1:]:
            futs.append(scheduler.submit(p, n_predict=6))
        done.set()

    threading.Thread(target=late_submitter).start()
    done.wait(timeout=60)
    for p, f in zip(prompts, futs):
        assert f.result(timeout=120).ids == _expected(single_engine, p, 6)


def test_scheduler_mixed_sampling(scheduler):
    """Greedy and sampled requests coexist in one batch (per-request
    params); sampled output is a valid continuation of the right length."""
    g = scheduler.submit([2, 5, 9], n_predict=4)
    s = scheduler.submit([2, 7, 8], n_predict=4, temp=0.9, top_k=8)
    rg, rs = g.result(timeout=120), s.result(timeout=120)
    assert len(rg.new_ids) == 4 and len(rs.new_ids) == 4
    assert all(0 <= t < TINY.n_vocab for t in rs.new_ids)


def test_scheduler_close_rejects_new_work(tiny_params):
    be = BatchedEngine(TINY, tiny_params, max_batch=2,
                       compute_dtype=jnp.float32, chunk=4)
    sched = ServingScheduler(be, GenerationParams(temp=0.0))
    sched.close()
    with pytest.raises(RuntimeError):
        sched.submit([2, 5], n_predict=2)


def test_http_generate_roundtrip(scheduler, single_engine):
    from biogpt_tpu.server import BioGptServer

    server = BioGptServer(scheduler, tokenizer=None, port=0)
    server.start()
    try:
        conn = http.client.HTTPConnection(server.host, server.port,
                                          timeout=120)
        conn.request("GET", "/healthz")
        assert conn.getresponse().status == 200

        body = json.dumps({"prompt_ids": [2, 5, 9], "n_predict": 4})
        conn.request("POST", "/generate", body=body,
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        payload = json.loads(resp.read())
        assert payload["ids"] == _expected(single_engine, [2, 5, 9], 4)
        assert payload["new_ids"] == payload["ids"][3:]

        # error paths: bad JSON, missing prompt
        conn.request("POST", "/generate", body="{not json",
                     headers={"Content-Type": "application/json"})
        assert conn.getresponse().status == 400
        conn.request("POST", "/generate", body="{}",
                     headers={"Content-Type": "application/json"})
        assert conn.getresponse().status == 400
    finally:
        server._httpd.shutdown()   # keep the module-scoped scheduler alive


def test_scheduler_token_streaming(scheduler, single_engine):
    """on_token callbacks deliver every generated token, in order, and the
    stream equals the final result's new_ids."""
    streamed = []
    fut = scheduler.submit([2, 5, 9], n_predict=6, on_token=streamed.append)
    result = fut.result(timeout=120)
    assert streamed == result.new_ids
    assert result.ids == _expected(single_engine, [2, 5, 9], 6)


def test_http_sse_streaming(scheduler, single_engine):
    from biogpt_tpu.server import BioGptServer

    server = BioGptServer(scheduler, tokenizer=None, port=0)
    server.start()
    try:
        conn = http.client.HTTPConnection(server.host, server.port,
                                          timeout=120)
        body = json.dumps({"prompt_ids": [2, 7, 8], "n_predict": 5,
                           "stream": True})
        conn.request("POST", "/generate", body=body,
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type") == "text/event-stream"
        events = [json.loads(line[len(b"data: "):])
                  for line in resp.read().split(b"\n\n")
                  if line.startswith(b"data: ")]
        *tokens, done = events
        expect = _expected(single_engine, [2, 7, 8], 5)
        assert done["done"] and done["ids"] == expect
        assert [e["token_id"] for e in tokens] == expect[3:]
    finally:
        server._httpd.shutdown()


def test_http_concurrent_clients(scheduler, single_engine):
    """Many simultaneous clients batch together and all get correct
    results (B=2 slots, 6 clients)."""
    from biogpt_tpu.server import BioGptServer

    server = BioGptServer(scheduler, tokenizer=None, port=0)
    server.start()
    prompts = [[2, i + 3, i + 11] for i in range(6)]
    out = {}

    def client(i):
        conn = http.client.HTTPConnection(server.host, server.port,
                                          timeout=300)
        body = json.dumps({"prompt_ids": prompts[i], "n_predict": 4})
        conn.request("POST", "/generate", body=body)
        resp = conn.getresponse()
        out[i] = (resp.status, json.loads(resp.read()))

    try:
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        for i, p in enumerate(prompts):
            status, payload = out[i]
            assert status == 200
            assert payload["ids"] == _expected(single_engine, p, 4), i
    finally:
        server._httpd.shutdown()


def test_http_stats_endpoint(scheduler, single_engine):
    """GET /stats serves the live ServingMetrics counters (SURVEY §5:
    the reference's only observability is an exit-time printf report)."""
    from biogpt_tpu.server import BioGptServer

    server = BioGptServer(scheduler, tokenizer=None, port=0)
    server.start()
    try:
        conn = http.client.HTTPConnection(server.host, server.port,
                                          timeout=120)
        body = json.dumps({"prompt_ids": [2, 5, 9], "n_predict": 4})
        conn.request("POST", "/generate", body=body,
                     headers={"Content-Type": "application/json"})
        assert conn.getresponse().status == 200
        conn.request("GET", "/stats")
        resp = conn.getresponse()
        assert resp.status == 200
        stats = json.loads(resp.read())
        assert stats["requests_completed"] >= 1
        assert stats["tokens_emitted"] >= 4
        assert stats["health_failures"] == 0
        assert stats["batch_slots"] == scheduler.engine.B
        assert stats["in_flight"] == 0 and not stats["closed"]
    finally:
        server._httpd.shutdown()
