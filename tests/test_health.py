"""Failure detection (runtime/health.py) and serving observability
(runtime/metrics.py).

The reference has neither (SURVEY §5: errors are fprintf returns, the only
observability is an exit-time timing report, main.cpp:153-162). These are
north-star serving components: silent-NaN detection on device, a drain
watchdog for hung devices, corrupt-checkpoint detection, and live
counters behind the HTTP front-end's GET /stats.
"""

import copy

import jax.numpy as jnp
import numpy as np
import pytest

from biogpt_tpu.config import BioGptConfig, GenerationParams
from biogpt_tpu.modelio.checkpoint import params_from_state_dict
from biogpt_tpu.modelio.synthetic import make_state_dict
from biogpt_tpu.runtime.health import (DrainStallError, ModelHealthError,
                                       check_params_finite)
from biogpt_tpu.runtime.metrics import ServingMetrics
from biogpt_tpu.runtime.serving import BatchedEngine, Request

TINY = BioGptConfig.tiny()


@pytest.fixture(scope="module")
def tiny_params():
    return params_from_state_dict(make_state_dict(TINY, seed=21), TINY)


def _poison(params):
    """Corrupt one FFN weight so every forward produces NaN logits."""
    bad = copy.deepcopy(params)
    w = np.array(bad["layers"]["fc1"]["w"], dtype=np.float32)
    w[..., 0] = np.nan
    bad["layers"]["fc1"]["w"] = jnp.asarray(w)
    return bad


def test_check_params_finite_passes(tiny_params):
    check_params_finite(tiny_params)


def test_check_params_finite_names_the_leaf(tiny_params):
    with pytest.raises(ModelHealthError, match="fc1"):
        check_params_finite(_poison(tiny_params))


def test_serve_detects_nonfinite_logits(tiny_params):
    be = BatchedEngine(TINY, _poison(tiny_params), max_batch=2,
                       compute_dtype=jnp.float32, chunk=4)
    reqs = [Request(prompt_ids=[2, 5, 9], n_predict=6, request_id=0)]
    with pytest.raises(ModelHealthError, match="chunk"):
        be.serve(reqs, GenerationParams(temp=0.0, stop_at_eos=False))
    assert be.metrics.snapshot()["health_failures"] >= 1


def test_health_check_off_does_not_raise(tiny_params):
    be = BatchedEngine(TINY, _poison(tiny_params), max_batch=2,
                       compute_dtype=jnp.float32, chunk=4,
                       health_check=False)
    reqs = [Request(prompt_ids=[2, 5, 9], n_predict=6, request_id=0)]
    results = be.serve(reqs, GenerationParams(temp=0.0, stop_at_eos=False))
    assert len(results[0].new_ids) == 6   # garbage tokens, but delivered


def test_healthy_serve_does_not_trip(tiny_params):
    be = BatchedEngine(TINY, tiny_params, max_batch=2,
                       compute_dtype=jnp.float32, chunk=4)
    reqs = [Request(prompt_ids=[2, 5, 9], n_predict=6, request_id=0),
            Request(prompt_ids=[2, 7], n_predict=4, request_id=1)]
    results = be.serve(reqs, GenerationParams(temp=0.0, stop_at_eos=False))
    assert len(results) == 2
    snap = be.metrics.snapshot()
    assert snap["health_failures"] == 0


def test_metrics_counters_track_a_serve(tiny_params):
    be = BatchedEngine(TINY, tiny_params, max_batch=2,
                       compute_dtype=jnp.float32, chunk=4)
    n_pred = [6, 4, 5]
    reqs = [Request(prompt_ids=[2, 5 + i], n_predict=n, request_id=i)
            for i, n in enumerate(n_pred)]
    results = be.serve(reqs, GenerationParams(temp=0.0, stop_at_eos=False))
    snap = be.metrics.snapshot()
    total = sum(len(r.new_ids) for r in results.values())
    assert total == sum(n_pred)
    assert snap["tokens_emitted"] == total
    assert snap["requests_accepted"] == 3
    assert snap["requests_completed"] == 3
    assert snap["chunks_launched"] >= 1
    assert snap["drains_landed"] == snap["chunks_launched"]
    assert snap["refill_programs"] >= 1
    assert snap["serve_calls"] == 1
    assert snap["last_serve"]["tokens"] == total
    assert snap["serve_wall_s"] > 0


def test_request_latency_metrics(tiny_params):
    """TTFT and end-to-end latency aggregates appear in the snapshot and
    are sane (ttft <= e2e, counts match completed requests)."""
    be = BatchedEngine(TINY, tiny_params, max_batch=2,
                       compute_dtype=jnp.float32, chunk=4)
    reqs = [Request(prompt_ids=[2, 5, 9], n_predict=6, request_id=0),
            Request(prompt_ids=[2, 7], n_predict=4, request_id=1)]
    be.serve(reqs, GenerationParams(temp=0.0, stop_at_eos=False))
    snap = be.metrics.snapshot()
    assert snap["ttft_mean_s"] > 0
    assert snap["e2e_mean_s"] >= snap["ttft_mean_s"]
    assert snap["e2e_max_s"] >= snap["e2e_mean_s"]


def test_metrics_accumulate_across_serves(tiny_params):
    be = BatchedEngine(TINY, tiny_params, max_batch=2,
                       compute_dtype=jnp.float32, chunk=4)
    gen = GenerationParams(temp=0.0, stop_at_eos=False)
    for k in range(2):
        be.serve([Request(prompt_ids=[2, 5], n_predict=3,
                          request_id=k)], gen)
    snap = be.metrics.snapshot()
    assert snap["serve_calls"] == 2
    assert snap["requests_completed"] == 2
    assert snap["tokens_emitted"] == 6


def test_watchdog_fires_on_stalled_drains(tiny_params, monkeypatch):
    """A drain pool that never lands a chunk must DrainStallError, not
    hang: stall the fetch by patching np.asarray inside the drain worker
    via an on-device fetch that never completes is not constructible on
    CPU, so instead the pool threads are prevented from consuming."""
    import biogpt_tpu.runtime.serving as serving_mod

    be = BatchedEngine(TINY, tiny_params, max_batch=2,
                       compute_dtype=jnp.float32, chunk=4,
                       watchdog_s=0.5)

    import jax

    real_asarray = serving_mod.np.asarray

    def slow_asarray(x, *a, **k):
        if isinstance(x, jax.Array):   # stall only device->host fetches
            import time as _t
            _t.sleep(5.0)
        return real_asarray(x, *a, **k)

    monkeypatch.setattr(serving_mod.np, "asarray", slow_asarray)
    reqs = [Request(prompt_ids=[2, 5], n_predict=4, request_id=0)]
    with pytest.raises(DrainStallError, match="watchdog"):
        be.serve(reqs, GenerationParams(temp=0.0, stop_at_eos=False))
    monkeypatch.undo()


def test_engine_generate_detects_nonfinite(tiny_params):
    """The single-stream (CLI) path has the same on-device finite lane as
    serving: poisoned weights fail the generation before tokens are
    emitted (VERDICT r2: previously the CLI streamed garbage)."""
    from biogpt_tpu.runtime.engine import Engine

    eng = Engine(TINY, _poison(tiny_params), compute_dtype=jnp.float32)
    with pytest.raises(ModelHealthError, match="non-finite"):
        eng.generate([2, 5, 9], GenerationParams(
            temp=0.0, n_predict=6, stop_at_eos=False))
    # sampled path too
    with pytest.raises(ModelHealthError, match="non-finite"):
        eng.generate([2, 5, 9], GenerationParams(
            temp=0.8, seed=3, n_predict=6, stop_at_eos=False))


def test_engine_generate_detects_nonfinite_streaming(tiny_params):
    from biogpt_tpu.runtime.engine import Engine

    eng = Engine(TINY, _poison(tiny_params), compute_dtype=jnp.float32)
    seen = []
    with pytest.raises(ModelHealthError):
        eng.generate([2, 5, 9],
                     GenerationParams(temp=0.0, n_predict=6,
                                      stop_at_eos=False),
                     stream_cb=seen.append)
    assert seen == []   # tokens withheld, not delivered


def test_engine_health_off_delivers(tiny_params):
    from biogpt_tpu.runtime.engine import Engine

    eng = Engine(TINY, _poison(tiny_params), compute_dtype=jnp.float32,
                 health_check=False)
    res = eng.generate([2, 5, 9], GenerationParams(
        temp=0.0, n_predict=6, stop_at_eos=False))
    assert len(res.new_ids) == 6   # garbage tokens, but delivered


def test_engine_health_lane_does_not_perturb_tokens(tiny_params):
    from biogpt_tpu.runtime.engine import Engine

    gen = GenerationParams(temp=0.0, n_predict=8, stop_at_eos=False)
    a = Engine(TINY, tiny_params, compute_dtype=jnp.float32).generate(
        [2, 7, 3], gen).ids
    b = Engine(TINY, tiny_params, compute_dtype=jnp.float32,
               health_check=False).generate([2, 7, 3], gen).ids
    assert a == b


def test_engine_fused_greedy_health_lane(tiny_params):
    """The greedy megakernel path never materializes logits — the argmax
    kernel's max-value output carries the NaN out (pallas_qmatmul)."""
    from biogpt_tpu.ops.qmatmul import set_pallas_mode
    from biogpt_tpu.quant import codecs
    from biogpt_tpu.runtime.engine import Engine

    cfg = BioGptConfig.tiny(d_model=128, d_ff=256, n_head=2, n_layer=3,
                            n_vocab=256, n_positions=64)
    sd = make_state_dict(cfg, seed=31)
    params = params_from_state_dict(sd, cfg, qtype=codecs.GGML_TYPE_Q4_0)
    bad = copy.deepcopy(params)
    b = np.array(bad["layers"]["fc1"]["b"], dtype=np.float32)
    b[..., 0] = np.nan
    bad["layers"]["fc1"]["b"] = b

    eng = Engine(cfg, bad, compute_dtype=jnp.bfloat16)
    assert eng._fused_greedy
    gen = GenerationParams(temp=0.0, n_predict=6, stop_at_eos=False)
    try:
        set_pallas_mode(True)   # CPU: run kernels in interpret mode
        assert eng._use_fused()
        with pytest.raises(ModelHealthError, match="non-finite"):
            eng.generate([2, 5, 9], gen)
    finally:
        set_pallas_mode("auto")


def test_serving_metrics_thread_safety_smoke():
    import threading

    m = ServingMetrics()

    def bump():
        for _ in range(1000):
            m.inc("tokens_emitted")

    ts = [threading.Thread(target=bump) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert m.snapshot()["tokens_emitted"] == 4000
