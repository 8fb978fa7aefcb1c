"""Non-blocking host-side profile of BatchedEngine.serve.

Times the DISPATCH cost of each jitted entry (no block_until_ready) plus
the end-of-serve flush, to separate host scheduling overhead from device
time (tools/bench/profile_serving.py measures the blocking splits).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
import time, collections
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/biogpt_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from biogpt_tpu.config import BioGptConfig, GenerationParams
from biogpt_tpu.modelio.synthetic import make_random_quantized_params
from biogpt_tpu.quant.codecs import GGML_TYPE_BY_NAME
from biogpt_tpu.runtime.serving import BatchedEngine, Request

config = BioGptConfig()
params = make_random_quantized_params(config, GGML_TYPE_BY_NAME["q4_0"], seed=0)
B, n_pred = 8, 48
be = BatchedEngine(config, params, max_batch=B, compute_dtype=jnp.bfloat16,
                   max_seq=512, chunk=16)
print("fused megakernel:", be._fused_decode, flush=True)

times = collections.defaultdict(float)
counts = collections.defaultdict(int)

def wrap(name, fn, block=False):
    def inner(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        if block:
            jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        times[name] += dt
        counts[name] += 1
        return out
    return inner

be._step_scan = wrap("step_scan.dispatch", be._step_scan)
be._refill_jit = wrap("refill.dispatch", be._refill_jit)
_pg = be._prefill_group
def prefill_group(*a, **k):
    t0 = time.perf_counter()
    out = _pg(*a, **k)
    times["prefill_group.total"] += time.perf_counter() - t0
    counts["prefill_group.total"] += 1
    return out
be._prefill_group = prefill_group

rng = np.random.default_rng(0)
def make_reqs(n):
    return [Request(prompt_ids=[2] + rng.integers(4, 40000, size=int(
        rng.integers(4, 24))).tolist(), n_predict=n_pred, request_id=i)
        for i in range(n)]

gen = GenerationParams(temp=0.0, stop_at_eos=False)

for label, n in (("warm1", 6 * B), ("warm2", 6 * B), ("timed", 6 * B),
                 ("timed2", 6 * B)):
    times.clear(); counts.clear()
    t0 = time.perf_counter()
    results = be.serve(make_reqs(n), gen)
    dt = time.perf_counter() - t0
    total_new = sum(len(r.new_ids) for r in results.values())
    print(f"--- {label}: {dt:.2f}s total, {total_new} tokens, "
          f"{total_new/dt:.1f} tok/s agg", flush=True)
    tracked = times["step_scan.dispatch"] + times["prefill_group.total"]
    for k in sorted(times, key=times.get, reverse=True):
        print(f"    {k:22s} {times[k]*1e3:9.1f} ms  x{counts[k]:3d} "
              f"({times[k]/counts[k]*1e3:7.2f} ms/call)", flush=True)
    print(f"    {'(loop residual)':22s} {(dt-tracked)*1e3:9.1f} ms "
          f"(drain waits + flush + python)", flush=True)
