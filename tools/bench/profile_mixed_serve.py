"""xprof the MIXED serving workload: device-time vs idle decomposition.

The round-5 mixed number (6.8-6.9k tok/s bf16) decomposes on the host
side as ~decode chunks + refill prefills + a large residual; this trace
answers whether the residual is device work we missed or relay/idle gap
(the round-6 optimization target hangs on that split). Traces ONE
measured serve of the driver's mixed workload shape and prints
per-program device totals + IDLE.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
import glob
import json
import tempfile
import time

import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/biogpt_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from biogpt_tpu.config import BioGptConfig, GenerationParams
from biogpt_tpu.modelio.synthetic import make_random_quantized_params
from biogpt_tpu.quant.codecs import GGML_TYPE_BY_NAME
from biogpt_tpu.runtime.serving import BatchedEngine, Request

config = BioGptConfig()
params = make_random_quantized_params(config, GGML_TYPE_BY_NAME["q4_0"],
                                      seed=0)
B = 32
be = BatchedEngine(config, params, max_batch=B, compute_dtype=jnp.bfloat16,
                   max_seq=512, chunk=16)
print(f"fused={be._fused_decode} kv_groups={be._kv_groups} "
      f"fused_sampled={be._fused_sampled}", flush=True)

classes = [(0.6, 5, 25), (0.25, 100, 124), (0.15, 300, 380)]
preds = [16, 32, 48, 64, 96]
vmax = min(40000, config.n_vocab - 2)


def make_reqs(n, seed):
    rng = np.random.default_rng(seed)
    reqs = []
    for i in range(n):
        u = rng.random()
        acc = 0.0
        for frac, lo, hi in classes:
            acc += frac
            if u < acc or (frac, lo, hi) == classes[-1]:
                plen = int(rng.integers(lo, hi + 1))
                break
        greedy_row = rng.random() < 0.25
        reqs.append(Request(
            prompt_ids=[2] + rng.integers(4, vmax, size=plen - 1).tolist(),
            n_predict=int(rng.choice(preds)), request_id=i,
            temp=0.0 if greedy_row else float(rng.choice([0.7, 0.9, 1.0])),
            top_k=40, top_p=0.9))
    return reqs


gen = GenerationParams(temp=0.7, top_k=40, top_p=0.9, stop_at_eos=True,
                       seed=11)
for s in (100, 101):   # warm (compile + deep queue)
    be.serve(make_reqs(4 * B, seed=s), gen)

from biogpt_tpu.utils.profiling import trace

trace_dir = tempfile.mkdtemp(prefix="biogpt_mixed_trace_")
t0 = time.perf_counter()
with trace(trace_dir):
    res = be.serve(make_reqs(4 * B, seed=100), gen)
wall = time.perf_counter() - t0
toks = sum(len(r.new_ids) for r in res.values())
print(f"serve wall {wall:.3f}s, {toks} tokens "
      f"({toks / wall:.0f} tok/s)", flush=True)

from xprof.convert import raw_to_tool_data as rtd

xspace = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
data, _ = rtd.xspace_to_tool_data(xspace, "op_profile", {})
d = json.loads(data)
progs = []
for prog in d["byProgram"]["children"]:
    total_us = prog["metrics"]["rawTime"] / 1e9 * 1000
    progs.append((total_us, prog["name"]))
progs.sort(reverse=True)
dev_total = sum(t for t, n in progs if n != "IDLE")
idle = sum(t for t, n in progs if n == "IDLE")
print(f"device busy {dev_total/1e3:.1f} ms, IDLE {idle/1e3:.1f} ms over "
      f"{wall*1e3:.0f} ms wall", flush=True)
for t, n in progs[:10]:
    print(f"  {t/1e3:9.2f} ms  {n}", flush=True)
print(f"trace: {trace_dir}", flush=True)
