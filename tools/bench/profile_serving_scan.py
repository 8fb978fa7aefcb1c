"""xprof device-time breakdown of the BATCHED serving decode scan.

Where does a B-slot chunk's device time go — the megakernel, the wide
lm_head kernel, the per-slot cache-row writes, the sampler/argmax, the
glue? Usage: python tools/bench/profile_serving_scan.py [B]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
import glob
import json
import tempfile

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/biogpt_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np

from biogpt_tpu.config import BioGptConfig, GenerationParams
from biogpt_tpu.modelio.synthetic import make_random_quantized_params
from biogpt_tpu.quant.codecs import GGML_TYPE_Q4_0
from biogpt_tpu.runtime.serving import BatchedEngine, Request

B = int(_sys.argv[1]) if len(_sys.argv) > 1 else 32
config = BioGptConfig()
params = make_random_quantized_params(config, GGML_TYPE_Q4_0, seed=0)
be = BatchedEngine(config, params, max_batch=B, compute_dtype=jnp.bfloat16,
                   max_seq=512, chunk=16)
rng = np.random.default_rng(0)


def make_reqs(n):
    return [Request(prompt_ids=[2] + rng.integers(4, 40000, size=int(
        rng.integers(4, 24))).tolist(), n_predict=48, request_id=i)
        for i in range(n)]


gen = GenerationParams(temp=0.0, stop_at_eos=False)
print(f"B={B}; warming...", flush=True)
be.serve(make_reqs(2 * B), gen)

from biogpt_tpu.utils.profiling import trace

trace_dir = tempfile.mkdtemp(prefix="biogpt_srv_trace_")
with trace(trace_dir):
    be.serve(make_reqs(2 * B), gen)

from xprof.convert import raw_to_tool_data as rtd

xspace = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
data, _ = rtd.xspace_to_tool_data(xspace, "op_profile", {})
d = json.loads(data)
for prog in d["byProgram"]["children"]:
    total = prog["metrics"]["rawTime"]
    print(f"\nprogram: {prog['name']}  total {total/1e9*1000:.3f} us")
    cats = []
    for c in prog["children"]:
        m = c["metrics"]
        cats.append((m.get("rawTime", 0) / 1e9 * 1000,
                     m.get("occurrences", 0),
                     m.get("rawBytesAccessedArray", [0])[0] / 1e6,
                     c["name"]))
    cats.sort(reverse=True)
    for us, ops, mb, name in cats[:10]:
        print(f"  {us:10.3f} us {ops:6d} ops {mb:9.1f} MB  {name}")
print("\ntrace:", trace_dir, file=_sys.stderr)
