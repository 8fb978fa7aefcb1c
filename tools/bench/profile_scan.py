"""Profile the 64-step decode scan program: where does device time go?

Throwaway diagnostic for the scan-chunked decode path.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
import glob
import json
import sys
import tempfile

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/biogpt_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np

from biogpt_tpu.config import BioGptConfig, GenerationParams
from biogpt_tpu.modelio.synthetic import make_random_quantized_params
from biogpt_tpu.quant.codecs import GGML_TYPE_Q4_0
from biogpt_tpu.runtime.engine import Engine

config = BioGptConfig()
params = make_random_quantized_params(config, GGML_TYPE_Q4_0, seed=0)
eng = Engine(config, params, compute_dtype=jnp.bfloat16)
prompt = list(range(2, 18))
gen = GenerationParams(n_predict=192, temp=0.0, stop_at_eos=False)
eng.generate(prompt, gen)   # compile + warm

from biogpt_tpu.utils.profiling import trace

trace_dir = tempfile.mkdtemp(prefix="biogpt_scan_trace_")
with trace(trace_dir):
    r = eng.generate(prompt, gen)

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
    for us, ops, mb, name in cats[:8]:
        print(f"  {us:10.3f} us {ops:6d} ops {mb:9.1f} MB  {name}")
print("\ntrace:", trace_dir, file=sys.stderr)
