"""Profile the 512-token prefill program: where does device time go?

Throwaway diagnostic for the prefill path (dequant-then-dot matmuls).
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

from biogpt_tpu.config import BioGptConfig
from biogpt_tpu.modelio.synthetic import make_random_quantized_params
from biogpt_tpu.quant.codecs import GGML_TYPE_Q4_0
from biogpt_tpu.runtime.engine import Engine

config = BioGptConfig()
params = make_random_quantized_params(config, GGML_TYPE_Q4_0, seed=0)
eng = Engine(config, params, compute_dtype=jnp.bfloat16)
ids = np.arange(2, 2 + 512) % 40000
for _ in range(2):
    logits, cache, _ = eng.prefill(eng.new_cache(), ids)
    jax.block_until_ready(logits)
    del cache

from biogpt_tpu.utils.profiling import trace

trace_dir = tempfile.mkdtemp(prefix="biogpt_prefill_trace_")
with trace(trace_dir):
    for _ in range(4):
        logits, cache, _ = eng.prefill(eng.new_cache(), ids)
        jax.block_until_ready(logits)
        del cache

from xprof.convert import raw_to_tool_data as rtd

xspace = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
data, _ = rtd.xspace_to_tool_data(xspace, "op_profile", {})
d = json.loads(data)
for prog in d["byProgram"]["children"]:
    total = prog["metrics"]["rawTime"]
    print(f"\nprogram: {prog['name']}  total {total/1e9*1000:.1f} us")

    def walk(node, depth=1):
        m = node.get("metrics", {})
        t = m.get("rawTime", 0) / 1e9 * 1000
        if t < total / 1e9 * 1000 * 0.01:
            return
        print("  " * depth + f"{t:9.1f} us  occ={m.get('occurrences', 0):4d}  "
              f"bytes={m.get('rawBytesAccessedArray', [0])[0]/1e6:9.1f}MB  "
              f"{node['name'][:100]}")
        for c in node.get("children", []):
            walk(c, depth + 1)

    for c in prog.get("children", []):
        walk(c)
print(f"\ntrace: {trace_dir}")
