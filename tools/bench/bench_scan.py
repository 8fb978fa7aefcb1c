"""Measure scan-chunked decode wall time per token on the real chip.

Throwaway diagnostic: drives Engine.generate (the production path) at 347M
Q4_0 and reports marginal tokens/s, comparing against the per-step path.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
import sys
import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/biogpt_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

from biogpt_tpu.config import BioGptConfig, GenerationParams
from biogpt_tpu.modelio.synthetic import make_random_quantized_params
from biogpt_tpu.quant.codecs import GGML_TYPE_BY_NAME
from biogpt_tpu.runtime.engine import Engine

QNAME = sys.argv[1] if len(sys.argv) > 1 else "q4_0"
N_PRED = int(sys.argv[2]) if len(sys.argv) > 2 else 256

config = BioGptConfig()
print(f"devices: {jax.devices()}  qtype={QNAME}", file=sys.stderr, flush=True)
params = make_random_quantized_params(config, GGML_TYPE_BY_NAME[QNAME], seed=0)
eng = Engine(config, params, compute_dtype=jnp.bfloat16)
print(f"fused_decode={eng._fused_decode}", file=sys.stderr, flush=True)

prompt = list(range(2, 18))
t0 = time.perf_counter()
eng.warmup(prompt_len=len(prompt), n_tokens=N_PRED, sampled=False)
print(f"warmup: {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

gen_s = GenerationParams(n_predict=64, temp=0.0, stop_at_eos=False)
gen_l = GenerationParams(n_predict=N_PRED, temp=0.0, stop_at_eos=False)
# marginal timing: long minus short removes prefill/first-fetch fixed costs
rs = eng.generate(prompt, gen_s)
t1 = time.perf_counter()
rs = eng.generate(prompt, gen_s)
t_short = time.perf_counter() - t1
t2 = time.perf_counter()
rl = eng.generate(prompt, gen_l)
t_long = time.perf_counter() - t2
n = len(rl.new_ids) - len(rs.new_ids)
dt = t_long - t_short
print(f"scan {QNAME}: {n/dt:.1f} tok/s marginal ({dt/n*1e3:.3f} ms/token)  "
      f"decode_s(long)={rl.timings['decode_s']:.2f} "
      f"ms_per_token(reported)={rl.timings['ms_per_token']:.3f}")
