"""Quick device measurement: megakernel decode step vs per-op path (347M Q4_0).

Throwaway diagnostic; marginal timing like bench.py.
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

from biogpt_tpu.config import BioGptConfig
from biogpt_tpu.modelio.synthetic import make_random_quantized_params
from biogpt_tpu.models.biogpt import forward, forward_fused_decode
from biogpt_tpu.quant.codecs import GGML_TYPE_BY_NAME
from biogpt_tpu.runtime.cache import init_cache
from biogpt_tpu.runtime.engine import _pack_matmul_weights
from biogpt_tpu.runtime.sampling import greedy

QNAME = sys.argv[1] if len(sys.argv) > 1 else "q4_0"
MODE = sys.argv[2] if len(sys.argv) > 2 else "fused"   # fused | perop

config = BioGptConfig()
print(f"devices: {jax.devices()}  qtype={QNAME} mode={MODE}", file=sys.stderr, flush=True)
params = make_random_quantized_params(config, GGML_TYPE_BY_NAME[QNAME], seed=0)
params = jax.device_put(_pack_matmul_weights(params))

W = 512

if MODE == "fused":
    def step(params, tok, cache, past):
        logits, cache = forward_fused_decode(
            params, tok, cache, past, config, compute_dtype=jnp.bfloat16,
            kv_window=W)
        return greedy(logits)[:, None], cache, past + 1
else:
    def step(params, tok, cache, past):
        logits, cache = forward(params, tok, cache, past, config,
                                compute_dtype=jnp.bfloat16,
                                allow_pallas=True, kv_window=W)
        return greedy(logits)[:, None], cache, past + 1

jit_step = jax.jit(step, donate_argnames=("cache",))
cache = init_cache(config, batch=1, max_len=config.n_positions,
                   dtype=jnp.bfloat16)
tok = jnp.full((1, 1), 17, jnp.int32)
past = jnp.int32(0)
t0 = time.perf_counter()
tok, cache, past = jit_step(params, tok, cache, past)
_ = int(np.asarray(tok)[0, 0])
print(f"compile+first step: {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)


def run(n):
    global tok, cache, past
    t0 = time.perf_counter()
    for _ in range(n):
        tok, cache, past = jit_step(params, tok, cache, past)
    _ = int(np.asarray(tok)[0, 0])
    return time.perf_counter() - t0


print("warmup 8...", file=sys.stderr, flush=True)
print(f"warm8: {run(8):.2f}s", file=sys.stderr, flush=True)
print(f"warm32: {run(32):.2f}s", file=sys.stderr, flush=True)
t_short = run(64)
t_long = run(320)
dt = t_long - t_short
n = 320 - 64
print(f"{MODE} {QNAME}: {n/dt:.1f} tok/s  ({dt/n*1e3:.3f} ms/token)  "
      f"short={t_short:.2f}s long={t_long:.2f}s past~{int(np.asarray(past))}")
