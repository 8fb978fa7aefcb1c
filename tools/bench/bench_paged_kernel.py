"""Paged (per-slot KV) vs lockstep batched megakernel on the real chip.

Measures the B=8 decode-step kernel at a long window under (a) uniform
full lengths — paged's worst case, pure grid-overhead comparison — and
(b) ragged lengths — the mixed-length serving case the paged path exists
for (each slot streams only its own live KV blocks).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
import time
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/biogpt_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from biogpt_tpu.config import BioGptConfig
from biogpt_tpu.modelio.synthetic import make_random_quantized_params
from biogpt_tpu.quant.codecs import GGML_TYPE_BY_NAME
from biogpt_tpu.runtime.engine import _pack_matmul_weights
from biogpt_tpu.runtime.cache import init_cache
from biogpt_tpu.ops.pallas_decode import decode_step_fused

config = BioGptConfig()
params = _pack_matmul_weights(
    make_random_quantized_params(config, GGML_TYPE_BY_NAME["q4_0"], seed=0))
layers = jax.device_put(params["layers"])

import sys
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
S, W = 512, 512
cache = init_cache(config, batch=B, max_len=S, dtype=jnp.bfloat16)
x0 = jnp.ones((B, config.d_model), jnp.float32)

rng = np.random.default_rng(1)
cases = {
    "uniform-full": np.full((B,), S - 1, np.int32),
    "ragged-mixed": np.resize(np.asarray(
        [32, 64, 96, 128, 256, 384, 448, 511], np.int32), B),
    "uniform-short": np.full((B,), 64, np.int32),
}

for paged in (False, True):
    for name, past_np in cases.items():
        past = jnp.asarray(past_np)
        fn = jax.jit(lambda x, k, v, p: decode_step_fused(
            x, layers, k, v, p, n_head=config.n_head, window=W,
            per_slot_kv=paged))
        out = fn(x0, cache.k, cache.v, past)
        jax.block_until_ready(out)

        def run(n):
            x = x0
            t0 = time.perf_counter()
            for _ in range(n):
                x, kr, vr = fn(x, cache.k, cache.v, past)
            jax.block_until_ready(x)
            return time.perf_counter() - t0
        run(32)
        t_s, t_l = run(32), run(160)
        dt = (t_l - t_s) / 128
        print(f"paged={int(paged)} {name:14s}: {dt*1e3:7.3f} ms/step "
              f"({B/dt:8.0f} tok/s agg)", flush=True)
