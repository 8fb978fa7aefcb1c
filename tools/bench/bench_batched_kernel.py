"""Time the decode megakernel standalone at B=1 vs B=8 on the real chip."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
import time, sys
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

for B in (16, 24, 32):
    cache = init_cache(config, batch=B, max_len=512, dtype=jnp.bfloat16)
    x0 = jnp.ones((B, config.d_model), jnp.float32)
    past = jnp.full((B,), 64, jnp.int32)
    fn = jax.jit(lambda x, k, v, p: decode_step_fused(
        x, layers, k, v, p, n_head=config.n_head, window=128))
    out = fn(x0, cache.k, cache.v, past)
    jax.block_until_ready(out)
    # steady state: chain x0 through to serialize, fetch once
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
    print(f"B={B}: {dt*1e3:.3f} ms/step marginal ({dt*1e3/B:.3f} ms/slot-token)",
          flush=True)
