"""Measure megakernel compile time vs shape/structure (throwaway).

Also enables the persistent compilation cache to test it works through the
axon PJRT plugin.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/biogpt_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from biogpt_tpu.config import BioGptConfig
from biogpt_tpu.modelio.synthetic import make_random_quantized_params
from biogpt_tpu.ops.pallas_decode import decode_step_fused
from biogpt_tpu.quant.codecs import GGML_TYPE_Q4_0
from biogpt_tpu.runtime.engine import _pack_matmul_weights

which = sys.argv[1] if len(sys.argv) > 1 else "small"

if which == "small":
    # full hidden dims, 2 layers — same kernel body as 347M, small weights
    config = BioGptConfig(n_layer=2)
elif which == "narrow":
    # narrow dims — tests whether compile time scales with D/F
    config = BioGptConfig(n_layer=2, d_model=256, d_ff=1024, n_head=4,
                          n_vocab=4096)
else:
    config = BioGptConfig()

print(f"config: L={config.n_layer} D={config.d_model} F={config.d_ff}",
      file=sys.stderr, flush=True)
params = _pack_matmul_weights(
    make_random_quantized_params(config, GGML_TYPE_Q4_0, seed=0))
layers = jax.device_put(params["layers"])

L, D = config.n_layer, config.d_model
S = config.n_positions
kc = jnp.zeros((L, 1, S, D), jnp.bfloat16)
vc = jnp.zeros((L, 1, S, D), jnp.bfloat16)
x0 = jnp.ones((1, D), jnp.float32)

t0 = time.perf_counter()
out = decode_step_fused(x0, layers, kc, vc, jnp.int32(3),
                        n_head=config.n_head, window=512)
jax.block_until_ready(out)
print(f"{which}: compile+run {time.perf_counter() - t0:.1f}s", flush=True)

t0 = time.perf_counter()
out = decode_step_fused(x0, layers, kc, vc, jnp.int32(4),
                        n_head=config.n_head, window=512)
jax.block_until_ready(out)
print(f"{which}: cached-call {time.perf_counter() - t0:.3f}s", flush=True)
