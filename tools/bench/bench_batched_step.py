"""Decompose the serving B=8 step cost on the real chip.

Times lax.scan over: (a) kernel only, (b) kernel + cache writes,
(c) full forward_fused_decode + greedy, to locate the gap between the
0.56 ms standalone kernel and the ~2.9 ms serving step.
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
from biogpt_tpu.runtime.cache import init_cache, KVCache
from biogpt_tpu.ops.pallas_decode import decode_step_fused
from biogpt_tpu.models.biogpt import forward_fused_decode
from biogpt_tpu.runtime.sampling import greedy

config = BioGptConfig()
B, W, STEPS = 8, 128, 16
params = jax.device_put(_pack_matmul_weights(
    make_random_quantized_params(config, GGML_TYPE_BY_NAME["q4_0"], seed=0)))
layers = params["layers"]
L, D = config.n_layer, config.d_model


def scan_kernel_only(x0, k, v, past):
    def body(carry, _):
        x, = carry
        xo, kr, vr = decode_step_fused(x, layers, k, v, past,
                                       n_head=config.n_head, window=W)
        return (xo,), None
    (x,), _ = jax.lax.scan(body, (x0,), None, length=STEPS)
    return x


def scan_kernel_writes(x0, k, v, past):
    def body(carry, _):
        x, k, v, past = carry
        xo, kr, vr = decode_step_fused(x, layers, k, v, past,
                                       n_head=config.n_head, window=W)
        zero = jnp.zeros((), jnp.int32)
        for b in range(B):
            idx = (zero, jnp.int32(b), past[b], zero)
            k = jax.lax.dynamic_update_slice(
                k, kr[:, b:b + 1].reshape(L, 1, 1, D).astype(k.dtype), idx)
            v = jax.lax.dynamic_update_slice(
                v, vr[:, b:b + 1].reshape(L, 1, 1, D).astype(v.dtype), idx)
        return (xo, k, v, past + 1), None
    (x, k, v, p), _ = jax.lax.scan(body, (x0, k, v, past), None, length=STEPS)
    return x, k, v


def scan_full(toks, cache, past):
    def body(carry, _):
        toks, cache, past = carry
        logits, cache = forward_fused_decode(
            params, toks, cache, past, config, kv_window=W)
        nxt = greedy(logits)
        return (nxt[:, None], cache, past + 1), None
    (toks, cache, past), _ = jax.lax.scan(
        body, (toks, cache, past), None, length=STEPS)
    return toks, cache


def bench(name, fn, args, donate=()):
    jfn = jax.jit(fn, donate_argnums=donate)
    out = jax.block_until_ready(jfn(*args))

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = jfn(*args)
        jax.block_until_ready(o)
        return time.perf_counter() - t0

    run(4)
    t_s, t_l = run(4), run(12)
    per_call = (t_l - t_s) / 8
    print(f"{name:22s}: {per_call*1e3:7.2f} ms per {STEPS}-step scan "
          f"({per_call/STEPS*1e3:.3f} ms/step)", flush=True)


past = jnp.full((B,), 64, jnp.int32)
x0 = jnp.ones((B, D), jnp.float32)
cache = init_cache(config, batch=B, max_len=512, dtype=jnp.bfloat16)
bench("kernel only", scan_kernel_only, (x0, cache.k, cache.v, past))
bench("kernel + cache writes", scan_kernel_writes,
      (x0, cache.k, cache.v, past))
toks = jnp.full((B, 1), 17, jnp.int32)
bench("full fused step", scan_full, (toks, cache, past))
