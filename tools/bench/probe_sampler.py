"""Micro-probe: per-step cost of the batched sampler's pieces at (B, 42k).

Times lax.top_k, argmax, and the full per-request sampler at serving
shapes (marginal, chained). Usage: python tools/bench/probe_sampler.py [B]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/biogpt_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np

from biogpt_tpu.runtime.sampling import sample_per_request

B = int(_sys.argv[1]) if len(_sys.argv) > 1 else 32
V = 42384
rng = np.random.default_rng(0)
logits = jnp.asarray(rng.normal(size=(B, V)).astype(np.float32))
key = jax.random.PRNGKey(0)
tk = jnp.full((B,), 40, jnp.int32)
tp = jnp.full((B,), 0.9, jnp.float32)
tm = jnp.full((B,), 0.8, jnp.float32)


def bench(name, fn):
    # chain: feed a scalar derived from the output back into the input so
    # iterations serialize; ONE fetch ends the chain
    f = jax.jit(fn)
    out = f(logits)
    jax.block_until_ready(out)

    def run(n):
        x = logits
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = f(x)
            x = logits + o.astype(jnp.float32).reshape(-1)[0] * 1e-9
        jax.block_until_ready(o)
        return time.perf_counter() - t0

    run(16)
    t_s, t_l = run(16), run(80)
    dt = (t_l - t_s) / 64
    print(f"{name:28s}: {dt * 1e3:7.3f} ms/step", flush=True)


bench("argmax(B,42k)", lambda x: jnp.argmax(x, -1).astype(jnp.int32))
bench("top_k(64)", lambda x: jax.lax.top_k(x, 64)[1][:, 0])
bench("top_k(64) grouped(16)", lambda x: jax.lax.top_k(
    jax.lax.top_k(x.reshape(B, 16, V // 16 + (0 if V % 16 == 0 else 0))
    if V % 16 == 0 else x[:, :42368].reshape(B, 16, 2648), 64)[0]
    .reshape(B, -1), 64)[1][:, 0])
bench("sample_per_request", lambda x: sample_per_request(
    key, x, tk, tp, tm, max_top_k=64))


def old_sample(rngk, logits, top_k, top_p, temp, max_top_k=64):
    """Round-3-start formulation: top_k on scaled logits + argmax fallback."""
    B, V = logits.shape
    k_max = min(max_top_k, V)
    temp = jnp.broadcast_to(jnp.asarray(temp, jnp.float32), (B,))[:, None]
    top_p = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (B,))[:, None]
    top_k = jnp.broadcast_to(jnp.asarray(top_k, jnp.int32), (B,))[:, None]
    scaled = logits.astype(jnp.float32) / jnp.maximum(temp, 1e-8)
    top_logits, top_ids = jax.lax.top_k(scaled, k_max)
    rank = jnp.arange(k_max, dtype=jnp.int32)[None, :]
    in_k = rank < jnp.minimum(top_k, k_max)
    top_logits = jnp.where(in_k, top_logits, -jnp.inf)
    probs = jax.nn.softmax(top_logits, axis=-1)
    cumsum = jnp.cumsum(probs, axis=-1)
    keep = (((cumsum - probs) < top_p) | (top_p >= 1.0)) & in_k
    probs = jnp.where(keep, probs, 0.0)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    choice = jax.random.categorical(
        rngk, jnp.log(jnp.maximum(probs, 1e-38)), axis=-1)
    sampled = jnp.take_along_axis(top_ids, choice[:, None], axis=-1)[:, 0]
    return jnp.where(temp[:, 0] <= 0.0,
                     jnp.argmax(logits, -1), sampled).astype(jnp.int32)


bench("sample_per_request NEW", lambda x: sample_per_request(
    key, x, tk, tp, tm, max_top_k=64))
bench("sample OLD formulation", lambda x: old_sample(
    key, x, tk, tp, tm, max_top_k=64))
