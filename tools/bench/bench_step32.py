"""Decompose the B=32 serving step on the real chip (round 4).

Times 16-step lax.scans over: (a) megakernel only, (b) + per-slot cache
writes, (c) + the OLD greedy epilogue (wide lm_head logits -> XLA
argmax + isfinite), (d) + the NEW fused greedy epilogue
(LN+lm_head+argmax kernel, per-row health), (e) + the per-request
sampler (the sampled serving epilogue). (c) vs (d) is the round-4
greedy-tail-fusion A/B; (b)-(a) is the cache-write cost the round-3
staged_kv experiment targeted; (e)-(d) is what sampling costs over
greedy at B=32.

Env: STEP_B (default 32), STEP_W (128), STEP_SEQ (512).
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
from biogpt_tpu.models.biogpt import (forward_fused_decode,
                                      forward_fused_decode_greedy)
from biogpt_tpu.runtime.sampling import greedy, sample_per_request

config = BioGptConfig()
B = int(_os.environ.get("STEP_B", "32"))
W = int(_os.environ.get("STEP_W", "128"))
SEQ = int(_os.environ.get("STEP_SEQ", "512"))
STEPS = 16
params = jax.device_put(_pack_matmul_weights(
    make_random_quantized_params(config, GGML_TYPE_BY_NAME["q4_0"], seed=0)))
layers = params["layers"]
L, D = config.n_layer, config.d_model


def write_rows(k, v, kr, vr, past):
    zero = jnp.zeros((), jnp.int32)
    for b in range(B):
        idx = (zero, jnp.int32(b), past[b], zero)
        k = jax.lax.dynamic_update_slice(
            k, kr[:, b:b + 1].reshape(L, 1, 1, D).astype(k.dtype), idx)
        v = jax.lax.dynamic_update_slice(
            v, vr[:, b:b + 1].reshape(L, 1, 1, D).astype(v.dtype), idx)
    return k, v


def scan_kernel_only(x0, k, v, past):
    def body(carry, _):
        (x,) = carry
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
        k, v = write_rows(k, v, kr, vr, past)
        return (xo, k, v, past + 1), None
    (x, k, v, p), _ = jax.lax.scan(body, (x0, k, v, past), None,
                                   length=STEPS)
    return x, k, v


def scan_greedy_old(toks, cache, past):
    def body(carry, _):
        toks, cache, past, health = carry
        logits, cache = forward_fused_decode(
            params, toks, cache, past, config, kv_window=W)
        health = health & jnp.all(jnp.isfinite(logits))
        nxt = greedy(logits)
        return (nxt[:, None], cache, past + 1, health), None
    (toks, cache, past, health), _ = jax.lax.scan(
        body, (toks, cache, past, jnp.bool_(True)), None, length=STEPS)
    return toks, cache, health


def scan_greedy_fused(toks, cache, past):
    def body(carry, _):
        toks, cache, past, health = carry
        nxt, cache, ok = forward_fused_decode_greedy(
            params, toks, cache, past, config, kv_window=W,
            with_health=True, health_per_row=True)
        health = health & jnp.all(ok)
        return (nxt[:, None], cache, past + 1, health), None
    (toks, cache, past, health), _ = jax.lax.scan(
        body, (toks, cache, past, jnp.bool_(True)), None, length=STEPS)
    return toks, cache, health


def scan_sampled(toks, cache, past, rng, temps, top_ps, top_ks):
    def body(carry, _):
        toks, cache, past, rng, health = carry
        logits, cache = forward_fused_decode(
            params, toks, cache, past, config, kv_window=W)
        health = health & jnp.all(jnp.isfinite(logits))
        rng, sub = jax.random.split(rng)
        nxt = sample_per_request(sub, logits, top_ks, top_ps, temps,
                                 max_top_k=64)
        return (nxt[:, None], cache, past + 1, rng, health), None
    (toks, cache, past, rng, health), _ = jax.lax.scan(
        body, (toks, cache, past, rng, jnp.bool_(True)), None, length=STEPS)
    return toks, cache, health


def bench(name, fn, args):
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(*args))

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = jfn(*args)
        jax.block_until_ready(o)
        return time.perf_counter() - t0

    run(4)
    samples = []
    for _ in range(3):
        t_s, t_l = run(4), run(12)
        samples.append((t_l - t_s) / 8)
    per_call = sorted(samples)[1]
    print(f"{name:22s}: {per_call*1e3:7.2f} ms per {STEPS}-step scan "
          f"({per_call/STEPS*1e3:.3f} ms/step) "
          f"[spread {min(samples)*1e3/STEPS:.3f}-{max(samples)*1e3/STEPS:.3f}]",
          flush=True)
    return per_call / STEPS


print(f"B={B} W={W} SEQ={SEQ}", flush=True)
past = jnp.full((B,), 64, jnp.int32)
x0 = jnp.ones((B, D), jnp.float32)
cache = init_cache(config, batch=B, max_len=SEQ, dtype=jnp.bfloat16)
toks = jnp.full((B, 1), 17, jnp.int32)
rng = jax.random.PRNGKey(0)
temps = jnp.full((B,), 0.8, jnp.float32)
top_ps = jnp.full((B,), 0.9, jnp.float32)
top_ks = jnp.full((B,), 40, jnp.int32)

a = bench("kernel only", scan_kernel_only, (x0, cache.k, cache.v, past))
b = bench("kernel + cache writes", scan_kernel_writes,
          (x0, cache.k, cache.v, past))
c = bench("greedy (logits+argmax)", scan_greedy_old, (toks, cache, past))
d = bench("greedy (fused argmax)", scan_greedy_fused, (toks, cache, past))
e = bench("sampled (per-request)", scan_sampled,
          (toks, cache, past, rng, temps, top_ps, top_ks))
print(f"\ncache writes: {1e3*(b-a):+.3f} ms/step | "
      f"old epilogue: {1e3*(c-b):+.3f} | fused epilogue: {1e3*(d-b):+.3f} | "
      f"fusion win: {1e3*(c-d):+.3f} | sampler over fused: {1e3*(e-d):+.3f}",
      flush=True)


def write_rows_scatter(k, v, kr, vr, past):
    bix = jnp.arange(B, dtype=jnp.int32)
    k = k.at[:, bix, past, :].set(kr.astype(k.dtype))
    v = v.at[:, bix, past, :].set(vr.astype(v.dtype))
    return k, v


def scan_kernel_scatter(x0, k, v, past):
    def body(carry, _):
        x, k, v, past = carry
        xo, kr, vr = decode_step_fused(x, layers, k, v, past,
                                       n_head=config.n_head, window=W)
        k, v = write_rows_scatter(k, v, kr, vr, past)
        return (xo, k, v, past + 1), None
    (x, k, v, p), _ = jax.lax.scan(body, (x0, k, v, past), None,
                                   length=STEPS)
    return x, k, v


f = bench("kernel + scatter write", scan_kernel_scatter,
          (x0, cache.k, cache.v, past))
print(f"scatter vs per-slot DUS: {1e3*(f-a):+.3f} vs {1e3*(b-a):+.3f} "
      f"ms/step", flush=True)


def scan_sampled_fused(toks, cache, past, rng, temps, top_ps, top_ks):
    """Round-5 sampled tail fusion: LN+lm_head+gmax+commit in ONE kernel,
    sampler consumes the kernel's group maxima (gather-top-k stage 1)."""
    from biogpt_tpu.models.biogpt import forward_fused_decode_sampled

    def body(carry, _):
        toks, cache, past, rng, health = carry
        logits, gmax, cache = forward_fused_decode_sampled(
            params, toks, cache, past, config, kv_window=W)
        health = health & jnp.all(jnp.isfinite(gmax))
        rng, sub = jax.random.split(rng)
        nxt = sample_per_request(sub, logits, top_ks, top_ps, temps,
                                 max_top_k=64, gmax=gmax)
        return (nxt[:, None], cache, past + 1, rng, health), None
    (toks, cache, past, rng, health), _ = jax.lax.scan(
        body, (toks, cache, past, rng, jnp.bool_(True)), None, length=STEPS)
    return toks, cache, health


def scan_sampled_alt(toks, cache, past, rng, temps, top_ps, top_ks):
    # sample_per_request is itself jitted and its cached trace would
    # otherwise ignore the env flip; flips to whichever top-k formulation
    # is NOT the current default (gather is the default since round 5)
    sample_per_request.clear_cache()
    alt = "grouped" if _os.environ.get("BIOGPT_TOPK", "gather") != "grouped" \
        else "gather"
    _os.environ["BIOGPT_TOPK"] = alt
    try:
        return scan_sampled(toks, cache, past, rng, temps, top_ps, top_ks)
    finally:
        _os.environ.pop("BIOGPT_TOPK", None)
        sample_per_request.clear_cache()


if _os.environ.get("STEP_SAMPLER_AB", "0") == "1":
    # same-process A/B: the cross-process comparison of the two top-k
    # formulations disagreed with the standalone probe — chip drift or
    # context effects; this pins it
    g1 = bench("sampled A/B: default", scan_sampled,
               (toks, cache, past, rng, temps, top_ps, top_ks))
    g2 = bench("sampled A/B: alt", scan_sampled_alt,
               (toks, cache, past, rng, temps, top_ps, top_ks))
    g3 = bench("sampled A/B: default(2)", scan_sampled,
               (toks, cache, past, rng, temps, top_ps, top_ks))
    print(f"default {1e3*g1:.3f}/{1e3*g3:.3f} vs alt {1e3*g2:.3f} "
          f"ms/step (same process)", flush=True)

h = bench("sampled (fused tail)", scan_sampled_fused,
          (toks, cache, past, rng, temps, top_ps, top_ks))
print(f"sampled fused tail vs unfused: {1e3*h:.3f} vs {1e3*e:.3f} ms/step "
      f"({1e3*(e-h):+.3f})", flush=True)


def scan_kernel_commit(x0, k, v, past):
    from biogpt_tpu.ops.pallas_decode import kv_commit_pallas

    def body(carry, _):
        x, k, v, past = carry
        xo, kr, vr = decode_step_fused(x, layers, k, v, past,
                                       n_head=config.n_head, window=W)
        k, v = kv_commit_pallas(k, v, jnp.transpose(kr, (1, 0, 2)),
                                jnp.transpose(vr, (1, 0, 2)), past)
        return (xo, k, v, past + 1), None
    (x, k, v, p), _ = jax.lax.scan(body, (x0, k, v, past), None,
                                   length=STEPS)
    return x, k, v


g = bench("kernel + commit kernel", scan_kernel_commit,
          (x0, cache.k, cache.v, past))
print(f"commit kernel vs DUS: {1e3*(g-a):+.3f} vs {1e3*(b-a):+.3f} ms/step",
      flush=True)
