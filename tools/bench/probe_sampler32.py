"""Where does the B=32 per-request sampler's ~0.94 ms/step go?

Times, under a 16-step scan with a dummy logits producer (a cheap matmul
so values change per step and nothing constant-folds): lax.top_k direct,
topk_2stage at several group counts, and the full sample_per_request —
on (32, 42384) f32 logits.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
import time
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/biogpt_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from biogpt_tpu.runtime.sampling import topk_2stage, sample_per_request

B, V, K, STEPS = 32, 42384, 64, 16
rng = np.random.RandomState(0)
seed_mat = jnp.asarray(rng.randn(128, V).astype(np.float32))
x0 = jnp.asarray(rng.randn(B, 128).astype(np.float32))
temps = jnp.full((B,), 0.8, jnp.float32)
top_ps = jnp.full((B,), 0.9, jnp.float32)
top_ks = jnp.full((B,), 40, jnp.int32)
key = jax.random.PRNGKey(0)


def make_scan(consume):
    def scan(x):
        def body(carry, _):
            x, acc = carry
            logits = jnp.dot(x, seed_mat)            # (B, V), ~10 us
            out = consume(logits)
            # fold the consumer's result back so nothing dead-codes
            x = x + out[:, None].astype(jnp.float32) * 1e-9
            return (x, acc + out.astype(jnp.int32)), None
        (x, acc), _ = jax.lax.scan(body, (x, jnp.zeros((B,), jnp.int32)),
                                   None, length=STEPS)
        return x, acc
    return scan


def bench(name, consume):
    jfn = jax.jit(make_scan(consume))
    jax.block_until_ready(jfn(x0))

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = jfn(x0)
        jax.block_until_ready(o)
        return time.perf_counter() - t0

    run(4)
    samples = []
    for _ in range(3):
        t_s, t_l = run(4), run(12)
        samples.append((t_l - t_s) / 8 / STEPS)
    per = sorted(samples)[1]
    print(f"{name:28s}: {per*1e3:7.3f} ms/step "
          f"[{min(samples)*1e3:.3f}-{max(samples)*1e3:.3f}]", flush=True)
    return per


def use_all(pair):
    # consume every value AND index so XLA cannot simplify the top-k to
    # an argmax (the first probe version sliced [:, 0] and measured 6 us:
    # the simplifier had rewritten it)
    v, i = pair
    return v.sum(-1) + i.astype(jnp.float32).sum(-1) * 1e-9


bench("producer only (argmax)",
      lambda lg: jnp.argmax(lg, -1).astype(jnp.int32))
bench("lax.top_k direct k=64",
      lambda lg: use_all(jax.lax.top_k(lg, K)))
for g in (8, 16, 32, 64):
    bench(f"topk_2stage groups={g}",
          lambda lg, g=g: use_all(topk_2stage(lg, K, groups=g)))
bench("topk_2stage k=40 g=16",
      lambda lg: use_all(topk_2stage(lg, 40, groups=16)))
bench("full sample_per_request",
      lambda lg: sample_per_request(key, lg, top_ks, top_ps, temps,
                                    max_top_k=K))
bench("topk32 (max_top_k=32)",
      lambda lg: sample_per_request(key, lg, jnp.minimum(top_ks, 32),
                                    top_ps, temps, max_top_k=32))
bench("bf16 2stage g=32",
      lambda lg: use_all(topk_2stage(lg.astype(jnp.bfloat16), K,
                                     groups=32)))
