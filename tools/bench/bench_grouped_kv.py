"""A/B the group-clamped KV fetch against the lockstep megakernel (round 5).

The mixed-serving decomposition (RESULTS.md round 4) blamed the batch-wide
KV window: one 300-380-token prompt forces every one of the 32 slots to
stream the 512-row window. Group-clamped streaming (pallas_decode
``kv_groups``) keeps the (L, nW) grid but fetches the cache as G per-group
block streams whose index maps clamp at each group's own live block count
— Pallas's revisit rule elides the copy, so short groups stop paying KV
traffic at their own window, with none of the per-block sequencing cost
that made per-slot paged KV -36% at B=32.

Scans 16 decode steps (kernel + commit kernel, the serving hot loop) over:
  - RAGGED pasts shaped like the mixed bench (a few long slots, most short)
    with the longs either CLUSTERED into one group (what length-affinity
    scheduling produces) or SCATTERED round-robin (what naive slot
    assignment produces)
  - UNIFORM-FULL pasts (the overhead check: grouping must not cost when
    every group needs every block)

Env: GKV_B (32), GKV_SEQ/GKV_W (512), GKV_GROUPS (comma list, "4,8,16").
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
from biogpt_tpu.ops.pallas_decode import decode_step_fused, kv_commit_pallas

config = BioGptConfig()
B = int(_os.environ.get("GKV_B", "32"))
SEQ = int(_os.environ.get("GKV_SEQ", "512"))
W = int(_os.environ.get("GKV_W", str(SEQ)))
GROUPS = [int(g) for g in _os.environ.get("GKV_GROUPS", "4,8,16").split(",")]
STEPS = 16
params = jax.device_put(_pack_matmul_weights(
    make_random_quantized_params(config, GGML_TYPE_BY_NAME["q4_0"], seed=0)))
layers = params["layers"]
L, D = config.n_layer, config.d_model


def make_scan(kv_groups):
    def scan(x0, k, v, past):
        def body(carry, _):
            x, k, v, past = carry
            xo, kr, vr = decode_step_fused(
                x, layers, k, v, past, n_head=config.n_head, window=W,
                kv_groups=kv_groups)
            k, v = kv_commit_pallas(k, v, jnp.transpose(kr, (1, 0, 2)),
                                    jnp.transpose(vr, (1, 0, 2)), past)
            return (x, k, v, past + 1), None
        (x, k, v, p), _ = jax.lax.scan(body, (x0, k, v, past), None,
                                       length=STEPS)
        return x, k, v
    return scan


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
    print(f"{name:34s}: {per_call/STEPS*1e3:7.3f} ms/step "
          f"[spread {min(samples)*1e3/STEPS:.3f}-{max(samples)*1e3/STEPS:.3f}]",
          flush=True)
    return per_call / STEPS


# past patterns: ~mixed-bench shape (1/4 long at ~430, 3/4 short at ~60)
n_long = max(1, B // 4)
longs = [430 + 7 * i for i in range(n_long)]
shorts = [40 + 3 * i for i in range(B - n_long)]
clustered = jnp.asarray(longs + shorts, jnp.int32)
scattered_list = []
li, si = iter(longs), iter(shorts)
for i in range(B):
    v = next(li, None) if i % 4 == 0 else next(si, None)
    if v is None:
        v = next(li, None) or next(si)
    scattered_list.append(v)
scattered = jnp.asarray(scattered_list, jnp.int32)
uniform = jnp.full((B,), SEQ - STEPS - 2, jnp.int32)

print(f"B={B} W={W} SEQ={SEQ} groups={GROUPS}", flush=True)
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
cache = init_cache(config, batch=B, max_len=SEQ, dtype=jnp.bfloat16)

results = {}
for pname, past in (("ragged-clustered", clustered),
                    ("ragged-scattered", scattered),
                    ("uniform-full", uniform)):
    base = bench(f"lockstep       {pname}", make_scan(None),
                 (x0, cache.k, cache.v, past))
    results[("lockstep", pname)] = base
    for G in GROUPS:
        r = bench(f"grouped G={G:<4}  {pname}", make_scan(G),
                  (x0, cache.k, cache.v, past))
        results[(f"G={G}", pname)] = r

print("\nsummary (ms/step):", flush=True)
for k, v in results.items():
    print(f"  {k}: {v*1e3:.3f}", flush=True)
