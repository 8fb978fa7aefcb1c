"""On-chip token-identity check for round-5 serving kernels.

Interpret-mode tests prove the math; this proves the COMPILED Mosaic
behavior on the real chip — specifically that the grouped index-map
clamping + revisit elision never feeds stale KV into valid lanes, and
that the fused sampled epilogue (gmax accumulator output) matches the
unfused path after real lowering.

Two comparisons, each demanding identical tokens:
  1. kv_groups=8 vs kv_groups=1, GREEDY mixed-length requests (greedy
     because slot-assignment order differs between the two schedulers,
     and the per-chunk sampler key is row-coupled — only greedy rows are
     assignment-invariant).
  2. fused sampled tail vs unfused, SAME kv_groups=8 (identical
     scheduling -> identical rng row coupling), per-request sampled.
Exit 0 = identical.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/biogpt_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from biogpt_tpu.config import BioGptConfig, GenerationParams
from biogpt_tpu.modelio.synthetic import make_random_quantized_params
from biogpt_tpu.quant.codecs import GGML_TYPE_BY_NAME
from biogpt_tpu.runtime.serving import BatchedEngine, Request

config = BioGptConfig()
params = make_random_quantized_params(config, GGML_TYPE_BY_NAME["q4_0"],
                                      seed=0)
rng = np.random.default_rng(7)
vmax = min(40000, config.n_vocab - 2)


def make_reqs(sampled):
    reqs = []
    for i in range(48):
        plen = int(rng.integers(4, 24)) if i % 4 else int(
            rng.integers(300, 380))
        reqs.append(Request(
            prompt_ids=[2] + rng.integers(4, vmax, size=plen - 1).tolist(),
            n_predict=24, request_id=i,
            temp=0.8 if (sampled and i % 3) else 0.0,
            top_k=40, top_p=0.9))
    return reqs


def serve_with(reqs, gen, *, kv_groups, unfuse=False):
    be = BatchedEngine(config, params, max_batch=32,
                       compute_dtype=jnp.bfloat16, max_seq=512, chunk=16,
                       kv_groups=kv_groups)
    if unfuse:
        be._fused_sampled = False
        be._fused_greedy = False
    res = be.serve([Request(prompt_ids=list(r.prompt_ids),
                            n_predict=r.n_predict, request_id=r.request_id,
                            temp=r.temp, top_k=r.top_k, top_p=r.top_p)
                    for r in reqs], gen)
    del be
    return {i: res[i].ids for i in res}


ok = True


def compare(tag, a, b):
    global ok
    bad = [i for i in a if a[i] != b[i]]
    if bad:
        i = bad[0]
        print(f"MISMATCH [{tag}] {len(bad)} requests, e.g. req{i}: "
              f"{a[i][-8:]} vs {b[i][-8:]}", flush=True)
        ok = False
    else:
        print(f"[{tag}] token-identical ({len(a)} requests)", flush=True)


greedy_reqs = make_reqs(sampled=False)
gen_g = GenerationParams(temp=0.0, stop_at_eos=False, seed=3)
a = serve_with(greedy_reqs, gen_g, kv_groups=8)
b = serve_with(greedy_reqs, gen_g, kv_groups=1)
compare("grouped-vs-lockstep greedy", a, b)

sampled_reqs = make_reqs(sampled=True)
gen_s = GenerationParams(temp=0.8, top_k=40, top_p=0.9,
                         stop_at_eos=False, seed=3)
c = serve_with(sampled_reqs, gen_s, kv_groups=8)
d = serve_with(sampled_reqs, gen_s, kv_groups=8, unfuse=True)
compare("fused-vs-unfused sampled", c, d)

print("ON-CHIP CHECKS PASSED" if ok else "ON-CHIP CHECKS FAILED",
      flush=True)
_sys.exit(0 if ok else 1)
