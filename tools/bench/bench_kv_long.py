"""Long-window serving: {bf16, int8 KV} x {uniform, mixed} at S=1024.

The int8 KV cache's pitch is long-window serving — at B=32, W=1024 a
lockstep step reads ~3.2 GB of bf16 KV vs ~170 MB of packed weights, and
int8 halves the KV stream. The short-window headline bench can't see that
(its windows stay at 128). Round 4 (VERDICT r3 #8) widened this probe to
the full decision table in ONE process (cross-process chip drift would
invalidate the comparison):

  uniform: every prompt 768 tokens, n_predict 64, greedy — the lockstep
           window is fully used by every slot (bucketing can't hurt)
  mixed:   prompts 448..832, n_predict 16..96 staggered, per-request
           sampling (25% greedy rows) — the production shape where the
           batch window buckets to the longest live request

Usage (on TPU): python tools/bench/bench_kv_long.py [n_waves] [B]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/biogpt_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from biogpt_tpu.config import BioGptConfig, GenerationParams
from biogpt_tpu.modelio.synthetic import make_random_quantized_params
from biogpt_tpu.quant.codecs import GGML_TYPE_BY_NAME
from biogpt_tpu.runtime.serving import BatchedEngine, Request


def main() -> int:
    n_waves = int(_sys.argv[1]) if len(_sys.argv) > 1 else 2
    B = int(_sys.argv[2]) if len(_sys.argv) > 2 else 32
    config = BioGptConfig()
    params = make_random_quantized_params(config, GGML_TYPE_BY_NAME["q4_0"],
                                          seed=0)
    gen_greedy = GenerationParams(temp=0.0, stop_at_eos=False)
    gen_mixed = GenerationParams(temp=0.7, top_k=40, top_p=0.9,
                                 stop_at_eos=True, seed=11)

    def make_uniform(n, seed):
        rng = np.random.default_rng(seed)
        return [Request(
            prompt_ids=[2] + rng.integers(4, 40000, size=767).tolist(),
            n_predict=64, request_id=i) for i in range(n)]

    def make_mixed(n, seed):
        rng = np.random.default_rng(seed)
        out = []
        for i in range(n):
            plen = int(rng.integers(448, 832))
            greedy_row = rng.random() < 0.25
            out.append(Request(
                prompt_ids=[2] + rng.integers(4, 40000,
                                              size=plen - 1).tolist(),
                n_predict=int(rng.choice([16, 32, 48, 64, 96])),
                request_id=i,
                temp=0.0 if greedy_row else float(
                    rng.choice([0.7, 0.9, 1.0])),
                top_k=40, top_p=0.9))
        return out

    workloads = [("uniform", make_uniform, gen_greedy),
                 ("mixed", make_mixed, gen_mixed)]
    results = {}
    for kv_quant in (False, True):
        label = "int8" if kv_quant else "bf16"
        be = BatchedEngine(config, params, max_batch=B,
                           compute_dtype=jnp.bfloat16, max_seq=1024,
                           chunk=16, kv_quant=kv_quant)
        for wname, mk, gen in workloads:
            seeds = [100 + r for r in range(3)]
            t0 = time.perf_counter()
            for s in seeds:   # warm every measured workload (compiles)
                be.serve(mk(n_waves * B, s), gen)
            print(f"[{label}/{wname}] warm: "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            aggs = []
            for r, s in enumerate(seeds):
                reqs = mk(n_waves * B, s)
                t0 = time.perf_counter()
                out = be.serve(reqs, gen)
                dt = time.perf_counter() - t0
                toks = sum(len(x.new_ids) for x in out.values())
                aggs.append(toks / dt)
                print(f"[{label}/{wname}][{r}] {toks} toks in "
                      f"{dt * 1e3:.0f} ms ({aggs[-1]:.0f} tok/s)",
                      flush=True)
            results[(label, wname)] = sorted(aggs)[len(aggs) // 2]
        del be
    print(f"\nlong-window serving table (S=1024, B={B}, "
          f"{n_waves * B} reqs/run, medians of 3):", flush=True)
    print(f"{'':10s} {'uniform':>10s} {'mixed':>10s}", flush=True)
    for label in ("bf16", "int8"):
        print(f"{label:10s} {results[(label, 'uniform')]:>10.0f} "
              f"{results[(label, 'mixed')]:>10.0f}", flush=True)
    for wname in ("uniform", "mixed"):
        r = results[("int8", wname)] / results[("bf16", wname)]
        print(f"int8/bf16 [{wname}]: {r:.2f}x", flush=True)
    return 0


if __name__ == "__main__":
    _sys.exit(main())
