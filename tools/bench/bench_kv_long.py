"""Long-window serving: int8 KV cache vs bf16 (VERDICT r2 #5).

The int8 KV cache's pitch is long-window serving — at B=8, W=1024 a
lockstep step reads ~1.6 GB of bf16 KV vs ~170 MB of packed weights, and
int8 halves the KV stream. The short-window headline bench can't see that
(its windows stay at 128). This probe serves MIXED-LENGTH long prompts
(448..832 tokens) to n_positions=1024 with and without ``kv_quant`` and
reports the aggregate for both modes.

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
    B = int(_sys.argv[2]) if len(_sys.argv) > 2 else 8
    config = BioGptConfig()
    params = make_random_quantized_params(config, GGML_TYPE_BY_NAME["q4_0"],
                                          seed=0)
    n_pred = 64
    gen = GenerationParams(temp=0.0, stop_at_eos=False)
    rng = np.random.default_rng(3)

    def make_reqs(n):
        # mixed long prompts: 448..832 tokens, so live windows sit at
        # 512..1024 for the whole generation
        return [Request(
            prompt_ids=[2] + rng.integers(4, 40000, size=int(
                rng.integers(448, 832))).tolist(),
            n_predict=n_pred, request_id=i) for i in range(n)]

    results = {}
    for kv_quant in (False, True):
        label = "int8" if kv_quant else "bf16"
        be = BatchedEngine(config, params, max_batch=B,
                           compute_dtype=jnp.bfloat16, max_seq=1024,
                           chunk=16, kv_quant=kv_quant)
        print(f"[{label}] warming (2 serve calls)...", flush=True)
        t0 = time.perf_counter()
        for _ in range(2):
            be.serve(make_reqs(B), gen)
        print(f"[{label}] warm: {time.perf_counter() - t0:.1f}s", flush=True)
        aggs = []
        for r in range(3):
            reqs = make_reqs(n_waves * B)
            t0 = time.perf_counter()
            out = be.serve(reqs, gen)
            dt = time.perf_counter() - t0
            toks = sum(len(x.new_ids) for x in out.values())
            aggs.append(toks / dt)
            print(f"[{label}][{r}] {toks} toks in {dt * 1e3:.0f} ms "
                  f"({aggs[-1]:.0f} tok/s)", flush=True)
        results[label] = sorted(aggs)[len(aggs) // 2]
        del be
    print(f"long-window serving (prompts 448..832, n_pred {n_pred}, "
          f"S=1024, B={B}): bf16 {results['bf16']:.0f} tok/s, "
          f"int8 {results['int8']:.0f} tok/s "
          f"({results['int8'] / results['bf16']:.2f}x)", flush=True)
    return 0


if __name__ == "__main__":
    _sys.exit(main())
