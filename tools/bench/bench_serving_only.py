"""Standalone serving-aggregate bench (mirrors bench.py's bench_serving)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
import sys
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
    config = BioGptConfig()
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    params = make_random_quantized_params(config, GGML_TYPE_BY_NAME["q4_0"],
                                          seed=0)
    B, n_pred = 8, 48
    be = BatchedEngine(config, params, max_batch=B,
                       compute_dtype=jnp.bfloat16, max_seq=512, chunk=chunk)
    rng = np.random.default_rng(0)

    def make_reqs(n):
        return [Request(prompt_ids=[2] + rng.integers(4, 40000, size=int(
            rng.integers(4, 24))).tolist(), n_predict=n_pred, request_id=i)
            for i in range(n)]

    gen = GenerationParams(temp=0.0, stop_at_eos=False)
    print(f"chunk={chunk}; warming (2 serve calls)...", flush=True)
    t0 = time.perf_counter()
    for _ in range(2):
        be.serve(make_reqs(3 * B), gen)
    print(f"warm: {time.perf_counter() - t0:.1f}s", flush=True)
    reqs = make_reqs(3 * B)
    t0 = time.perf_counter()
    results = be.serve(reqs, gen)
    dt = time.perf_counter() - t0
    total_new = sum(len(r.new_ids) for r in results.values())
    print(f"serving: {total_new / dt:.1f} tok/s aggregate "
          f"({total_new} tokens in {dt:.2f}s) at B={B} chunk={chunk}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
