"""Separate serving's per-token rate from its fixed per-serve tail.

Runs bench-shaped serves at several request counts; a linear fit of wall
time vs tokens splits steady-state throughput from the fixed cost (ramp +
final drain flush). Also stamps the time from the LAST chunk launch to
serve() return (the tail itself).
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
    import sys as _s
    chunk = int(_s.argv[1]) if len(_s.argv) > 1 else 16
    kv_quant = "kvq" in _s.argv[2:]
    B = int(_s.argv[3]) if len(_s.argv) > 3 else 8
    sampled = "sampled" in _s.argv
    config = BioGptConfig()
    params = make_random_quantized_params(config, GGML_TYPE_BY_NAME["q4_0"],
                                          seed=0)
    n_pred = 48
    print(f"chunk={chunk} kv_quant={kv_quant} B={B} sampled={sampled}", flush=True)
    be = BatchedEngine(config, params, max_batch=B,
                       compute_dtype=jnp.bfloat16, max_seq=512, chunk=chunk,
                       kv_quant=kv_quant)

    # timestamp the last chunk launch
    last_launch = [0.0]
    real_scan = be._step_scan
    def scan_wrap(*a, **k):
        out = real_scan(*a, **k)
        last_launch[0] = time.perf_counter()
        return out
    be._step_scan = scan_wrap

    rng = np.random.default_rng(0)

    def make_reqs(n):
        return [Request(prompt_ids=[2] + rng.integers(4, 40000, size=int(
            rng.integers(4, 24))).tolist(), n_predict=n_pred, request_id=i)
            for i in range(n)]

    gen = GenerationParams(temp=0.8 if sampled else 0.0, seed=3,
                           top_k=40, top_p=0.9, stop_at_eos=False)
    print("warming (2 serve calls)...", flush=True)
    t0 = time.perf_counter()
    for _ in range(2):
        be.serve(make_reqs(3 * B), gen)
    print(f"warm: {time.perf_counter() - t0:.1f}s", flush=True)

    pts = []
    for n_mult in (3, 6, 12, 3, 6, 12):
        reqs = make_reqs(n_mult * B)
        t0 = time.perf_counter()
        results = be.serve(reqs, gen)
        dt = time.perf_counter() - t0
        tail = time.perf_counter() - last_launch[0]
        toks = sum(len(r.new_ids) for r in results.values())
        pts.append((toks, dt))
        print(f"n={n_mult * B}: {toks} toks in {dt * 1e3:.1f} ms "
              f"({toks / dt:.0f} tok/s), tail(after last launch) "
              f"{tail * 1e3:.1f} ms", flush=True)

    xs = np.array([p[0] for p in pts], float)
    ys = np.array([p[1] for p in pts], float)
    a, b = np.polyfit(xs, ys, 1)
    print(f"fit: {1 / a:.0f} tok/s steady-state, {b * 1e3:.1f} ms fixed/serve",
          flush=True)
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
