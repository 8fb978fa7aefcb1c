"""Benchmark: Q4_0 BioGPT-347M decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "q4_0_decode_tokens_per_sec", "value": N, "unit": "tokens/s",
   "vs_baseline": N / 125.0, ...}

Baseline anchor: the reference's Q4_0 decode at 8 ms/token on M1 Pro
(BASELINE.md) = 125 tokens/s; the north star is >= 10x that on one chip.

Weights are random in real Q4_0 plane layout (no checkpoint is available in
this offline environment) — decode throughput is weight-value-independent.
Extra diagnostic metrics go to stderr.

Timing methodology: this runtime acknowledges block_until_ready before
device work completes, so every measurement ends with a real device->host
fetch of the token chain, and the per-step cost is the MARGINAL time
between a long and a short run (fixed fetch/queue costs cancel).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from biogpt_tpu.config import BioGptConfig
from biogpt_tpu.modelio.synthetic import make_random_quantized_params, make_state_dict
from biogpt_tpu.modelio.checkpoint import params_from_state_dict
from biogpt_tpu.models.biogpt import forward
from biogpt_tpu.quant.codecs import GGML_TYPE_BY_NAME
from biogpt_tpu.runtime.cache import init_cache
from biogpt_tpu.runtime.engine import _pack_matmul_weights
from biogpt_tpu.runtime.sampling import greedy

# reference per-token decode latencies on M1 Pro (BASELINE.md)
BASELINES_TOK_S = {"q4_0": 125.0, "q4_1": 1000 / 9, "q5_0": 100.0,
                   "q5_1": 1000 / 11, "q8_0": 100.0, "f32": 50.0}
BASELINE_TOKENS_PER_SEC = 125.0  # Q4_0 anchor: 8 ms/token, reference README.md:56


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> int:  # noqa: C901
    config = BioGptConfig()
    qname = os.environ.get("BENCH_QTYPE", "q4_0")  # q4_0..q8_0 | f32
    log(f"devices: {jax.devices()}")
    log(f"building {qname} params (random, real layout)...")
    if qname == "f32":
        params = params_from_state_dict(make_state_dict(config, seed=0), config)
    else:
        params = make_random_quantized_params(
            config, GGML_TYPE_BY_NAME[qname], seed=0)
    use_pallas = os.environ.get("BENCH_PACK_Q4", "1") == "1"
    if use_pallas:   # Pallas packed-kernel path (default; fastest measured)
        params = _pack_matmul_weights(params)
    params = jax.device_put(params)

    def step(params, tok, cache, past):
        # kv_window 512 covers the 433 decode positions this bench reaches
        # (the engine buckets this dynamically per chunk)
        logits, cache = forward(params, tok, cache, past, config,
                                compute_dtype=jnp.bfloat16,
                                allow_pallas=use_pallas, kv_window=512)
        # past advances on device: per-step host->device scalar uploads cost
        # several times the model step itself
        return greedy(logits)[:, None], cache, past + 1

    jit_step = jax.jit(step, donate_argnames=("cache",))

    cache = init_cache(config, batch=1, max_len=config.n_positions,
                       dtype=jnp.float16)

    # prefill a short prompt region by decoding a few warmup tokens
    tok = jnp.full((1, 1), 17, jnp.int32)
    past = jnp.int32(0)
    log("compiling decode step...")
    t0 = time.perf_counter()
    tok, cache, past = jit_step(params, tok, cache, past)
    import numpy as np
    _ = int(np.asarray(tok)[0, 0])          # real sync (fetch)
    log(f"compile+first step: {time.perf_counter() - t0:.1f}s")

    def run(n):
        nonlocal tok, cache, past
        t0 = time.perf_counter()
        for _ in range(n):
            tok, cache, past = jit_step(params, tok, cache, past)
        _ = int(np.asarray(tok)[0, 0])      # forces the whole chain
        return time.perf_counter() - t0

    run(48)                                  # warmup (absorbs runtime quirks)
    t_short = run(64)
    t_long = run(320)
    n_steps = 320 - 64
    dt = t_long - t_short                    # marginal: fixed costs cancel

    tokens_per_sec = n_steps / dt
    ms_per_token = dt / n_steps * 1e3
    log(f"decode: {tokens_per_sec:.1f} tokens/s ({ms_per_token:.3f} ms/token) "
        f"over {n_steps} steps at past~{past}")

    print(json.dumps({
        "metric": f"{qname}_decode_tokens_per_sec",
        "value": round(tokens_per_sec, 2),
        "unit": "tokens/s",
        "vs_baseline": round(
            tokens_per_sec / BASELINES_TOK_S.get(qname, BASELINE_TOKENS_PER_SEC), 3),
        "ms_per_token": round(ms_per_token, 4),
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
