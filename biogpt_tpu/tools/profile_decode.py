"""Decode-step device profiler: capture an xprof trace and print the
op-category breakdown.

The TPU counterpart of the reference's wall-clock-only timing report
(``main.cpp:153-162``): runs N fused decode steps under jax.profiler,
converts the XPlane with xprof's op_profile tool, and prints per-category
device time / op counts / HBM bytes per step. This is how the round-1
decode bottleneck (op-issue serialization, not bandwidth) was identified.

Usage:
  python -m biogpt_tpu.tools.profile_decode [-m model.bin] [--steps 32]
  (without -m, profiles a random full-size Q4_0 model)
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BioGptConfig
from ..models.biogpt import forward
from ..runtime.cache import init_cache
from ..runtime.sampling import greedy


def profile_decode(params, config: BioGptConfig, steps: int = 32,
                   kv_window: int = 512, trace_dir: str | None = None,
                   fused: bool = False) -> dict:
    """Returns {"ms_per_step": float, "categories": [(pct, ms, n_ops, mb, name)]}."""
    from ..models.biogpt import forward_fused_decode
    from ..runtime.engine import _pack_matmul_weights

    params = jax.device_put(_pack_matmul_weights(params))

    if fused:
        def step(params, tok, cache, past):
            logits, cache = forward_fused_decode(
                params, tok, cache, past, config,
                compute_dtype=jnp.bfloat16, kv_window=kv_window)
            return greedy(logits)[:, None], cache, past + 1
    else:
        def step(params, tok, cache, past):
            logits, cache = forward(params, tok, cache, past, config,
                                    compute_dtype=jnp.bfloat16,
                                    allow_pallas=True, kv_window=kv_window)
            return greedy(logits)[:, None], cache, past + 1

    jit_step = jax.jit(step, donate_argnames=("cache",))
    cache = init_cache(config, batch=1, max_len=config.n_positions,
                       dtype=jnp.bfloat16 if fused else jnp.float16)
    tok = jnp.full((1, 1), 17, jnp.int32)
    past = jnp.int32(0)
    for _ in range(steps):
        tok, cache, past = jit_step(params, tok, cache, past)
    _ = int(np.asarray(tok)[0, 0])

    from ..utils.profiling import trace

    trace_dir = trace_dir or tempfile.mkdtemp(prefix="biogpt_trace_")
    with trace(trace_dir):
        for _ in range(steps):
            tok, cache, past = jit_step(params, tok, cache, past)
        _ = int(np.asarray(tok)[0, 0])

    from xprof.convert import raw_to_tool_data as rtd

    xspace = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
    data, _ = rtd.xspace_to_tool_data(xspace, "op_profile", {})
    d = json.loads(data)
    prog = d["byProgram"]["children"][0]
    total = prog["metrics"]["rawTime"]
    cats = []
    for c in prog["children"]:
        m = c["metrics"]
        cats.append((
            m.get("rawTime", 0) / total * 100,
            m.get("rawTime", 0) / steps / 1e9,
            m.get("occurrences", 0) / steps,
            m.get("rawBytesAccessedArray", [0])[0] / steps / 1e6,
            c["name"],
        ))
    cats.sort(reverse=True)
    return {"ms_per_step": total / steps / 1e9, "categories": cats,
            "trace_dir": trace_dir}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("-m", "--model", default=None)
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--kv-window", type=int, default=512)
    p.add_argument("--trace-dir", default=None,
                   help="keep the raw trace here (for TensorBoard/xprof UI)")
    p.add_argument("--fused", action="store_true",
                   help="profile the whole-model megakernel decode path")
    args = p.parse_args(argv)

    if args.model:
        from ..modelio.checkpoint import load_params
        config, _, _, params = load_params(args.model)
    else:
        from ..modelio.synthetic import make_random_quantized_params
        from ..quant.codecs import GGML_TYPE_Q4_0
        config = BioGptConfig()
        params = make_random_quantized_params(config, GGML_TYPE_Q4_0, seed=0)

    r = profile_decode(params, config, steps=args.steps,
                       kv_window=args.kv_window, trace_dir=args.trace_dir,
                       fused=args.fused)
    print(f"device time: {r['ms_per_step']:.3f} ms/step "
          f"(trace: {r['trace_dir']})")
    print(f"{'%':>6s} {'ms/step':>9s} {'ops/step':>9s} {'MB/step':>9s}  category")
    for pct, ms, ops, mb, name in r["categories"]:
        print(f"{pct:6.1f} {ms:9.4f} {ops:9.1f} {mb:9.1f}  {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
