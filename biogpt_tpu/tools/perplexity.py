"""Perplexity evaluation — the Δppl harness for quantization parity.

The reference publishes no perplexity numbers (SURVEY §6); BASELINE.json
requires Δppl vs FP32 per quant level measured by this project. This tool
scores text with full-sequence logits and reports token-level negative
log-likelihood / perplexity.

Usage: python -m biogpt_tpu.tools.perplexity -m model.bin -f corpus.txt [--dtype f32]
"""

from __future__ import annotations

import argparse
import math
import sys

import numpy as np
import jax
import jax.numpy as jnp

from ..modelio.checkpoint import load_params
from ..runtime.engine import Engine
from ..tokenizer import BioGptTokenizer


def perplexity_of_ids(engine: Engine, ids: list[int], window: int = 1024,
                      stride: int | None = None) -> dict:
    """Sliding-window ppl over a token stream.

    With stride < window, each window after the first scores only its final
    ``stride`` target positions — overlapped tokens (which earlier windows
    already scored, with more context here) are skipped, the standard
    sliding-window convention. Each token is counted exactly once.
    """
    stride = stride or window
    total_nll = 0.0
    total_tokens = 0
    for start in range(0, max(len(ids) - 1, 1), stride):
        chunk = ids[start:start + window]
        if len(chunk) < 2:
            break
        # Targets in this chunk are positions start+1 .. start+len-1; skip
        # the ones a previous window already scored (overlap = window-stride).
        skip = 0 if start == 0 else max(window - stride - 1, 0)
        if skip >= len(chunk) - 1:
            continue
        logits = engine.score(np.asarray([chunk], dtype=np.int32))[0]
        logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
        targets = np.asarray(chunk[1:])
        token_logp = np.asarray(logp)[np.arange(len(targets)), targets]
        token_logp = token_logp[skip:]
        total_nll += float(-token_logp.sum())
        total_tokens += len(token_logp)
    nll = total_nll / max(total_tokens, 1)
    return {"nll": nll, "ppl": math.exp(nll), "tokens": total_tokens}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-f", "--file", required=True, help="UTF-8 text file to score")
    p.add_argument("--dtype", choices=["bf16", "f32"], default="f32")
    p.add_argument("--window", type=int, default=1024)
    p.add_argument("--stride", type=int, default=None)
    args = p.parse_args(argv)

    config, token_to_id, merges, params = load_params(args.model)
    tokenizer = BioGptTokenizer(token_to_id, merges)
    engine = Engine(
        config, params,
        compute_dtype=jnp.float32 if args.dtype == "f32" else jnp.bfloat16,
    )

    with open(args.file, encoding="utf-8") as f:
        text = f.read()
    ids = tokenizer.encode(text)
    window = min(args.window, config.n_positions)
    stats = perplexity_of_ids(engine, ids, window=window, stride=args.stride)
    print(f"tokens={stats['tokens']} nll={stats['nll']:.6f} ppl={stats['ppl']:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
