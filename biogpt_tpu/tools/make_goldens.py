"""Generate committed full-size golden outputs from the HF oracle.

No real BioGPT checkpoint is reachable offline (the reference README demo,
``/root/reference/README.md:14-47``, was validated against real weights).
The next-best regression anchor: deterministic random weights at the FULL
347M configuration (``make_state_dict(seed=7)`` — plain seeded numpy, so
the weights reproduce across torch/transformers versions), loaded into HF
``BioGptForCausalLM``, whose greedy continuation and logits are saved to
``tests/goldens/``. The parity test (tests/test_goldens.py) replays our
engine against the file, so a numerics regression at production scale
fails CI without needing torch at test time.

``--quant`` additionally records QUANTIZED (Q4_0 + Q4_1) greedy
continuations at the same full configuration. The oracle chain: the f32
golden anchors seed-7 weights against HF; the codecs are bit-exact against
the independent C++ implementation (tests/test_native.py); so our engine's
quantized greedy output over those weights is the reference for itself —
committing it locks full-scale quantized numerics (the XLA per-op f32
path, replayable in CPU CI) against regressions.

``--tpu-bf16`` records the PRODUCTION path's continuation — bf16 compute,
packed planes, whole-model Pallas megakernel — and must run on the real
chip (the 347M megakernel is infeasible under CPU interpret). Checked by
``python -m biogpt_tpu.tools.check_goldens_tpu`` on TPU; CPU CI covers the
megakernel-vs-oracle equivalence at tiny scale instead
(tests/test_pallas_decode.py).

Usage: python -m biogpt_tpu.tools.make_goldens [out.npz]
       python -m biogpt_tpu.tools.make_goldens --quant [out.npz]
       python -m biogpt_tpu.tools.make_goldens --tpu-bf16 [out.npz]
"""

from __future__ import annotations

import os
import sys

import numpy as np

SEED = 7
SCALE = 0.1   # 0.02-scale weights collapse to a constant echo continuation
PROMPT = [2, 431, 88, 2901, 17, 1512, 40960, 233, 11, 5, 92, 1203]
N_NEW = 24
QTYPES = ("q4_0", "q4_1")
N_NEW_Q = 12      # per-step CPU cost at 347M is real; 12 tokens lock plenty


def _goldens_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "tests", "goldens")


def _quant_engine(qname: str, compute_dtype, pack: bool):
    import jax.numpy as jnp

    from ..config import BioGptConfig
    from ..modelio.checkpoint import params_from_state_dict
    from ..modelio.synthetic import make_state_dict
    from ..quant.codecs import GGML_TYPE_BY_NAME
    from ..runtime.engine import Engine

    config = BioGptConfig()
    sd = make_state_dict(config, seed=SEED, scale=SCALE)
    params = params_from_state_dict(sd, config,
                                    qtype=GGML_TYPE_BY_NAME[qname])
    cache_dtype = None if pack else jnp.float32
    return Engine(config, params, compute_dtype=compute_dtype,
                  cache_dtype=cache_dtype, max_seq=64, donate_cache=False,
                  pack_q4=pack)


def make_quant_goldens(out: str) -> int:
    """CPU-replayable quantized goldens (XLA per-op f32 path)."""
    import jax.numpy as jnp

    from ..config import GenerationParams

    data = {"seed": np.int32(SEED), "scale": np.float32(SCALE),
            "prompt": np.asarray(PROMPT, np.int32)}
    gen = GenerationParams(n_predict=N_NEW_Q, temp=0.0, stop_at_eos=False)
    for qname in QTYPES:
        eng = _quant_engine(qname, jnp.float32, pack=False)
        res = eng.generate(PROMPT, gen, stream_cb=lambda _: None)
        data[f"{qname}_greedy_ids"] = np.asarray(res.ids, np.int32)
        print(f"{qname}: {res.ids[len(PROMPT):]}")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, **data)
    print(f"wrote {out}")
    return 0


def make_tpu_bf16_goldens(out: str) -> int:
    """Production-path goldens: packed planes + bf16 + megakernel, on TPU."""
    import jax
    import jax.numpy as jnp

    from ..config import GenerationParams

    assert jax.default_backend() == "tpu", (
        "--tpu-bf16 must run on the real chip (use --quant for the CPU-"
        "replayable goldens)")
    data = {"seed": np.int32(SEED), "scale": np.float32(SCALE),
            "prompt": np.asarray(PROMPT, np.int32),
            "device": str(jax.devices()[0])}
    gen = GenerationParams(n_predict=N_NEW_Q, temp=0.0, stop_at_eos=False)
    for qname in QTYPES:
        eng = _quant_engine(qname, jnp.bfloat16, pack=True)
        assert eng._fused_decode, "megakernel must engage for this golden"
        res = eng.generate(PROMPT, gen, stream_cb=lambda _: None)
        data[f"{qname}_greedy_ids"] = np.asarray(res.ids, np.int32)
        print(f"{qname} (bf16 megakernel): {res.ids[len(PROMPT):]}")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, **data)
    print(f"wrote {out}")
    return 0


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "--quant":
        out = argv[1] if len(argv) > 1 else os.path.join(
            _goldens_dir(), f"own347m_seed{SEED}_quant.npz")
        return make_quant_goldens(out)
    if argv and argv[0] == "--tpu-bf16":
        out = argv[1] if len(argv) > 1 else os.path.join(
            _goldens_dir(), f"tpu347m_seed{SEED}_bf16.npz")
        return make_tpu_bf16_goldens(out)
    out = argv[0] if argv else os.path.join(
        _goldens_dir(), f"hf347m_seed{SEED}.npz")

    import torch
    from transformers import BioGptConfig as HFConfig
    from transformers import BioGptForCausalLM

    from ..config import BioGptConfig
    from ..modelio.synthetic import make_state_dict

    config = BioGptConfig()
    sd = make_state_dict(config, seed=SEED, scale=SCALE)

    hf_config = HFConfig(
        vocab_size=config.n_vocab,
        hidden_size=config.d_model,
        num_hidden_layers=config.n_layer,
        num_attention_heads=config.n_head,
        intermediate_size=config.d_ff,
        max_position_embeddings=config.n_positions,
        scale_embedding=True,
        activation_function="gelu",
        # HF ties output_projection to embed_tokens by default, which would
        # silently clobber one of the two independent random tables
        tie_word_embeddings=False,
    )
    model = BioGptForCausalLM(hf_config).eval()
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False)
    assert not unexpected, unexpected
    # HF may track non-parameter buffers; every actual weight must load
    assert all("bias" not in m and "weight" not in m for m in missing), missing

    ids = list(PROMPT)
    prefill_logits = None
    with torch.no_grad():
        for step in range(N_NEW):
            out_t = model(input_ids=torch.tensor([ids], dtype=torch.long))
            logits = out_t.logits[0, -1].numpy()
            if step == 0:
                prefill_logits = logits.copy()
            ids.append(int(logits.argmax()))
    final_logits = logits.copy()

    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out,
        seed=np.int32(SEED),
        scale=np.float32(SCALE),
        prompt=np.asarray(PROMPT, np.int32),
        greedy_ids=np.asarray(ids, np.int32),
        prefill_logits=prefill_logits.astype(np.float16),
        final_logits=final_logits.astype(np.float16),
    )
    print(f"wrote {out}: greedy continuation "
          f"{ids[len(PROMPT):]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
