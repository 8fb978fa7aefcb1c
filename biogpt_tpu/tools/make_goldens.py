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

Usage: python -m biogpt_tpu.tools.make_goldens [out.npz]
"""

from __future__ import annotations

import os
import sys

import numpy as np

SEED = 7
SCALE = 0.1   # 0.02-scale weights collapse to a constant echo continuation
PROMPT = [2, 431, 88, 2901, 17, 1512, 40960, 233, 11, 5, 92, 1203]
N_NEW = 24


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    out = argv[0] if argv else os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "tests", "goldens", f"hf347m_seed{SEED}.npz")

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
