"""Convert a HuggingFace BioGPT checkpoint directory to a model file.

Replaces the reference's ``convert.py``: reads ``config.json`` +
``vocab.json`` + ``merges.txt`` + weights (``pytorch_model.bin`` or
``model.safetensors``) and writes the ggml-model.bin contract
(see modelio.ggml_format). Tensors are squeezed and stored f32, or f16 for
2-D ``*.weight`` tensors with ``--use-f16`` (convert.py:54-83 policy).

Usage: python -m biogpt_tpu.tools.convert_hf --dir-model DIR --out-dir DIR [--use-f16]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

from ..config import BioGptConfig, FTYPE_F16, FTYPE_F32
from ..modelio import ggml_format
from ..modelio.ggml_format import tensor_record_from_array


def _load_state_dict(dir_model: Path) -> dict:
    pt = dir_model / "pytorch_model.bin"
    st = dir_model / "model.safetensors"
    if pt.exists():
        import torch
        with open(pt, "rb") as f:
            checkpoint = torch.load(f, map_location="cpu", weights_only=True)
        return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                for k, v in checkpoint.items()}
    if st.exists():
        from safetensors.numpy import load_file
        return load_file(str(st))
    raise FileNotFoundError(f"no pytorch_model.bin or model.safetensors in {dir_model}")


def convert(dir_model: str | Path, out_dir: str | Path, use_f16: bool = False,
            verbose: bool = True) -> Path:
    dir_model = Path(dir_model)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    with open(dir_model / "config.json", encoding="utf-8") as f:
        hf = json.load(f)
    with open(dir_model / "vocab.json", encoding="utf-8") as f:
        vocab = json.load(f)
    with open(dir_model / "merges.txt", encoding="utf-8") as f:
        lines = f.read().split("\n")[:-1]
    # skip headers/blank lines; a merge line is "first second"
    merges = [tuple(parts[:2]) for line in lines
              if len(parts := line.split()) >= 2]

    config = BioGptConfig(
        n_vocab=hf["vocab_size"],
        n_merges=len(merges),
        d_ff=hf["intermediate_size"],
        d_model=hf["hidden_size"],
        n_layer=hf["num_hidden_layers"],
        n_head=hf["num_attention_heads"],
        n_positions=hf["max_position_embeddings"],
        ftype=FTYPE_F16 if use_f16 else FTYPE_F32,
    )

    state_dict = _load_state_dict(dir_model)
    out_path = out_dir / "ggml-model.bin"

    def records():
        for name, arr in state_dict.items():
            arr = np.squeeze(np.asarray(arr))
            if verbose:
                print(f"  {name:55s} {str(tuple(arr.shape)):>16s}")
            yield tensor_record_from_array(name, arr, use_f16=use_f16)

    ggml_format.write_model_file(out_path, config, vocab, merges, records())
    if verbose:
        size = out_path.stat().st_size
        print(f"wrote {out_path} ({size / 1e6:.2f} MB, "
              f"{'f16' if use_f16 else 'f32'})")
    return out_path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--dir-model", required=True)
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--use-f16", action="store_true")
    args = parser.parse_args(argv)
    convert(args.dir_model, args.out_dir, use_f16=args.use_f16)
    return 0


if __name__ == "__main__":
    sys.exit(main())
