"""Synthetic tiny models for tests and offline drives.

No real BioGPT checkpoint is available in this environment (no network
egress), so these helpers fabricate a small random model with the exact HF
tensor-name/shape contract, plus a minimal working character-level BPE
vocabulary, and can serialize it through the real file format.
"""

from __future__ import annotations

import string
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

from ..config import BioGptConfig
from . import ggml_format
from .ggml_format import tensor_record_from_array


def make_char_vocab(n_vocab: int) -> Tuple[Dict[str, int], List[Tuple[str, str]]]:
    """A character-level BPE vocab: specials, printable chars, char</w> forms,
    and a few common merges. Tokenizes any ASCII text without <unk>."""
    tokens: Dict[str, int] = {"<unk>": 0, "<s>": 1, "</s>": 2, "<pad>": 3}
    chars = string.ascii_letters + string.digits + string.punctuation
    for ch in chars:
        tokens.setdefault(ch, len(tokens))
    for ch in chars:
        tokens.setdefault(ch + "</w>", len(tokens))
    merges: List[Tuple[str, str]] = []
    for a, b in [("t", "h"), ("th", "e</w>"), ("i", "n"), ("a", "n"),
                 ("e", "r"), ("o", "n"), ("e", "n"), ("an", "d</w>")]:
        if len(tokens) >= n_vocab:
            break
        merged = a + b
        merges.append((a, b))
        tokens.setdefault(merged, len(tokens))
    if len(tokens) > n_vocab:
        raise ValueError(f"n_vocab={n_vocab} too small (need {len(tokens)})")
    i = len(tokens)
    while i < n_vocab:
        tokens[f"[unused_{i}]"] = i
        i += 1
    return tokens, merges


def make_state_dict(config: BioGptConfig, seed: int = 0, scale: float = 0.02) -> Dict[str, np.ndarray]:
    """Random torch-layout state dict with the HF BioGPT names/shapes."""
    rng = np.random.RandomState(seed)

    def w(*shape):
        return (rng.randn(*shape) * scale).astype(np.float32)

    sd = {
        "biogpt.embed_tokens.weight": w(config.n_vocab, config.d_model),
        "biogpt.embed_positions.weight": w(config.n_positions + config.pos_offset, config.d_model),
        "biogpt.layer_norm.weight": np.ones(config.d_model, np.float32),
        "biogpt.layer_norm.bias": np.zeros(config.d_model, np.float32),
        "output_projection.weight": w(config.n_vocab, config.d_model),
    }
    for i in range(config.n_layer):
        p = f"biogpt.layers.{i}."
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[p + f"self_attn.{proj}.weight"] = w(config.d_model, config.d_model)
            sd[p + f"self_attn.{proj}.bias"] = w(config.d_model)
        sd[p + "self_attn_layer_norm.weight"] = np.ones(config.d_model, np.float32)
        sd[p + "self_attn_layer_norm.bias"] = np.zeros(config.d_model, np.float32)
        sd[p + "final_layer_norm.weight"] = np.ones(config.d_model, np.float32)
        sd[p + "final_layer_norm.bias"] = np.zeros(config.d_model, np.float32)
        sd[p + "fc1.weight"] = w(config.d_ff, config.d_model)
        sd[p + "fc1.bias"] = w(config.d_ff)
        sd[p + "fc2.weight"] = w(config.d_model, config.d_ff)
        sd[p + "fc2.bias"] = w(config.d_model)
    return sd


def make_random_quantized_params(
    config: BioGptConfig, qtype: int, seed: int = 0
) -> dict:
    """Random params with quantized weights built directly in plane layout.

    Skips the codec (instant even at 347M scale) — for benchmarks and
    compile checks where weight *values* don't matter but layouts, dtypes,
    and byte volumes must be exactly those of a real quantized model.
    """
    from ..quant.codecs import QK
    from ..quant.layouts import LEVEL_OFFSET, QuantizedTensor

    rng = np.random.RandomState(seed)
    lo = -LEVEL_OFFSET[qtype]
    hi = {2: 15, 3: 15, 6: 31, 7: 31, 8: 127}[qtype] + lo  # qtype codes, see codecs

    def qt(d_out: int, d_in: int, lookup: bool = False) -> QuantizedTensor:
        shape = (d_out, d_in) if lookup else (d_in, d_out)
        sshape = ((d_out, d_in // QK) if lookup else (d_in // QK, d_out))
        levels = rng.randint(lo, hi + 1, size=shape).astype(np.int8)
        scales = (rng.uniform(0.005, 0.02, size=sshape)).astype(np.float16)
        mins = None
        if qtype in (3, 7):  # Q4_1 / Q5_1 carry block minima
            mins = (-rng.uniform(0.05, 0.2, size=sshape)).astype(np.float16)
        return QuantizedTensor(levels=levels, scales=scales, mins=mins, qtype=qtype)

    def dense(*shape):
        return (rng.randn(*shape) * 0.02).astype(np.float32)

    d, ff, v = config.d_model, config.d_ff, config.n_vocab
    params = {
        "embed_tokens": qt(v, d, lookup=True),
        "embed_positions": dense(config.n_positions + config.pos_offset, d),
        "final_ln": {"w": np.ones(d, np.float32), "b": np.zeros(d, np.float32)},
        "lm_head": qt(v, d),
        "layers": [],
    }
    for _ in range(config.n_layer):
        layer = {
            "ln0": {"w": np.ones(d, np.float32), "b": np.zeros(d, np.float32)},
            "ln1": {"w": np.ones(d, np.float32), "b": np.zeros(d, np.float32)},
            "fc1": {"w": qt(ff, d), "b": dense(ff)},
            "fc2": {"w": qt(d, ff), "b": dense(d)},
        }
        for name in ("q", "k", "v", "o"):
            layer[name] = {"w": qt(d, d), "b": dense(d)}
        params["layers"].append(layer)
    from .checkpoint import stack_layers
    params["layers"] = stack_layers(params["layers"])
    return params


def write_synthetic_model(
    path: str | Path,
    config: BioGptConfig | None = None,
    seed: int = 0,
    use_f16: bool = False,
) -> BioGptConfig:
    """Write a tiny random-but-valid model file; returns its config."""
    config = config or BioGptConfig.tiny()
    vocab, merges = make_char_vocab(config.n_vocab)
    sd = make_state_dict(config, seed=seed)
    records = (tensor_record_from_array(name, arr, use_f16=use_f16)
               for name, arr in sd.items())
    ggml_format.write_model_file(path, config, vocab, merges, records)
    return config
