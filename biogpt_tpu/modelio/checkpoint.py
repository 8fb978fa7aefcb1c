"""Checkpoint -> params pytree.

Maps the HF BioGPT tensor names (used verbatim as keys in the model file,
reference map built at ``/root/reference/biogpt.cpp:256-318``) onto the
structured params pytree the JAX model consumes:

  params = {
    "embed_tokens":    (n_vocab, d_model) array | QuantizedTensor (row-major)
    "embed_positions": (n_positions + 2, d_model) float32 (always dense)
    "final_ln":        {"w": (d_model,), "b": (d_model,)}
    "lm_head":         (d_model, n_vocab) kernel | QuantizedTensor (planes)
    "layers":          one dict of LAYER-STACKED tensors (leading axis L):
       {"ln0": {w,b}, "ln1": {w,b},               (L, d_model)
        "q"|"k"|"v"|"o":  {"w": (L, d_model, d_model) kernel | QT,
                           "b": (L, d_model)},
        "fc1": {"w": (L, d_model, d_ff) | QT, "b": (L, d_ff)},
        "fc2": {"w": (L, d_ff, d_model) | QT, "b": (L, d_model)}}
  }

Layers are stacked (not a list of 24 dicts) so the jitted step takes ~30
arrays instead of ~450 — per-call dispatch overhead scales with leaf count
and dominated decode latency before stacking. The forward pass slices each
layer with a static index (free under jit).

Matmul weights are stored in kernel orientation (d_in, d_out) — transposed
from torch — so the forward pass contracts with ``x @ w``. Quantized weights
stay in plane layout (never densified at load): int8 level planes + fp16
scale planes, dequantized inside the matmul ops.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Tuple

import jax
import numpy as np

from ..config import BioGptConfig
from ..quant import codecs
from ..quant.layouts import to_planes, to_lookup_planes
from . import ggml_format
from .ggml_format import TensorRecord


def _dense(rec: TensorRecord) -> np.ndarray:
    return rec.to_float32()


def _matmul_weight(rec: TensorRecord):
    """2-D torch-(out,in) weight record -> kernel (in,out) dense or planes."""
    if rec.ttype in (codecs.GGML_TYPE_F32, codecs.GGML_TYPE_F16):
        return np.ascontiguousarray(rec.to_float32().T)
    return to_planes(rec.data, rec.shape, rec.ttype)


def _embedding_weight(rec: TensorRecord):
    """Embedding table record -> row-major dense or lookup planes."""
    if rec.ttype in (codecs.GGML_TYPE_F32, codecs.GGML_TYPE_F16):
        return rec.to_float32()
    return to_lookup_planes(rec.data, rec.shape, rec.ttype)


def params_from_records(records: Dict[str, TensorRecord], config: BioGptConfig) -> dict:
    """Assemble the params pytree from named tensor records."""

    def rec(name: str) -> TensorRecord:
        if name not in records:
            raise KeyError(f"model file is missing tensor '{name}'")
        return records[name]

    params = {
        "embed_tokens": _embedding_weight(rec("biogpt.embed_tokens.weight")),
        "embed_positions": _dense(rec("biogpt.embed_positions.weight")),
        "final_ln": {
            "w": _dense(rec("biogpt.layer_norm.weight")),
            "b": _dense(rec("biogpt.layer_norm.bias")),
        },
        "lm_head": _matmul_weight(rec("output_projection.weight")),
        "layers": [],
    }
    for i in range(config.n_layer):
        p = f"biogpt.layers.{i}."
        layer = {
            "ln0": {"w": _dense(rec(p + "self_attn_layer_norm.weight")),
                    "b": _dense(rec(p + "self_attn_layer_norm.bias"))},
            "ln1": {"w": _dense(rec(p + "final_layer_norm.weight")),
                    "b": _dense(rec(p + "final_layer_norm.bias"))},
            "fc1": {"w": _matmul_weight(rec(p + "fc1.weight")),
                    "b": _dense(rec(p + "fc1.bias"))},
            "fc2": {"w": _matmul_weight(rec(p + "fc2.weight")),
                    "b": _dense(rec(p + "fc2.bias"))},
        }
        for short, hf in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"), ("o", "out_proj")):
            layer[short] = {
                "w": _matmul_weight(rec(f"{p}self_attn.{hf}.weight")),
                "b": _dense(rec(f"{p}self_attn.{hf}.bias")),
            }
        params["layers"].append(layer)
    params["layers"] = stack_layers(params["layers"])
    return params


def stack_layers(layer_list: list) -> dict:
    """List of per-layer dicts -> one dict of (L, ...) stacked tensors."""
    return jax.tree.map(lambda *xs: np.stack(xs), *layer_list)


def layer_slice(layers: dict, i):
    """Per-layer view of the stacked layer dict (free slicing under jit)."""
    return jax.tree.map(lambda a: a[i], layers)


def load_params(path: str | Path):
    """Read a ggml-model.bin -> (config, token_to_id, merges, params)."""
    from ..utils.logging import get_logger

    log = get_logger("modelio")
    config, token_to_id, merges, records = ggml_format.read_model_file(path)
    log.info("loaded %s: n_vocab=%d n_layer=%d d_model=%d ftype=%d, %d tensors",
             path, config.n_vocab, config.n_layer, config.d_model,
             config.ftype, len(records))
    for name, r in records.items():
        log.debug("tensor %-48s shape=%s ttype=%d", name, r.shape, r.ttype)
    params = params_from_records(records, config)
    return config, token_to_id, merges, params


def should_quantize(name: str, shape: Tuple[int, ...]) -> bool:
    """The reference quantization selection rule (biogpt.cpp:523):
    name contains 'weight' and the tensor is 2-D (second dim != 1)."""
    return "weight" in name and len(shape) == 2 and shape[0] != 1


def params_from_state_dict(
    state_dict: Dict[str, np.ndarray],
    config: BioGptConfig,
    qtype: int | None = None,
) -> dict:
    """Torch-layout state dict (HF names) -> params pytree.

    ``qtype`` (a GGML_TYPE_* code) quantizes the tensors selected by the
    reference rule through the real codec, so the result is bit-identical
    to loading a quantized model file.
    """
    records: Dict[str, TensorRecord] = {}
    for name, arr in state_dict.items():
        arr = np.asarray(arr, dtype=np.float32)
        arr = np.squeeze(arr)  # convert.py squeezes (convert.py:56)
        if qtype is not None and should_quantize(name, arr.shape):
            data = codecs.quantize_rows(arr, qtype)
            records[name] = TensorRecord(name=name, shape=tuple(arr.shape),
                                         ttype=qtype, data=data)
        else:
            # hand the array straight to the record: the bytes round-trip
            # (astype -> tobytes -> frombuffer -> astype) copies the whole
            # model three extra times — minutes at 347M on a throttled host
            records[name] = TensorRecord(name=name, shape=tuple(arr.shape),
                                         ttype=codecs.GGML_TYPE_F32,
                                         data=arr)
    return params_from_records(records, config)
