"""Synthetic tiny models for tests and offline drives.

No real BioGPT checkpoint is available in this environment (no network
egress), so these helpers fabricate a small random model with the exact HF
tensor-name/shape contract, plus a minimal working character-level BPE
vocabulary, and can serialize it through the real file format.
"""

from __future__ import annotations

import json
import os
import string
from functools import lru_cache
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


# Full-size synthetic state dicts cache to disk: legacy-numpy gaussian
# generation runs ~1M values/s when this host's burstable CPU is throttled
# (~6 minutes for the 347M config), while reloading the cached file takes
# seconds. Values are deterministic in (shapes, seed, scale), so the cache
# is a pure memoization — goldens stay bit-identical.
_CACHE_DIR = os.environ.get(
    "BIOGPT_SYNTH_CACHE", os.path.expanduser("~/.cache/biogpt_synth"))
_CACHE_MIN_PARAMS = 10_000_000  # tiny test models regenerate instantly


def _n_params(config: BioGptConfig) -> int:
    return (2 * config.n_vocab * config.d_model
            + config.n_layer * (4 * config.d_model ** 2
                                + 2 * config.d_model * config.d_ff))


def _config_key(config: BioGptConfig) -> str:
    return (f"v{config.n_vocab}_d{config.d_model}_l{config.n_layer}"
            f"_f{config.d_ff}_p{config.n_positions}_h{config.n_head}")


@lru_cache(maxsize=8)
def _src_salt(*sources: str) -> str:
    """8-hex digest of the named source files/functions, mixed into cache
    keys so a change to the generating/converting CODE invalidates cached
    results — otherwise a stale cache would silently defeat the full-size
    goldens regression test (cached pre-bug params would keep passing)."""
    import hashlib
    import inspect

    h = hashlib.sha1()
    for s in sources:
        if s == "make_state_dict":
            h.update(inspect.getsource(make_state_dict).encode())
        elif s == "make_random_quantized_params":
            h.update(inspect.getsource(make_random_quantized_params).encode())
        else:   # a module whose file contents define the conversion
            import importlib
            mod = importlib.import_module(s)
            with open(mod.__file__, "rb") as f:
                h.update(f.read())
    return h.hexdigest()[:8]


def _atomic_save_dir(path: str, writer) -> None:
    """Best-effort atomic cache-dir publish: write into a private .tmp dir,
    rename over ``path``; on any failure (read-only disk, racing writer
    that published first) the temp dir is REMOVED, not leaked — these dirs
    are multi-GB."""
    import shutil

    tmp = f"{path}.{os.getpid()}.tmp"
    try:
        os.makedirs(tmp, exist_ok=True)
        writer(tmp)
        os.replace(tmp, path)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)


def _sd_cache_path(config: BioGptConfig, seed: int, scale: float) -> str:
    """Cache DIRECTORY of raw .npy files (one per tensor + keys.json).

    Not an .npz: np.load of a 1.5 GB zip costs minutes of CRC/copy CPU on
    this host, while mmap'd .npy files open instantly and fault pages in
    at disk speed.
    """
    key = (f"sd_{_config_key(config)}_s{seed}_c{scale!r}".replace(".", "p")
           + f"_{_src_salt('make_state_dict')}")
    return os.path.join(_CACHE_DIR, key)


def make_state_dict(config: BioGptConfig, seed: int = 0, scale: float = 0.02,
                    cache: bool = True) -> Dict[str, np.ndarray]:
    """Random torch-layout state dict with the HF BioGPT names/shapes."""
    cache = cache and _n_params(config) >= _CACHE_MIN_PARAMS
    path = _sd_cache_path(config, seed, scale)
    manifest = os.path.join(path, "keys.json")
    if cache and os.path.exists(manifest):
        with open(manifest) as f:
            keys = json.load(f)
        return {k: np.load(os.path.join(path, f"{i}.npy"), mmap_mode="r")
                for i, k in enumerate(keys)}
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
    if cache:
        def write(tmp):
            keys = list(sd)
            for i, k in enumerate(keys):
                np.save(os.path.join(tmp, f"{i}.npy"), sd[k])
            with open(os.path.join(tmp, "keys.json"), "w") as f:
                json.dump(keys, f)
        _atomic_save_dir(path, write)
    return sd


def make_cached_params(config: BioGptConfig, seed: int = 0,
                       scale: float = 0.02, qtype: int | None = None) -> dict:
    """``params_from_state_dict(make_state_dict(...))`` with a params-level
    disk cache.

    The state-dict cache (above) removes the RNG cost, but the torch->kernel
    conversion itself (transposes + layer stacking, ~3 GB of copies at 347M)
    still costs minutes when this host throttles. Full-size params therefore
    cache post-conversion as one .npy per pytree LEAF, loaded back with mmap
    (instant); the tree structure is rebuilt from a tiny same-structure
    template, so no pickling.
    """
    from .checkpoint import params_from_state_dict

    if _n_params(config) < _CACHE_MIN_PARAMS:
        return params_from_state_dict(
            make_state_dict(config, seed=seed, scale=scale), config, qtype)

    # the conversion salt invalidates on any change to the torch->kernel
    # mapping, the plane layouts, or the codecs
    salt = _src_salt("biogpt_tpu.modelio.checkpoint",
                     "biogpt_tpu.quant.layouts", "biogpt_tpu.quant.codecs")
    path = (_sd_cache_path(config, seed, scale)
            + f"_params_q{qtype}_{salt}")
    # structure template: same keys/leaf-count at any size (layers stack)
    tiny = BioGptConfig.tiny()
    template = params_from_state_dict(
        make_state_dict(tiny, seed=0), tiny, qtype)
    return _cached_pytree(
        path, template,
        lambda: params_from_state_dict(
            make_state_dict(config, seed=seed, scale=scale), config, qtype))


def _cached_pytree(path: str, template, build):
    """Leaf-level .npy disk cache for a params pytree.

    Leaves store as ``<path>/<i>.npy`` (mmap-loaded, instant); the tree
    structure comes from ``template`` — a small pytree with the SAME
    structure (synthetic params have size-independent structure because
    layers stack) — so nothing is pickled.
    """
    import jax

    _, treedef = jax.tree.flatten(template)
    manifest = os.path.join(path, "keys.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            n_leaves = json.load(f)["n_leaves"]
        if n_leaves == treedef.num_leaves:
            leaves = [np.load(os.path.join(path, f"{i}.npy"), mmap_mode="r")
                      for i in range(n_leaves)]
            return jax.tree.unflatten(treedef, leaves)
    params = build()
    leaves, treedef2 = jax.tree.flatten(params)
    assert treedef2 == treedef, "template structure mismatch"

    def write(tmp):
        for i, leaf in enumerate(leaves):
            np.save(os.path.join(tmp, f"{i}.npy"), np.asarray(leaf))
        with open(os.path.join(tmp, "keys.json"), "w") as f:
            json.dump({"n_leaves": len(leaves)}, f)
    _atomic_save_dir(path, write)
    return params


def make_random_quantized_params(
    config: BioGptConfig, qtype: int, seed: int = 0, cache: bool = True
) -> dict:
    """Random params with quantized weights built directly in plane layout.

    Skips the codec — for benchmarks and compile checks where weight
    *values* don't matter but layouts, dtypes, and byte volumes must be
    exactly those of a real quantized model. Full-size results memoize to
    disk like :func:`make_state_dict` (legacy-numpy randint also crawls at
    ~1M values/s when this host throttles — minutes at 347M).
    """
    from ..quant.codecs import QK
    from ..quant.layouts import LEVEL_OFFSET, QuantizedTensor

    if cache and _n_params(config) >= _CACHE_MIN_PARAMS:
        salt = _src_salt("make_random_quantized_params",
                         "biogpt_tpu.quant.layouts")
        path = os.path.join(
            _CACHE_DIR, f"rq_{_config_key(config)}_s{seed}_q{qtype}_{salt}")
        template = make_random_quantized_params(
            BioGptConfig.tiny(), qtype, seed=0, cache=False)
        return _cached_pytree(
            path, template,
            lambda: make_random_quantized_params(
                config, qtype, seed=seed, cache=False))

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


def write_synthetic_hf_dir(
    dir_path: str | Path,
    config: BioGptConfig | None = None,
    seed: int = 0,
) -> BioGptConfig:
    """Write a synthetic HuggingFace-style BioGPT checkpoint DIRECTORY.

    Produces exactly the files ``tools/convert_hf.py`` consumes —
    ``config.json`` (HF schema keys), ``vocab.json``, ``merges.txt``, and
    ``pytorch_model.bin`` — so the real-weights runbook's offline steps
    (``tools/fetch_weights.sh --synthetic``: convert → quantize → Δppl →
    greedy demo) stay executable and CI-tested in this zero-egress
    environment. The reference's counterpart input is the actual
    ``microsoft/biogpt`` download (reference convert.py reads the same
    four files).
    """
    import torch

    config = config or BioGptConfig.tiny()
    dir_path = Path(dir_path)
    dir_path.mkdir(parents=True, exist_ok=True)
    vocab, merges = make_char_vocab(config.n_vocab)
    hf = {
        "model_type": "biogpt",
        "vocab_size": config.n_vocab,
        "hidden_size": config.d_model,
        "intermediate_size": config.d_ff,
        "num_hidden_layers": config.n_layer,
        "num_attention_heads": config.n_head,
        "max_position_embeddings": config.n_positions,
    }
    with open(dir_path / "config.json", "w", encoding="utf-8") as f:
        json.dump(hf, f)
    with open(dir_path / "vocab.json", "w", encoding="utf-8") as f:
        json.dump(vocab, f)
    with open(dir_path / "merges.txt", "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    sd = make_state_dict(config, seed=seed)
    torch.save({k: torch.tensor(np.asarray(v)) for k, v in sd.items()},
               dir_path / "pytorch_model.bin")
    return config
