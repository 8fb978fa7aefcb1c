"""Named shardings for the params pytree and KV cache.

Megatron-style tensor parallelism expressed as PartitionSpecs; XLA/GSPMD
inserts the all-gathers/reduce-scatters (over ICI) from these annotations:

  q/k/v kernels  (d_model, d_model): column-parallel — shard d_out, which
                  propagates to the head axis after the (H, Dk) reshape
  o kernel       (d_model, d_model): row-parallel — shard d_in; GSPMD emits
                  the psum at the residual join
  fc1            (d_model, d_ff):    column-parallel over d_ff
  fc2            (d_ff, d_model):    row-parallel over d_ff
  lm_head        (d_model, n_vocab): column-parallel over vocab
  embed_tokens   (n_vocab, d_model): row(vocab)-sharded lookup table
  KV cache       (L, B, S, D):       batch over "data", d_model (= whole
                                     contiguous head groups) over "model"

QuantizedTensor leaves shard the same logical dim on levels AND scales
(/mins): the scale plane's block axis is d_in // 32, so a d_in shard maps
1:1 onto a block-axis shard (d_in/32 must divide by the model axis — true
for all BioGPT dims with tp <= 16).

LayerNorm params, biases of row-parallel projections, and embed_positions
are replicated.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..quant.layouts import QuantizedTensor
from ..runtime.cache import KVCache, QuantKVCache
from .mesh import DATA_AXIS, MODEL_AXIS


def _wspec(spec_2d: P) -> Any:
    """Builds the spec entry for a weight that may be dense or quantized.

    For QuantizedTensor the same 2-D spec is applied to levels and scales
    (and mins): their axes are (d_in[, /32], d_out) — parallel semantics.
    """
    return spec_2d


COL = P(None, MODEL_AXIS)   # column-parallel: shard d_out
ROW = P(MODEL_AXIS, None)   # row-parallel: shard d_in
REP = P()                   # replicated


def param_pspecs(params: dict) -> dict:
    """PartitionSpec pytree mirroring ``params``.

    Layer tensors are layer-stacked with a leading L axis, so their specs
    carry a leading None (layers replicate over neither axis — a future
    pipeline-parallel axis would shard exactly that dim).
    """
    COL3 = P(None, None, MODEL_AXIS)
    ROW3 = P(None, MODEL_AXIS, None)
    BIAS3 = P(None, MODEL_AXIS)
    layer_specs = {
        "ln0": {"w": REP, "b": REP},
        "ln1": {"w": REP, "b": REP},
        "q": {"w": COL3, "b": BIAS3},
        "k": {"w": COL3, "b": BIAS3},
        "v": {"w": COL3, "b": BIAS3},
        "o": {"w": ROW3, "b": REP},
        "fc1": {"w": COL3, "b": BIAS3},
        "fc2": {"w": ROW3, "b": REP},
    }

    return {
        # Lookup tables replicate: a vocab-sharded gather would need an
        # unresolvable (or collective-heavy) out-sharding per token; the
        # quantized table is small (~24 MB at Q4_0 for 347M).
        "embed_tokens": REP,
        "embed_positions": REP,
        "final_ln": {"w": REP, "b": REP},
        "lm_head": COL,
        "layers": layer_specs,
    }


def cache_pspec(batch_shardable: bool = True, quant: bool = False):
    """(L, B, S, D): batch over data (when divisible), d_model over model.

    Heads are contiguous in the flat d_model axis, so sharding D by the
    model axis IS head sharding (each shard owns n_head/tp whole heads —
    column-parallel q/k/v produce exactly these rows locally).

    int8 KV (``quant``): the level planes shard like the dense cache; the
    per-row scale planes (L, B, 1, S) have no d_model axis and REPLICATE
    over "model" — every shard computes the identical full-row absmax
    (``cache.quantize_rows`` pmaxes it), so replication is exact."""
    dspec = DATA_AXIS if batch_shardable else None
    spec = P(None, dspec, None, MODEL_AXIS)
    if quant:
        sspec = P(None, dspec, None, None)
        return QuantKVCache(k=spec, v=spec, ks=sspec, vs=sspec)
    return KVCache(k=spec, v=spec)


def _to_sharding(mesh: Mesh, spec_tree, value_tree):
    """Expand 2-D weight specs over QuantizedTensor leaves and wrap in
    NamedSharding."""

    def fit(spec, shape):
        """Drop spec axes whose mesh size doesn't divide the dim (tiny
        models / scale planes): replication is always correct there."""
        parts = []
        for dim, axis in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
            ok = axis is None or dim % mesh.shape[axis] == 0
            parts.append(axis if ok else None)
        return P(*parts)

    def expand(spec, value):
        if isinstance(value, QuantizedTensor):
            # levels (d_in, d_out); scales/mins (d_in//QK, d_out): same
            # logical spec, fitted per plane shape
            mins = (NamedSharding(mesh, fit(spec, value.mins.shape))
                    if value.mins is not None else None)
            return QuantizedTensor(
                levels=NamedSharding(mesh, fit(spec, value.levels.shape)),
                scales=NamedSharding(mesh, fit(spec, value.scales.shape)),
                mins=mins,
                qtype=value.qtype,
            )
        return NamedSharding(mesh, fit(spec, value.shape))

    return jax.tree.map(
        expand, spec_tree, value_tree,
        is_leaf=lambda x: isinstance(x, (P, QuantizedTensor)),
    )


def named_sharding_tree(mesh: Mesh, params: dict):
    """NamedSharding pytree for params (QuantizedTensor-aware)."""
    return _to_sharding(mesh, param_pspecs(params), params)


def shard_params(params: dict, mesh: Mesh):
    """device_put the params with their tensor-parallel shardings."""
    shardings = named_sharding_tree(mesh, params)
    flat_p, treedef = jax.tree.flatten(params)
    flat_s = jax.tree.leaves(shardings)
    placed = [jax.device_put(p, s) for p, s in zip(flat_p, flat_s)]
    return jax.tree.unflatten(treedef, placed)


def cache_shardings(mesh: Mesh, batch: int = 1, quant: bool = False):
    spec = cache_pspec(batch_shardable=batch % mesh.shape[DATA_AXIS] == 0,
                       quant=quant)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), spec,
                        is_leaf=lambda x: isinstance(x, P))


def shard_cache(cache: KVCache, mesh: Mesh):
    s = cache_shardings(mesh, batch=cache.batch,
                        quant=isinstance(cache, QuantKVCache))
    return jax.tree.map(jax.device_put, cache, s)
