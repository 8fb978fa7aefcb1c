"""shard_map tensor parallelism with per-shard packed Pallas kernels.

The GSPMD path (parallel/sharding.py) lets XLA partition the per-op XLA
forward — correct, but it cannot partition a custom Pallas kernel, so the
round-1 mesh engine dropped to the slow unpacked XLA kernels. This module
is the fast path: the WHOLE forward runs as the per-shard body of a
``jax.shard_map``, so every shard calls the packed fused dequant-matmul
Pallas kernel (ops/pallas_qmatmul.py) on its LOCAL weight planes, with
explicit collectives exactly at the Megatron joins:

  q/k/v   column-parallel (fused, shard-interleaved)  -> local, no comm
  attention over local head group                     -> local, no comm
  o       row-parallel                                -> psum
  fc1     column-parallel                             -> local
  fc2     row-parallel                                -> psum
  lm_head column-parallel over (lane-padded) vocab    -> all_gather(tiled)

i.e. 2 psums + 1 all_gather per token — the textbook Megatron count; all
ride ICI on a real slice. The KV cache shards its d_model axis (contiguous
head groups, runtime/cache.py layout) and optionally batch over "data".

Sharding-aware weight packing: 4-bit nibble planes pack split-half, which
interleaves d_in rows; a row-parallel (d_in-sharded) weight must therefore
pack each shard's chunk independently (``pack_nibble_planes(chunks=tp)``)
so the local planes unpack shard-locally. The fused qkv weight concatenates
per-shard column groups (q_s|k_s|v_s) so a plain d_out shard of the fused
tensor is exactly one shard's q/k/v. The lm_head pads n_vocab so every
shard's slice stays lane-aligned (forward slices logits back).

No reference counterpart (the reference is single-process CPU,
/root/reference/biogpt.cpp — SURVEY §2.1); this is north-star scope.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import BioGptConfig
from ..models.biogpt import forward
from ..ops.pallas_qmatmul import _LANES
from ..quant.codecs import QK
from ..quant.layouts import QuantizedTensor, pack_nibble_planes
from ..runtime.cache import KVCache, QuantKVCache
from .mesh import DATA_AXIS, MODEL_AXIS


def _concat_qt(parts, axis):
    q0 = parts[0]
    return QuantizedTensor(
        levels=np.concatenate([np.asarray(p.levels) for p in parts], axis=axis),
        scales=np.concatenate([np.asarray(p.scales) for p in parts], axis=axis),
        mins=(np.concatenate([np.asarray(p.mins) for p in parts], axis=axis)
              if q0.mins is not None else None),
        qtype=q0.qtype, packed=q0.packed)


def _slice_cols(w, lo, hi):
    if isinstance(w, QuantizedTensor):
        return QuantizedTensor(
            levels=np.asarray(w.levels)[..., lo:hi],
            scales=np.asarray(w.scales)[..., lo:hi],
            mins=(np.asarray(w.mins)[..., lo:hi]
                  if w.mins is not None else None),
            qtype=w.qtype, packed=w.packed)
    return np.asarray(w)[..., lo:hi]


def fuse_qkv_interleaved(layers: dict, tp: int) -> dict:
    """Fuse q/k/v into one column-parallel weight, concatenated PER SHARD
    GROUP: columns [(q_0|k_0|v_0) | (q_1|k_1|v_1) | ...] so a plain d_out
    shard holds its own (q_s|k_s|v_s) and the in-shard ``jnp.split`` in
    the model (models/biogpt.py _attention) stays correct."""
    qw, kw, vw = (layers[n]["w"] for n in ("q", "k", "v"))
    d_out = (qw.scales.shape[-1] if isinstance(qw, QuantizedTensor)
             else qw.shape[-1])
    assert d_out % tp == 0
    per = d_out // tp
    parts, bparts = [], []
    for s in range(tp):
        for n in ("q", "k", "v"):
            parts.append(_slice_cols(layers[n]["w"], s * per, (s + 1) * per))
            bparts.append(np.asarray(layers[n]["b"])[..., s * per:(s + 1) * per])
    fused_w = (_concat_qt(parts, axis=-1)
               if isinstance(qw, QuantizedTensor)
               else np.concatenate(parts, axis=-1))
    fused_b = np.concatenate(bparts, axis=-1)
    out = {k: v for k, v in layers.items() if k not in ("q", "k", "v")}
    out["qkv"] = {"w": fused_w, "b": fused_b}
    return out


def _pad_cols(w, d_out_padded):
    """Zero-pad a (possibly quantized) weight's d_out axis."""
    if isinstance(w, QuantizedTensor):
        pad = d_out_padded - w.scales.shape[-1]
        if pad == 0:
            return w
        def padp(a):
            if a is None:
                return None
            a = np.asarray(a)
            widths = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
            return np.pad(a, widths)
        return QuantizedTensor(levels=padp(w.levels), scales=padp(w.scales),
                               mins=padp(w.mins), qtype=w.qtype,
                               packed=w.packed)
    w = np.asarray(w)
    pad = d_out_padded - w.shape[-1]
    if pad == 0:
        return w
    return np.pad(w, [(0, 0)] * (w.ndim - 1) + [(0, pad)])


def pack_params_tp(params: dict, tp: int) -> dict:
    """Sharding-aware engine packing for the shard_map TP path.

    Matches runtime/engine._pack_matmul_weights semantically, but: qkv
    fuses shard-interleaved; row-parallel weights (o, fc2) nibble-pack
    per-shard chunk; the lm_head's vocab pads to a multiple of tp*128 so
    every shard's slice is lane-aligned. Dense (f32/f16) weights pass
    through (padded/fused only).
    """
    import ml_dtypes

    def bf16_planes(w: QuantizedTensor) -> QuantizedTensor:
        return QuantizedTensor(
            levels=w.levels,
            scales=np.asarray(w.scales).astype(ml_dtypes.bfloat16),
            mins=(np.asarray(w.mins).astype(ml_dtypes.bfloat16)
                  if w.mins is not None else None),
            qtype=w.qtype, packed=w.packed)

    def pack(w, chunks=1):
        if not isinstance(w, QuantizedTensor) or w.packed:
            return w
        return bf16_planes(pack_nibble_planes(w, chunks=chunks))

    layers = fuse_qkv_interleaved(params["layers"], tp)
    row_parallel = {"o", "fc2"}
    out_layers = {}
    for name, leaf in layers.items():
        if isinstance(leaf, dict) and isinstance(
                leaf.get("w"), (QuantizedTensor, np.ndarray, jnp.ndarray)):
            chunks = tp if name in row_parallel else 1
            out_layers[name] = {"w": pack(leaf["w"], chunks=chunks),
                                "b": leaf["b"]}
        else:
            out_layers[name] = leaf

    lm = params["lm_head"]
    d_out = (lm.scales.shape[-1] if isinstance(lm, QuantizedTensor)
             else np.asarray(lm).shape[-1])
    mult = tp * _LANES
    padded = -(-d_out // mult) * mult
    lm = pack(_pad_cols(lm, padded))

    out = dict(params)
    out["layers"] = out_layers
    out["lm_head"] = lm
    return out


# ---------------------------------------------------------------- pspecs

def tp_pspecs(params: dict) -> dict:
    """PartitionSpec pytree for TP-packed params (shard_map in_specs).

    Planes of a QuantizedTensor share the logical 2-D spec: levels
    (d_in[, /2], d_out) and scales/mins (d_in/32, d_out) shard the same
    axis (per-chunk packing keeps row shards self-contained).
    """
    COL3, ROW3 = P(None, None, MODEL_AXIS), P(None, MODEL_AXIS, None)
    BIAS3, REP3 = P(None, MODEL_AXIS), P(None, None)

    def wspec(value, spec):
        if isinstance(value, QuantizedTensor):
            return QuantizedTensor(
                levels=spec, scales=spec,
                mins=None if value.mins is None else spec,
                qtype=value.qtype, packed=value.packed)
        return spec

    layers = params["layers"]
    layer_specs = {
        "ln0": {"w": P(None, None), "b": P(None, None)},
        "ln1": {"w": P(None, None), "b": P(None, None)},
        "qkv": {"w": wspec(layers["qkv"]["w"], COL3), "b": BIAS3},
        "o": {"w": wspec(layers["o"]["w"], ROW3), "b": REP3},
        "fc1": {"w": wspec(layers["fc1"]["w"], COL3), "b": BIAS3},
        "fc2": {"w": wspec(layers["fc2"]["w"], ROW3), "b": REP3},
    }

    def rep_like(v):
        if isinstance(v, QuantizedTensor):
            return QuantizedTensor(
                levels=P(), scales=P(),
                mins=None if v.mins is None else P(),
                qtype=v.qtype, packed=v.packed)
        return P()

    return {
        "embed_tokens": rep_like(params["embed_tokens"]),
        "embed_positions": rep_like(params["embed_positions"]),
        "final_ln": {"w": P(), "b": P()},
        "lm_head": wspec(params["lm_head"], P(None, MODEL_AXIS)),
        "layers": layer_specs,
    }


def tp_shardings(mesh: Mesh, params: dict):
    """NamedSharding pytree for device_put of TP-packed params."""
    return jax.tree.map(lambda s: NamedSharding(mesh, s), tp_pspecs(params),
                        is_leaf=lambda x: isinstance(x, P))


def shard_params_tp(params: dict, mesh: Mesh):
    shardings = tp_shardings(mesh, params)
    flat_p, treedef = jax.tree.flatten(params)
    flat_s = jax.tree.leaves(shardings)
    return jax.tree.unflatten(
        treedef, [jax.device_put(p, s) for p, s in zip(flat_p, flat_s)])


# ---------------------------------------------------------------- forward

def make_tp_forward(mesh: Mesh, seq_parallel: bool = True,
                    fused_decode: bool = False):
    """A drop-in for models.biogpt.forward that runs the whole step as a
    shard_map over ``mesh`` (see module docstring). Same signature/static
    args, so the engine jits it exactly like the single-device forward.

    ``seq_parallel``: prefill shapes whose sequence length divides the TP
    degree run with Megatron sequence parallelism (residuals/LN sharded
    over N, reduce_scatter+all_gather at the joins instead of psum — the
    collective-overlap scheduling of SURVEY §2.1(e)). Decode (N=1) and
    non-divisible lengths fall back to the psum formulation; both are
    numerically identical (tests/test_sharding.py).

    ``fused_decode`` (opt-in): decode-shaped calls (N == 1, bf16 KVCache,
    supported local shard widths) route through the TP megakernel —
    per-layer kernel halves with the Megatron psums between
    (ops/pallas_decode_tp.py) — instead of the per-op shard_map body
    (measured 3.2x the single-device megakernel's cost, RESULTS.md round
    3). Prefill shapes, int8-KV caches, and unsupported shapes keep the
    per-op path. Whether the kernels engage is decided when this factory
    runs: on a TPU backend they run compiled; elsewhere they require
    ``ops.qmatmul.set_pallas_mode(True)`` and run in interpret mode (the
    virtual-mesh verification lane, tests/test_sharding.py)."""
    tp = mesh.shape[MODEL_AXIS]
    dp = mesh.shape[DATA_AXIS]
    from ..ops.qmatmul import _PALLAS_MODE
    _interpret = jax.default_backend() != "tpu"
    fused_on = fused_decode and (_PALLAS_MODE is True or
                                 (not _interpret and _PALLAS_MODE is not False))

    def tp_forward(params, tokens, cache, past, config: BioGptConfig,
                   compute_dtype=jnp.float32, causal: bool = True,
                   logits_mode: str = "last", allow_pallas: bool = True,
                   kv_window: Optional[int] = None,
                   last_index=None):
        B = tokens.shape[0]
        dspec = DATA_AXIS if (dp > 1 and B % dp == 0) else None
        kv = P(None, dspec, None, MODEL_AXIS)
        if isinstance(cache, QuantKVCache):
            # int8 levels shard like the dense cache; the per-row scale
            # planes have no d_model axis and replicate over "model" —
            # exact, because quantize_rows pmaxes the absmax so every
            # shard writes the identical full-row scale
            cache_spec = QuantKVCache(k=kv, v=kv,
                                      ks=P(None, dspec, None, None),
                                      vs=P(None, dspec, None, None))
        else:
            cache_spec = KVCache(k=kv, v=kv)
        pspecs = tp_pspecs(params)

        def vec_spec(x):
            return P() if jnp.ndim(x) == 0 else P(dspec)

        body_args = [params, tokens, cache, jnp.asarray(past, jnp.int32)]
        in_specs = [pspecs, P(dspec, None), cache_spec, vec_spec(past)]
        if last_index is not None:
            body_args.append(jnp.asarray(last_index, jnp.int32))
            in_specs.append(vec_spec(last_index))

        logits_spec = (P(dspec, None) if logits_mode == "last"
                       else P(dspec, None, None))

        N = tokens.shape[1]
        seq_shard = seq_parallel and tp > 1 and N > 1 and N % tp == 0

        from ..ops.pallas_decode_tp import supports_layers_tp
        use_fused = (
            fused_on and N == 1 and causal and logits_mode == "last"
            and last_index is None and kv_window is not None
            and (isinstance(cache, QuantKVCache)    # int8-KV (round 5)
                 or cache.k.dtype == jnp.bfloat16)
            and supports_layers_tp(params.get("layers", {}), tp,
                                   batch=B // (dp if dspec else 1)))

        def body(params, tokens, cache, past, *rest):
            li = rest[0] if rest else None
            if use_fused:
                return _fused_decode_body(
                    params, tokens, cache, past, config, tp,
                    compute_dtype=compute_dtype, kv_window=kv_window,
                    interpret=_interpret)
            return forward(
                params, tokens, cache, past, config,
                compute_dtype=compute_dtype, causal=causal,
                logits_mode=logits_mode, allow_pallas=allow_pallas,
                kv_window=kv_window, last_index=li,
                tp_axis=MODEL_AXIS, tp_size=tp, tp_seq_shard=seq_shard)

        return jax.shard_map(
            body, mesh=mesh, in_specs=tuple(in_specs),
            out_specs=(logits_spec, cache_spec), check_vma=False,
        )(*body_args)

    return tp_forward


def _fused_decode_body(params, tokens, cache, past, config: BioGptConfig,
                       tp: int, *, compute_dtype, kv_window: int,
                       interpret: bool):
    """Per-shard body for the TP megakernel decode step.

    The TP analog of models.biogpt.forward_fused_decode: embedding and the
    epilogue (final LN, column-parallel lm_head + all_gather) stay XLA ops;
    the layer stack runs as per-layer kernel halves with the Megatron
    psums between (ops/pallas_decode_tp.decode_step_fused_tp). Cache-row
    writes land in the LOCAL shard at each slot's own position — the same
    per-slot commit as the single-device megakernel path.
    """
    import math

    from ..models.biogpt import _layer_norm
    from ..ops import embedding_lookup, matmul
    from ..ops.pallas_decode_tp import decode_step_fused_tp

    B, N = tokens.shape
    assert N == 1
    D = config.d_model
    emb = embedding_lookup(tokens, params["embed_tokens"]) * math.sqrt(D)
    past_vec = jnp.broadcast_to(
        jnp.atleast_1d(jnp.asarray(past, jnp.int32)), (B,))
    pos = past_vec.reshape(B, 1) + config.pos_offset
    pos_emb = embedding_lookup(pos, params["embed_positions"])
    x0 = (emb + pos_emb).reshape(B, D)

    L = cache.k.shape[0]
    Dloc = cache.k.shape[-1]
    S = cache.k.shape[2]
    zero = jnp.zeros((), jnp.int32)
    if isinstance(cache, QuantKVCache):
        # int8-KV fused TP (round 5): the kernel returns pre-quantized
        # rows (pmax-completed full-row scales — bit-identical cache
        # contents to the per-op TP path)
        x, kq, vq, ksc, vsc = decode_step_fused_tp(
            x0, params["layers"], cache.k, cache.v, past_vec,
            n_head=config.n_head, tp_size=tp, tp_axis=MODEL_AXIS,
            window=kv_window, ln_eps=config.ln_eps, interpret=interpret,
            k_scales=cache.ks, v_scales=cache.vs)
        k_new, v_new, ks_new, vs_new = cache
        if B > 1 and Dloc % 128 == 0 and S % 128 == 0:
            # same aligned-RMW commit kernel as the single-device int8
            # fused path, on the LOCAL level shard + replicated planes
            from ..ops.pallas_decode import kv_commit_quant_pallas
            k_new, v_new, ks_new, vs_new = kv_commit_quant_pallas(
                k_new, v_new, ks_new, vs_new,
                jnp.transpose(kq, (1, 0, 2)), jnp.transpose(vq, (1, 0, 2)),
                jnp.transpose(ksc, (1, 0))[..., None],
                jnp.transpose(vsc, (1, 0))[..., None],
                past_vec, interpret=interpret)
        else:
            for b in range(B):
                idx = (zero, jnp.int32(b), past_vec[b], zero)
                sidx = (zero, jnp.int32(b), zero, past_vec[b])
                k_new = jax.lax.dynamic_update_slice(
                    k_new, kq[:, b].reshape(L, 1, 1, Dloc), idx)
                v_new = jax.lax.dynamic_update_slice(
                    v_new, vq[:, b].reshape(L, 1, 1, Dloc), idx)
                ks_new = jax.lax.dynamic_update_slice(
                    ks_new, ksc[:, b].reshape(L, 1, 1, 1), sidx)
                vs_new = jax.lax.dynamic_update_slice(
                    vs_new, vsc[:, b].reshape(L, 1, 1, 1), sidx)
        cache = QuantKVCache(k=k_new, v=v_new, ks=ks_new, vs=vs_new)
    else:
        x, k_rows, v_rows = decode_step_fused_tp(
            x0, params["layers"], cache.k, cache.v, past_vec,
            n_head=config.n_head, tp_size=tp, tp_axis=MODEL_AXIS,
            window=kv_window, ln_eps=config.ln_eps, interpret=interpret)

        if B > 1 and Dloc % 128 == 0:
            # same aligned-RMW commit kernel as the single-device fused
            # path (2·B dynamic_update_slices are serially-chained op
            # launches)
            from ..ops.pallas_decode import kv_commit_pallas
            k_new, v_new = kv_commit_pallas(
                cache.k, cache.v, jnp.transpose(k_rows, (1, 0, 2)),
                jnp.transpose(v_rows, (1, 0, 2)), past_vec,
                interpret=interpret)
        else:
            k_new, v_new = cache.k, cache.v
            for b in range(B):
                idx = (zero, jnp.int32(b), past_vec[b], zero)
                k_new = jax.lax.dynamic_update_slice(
                    k_new, k_rows[:, b:b + 1].reshape(L, 1, 1, Dloc).astype(
                        k_new.dtype), idx)
                v_new = jax.lax.dynamic_update_slice(
                    v_new, v_rows[:, b:b + 1].reshape(L, 1, 1, Dloc).astype(
                        v_new.dtype), idx)
        cache = KVCache(k=k_new, v=v_new)

    x = _layer_norm(x, params["final_ln"]["w"], params["final_ln"]["b"],
                    config.ln_eps)
    logits = matmul(x, params["lm_head"], compute_dtype=compute_dtype,
                    allow_pallas=not interpret)
    logits = jax.lax.all_gather(logits, MODEL_AXIS, axis=-1, tiled=True)
    return logits[..., :config.n_vocab], cache


def supports_tp(config: BioGptConfig, tp: int) -> bool:
    """Whether the shard_map TP path divides cleanly for this model.

    Divisibility only — lane alignment of the LOCAL shards decides per
    weight whether the Pallas kernel engages (ops.pallas_qmatmul.supports)
    or the XLA fallback runs; both are correct."""
    if tp <= 0:
        return False
    d, f, h = config.d_model, config.d_ff, config.n_head
    # row-parallel weights shard their SCALE planes on the block axis too:
    # d_in/32 blocks must divide across shards
    return (h % tp == 0 and d % tp == 0 and f % tp == 0
            and (d // QK) % tp == 0 and (f // QK) % tp == 0)
