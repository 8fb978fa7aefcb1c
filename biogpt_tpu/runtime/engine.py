"""The generation engine: jitted prefill/decode with bucketed shapes.

The reference rebuilds its ggml graph from scratch every token
(``biogpt_eval``, ``/root/reference/biogpt.cpp:812-847`` — SURVEY §8 Q10).
The TPU-native equivalent is the opposite: ``forward`` is traced and
compiled ONCE per shape bucket, the KV cache is a donated pytree (updated
in place on device, no per-step copies), and positions/lengths are traced
scalars so a single compiled decode step serves the whole generation.

Prefill pads the prompt up to a power-of-two bucket so arbitrary prompt
lengths reuse a handful of compiled programs; the real last-token index is
passed into the jitted function to extract the right logits row.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BioGptConfig, GenerationParams
from ..models.biogpt import (forward, forward_fused_decode,
                             forward_fused_decode_greedy)
from .cache import KVCache, init_cache
from .sampling import greedy, sample_top_k_top_p


def _bucket(n: int, floor: int = 8) -> int:
    b = floor
    while b < n:
        b *= 2
    return b


def _pack_matmul_weights(params: dict) -> dict:
    """Prepare quantized matmul weights for the Pallas kernel: nibble-pack
    4-bit formats (halves their HBM traffic at decode) and store scale/min
    planes as bfloat16 (Mosaic has no f16; the dequantized weight is
    bf16-rounded for the MXU regardless). Embeddings stay row-major
    unpacked fp16 (gather path); non-lane-aligned weights (lm_head's odd
    vocab) stay on the XLA path untouched."""
    import ml_dtypes

    from ..ops.pallas_qmatmul import supports, _LANES
    from ..quant.layouts import QuantizedTensor, pack_nibble_planes

    def maybe_pack(w, pad_out: bool = False):
        if not isinstance(w, QuantizedTensor) or w.packed:
            return w
        if pad_out and w.scales.shape[-1] % _LANES != 0:
            # lane-pad d_out (lm_head's odd vocab) with zero scales/levels;
            # forward slices logits back to n_vocab
            pad = _LANES - w.scales.shape[-1] % _LANES
            widths = [(0, 0)] * (w.levels.ndim - 1) + [(0, pad)]
            w = QuantizedTensor(
                levels=np.pad(np.asarray(w.levels), widths),
                scales=np.pad(np.asarray(w.scales), widths),
                mins=(np.pad(np.asarray(w.mins), widths)
                      if w.mins is not None else None),
                qtype=w.qtype, packed=False,
            )
        if not supports(w, 1):
            return w
        w = pack_nibble_planes(w)
        return QuantizedTensor(
            levels=w.levels,
            scales=np.asarray(w.scales).astype(ml_dtypes.bfloat16),
            mins=(np.asarray(w.mins).astype(ml_dtypes.bfloat16)
                  if w.mins is not None else None),
            qtype=w.qtype, packed=w.packed,
        )

    def fuse_qkv(layers: dict) -> dict:
        """Concatenate q/k/v into one projection (d_in, 3*d_model): one
        kernel launch instead of three — program length, not bytes, caps
        decode on this runtime, and shorter programs also help real HW."""
        qw = layers.get("q", {}).get("w")
        kw = layers.get("k", {}).get("w")
        vw = layers.get("v", {}).get("w")
        if not all(isinstance(w, QuantizedTensor) and not w.packed
                   for w in (qw, kw, vw)):
            return layers
        fused_w = QuantizedTensor(
            levels=np.concatenate([qw.levels, kw.levels, vw.levels], axis=-1),
            scales=np.concatenate([qw.scales, kw.scales, vw.scales], axis=-1),
            mins=(np.concatenate([qw.mins, kw.mins, vw.mins], axis=-1)
                  if qw.mins is not None else None),
            qtype=qw.qtype, packed=False,
        )
        fused_b = np.concatenate(
            [layers["q"]["b"], layers["k"]["b"], layers["v"]["b"]], axis=-1)
        out = {k: v for k, v in layers.items() if k not in ("q", "k", "v")}
        out["qkv"] = {"w": fused_w, "b": fused_b}
        return out

    out = dict(params)
    out["lm_head"] = maybe_pack(params["lm_head"], pad_out=True)
    out["layers"] = {
        k: ({"w": maybe_pack(v["w"]), "b": v["b"]}
            if isinstance(v, dict) and isinstance(v.get("w"), QuantizedTensor)
            else v)
        for k, v in fuse_qkv(params["layers"]).items()
    }
    return out


@dataclass
class GenerationResult:
    ids: List[int]
    prompt_len: int
    timings: dict = field(default_factory=dict)

    @property
    def new_ids(self) -> List[int]:
        return self.ids[self.prompt_len:]


class Engine:
    """Single-model generation engine (batch=1 decode; batched scoring).

    ``compute_dtype``: jnp.bfloat16 for speed (default), jnp.float32 for
    bit-careful parity work. ``cache_dtype`` defaults to float16 (the
    north-star upgrade over the reference's F32 cache).
    """

    # decode steps per scan dispatch (non-streaming generate): fixed so a
    # generation compiles one scan program per KV-window bucket
    SCAN_LEN = 64

    def __init__(
        self,
        config: BioGptConfig,
        params,
        compute_dtype=jnp.bfloat16,
        cache_dtype=None,
        causal: bool = True,
        max_seq: Optional[int] = None,
        donate_cache: bool = True,
        mesh=None,
        pack_q4: bool = True,
        kv_quant: bool = False,
        health_check: bool = True,
        tp_fused_decode: bool = False,
    ):
        self.config = config
        self.compute_dtype = compute_dtype
        self.causal = causal
        # failure detection (runtime/health.py): generate()'s decode loop
        # accumulates an on-device finite check and the bit rides home in
        # the existing once-per-generation token drain; a tripped bit
        # raises ModelHealthError before the poisoned tokens are emitted.
        self.health_check = health_check
        self.max_seq = max_seq or config.n_positions
        self.mesh = mesh
        # Mesh path: the whole forward runs as a shard_map (parallel/tp.py)
        # so each shard calls the packed Pallas kernels on its LOCAL planes
        # with explicit psum/all_gather at the Megatron joins — GSPMD alone
        # cannot partition a custom kernel, which is what forced round 1's
        # mesh engine onto the slow unpacked XLA path.
        self._tp_fwd = None
        self._tp_fused = False
        if mesh is not None and pack_q4:
            from ..parallel.mesh import MODEL_AXIS
            from ..parallel.tp import (make_tp_forward, pack_params_tp,
                                       supports_tp)
            tp = mesh.shape[MODEL_AXIS]
            if supports_tp(config, tp):
                params = pack_params_tp(params, tp)
                # opt-in TP megakernel (VERDICT r3 #3): decode-shaped calls
                # route through the per-layer kernel halves + Megatron
                # psums (ops/pallas_decode_tp.py); prefill stays per-op.
                # Needs a bf16 cache — forced below.
                self._tp_fused = tp_fused_decode   # incl. int8 KV (round 5)
                self._tp_fwd = make_tp_forward(
                    mesh, fused_decode=self._tp_fused)
        # Default ON: the block-structured Pallas kernel measures ~2.5x
        # faster than the XLA block-accum path under honest (fetch-synced)
        # timing (RESULTS.md).
        self.allow_pallas = pack_q4 and (mesh is None or self._tp_fwd is not None)
        if pack_q4 and mesh is None:
            params = _pack_matmul_weights(params)

        # int8 KV (opt-in): levels + per-row absmax scales, half the KV HBM
        # traffic of bf16 — see runtime/cache.QuantKVCache. Works on the
        # megakernel, per-op, and mesh paths (sharded: levels over d_model,
        # scale planes replicated; quantize_rows pmaxes the absmax so the
        # sharded cache is bit-identical to single-device).
        if kv_quant:
            if cache_dtype not in (None, jnp.int8):
                raise ValueError("kv_quant forces an int8 cache")
            cache_dtype = jnp.int8
        # (downstream dispatch keys on cache_dtype / the cache pytree type)
        # Whole-model decode megakernel (ops/pallas_decode.py): single-
        # stream decode runs ALL layers as one Pallas kernel. Needs a bf16
        # or int8 KV cache (Mosaic has no f16 vectors) and fused+packed
        # quantized layer weights; greedy/sampled decode at batch=1,
        # causal only.
        from ..ops.pallas_decode import supports_layers
        self._fused_decode = (
            mesh is None and pack_q4 and causal
            and compute_dtype != jnp.float32
            and cache_dtype in (None, jnp.bfloat16, jnp.int8)
            and supports_layers(params.get("layers", {}), jnp.bfloat16,
                                batch=1, n_new=1))
        # fp16 KV cache (the north-star upgrade over the reference's f32);
        # bf16 when a megakernel path (single-device or TP) is live.
        if cache_dtype is None:
            cache_dtype = (jnp.bfloat16
                           if self._fused_decode or self._tp_fused
                           else jnp.float16)
        self.cache_dtype = cache_dtype
        if self._tp_fwd is not None:
            from ..parallel.tp import shard_params_tp
            self.params = shard_params_tp(params, mesh)
        elif mesh is not None:
            from ..parallel.sharding import shard_params
            self.params = shard_params(params, mesh)
        else:
            self.params = jax.device_put(params)

        fwd = self._tp_fwd or forward
        static = ("config", "compute_dtype", "causal", "logits_mode",
                  "allow_pallas", "kv_window")
        donate = ("cache",) if donate_cache else ()
        self._step = jax.jit(
            fwd, static_argnames=static, donate_argnames=donate)

        self._interpret = jax.default_backend() != "tpu"

        # Greedy tail fusion: when the megakernel path is live and lm_head
        # is packed, greedy decode skips materializing the (B, n_vocab)
        # logits — a second Pallas kernel does final LN + lm_head + argmax
        # and returns the token ids (ops.pallas_qmatmul.lm_head_argmax_pallas).
        from ..ops.pallas_qmatmul import supports as _pallas_supports
        from ..quant.layouts import QuantizedTensor as _QT
        lm_head = (self.params.get("lm_head")
                   if isinstance(self.params, dict) else None)
        self._fused_greedy = (
            self._fused_decode and isinstance(lm_head, _QT)
            and lm_head.packed and _pallas_supports(lm_head, 1))

        def decode_and_sample(params, tok, cache, past, rng, temp, top_p,
                              out_buf, out_ix, health, *, top_k: int,
                              use_greedy: bool, kv_window: int,
                              use_fused: bool = False):
            if use_fused and use_greedy and self._fused_greedy:
                # no logits materialize on this path — the argmax kernel's
                # max-value output carries the finite check instead
                nxt, cache, ok = forward_fused_decode_greedy(
                    params, tok, cache, past, self.config,
                    kv_window=kv_window, interpret=self._interpret,
                    with_health=True)
                out_buf = jax.lax.dynamic_update_slice(out_buf, nxt, (out_ix,))
                return (nxt[:, None], cache, rng, out_buf, past + 1,
                        out_ix + 1, health & ok)
            if use_fused:
                logits, cache = forward_fused_decode(
                    params, tok, cache, past, self.config,
                    compute_dtype=self.compute_dtype, kv_window=kv_window,
                    interpret=self._interpret)
            else:
                logits, cache = fwd(
                    params, tok, cache, past, self.config,
                    compute_dtype=self.compute_dtype, causal=self.causal,
                    allow_pallas=self.allow_pallas, logits_mode="last",
                    kv_window=kv_window)
            health = health & jnp.all(jnp.isfinite(logits))
            if use_greedy:
                nxt = greedy(logits)
            else:
                rng, sub = jax.random.split(rng)
                nxt = sample_top_k_top_p(sub, logits, top_k=top_k,
                                         top_p=top_p, temp=temp)
            # Sampled tokens accumulate on device (host fetches the buffer
            # once per chunk) and the counters advance on device — per-step
            # host<->device scalar traffic costs ~4x the whole model step.
            out_buf = jax.lax.dynamic_update_slice(out_buf, nxt, (out_ix,))
            return (nxt[:, None], cache, rng, out_buf, past + 1, out_ix + 1,
                    health)

        self._decode_sample = jax.jit(
            decode_and_sample,
            static_argnames=("top_k", "use_greedy", "kv_window", "use_fused"),
            donate_argnames=donate + (("out_buf",) if donate_cache else ()))

        def fused_step(params, tok, cache, past, *, kv_window: int):
            return forward_fused_decode(
                params, tok, cache, past, self.config,
                compute_dtype=self.compute_dtype, kv_window=kv_window,
                interpret=self._interpret)

        self._fused_step = jax.jit(
            fused_step, static_argnames=("kv_window",), donate_argnames=donate)

        def decode_scan(params, tok, cache, past, rng, temp, top_p,
                        out_buf, out_ix, done, health, eos_id, *,
                        n_steps: int, top_k: int, use_greedy: bool,
                        kv_window: int, use_fused: bool, check_eos: bool):
            """``n_steps`` fused decode+sample steps under ONE dispatch.

            Two runtime costs force this shape (both measured, see
            RESULTS.md): binding the real arguments costs ~0.7 ms/call —
            2x the megakernel's device time — so steps run under one
            ``lax.scan``; and a device->host fetch after a large program
            stalls ~60 ms, so EOS is detected ON DEVICE (``done`` carry;
            post-EOS steps collapse to a ``cond`` no-op) and the host
            drains the token ring ONCE per generation, with the health
            bit riding in the same fetch.
            """
            def step(operand):
                tok, cache, past, rng, out_buf, out_ix, health = operand
                (tok, cache, rng, out_buf, past, out_ix,
                 health) = decode_and_sample(
                    params, tok, cache, past, rng, temp, top_p, out_buf,
                    out_ix, health, top_k=top_k, use_greedy=use_greedy,
                    kv_window=kv_window, use_fused=use_fused)
                return tok, cache, past, rng, out_buf, out_ix, health

            def body(carry, _):
                done = carry[-1]
                operand = carry[:-1]
                operand = jax.lax.cond(done, lambda c: c, step, operand)
                if check_eos:
                    done = done | (operand[0][0, 0] == eos_id)
                return operand + (done,), None

            init = (tok, cache, past, rng, out_buf, out_ix, health, done)
            (tok, cache, past, rng, out_buf, out_ix, health,
             done), _ = jax.lax.scan(body, init, None, length=n_steps)
            return tok, cache, rng, out_buf, past, out_ix, health, done

        self._decode_scan = jax.jit(
            decode_scan,
            static_argnames=("n_steps", "top_k", "use_greedy", "kv_window",
                             "use_fused", "check_eos"),
            donate_argnames=donate + (("out_buf",) if donate_cache else ()))

    def _use_fused(self) -> bool:
        """Megakernel gate, evaluated per call (honors set_pallas_mode)."""
        from ..ops.qmatmul import _PALLAS_MODE
        if not self._fused_decode or _PALLAS_MODE is False:
            return False
        return (not self._interpret) or _PALLAS_MODE is True

    # ------------------------------------------------------------- plumbing

    def _window(self, needed: int) -> int:
        """Static KV-attention window: the live length bucketed up (floor
        128) — a handful of compiled variants instead of reading the whole
        n_positions cache every step."""
        return min(_bucket(needed, floor=128), self.max_seq)

    def warmup(self, prompt_len: int = 8, n_tokens: int = 4,
               sampled: bool = True) -> None:
        """Precompile the prefill bucket, decode step, and samplers.

        Also absorbs runtime first-use costs (some PJRT transports are slow
        on the first deeply-queued executable) so the first user request
        runs at steady-state speed.
        """
        gen = GenerationParams(n_predict=n_tokens, seed=0, stop_at_eos=False,
                               temp=0.8 if sampled else 0.0)
        # two rounds: the first compiles and absorbs transport warmup, the
        # second confirms the steady-state path is primed
        self.generate(list(range(2, 2 + prompt_len)), gen)
        self.generate(list(range(2, 2 + prompt_len)), gen)
        if sampled:  # greedy variant compiles separately
            gen.temp = 0.0
            self.generate(list(range(2, 2 + prompt_len)), gen)

    def new_cache(self, batch: int = 1, max_len: Optional[int] = None) -> KVCache:
        cache = init_cache(self.config, batch=batch,
                           max_len=max_len or self.max_seq,
                           dtype=self.cache_dtype)
        if self.mesh is not None:
            from ..parallel.sharding import shard_cache
            cache = shard_cache(cache, self.mesh)
        return cache

    def prefill(self, cache: KVCache, token_ids: List[int] | np.ndarray):
        """Run the prompt through the model. Returns (logits(B,V), cache, n)."""
        ids = np.asarray(token_ids, dtype=np.int32)
        if ids.ndim == 1:
            ids = ids[None, :]
        n = ids.shape[1]
        if n > self.max_seq:
            raise ValueError(f"prompt length {n} exceeds max_seq {self.max_seq}")
        padded = _bucket(n)
        if padded > self.max_seq:
            padded = self.max_seq
        buf = np.zeros((ids.shape[0], padded), dtype=np.int32)
        buf[:, :n] = ids
        logits, cache = self._step(
            self.params, jnp.asarray(buf), cache, jnp.int32(0), self.config,
            compute_dtype=self.compute_dtype, causal=self.causal, allow_pallas=self.allow_pallas,
            logits_mode="last", kv_window=self._window(padded),
            last_index=jnp.int32(n - 1),
        )
        return logits, cache, n

    def decode_step(self, cache: KVCache, token: int | jax.Array, past: int | jax.Array):
        """One-token decode. Returns (logits(B,V), cache)."""
        tok = jnp.asarray(token, jnp.int32).reshape(1, 1)
        window = self._window(int(past) + 1) if isinstance(past, int) else None
        if window is not None and self._use_fused() and cache.batch == 1:
            return self._fused_step(
                self.params, tok, cache, jnp.asarray(past, jnp.int32),
                kv_window=window)
        logits, cache = self._step(
            self.params, tok, cache, jnp.asarray(past, jnp.int32), self.config,
            compute_dtype=self.compute_dtype, causal=self.causal, allow_pallas=self.allow_pallas,
            logits_mode="last", kv_window=window,
        )
        return logits, cache

    # ------------------------------------------------------------ generation

    def generate(
        self,
        prompt_ids: List[int],
        gen: GenerationParams | None = None,
        stream_cb: Optional[Callable[[int], None]] = None,
    ) -> GenerationResult:
        """Prefill + fused decode/sample loop.

        Decode steps are enqueued asynchronously with the sampled token fed
        device-to-device; the host syncs once per chunk (per token when
        streaming) to check EOS — so steady-state throughput is set by the
        compiled step, not host round-trips.
        """
        gen = gen or GenerationParams()
        seed = gen.seed if gen.seed >= 0 else int(time.time())
        rng = jax.random.PRNGKey(seed)
        use_greedy = gen.temp <= 0
        temp = jnp.float32(max(gen.temp, 1e-8))
        top_p = jnp.float32(gen.top_p)
        # Speculative chunking: run `chunk` fused steps, then fetch the
        # device-side token buffer in ONE device->host transfer to emit
        # tokens and check EOS. If EOS landed mid-chunk the extra steps are
        # discarded (the cache dies with the generation, so over-advancing
        # it is harmless). Streaming fetches every token for latency;
        # otherwise fetches are kept rare — device->host reads are far more
        # expensive than decode steps. Non-streaming chunks run as ONE
        # lax.scan dispatch (see decode_scan): per-call argument binding on
        # this runtime costs ~2x the megakernel itself.
        streaming = stream_cb is not None
        chunk = 1 if streaming else self.SCAN_LEN

        # Cap by the KV-cache length (max_seq), not just n_positions: decode
        # writes cache rows at prompt_len..prompt_len+n-2, and
        # dynamic_update_slice clamps out-of-range writes to the LAST slot —
        # silently corrupting the cache instead of failing.
        limit = min(self.max_seq, self.config.n_positions)
        n_predict = min(gen.n_predict, limit - len(prompt_ids))
        ids = list(prompt_ids)
        if n_predict <= 0:
            return GenerationResult(ids=ids, prompt_len=len(prompt_ids))

        t0 = time.perf_counter()
        cache = self.new_cache(batch=1)
        logits, cache, past = self.prefill(cache, ids)
        jax.block_until_ready(logits)
        t_prefill = time.perf_counter() - t0
        # on-device health lane (runtime/health.py): seeded from the prefill
        # logits, accumulated by every decode step, fetched with the drain
        health_dev = jnp.all(jnp.isfinite(logits))

        # first sampled token comes from the prefill logits
        td0 = time.perf_counter()
        if use_greedy:
            tok = greedy(logits)[:, None]
        else:
            rng, sub = jax.random.split(rng)
            tok = sample_top_k_top_p(sub, logits, top_k=gen.top_k,
                                     top_p=gen.top_p, temp=gen.temp)[:, None]

        stopped = False
        emitted = 0
        # scan chunks over-generate past n_predict (the tail chunk runs to
        # its full static length; extras are discarded) — size the ring so
        # those writes never clamp onto a live slot
        buf_len = (max(n_predict, 1) if streaming
                   else 1 + -(-(n_predict - 1) // chunk) * chunk)
        out_buf = jnp.zeros((buf_len,), jnp.int32)
        out_buf = jax.lax.dynamic_update_slice(out_buf, tok[0], (0,))
        queued = 1   # tokens materialized in out_buf (incl. the prefill one)

        def drain():
            """One transfer: emit all queued tokens, detect EOS, check
            the health bit (it rides the same fetch)."""
            nonlocal stopped, emitted
            # np.asarray blocks until the buffer is computed AND fetched;
            # an explicit block_until_ready first would add a second ~35 ms
            # sync RPC on this runtime
            if self.health_check:
                vals = np.asarray(jnp.concatenate(
                    [out_buf, health_dev.astype(jnp.int32)[None]]))
                if int(vals[-1]) == 0:
                    from .health import ModelHealthError
                    raise ModelHealthError(
                        "non-finite logits during generation (after "
                        f"{emitted} emitted tokens) — corrupt checkpoint "
                        "or numerics bug; tokens withheld")
            else:
                vals = np.asarray(out_buf)
            while emitted < min(queued, n_predict) and not stopped:
                tid = int(vals[emitted])
                ids.append(tid)
                emitted += 1
                if stream_cb is not None:
                    stream_cb(tid)
                if gen.stop_at_eos and tid == gen.eos_token_id:
                    stopped = True

        td = time.perf_counter()
        steps = 0
        past_dev = jnp.int32(past)
        out_ix = jnp.int32(queued)
        use_fused = self._use_fused()
        # on-device EOS flag for the scan path (the prefill-sampled first
        # token may already be EOS)
        done_dev = (tok[0, 0] == gen.eos_token_id if gen.stop_at_eos
                    else jnp.asarray(False))
        while queued < n_predict and not stopped:
            if streaming:
                budget = min(chunk, n_predict - queued)
                window = self._window(past + queued + budget)
                for _ in range(budget):
                    (tok, cache, rng, out_buf, past_dev, out_ix,
                     health_dev) = self._decode_sample(
                            self.params, tok, cache, past_dev, rng, temp,
                            top_p, out_buf, out_ix, health_dev,
                            top_k=gen.top_k, use_greedy=use_greedy,
                            kv_window=window, use_fused=use_fused)
                    queued += 1
                    steps += 1
                drain()
            else:
                # one dispatch = `chunk` steps; the tail chunk over-generates
                # into the oversized ring (extras discarded at drain); NO
                # mid-generation drain — EOS is handled on device and the
                # single fetch below collects the whole ring
                window = self._window(past + queued + chunk)
                (tok, cache, rng, out_buf, past_dev, out_ix, health_dev,
                 done_dev) = self._decode_scan(
                    self.params, tok, cache, past_dev, rng, temp,
                    top_p, out_buf, out_ix, done_dev, health_dev,
                    jnp.int32(gen.eos_token_id), n_steps=chunk,
                    top_k=gen.top_k, use_greedy=use_greedy,
                    kv_window=window, use_fused=use_fused,
                    check_eos=gen.stop_at_eos)
                steps += min(chunk, n_predict - queued)
                queued += chunk
        drain()
        t_decode = time.perf_counter() - td

        n_new = len(ids) - len(prompt_ids)
        return GenerationResult(
            ids=ids,
            prompt_len=len(prompt_ids),
            timings={
                "prefill_s": t_prefill,
                "sample_s": td - td0,
                "decode_s": t_decode,
                "n_new": n_new,
                "ms_per_token": (t_decode / max(steps, 1)) * 1e3,
            },
        )

    # -------------------------------------------------------------- scoring

    def score(self, token_ids, batch: bool = False) -> np.ndarray:
        """Full-sequence logits (B, N, V) — for perplexity and parity tests."""
        ids = np.asarray(token_ids, dtype=np.int32)
        if ids.ndim == 1:
            ids = ids[None, :]
        cache = self.new_cache(batch=ids.shape[0], max_len=ids.shape[1])
        logits, _ = self._step(
            self.params, jnp.asarray(ids), cache, jnp.int32(0), self.config,
            compute_dtype=self.compute_dtype, causal=self.causal, allow_pallas=self.allow_pallas,
            logits_mode="all",
        )
        return np.asarray(logits)
