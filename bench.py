"""Benchmark: BioGPT-347M on one TPU chip — decode, prefill, serving.

Prints one JSON line per metric; the FIRST line is the headline decode
throughput:
  {"metric": "q4_0_decode_tokens_per_sec", "value": N, "unit": "tokens/s",
   "vs_baseline": N / 125.0, ...}

Baseline anchor: the reference's Q4_0 decode at 8 ms/token on M1 Pro
(BASELINE.md) = 125 tokens/s; the north star is >= 10x that on one chip.

Weights are random in real Q4_0 plane layout (no checkpoint is available in
this offline environment) — throughput is weight-value-independent.
Diagnostics go to stderr.

Timing methodology: this runtime acknowledges block_until_ready before
device work completes, so every measurement ends with a real device->host
fetch, and per-step cost is the MARGINAL time between a long and a short
run (fixed fetch/queue costs cancel). The decode number drives the
production Engine.generate path: megakernel decode steps scanned 64 per
dispatch, EOS on device, one token fetch per generation.

Env:
  BENCH_QTYPE=q4_0..q8_0|f32   quant family (default q4_0)
  BENCH_PACK_Q4=0              disable the packed Pallas path
  BENCH_SERVING=0              skip the serving aggregate metric
  BENCH_SERVING_MIXED=0        skip the production-shaped serving metric
                               (mixed prompt/predict lengths, EOS on,
                               per-request sampling — the honest serving
                               number next to the uniform-greedy one)
  BENCH_PREFILL=0              skip the prefill metric
  BENCH_DECODE=0               skip decode+prefill (targeted serving runs)
  BENCH_STAGED=1               chunk-local KV staging in the serving
                               benches (one slot-agnostic staging write
                               per step + per-chunk commit instead of 2*B
                               per-slot cache writes)
  BENCH_PAGED=1                per-slot ("paged") KV reads in the mixed
                               serving bench — each slot streams only its
                               own live blocks instead of the batch-wide
                               window that long prompts force on everyone
  BENCH_FAMILY=1               single-process quant-family sweep: all five
                               codecs interleaved round-robin in ONE
                               process (valid within-table ranking), then
                               exit
  BENCH_SEQ=N                  serving KV window cap (default 512; use
                               1024 for the long-window int8-KV table —
                               tools/bench/bench_longwindow.py runs the
                               full {bf16,int8}x{uniform,mixed} table in
                               one process)
  BENCH_MIXED_KVQ=0            skip the int8-KV mixed serving metric
                               (emitted by default right after the bf16
                               one: *_kvq_serving_mixed_tokens_per_sec)
  BENCH_CHUNK=N                decode steps per serving launch (default
                               16; 32 measured WORSE — it over-schedules
                               48-token requests, RESULTS.md round 5)
  BENCH_PREFILL_REPEATS=N      prefill sample count (default 3)
  BENCH_MESH=DxM               run the engine over a (data=D, model=M) mesh
                               (shard_map TP path) — for multi-chip rounds;
                               requires D*M <= len(jax.devices())
  BENCH_KV_QUANT=1             int8 KV cache (metric names gain _kvq)
  BENCH_TINY=1                 smoke mode: small model + short workloads so
                               CI can execute the full bench code path
                               (incl. BENCH_MESH) on a virtual CPU mesh —
                               keeps the multi-chip bench warm so the first
                               real multi-chip round measures scaling
                               instead of debugging the bench
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/biogpt_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from biogpt_tpu.config import BioGptConfig, GenerationParams
from biogpt_tpu.modelio.synthetic import make_random_quantized_params, make_state_dict
from biogpt_tpu.modelio.checkpoint import params_from_state_dict
from biogpt_tpu.quant.codecs import GGML_TYPE_BY_NAME
from biogpt_tpu.runtime.engine import Engine

# reference per-token decode latencies on M1 Pro (BASELINE.md)
BASELINES_TOK_S = {"q4_0": 125.0, "q4_1": 1000 / 9, "q5_0": 100.0,
                   "q5_1": 1000 / 11, "q8_0": 100.0, "f32": 50.0}
BASELINE_TOKENS_PER_SEC = 125.0  # Q4_0 anchor: 8 ms/token, reference README.md:56
# the reference has no prefill/serving counterpart numbers; anchor both
# against the same per-token rate (BASELINE.md publishes decode only)
PROMPT = list(range(2, 18))

TINY = os.environ.get("BENCH_TINY", "0") == "1"
# smoke-mode workload sizes (full-model sizes otherwise)
DECODE_SHORT, DECODE_LONG = (8, 24) if TINY else (64, 320)
PREFILL_LEN = 32 if TINY else 512
SERVE_PRED = 8 if TINY else 48
SERVE_SEQ = int(os.environ.get("BENCH_SEQ", "64" if TINY else "512"))
# serving slots: weight bytes amortize across slots in the batched
# megakernel, so aggregate keeps climbing well past 8 (measured round 3:
# ~7.9k tok/s at B=8, ~13k at B=16, ~15k at B=32 for the 48-token
# workload); 32 is the kernel's current cap (BENCH_SLOTS to override)
SERVE_SLOTS = int(os.environ.get("BENCH_SLOTS", "8" if TINY else "32"))
# decode chunk (steps per launch): 16 is the measured default; 32 halves
# launch+drain dispatch density for relay-degraded days at the cost of
# EOS-lag granularity (A/B knob)
SERVE_CHUNK = int(os.environ.get("BENCH_CHUNK", "4" if TINY else "16"))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def emit(metric: str, value: float, unit: str, baseline: float, **extra) -> None:
    print(json.dumps({
        "metric": metric, "value": round(value, 2), "unit": unit,
        "vs_baseline": round(value / baseline, 3),
        "device": str(jax.devices()[0]), **extra,
    }), flush=True)


def bench_decode(eng: Engine, qname: str, repeats: int = 3) -> float:
    """Median-of-N marginal throughput.

    The shared chip's state drifts between runs (repeated identical Q4_0
    benches span 0.25-0.45 ms/token); a single (short, long) pair can also
    land its two runs in different states and corrupt the subtraction.
    Interleaved repeats + median bound both failure modes.
    """
    gen_s = GenerationParams(n_predict=DECODE_SHORT, temp=0.0,
                             stop_at_eos=False)
    gen_l = GenerationParams(n_predict=DECODE_LONG, temp=0.0,
                             stop_at_eos=False)
    eng.generate(PROMPT, gen_s)
    samples = []
    absolutes = []
    for r in range(repeats):
        t1 = time.perf_counter()
        rs = eng.generate(PROMPT, gen_s)
        t_short = time.perf_counter() - t1
        t2 = time.perf_counter()
        rl = eng.generate(PROMPT, gen_l)
        t_long = time.perf_counter() - t2
        n = len(rl.new_ids) - len(rs.new_ids)
        dt = t_long - t_short
        samples.append(dt / n)
        absolutes.append(len(rl.new_ids) / t_long)
        log(f"decode[{r}]: {n/dt:.1f} tok/s marginal ({dt/n*1e3:.3f} ms/token)")
    ms = sorted(samples)[len(samples) // 2]
    tok_s = 1.0 / ms
    log(f"decode: median {tok_s:.1f} tok/s ({ms*1e3:.3f} ms/token) over "
        f"{repeats} runs; absolute(long) best {max(absolutes):.1f} tok/s")
    emit(f"{qname}_decode_tokens_per_sec", tok_s, "tokens/s",
         BASELINES_TOK_S.get(qname, BASELINE_TOKENS_PER_SEC),
         ms_per_token=round(ms * 1e3, 4), n_runs=repeats,
         spread_ms=[round(s * 1e3, 4) for s in sorted(samples)],
         absolute_tokens_per_sec=round(max(absolutes), 2))
    return tok_s


def bench_prefill(eng: Engine, qname: str) -> None:
    """PIPELINED prefill throughput: k prefills enqueue back-to-back and ONE
    fetch of the last program's logits ends the chain (the device executes
    programs in submission order, so that fetch proves all k ran). A
    sync-per-prefill formulation measured ~12k tok/s — but ~30 ms of every
    iteration was the device->host sync RPC, a cost no pipelined consumer
    (serving refill, batch scoring) ever pays; the device program itself
    runs in ~4.5 ms (profiled). Marginal long-minus-short cancels the fixed
    dispatch/fetch tail."""
    n_prompt = PREFILL_LEN
    ids = np.arange(2, 2 + n_prompt) % 40000
    for _ in range(3):   # compile + warm the 512 bucket
        logits, cache, _ = eng.prefill(eng.new_cache(), ids)
        np.asarray(logits)
        del cache

    def run(k):
        # allocate the k donated caches OUTSIDE the timed region: the
        # zero-fill is its own device program, and on relay-degraded days
        # (round 5: per-dispatch latency grew ~4x across rounds while the
        # profiled device program held at ~4.5 ms/prefill — RESULTS.md)
        # every extra dispatch in the chain reads as prefill time
        caches = [eng.new_cache() for _ in range(k)]
        jax.block_until_ready(caches[-1].k)
        t0 = time.perf_counter()
        last = None
        for c in caches:
            logits, cache, _ = eng.prefill(c, ids)
            last = logits
            del cache
        np.asarray(last)
        return time.perf_counter() - t0

    samples = []
    for r in range(int(os.environ.get("BENCH_PREFILL_REPEATS", "3"))):
        t_short, t_long = run(2), run(10)
        per = (t_long - t_short) / 8
        samples.append(n_prompt / per)
        log(f"prefill[{r}]({n_prompt}): {samples[-1]:.0f} tok/s pipelined "
            f"({per * 1e3:.2f} ms/prefill)")
    tok_s = sorted(samples)[len(samples) // 2]
    log(f"prefill: median {tok_s:.0f} tok/s")
    emit(f"{qname}_prefill_tokens_per_sec", tok_s, "tokens/s",
         BASELINES_TOK_S.get(qname, BASELINE_TOKENS_PER_SEC),
         prompt_len=n_prompt, pipelined=True,
         spread=[round(s) for s in sorted(samples)])


def bench_serving(params, config, qname: str, single_stream_tok_s: float,
                  mesh=None, kv_quant: bool = False) -> None:
    from biogpt_tpu.runtime.serving import BatchedEngine, Request

    B, n_pred = SERVE_SLOTS, SERVE_PRED
    be = BatchedEngine(config, params, max_batch=B,
                       compute_dtype=jnp.bfloat16, max_seq=SERVE_SEQ,
                       chunk=SERVE_CHUNK, mesh=mesh, kv_quant=kv_quant,
                       staged_kv=os.environ.get("BENCH_STAGED", "0") == "1")
    rng = np.random.default_rng(0)
    vmax = config.n_vocab - 2

    def make_reqs(n):
        return [Request(prompt_ids=[2] + rng.integers(4, min(40000, vmax),
            size=int(rng.integers(4, 24))).tolist(), n_predict=n_pred,
            request_id=i) for i in range(n)]

    gen = GenerationParams(temp=0.0, stop_at_eos=False)
    # Warm with REFILL-shaped traffic (3B requests exercises the refill
    # prefill/insert/scatter programs), twice: the first run compiles, the
    # second absorbs the one-time deep-queue warmup of the new executables
    # (profiled at ~120 s first run vs ~2.6 s steady state).
    for _ in range(2):
        be.serve(make_reqs(3 * B), gen)

    def run(n_reqs):
        reqs = make_reqs(n_reqs)
        t0 = time.perf_counter()
        results = be.serve(reqs, gen)
        dt = time.perf_counter() - t0
        return sum(len(r.new_ids) for r in results.values()), dt

    def median(xs):
        return sorted(xs)[len(xs) // 2]

    # ABSOLUTE aggregate (all generated tokens / total wall for a 48-request
    # batch, prefills and drains included), median of 5 runs (3 left a
    # ~1,500 tok/s spread on this shared chip — too loose to detect a 15%
    # regression; VERDICT r2 #7). A marginal (long-minus-short) formulation
    # was tried and abandoned: chip-state drift between serve() calls
    # exceeds the subtraction's signal (one recorded sample was negative).
    # Absolute is also the honest number a serving operator cares about.
    absolutes, dts6 = [], []
    toks6 = 0
    for r in range(5):
        toks6, dt = run(6 * B)
        absolutes.append(toks6 / dt)
        dts6.append(dt)
        log(f"serving[{r}]: {absolutes[-1]:.1f} absolute aggregate tok/s")
    agg = median(absolutes)
    # secondary metric: steady-state marginal rate (double-workload minus
    # single-workload medians — the fixed ramp + final-drain tail cancels).
    # This is the device-bound number the refill/step optimizations move;
    # the absolute aggregate above also carries the per-serve fixed cost.
    dts12 = []
    toks12 = 0
    for r in range(3):
        toks12, dt = run(12 * B)
        dts12.append(dt)
    marginal = (toks12 - toks6) / max(median(dts12) - median(dts6), 1e-9)
    log(f"serving marginal (12B-6B medians): {marginal:.1f} tok/s")
    # smoke mode's marginal single-stream rate is degenerate (near-zero
    # subtraction on CPU) — don't report a nonsense ratio there
    x_single = (round(agg / single_stream_tok_s, 2)
                if not TINY and single_stream_tok_s > 1 else None)
    log(f"serving: median {agg:.1f} tok/s absolute aggregate at B={B} "
        f"over {6 * B} reqs ({x_single}x the single-stream marginal rate)")
    emit(f"{qname}_serving_agg_tokens_per_sec", agg, "tokens/s",
         BASELINES_TOK_S.get(qname, BASELINE_TOKENS_PER_SEC),
         batch_slots=B, n_requests=6 * B,
         spread=[round(s, 1) for s in sorted(absolutes)],
         x_single_stream=x_single,
         marginal_tokens_per_sec=round(marginal, 1))


def bench_serving_mixed(params, config, qname: str, mesh=None,
                        kv_quant: bool = False,
                        paged_kv: bool = False) -> None:
    """Production-shaped serving: mixed prompt lengths (incl. 256-384-token
    prompts), mixed n_predict (16-96, so completions stagger and PARTIAL
    refills run under measurement), stop_at_eos=True, and per-request
    sampling on (~25% greedy rows, the rest temp 0.7-1.0 / top-k 40 /
    top-p 0.9). The uniform-greedy metric above is the engine's best case
    (synchronized full-wave refills, no EOS checks, trivial prefills);
    this one is what a serving operator actually runs (VERDICT r3 #1)."""
    from biogpt_tpu.runtime.serving import BatchedEngine, Request

    B = SERVE_SLOTS
    be = BatchedEngine(config, params, max_batch=B,
                       compute_dtype=jnp.bfloat16, max_seq=SERVE_SEQ,
                       chunk=SERVE_CHUNK, mesh=mesh, kv_quant=kv_quant,
                       paged_kv=paged_kv,
                       staged_kv=os.environ.get("BENCH_STAGED", "0") == "1")
    vmax = min(40000, config.n_vocab - 2)
    # prompt classes (full-size): short chat-like, medium, long-document —
    # three bucket families so the refill-program set stays bounded while
    # the 512 bucket (long prompts) is genuinely exercised
    classes = ([(0.6, 5, 25), (0.25, 100, 124), (0.15, 300, 380)]
               if not TINY else [(0.7, 4, 12), (0.3, 16, 30)])
    preds = [16, 32, 48, 64, 96] if not TINY else [4, 8]

    def make_reqs(n, seed):
        rng = np.random.default_rng(seed)
        reqs = []
        for i in range(n):
            u = rng.random()
            acc = 0.0
            for frac, lo, hi in classes:
                acc += frac
                if u < acc or (frac, lo, hi) == classes[-1]:
                    plen = int(rng.integers(lo, hi + 1))
                    break
            greedy_row = rng.random() < 0.25
            reqs.append(Request(
                prompt_ids=[2] + rng.integers(4, vmax,
                                              size=plen - 1).tolist(),
                n_predict=int(rng.choice(preds)), request_id=i,
                temp=0.0 if greedy_row else float(
                    rng.choice([0.7, 0.9, 1.0])),
                top_k=40, top_p=0.9))
        return reqs

    gen = GenerationParams(temp=0.7, top_k=40, top_p=0.9,
                           stop_at_eos=True, seed=11)
    # Warm EVERY measured workload once: which refill (rows, bucket)
    # programs a run needs depends on its random completion staggering, so
    # warming a couple of generic workloads left later seeds hitting fresh
    # shapes mid-measurement — one 20-40 s remote compile poisons that
    # run's number. The first warm pass also absorbs the one-time
    # deep-queue cost; repeat processes hit the persistent compile cache.
    absolutes = []
    n_reqs = 4 * B
    seeds = [100 + r for r in range(5)]
    for s in seeds:
        be.serve(make_reqs(n_reqs, seed=s), gen)
    # latency taps must cover the MEASURED serves only — the warmup
    # serves above pay 20-40 s compiles that would dominate ttft/e2e max
    from biogpt_tpu.runtime.metrics import ServingMetrics
    be.metrics = ServingMetrics()
    for r, s in enumerate(seeds):
        reqs = make_reqs(n_reqs, seed=s)
        t0 = time.perf_counter()
        results = be.serve(reqs, gen)
        dt = time.perf_counter() - t0
        toks = sum(len(res.new_ids) for res in results.values())
        absolutes.append(toks / dt)
        log(f"serving_mixed[{r}]: {absolutes[-1]:.1f} tok/s absolute "
            f"({toks} tokens in {dt:.2f}s)")
    agg = sorted(absolutes)[len(absolutes) // 2]
    log(f"serving_mixed: median {agg:.1f} tok/s absolute at B={B} "
        f"over {n_reqs} mixed requests")
    suffix = "_paged" if paged_kv else ""
    # per-request latency taps (runtime/metrics.py): accept->first-token
    # and accept->final-token, measured at DRAIN time over every measured
    # (and warmup) request — the production-shaped latency companion to
    # the throughput number
    snap = be.metrics.snapshot()
    emit(f"{qname}_serving_mixed{suffix}_tokens_per_sec", agg, "tokens/s",
         BASELINES_TOK_S.get(qname, BASELINE_TOKENS_PER_SEC),
         batch_slots=B, n_requests=n_reqs,
         spread=[round(s, 1) for s in sorted(absolutes)],
         ttft_mean_s=snap.get("ttft_mean_s"),
         ttft_max_s=snap.get("ttft_max_s"),
         e2e_mean_s=snap.get("e2e_mean_s"),
         e2e_max_s=snap.get("e2e_max_s"),
         workload={"prompt_classes": [list(c) for c in classes],
                   "n_predict_choices": preds, "stop_at_eos": True,
                   "sampling": "per-request (25% greedy)"})


def bench_family(config, use_pallas: bool) -> None:
    """Single-process quant-family sweep (VERDICT r3 #4): all five codecs'
    engines live in ONE process and their decode runs interleave round-
    robin, so within-table ranking reflects the codecs, not cross-process
    chip-state drift (the per-process BENCH_QTYPE table measured Q5_1
    'faster' than Q4_0 purely from that drift — RESULTS.md round 3)."""
    families = ["q4_0", "q4_1", "q5_0", "q5_1", "q8_0"]
    gen_s = GenerationParams(n_predict=DECODE_SHORT, temp=0.0,
                             stop_at_eos=False)
    gen_l = GenerationParams(n_predict=DECODE_LONG, temp=0.0,
                             stop_at_eos=False)
    engines = {}
    for q in families:
        log(f"family: building + warming {q}...")
        params = make_random_quantized_params(
            config, GGML_TYPE_BY_NAME[q], seed=0)
        engines[q] = Engine(config, params, compute_dtype=jnp.bfloat16,
                            pack_q4=use_pallas)
        engines[q].warmup(prompt_len=len(PROMPT), n_tokens=DECODE_LONG,
                          sampled=False)
    samples = {q: [] for q in families}
    repeats = int(os.environ.get("BENCH_FAMILY_REPEATS", "3"))
    # round -1 is a throwaway: the first interleaved pass still absorbs
    # per-executable deep-queue warmup, which poisoned round-0 marginals
    # (negative samples) in the first sweep
    for r in range(-1, repeats):
        for q in families:   # interleaved: each round sees the same chip
            eng = engines[q]
            t1 = time.perf_counter()
            rs = eng.generate(PROMPT, gen_s)
            t_short = time.perf_counter() - t1
            t2 = time.perf_counter()
            rl = eng.generate(PROMPT, gen_l)
            t_long = time.perf_counter() - t2
            if r < 0:
                continue
            n = len(rl.new_ids) - len(rs.new_ids)
            samples[q].append((t_long - t_short) / n)
            log(f"family[{r}] {q}: {samples[q][-1]*1e3:.3f} ms/token")
    for q in families:
        ss = sorted(samples[q])
        ms = ss[len(ss) // 2]
        emit(f"{q}_decode_tokens_per_sec_family", 1.0 / ms, "tokens/s",
             BASELINES_TOK_S[q], ms_per_token=round(ms * 1e3, 4),
             interleaved=True, n_runs=repeats,
             spread_ms=[round(s * 1e3, 4) for s in ss])


def main() -> int:
    config = (BioGptConfig.tiny(d_model=512, d_ff=512, n_head=4, n_layer=2,
                                n_vocab=300, n_positions=64)
              if TINY else BioGptConfig())
    qname = os.environ.get("BENCH_QTYPE", "q4_0")
    use_pallas = os.environ.get("BENCH_PACK_Q4", "1") == "1"
    log(f"devices: {jax.devices()}")
    if os.environ.get("BENCH_FAMILY", "0") == "1":
        bench_family(config, use_pallas)
        return 0
    log(f"building {qname} params (random, real layout)...")
    if qname == "f32":
        params = params_from_state_dict(make_state_dict(config, seed=0), config)
    else:
        params = make_random_quantized_params(
            config, GGML_TYPE_BY_NAME[qname], seed=0)

    mesh = None
    mesh_spec = os.environ.get("BENCH_MESH", "")
    if mesh_spec:
        from biogpt_tpu.parallel import make_mesh
        d, m = (int(v) for v in mesh_spec.split("x"))
        mesh = make_mesh(data=d, model=m)
        log(f"mesh: {mesh_spec} (shard_map TP decode; megakernel off)")
    kv_quant = os.environ.get("BENCH_KV_QUANT", "0") == "1"
    if kv_quant:
        qname += "_kvq"

    single_marginal = 0.0
    if os.environ.get("BENCH_DECODE", "1") == "1":
        eng = Engine(config, params, compute_dtype=jnp.bfloat16,
                     pack_q4=use_pallas, mesh=mesh, kv_quant=kv_quant)
        log(f"megakernel={eng._fused_decode}; warming up (compile "
            f"~20-40s/program + one-time deep-queue warmup, can take "
            f"minutes)...")
        t0 = time.perf_counter()
        eng.warmup(prompt_len=len(PROMPT), n_tokens=DECODE_LONG,
                   sampled=False)
        log(f"warmup: {time.perf_counter() - t0:.1f}s")
        single_marginal = bench_decode(eng, qname)
        if os.environ.get("BENCH_PREFILL", "1") == "1":
            bench_prefill(eng, qname)
        del eng
    if os.environ.get("BENCH_SERVING", "1") == "1":
        bench_serving(params, config, qname, single_marginal, mesh=mesh,
                      kv_quant=kv_quant)
    if os.environ.get("BENCH_SERVING_MIXED", "1") == "1":
        bench_serving_mixed(params, config, qname, mesh=mesh,
                            kv_quant=kv_quant,
                            paged_kv=os.environ.get("BENCH_PAGED",
                                                    "0") == "1")
        if not kv_quant and os.environ.get("BENCH_MIXED_KVQ", "1") == "1":
            # int8-KV mixed in the SAME driver run (VERDICT r4 weak #6):
            # int8's pitch workload is exactly this bench's long-prompt
            # windows, so the driver artifact must carry a valid
            # same-round int8-vs-bf16 comparison, not mid-round manual
            # runs. Emits <qname>_kvq_serving_mixed_tokens_per_sec.
            bench_serving_mixed(params, config, qname + "_kvq", mesh=mesh,
                                kv_quant=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
