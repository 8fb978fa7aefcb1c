"""S=1024 long-window serving table: {bf16, int8 KV} x {uniform, mixed}
in ONE process (VERDICT r3 #8 / r4 missing #4).

Answers "which KV format should a long-context operator run at which
workload" with a single same-process table — the int8-KV +17-20% was
previously measured only on uniform traffic, and the mixed evidence only
at S=512. Reuses bench.py's own serving benches (so the workload shapes
are exactly the driver metrics') with BENCH_SEQ pinned to 1024 before
import.

Env: LW_SEQ (default 1024), LW_COMBOS (csv of u_bf16,u_kvq,m_bf16,m_kvq).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
_os.environ.setdefault("BENCH_SEQ", _os.environ.get("LW_SEQ", "1024"))

import bench  # noqa: E402  (bench.py reads BENCH_SEQ at import)
from biogpt_tpu.modelio.synthetic import make_random_quantized_params
from biogpt_tpu.quant.codecs import GGML_TYPE_BY_NAME

combos = _os.environ.get("LW_COMBOS", "u_bf16,u_kvq,m_bf16,m_kvq").split(",")
print(f"long-window table at S={bench.SERVE_SEQ}, B={bench.SERVE_SLOTS}",
      flush=True)
params = bench.make_random_quantized_params(
    bench.BioGptConfig(), GGML_TYPE_BY_NAME["q4_0"], seed=0)
config = bench.BioGptConfig()

if "u_bf16" in combos:
    bench.bench_serving(params, config, "q4_0_s1024", 0.0)
if "u_kvq" in combos:
    bench.bench_serving(params, config, "q4_0_kvq_s1024", 0.0,
                        kv_quant=True)
if "m_bf16" in combos:
    bench.bench_serving_mixed(params, config, "q4_0_s1024")
if "m_kvq" in combos:
    bench.bench_serving_mixed(params, config, "q4_0_kvq_s1024",
                              kv_quant=True)
