#!/usr/bin/env bash
# Real-weights runbook (tools/fetch_weights.md) as an executable script.
#
# Usage:
#   tools/fetch_weights.sh                  # full run: fetch microsoft/biogpt,
#                                           # convert, quantize all families,
#                                           # Δppl sweep, greedy demo
#   tools/fetch_weights.sh --synthetic      # OFFLINE: substitute a synthetic
#                                           # HF checkpoint dir for step 1 and
#                                           # run steps 2-5 end-to-end (CI
#                                           # keeps the recipe from rotting)
#
# Env:
#   FETCH_OUT=weights            output directory
#   FETCH_FAMILIES="q4_0 ..."    quant families (default: all five)
#   FETCH_PLATFORM=cpu           pin the JAX platform for steps 4-5 (the
#                                axon sitecustomize re-registers the TPU at
#                                interpreter start, so an env var alone does
#                                NOT stick -- the wrapper below pins it
#                                in-process before backend init)
#   FETCH_CORPUS=path.txt        Δppl corpus (one doc per line; synthetic
#                                mode fabricates a small ASCII one)
#   FETCH_NPREDICT=32            demo generation length
#
# The connected-environment artifacts this produces: $FETCH_OUT/ppl-*.json
# (fills BASELINE.json's Δppl-vs-f32 table), the quantized model files, and
# the greedy demo transcripts ($FETCH_OUT/demo-*.txt) to diff against HF
# BioGptForCausalLM.generate (reference README.md:14-47 counterpart).
set -euo pipefail
cd "$(dirname "$0")/.."

OUT="${FETCH_OUT:-weights}"
FAMILIES="${FETCH_FAMILIES:-q4_0 q4_1 q5_0 q5_1 q8_0}"
NPRED="${FETCH_NPREDICT:-32}"
SYNTHETIC=0
for arg in "$@"; do
  case "$arg" in
    --synthetic) SYNTHETIC=1 ;;
    *) echo "unknown arg: $arg" >&2; exit 2 ;;
  esac
done
mkdir -p "$OUT"

# Run a biogpt_tpu module's main(argv) in-process, pinning the platform
# BEFORE any JAX backend init when FETCH_PLATFORM is set (see header).
run_mod() {
  python - "$@" <<'EOF'
import importlib
import os
import sys

plat = os.environ.get("FETCH_PLATFORM")
if plat:
    import jax
    jax.config.update("jax_platforms", plat)
mod = importlib.import_module(sys.argv[1])
rc = mod.main(sys.argv[2:])
sys.exit(rc or 0)
EOF
}

# ---- 1. the checkpoint (the only networked step)
if [ "$SYNTHETIC" = "1" ]; then
  echo "== step 1 (synthetic): fabricating an HF-style checkpoint dir"
  python - "$OUT/hf-biogpt" <<'EOF'
import sys
from biogpt_tpu.modelio.synthetic import write_synthetic_hf_dir
cfg = write_synthetic_hf_dir(sys.argv[1], seed=0)
print(f"  wrote {sys.argv[1]} (tiny {cfg.n_layer}L/{cfg.d_model}d synthetic)")
EOF
else
  echo "== step 1: fetching microsoft/biogpt"
  python - "$OUT/hf-biogpt" <<'EOF'
import sys
from huggingface_hub import snapshot_download
snapshot_download(
    "microsoft/biogpt", local_dir=sys.argv[1],
    allow_patterns=["config.json", "vocab.json", "merges.txt",
                    "pytorch_model.bin", "model.safetensors",
                    "tokenizer_config.json"])
EOF
fi

# ---- 2. convert to the ggml-model.bin contract
echo "== step 2: convert"
run_mod biogpt_tpu.tools.convert_hf \
    --dir-model "$OUT/hf-biogpt" --out-dir "$OUT"

# ---- 3. quantize every family
echo "== step 3: quantize ($FAMILIES)"
for t in $FAMILIES; do
  run_mod biogpt_tpu.tools.quantize_cli \
      "$OUT/ggml-model.bin" "$OUT/ggml-model-$t.bin" --type "$t"
done

# ---- 4. Δppl sweep (fills BASELINE.json's open table)
CORPUS="${FETCH_CORPUS:-}"
if [ -z "$CORPUS" ] && [ "$SYNTHETIC" = "1" ]; then
  CORPUS="$OUT/corpus.txt"
  python - "$CORPUS" <<'EOF'
import sys
lines = ["the gene and the protein interact in the cell line",
         "patients in the trial received the standard of care",
         "expression of the receptor is induced by the pathway"]
with open(sys.argv[1], "w") as f:
    f.write("\n".join(lines * 4) + "\n")
EOF
fi
if [ -n "$CORPUS" ]; then
  echo "== step 4: Δppl sweep over $CORPUS"
  run_mod biogpt_tpu.tools.perplexity -m "$OUT/ggml-model.bin" \
      -f "$CORPUS" --dtype f32 | tee "$OUT/ppl-f32.json"
  for t in $FAMILIES; do
    run_mod biogpt_tpu.tools.perplexity -m "$OUT/ggml-model-$t.bin" \
        -f "$CORPUS" --dtype f32 | tee "$OUT/ppl-$t.json"
  done
else
  echo "== step 4: SKIPPED (set FETCH_CORPUS=path.txt; one document per"
  echo "   line — see tools/fetch_weights.md §4 for the recommended corpus)"
fi

# ---- 5. greedy demo (reference README.md:14-47 parity transcript)
FIRST_FAMILY=$(set -- $FAMILIES; echo "$1")
echo "== step 5: greedy demo (f32 + $FIRST_FAMILY)"
run_mod biogpt_tpu.cli -m "$OUT/ggml-model.bin" \
    -p "COVID-19 is" -n "$NPRED" --temp 0 --dtype f32 \
    | tee "$OUT/demo-f32.txt"
run_mod biogpt_tpu.cli -m "$OUT/ggml-model-$FIRST_FAMILY.bin" \
    -p "COVID-19 is" -n "$NPRED" --temp 0 \
    | tee "$OUT/demo-$FIRST_FAMILY.txt"

if [ "$SYNTHETIC" = "1" ]; then
  echo "== done (synthetic). Real-weights follow-ups once fetched:"
  echo "   - diff demo-f32.txt vs HF generate (fetch_weights.md §5)"
  echo "   - freeze real-weights goldens (make_goldens.py --model)"
  echo "   - on-chip: python bench.py && python -m biogpt_tpu.tools.check_goldens_tpu"
else
  echo "== done. Record ppl-*.json deltas into BASELINE.json's Δppl table,"
  echo "   cross-check demo-f32.txt against HF generate (fetch_weights.md §5),"
  echo "   then: python bench.py && python -m biogpt_tpu.tools.check_goldens_tpu"
fi
