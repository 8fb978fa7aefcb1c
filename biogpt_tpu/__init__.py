"""biogpt_tpu — a TPU-native quantized-inference engine for BioGPT.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
ggml-based CPU engine ``PABannier/biogpt.cpp``: the full ggml block-quant
family (Q4_0/Q4_1/Q5_0/Q5_1/Q8_0 weight-only quantization, bit-exact
codecs), an FP16 KV cache, the Moses+BPE tokenizer/detokenizer, the
HF-checkpoint converter and quantizer, top-k/top-p/greedy generation —
plus what the reference does not have: tensor-sharded multi-chip execution
over a ``jax.sharding.Mesh`` and Pallas fused dequant+matmul / decode
attention kernels.

Package layout:
  config     — model hyperparameters and generation parameters
  quant      — ggml-compatible block quantization codecs + TPU plane layouts
  modelio    — ggml-model.bin reader/writer, checkpoint <-> params pytrees
  tokenizer  — Moses tokenizer/detokenizer + BPE (pure Python, Unicode-aware)
  models     — the BioGPT transformer as pure functions over a params pytree
  ops        — quantized matmul + attention: XLA reference paths and Pallas kernels
  runtime    — KV cache, sampling, the generation engine
  parallel   — device mesh + named shardings (tensor/data parallel)
  tools      — convert-from-HF and quantize CLIs
"""

__version__ = "0.1.0"

from .config import BioGptConfig, GenerationParams  # noqa: F401
