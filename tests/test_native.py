"""Native C++ codecs vs numpy codecs: bit-exact cross-validation.

Two fully independent implementations of the same block formats — byte-level
equality here is strong evidence both derived the ggml semantics correctly.
"""

import numpy as np
import pytest

from biogpt_tpu.quant import codecs, native

ALL_QTYPES = [codecs.GGML_TYPE_Q4_0, codecs.GGML_TYPE_Q4_1,
              codecs.GGML_TYPE_Q5_0, codecs.GGML_TYPE_Q5_1,
              codecs.GGML_TYPE_Q8_0]

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native codec library unavailable (no toolchain)")


@pytest.mark.parametrize("qtype", ALL_QTYPES)
def test_native_quantize_bit_exact(qtype):
    rng = np.random.RandomState(0)
    for scale in (1.0, 1e-3, 50.0):
        x = (rng.randn(64 * 32) * scale).astype(np.float32)
        a = codecs.quantize_blocks(x, qtype)
        b = native.quantize_blocks(x, qtype)
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("qtype", ALL_QTYPES)
def test_native_dequantize_bit_exact(qtype):
    rng = np.random.RandomState(1)
    x = rng.randn(32 * 32).astype(np.float32)
    raw = codecs.quantize_blocks(x, qtype)
    a = codecs.dequantize_blocks(raw, qtype)
    b = native.dequantize_blocks(raw, qtype)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("qtype", ALL_QTYPES)
def test_native_edge_cases(qtype):
    cases = [
        np.zeros(32, np.float32),
        np.full(32, 7.25, np.float32),
        np.array([np.float32(65504)] + [0.0] * 31, np.float32),  # f16 max
        np.array([-1e-8] * 16 + [1e-8] * 16, np.float32),
        np.linspace(-3, 3, 32).astype(np.float32),
    ]
    for x in cases:
        a = codecs.quantize_blocks(x, qtype)
        b = native.quantize_blocks(x, qtype)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(
            codecs.dequantize_blocks(a, qtype),
            native.dequantize_blocks(a, qtype))


def test_fp16_conversion_corners():
    """The hand-rolled f32<->f16 in C++ must match numpy's over tricky
    values (subnormals, rounding ties, overflow)."""
    vals = np.array([
        0.0, -0.0, 1.0, -1.0, 65504.0, 65520.0, 1e-8, 6e-8, 5.96e-8,
        2.9802322e-08, 6.1035156e-05, 6.0975552e-05, 0.333251953125,
        1e9, -1e9, 3.0517578e-05,
    ], dtype=np.float32)
    # route through Q8_0 scale: d = amax/127 exercises conversion of many values
    for v in vals:
        x = np.full(32, abs(v) if v != 0 else 0.0, np.float32)
        x[0] = abs(v) * 127 if v != 0 else 0.0
        a = codecs.quantize_blocks(x, codecs.GGML_TYPE_Q8_0)
        b = native.quantize_blocks(x, codecs.GGML_TYPE_Q8_0)
        np.testing.assert_array_equal(a[:, :2], b[:, :2], err_msg=f"v={v}")


# ------------------------------------------------- file-format interop proof

def _fnv1a(data: bytes, h: int = 1469598103934665603) -> int:
    for byte in data:
        h ^= byte
        h = (h * 1099511628211) % (1 << 64)
    return h


def _py_dump(path) -> str:
    """Canonical dump of a model file via the PYTHON reader — line format
    must match csrc/bgpt_reader.cpp exactly (the interop contract)."""
    from biogpt_tpu.modelio.ggml_format import read_model_file
    from biogpt_tpu.quant.codecs import GGML_TYPE_BY_NAME

    names = {v: k for k, v in GGML_TYPE_BY_NAME.items()}
    cfg, token_to_id, merges, tensors = read_model_file(path)
    lines = [
        f"hparams n_vocab={cfg.n_vocab} n_layer={cfg.n_layer} "
        f"n_head={cfg.n_head} n_positions={cfg.n_positions} "
        f"d_ff={cfg.d_ff} d_model={cfg.d_model} ftype={cfg.ftype}"
    ]
    words = [w for w, _ in sorted(token_to_id.items(), key=lambda kv: kv[1])
             if not w.startswith("[_extra_token_")]
    vh = 1469598103934665603
    for w in words:
        vh = _fnv1a(w.encode("utf-8") + b"\x1f", vh)
    lines.append(f"vocab n={len(words)} extra={cfg.n_vocab - len(words)} "
                 f"hash={vh:016x}")
    mh = 1469598103934665603
    for a, b in merges:
        mh = _fnv1a(f"{a} {b}".encode("utf-8") + b"\x1f", mh)
    lines.append(f"merges n={len(merges)} hash={mh:016x}")
    for name, rec in tensors.items():
        d0 = rec.shape[-1]
        d1 = rec.shape[0] if len(rec.shape) == 2 else 1
        lines.append(
            f"tensor {name} dims={d0}x{d1} type={names[rec.ttype]} "
            f"bytes={len(rec.data)} hash={_fnv1a(rec.data):016x}")
    lines.append(f"tensors n={len(tensors)}")
    return "\n".join(lines) + "\n"


def _reader_binary():
    import pathlib
    import subprocess

    path = pathlib.Path(__file__).parent.parent / "csrc" / "bgpt_reader"
    if not path.exists():
        subprocess.run(["make", "-C", str(path.parent), "bgpt_reader"],
                       check=True, capture_output=True)
    return str(path)


@pytest.mark.parametrize("qtype_name", [None, "q4_0", "q5_1", "q8_0"])
def test_model_file_parses_in_independent_cpp_reader(tmp_path, qtype_name):
    """Files written by the Python layer parse in the C++ reader harness
    (an independent re-implementation of the REFERENCE loader contract,
    /root/reference/biogpt.cpp:27-453 — the reference binary itself cannot
    be built here) and every field/tensor hashes identically."""
    import subprocess

    from biogpt_tpu.modelio.synthetic import write_synthetic_model
    from biogpt_tpu.quant.codecs import GGML_TYPE_BY_NAME
    from biogpt_tpu.tools.quantize_cli import main as quantize_main

    path = str(tmp_path / "model.bin")
    write_synthetic_model(path, seed=3)
    if qtype_name is not None:
        qpath = str(tmp_path / f"model-{qtype_name}.bin")
        assert quantize_main([path, qpath, "--type", qtype_name]) == 0
        path = qpath
        _ = GGML_TYPE_BY_NAME[qtype_name]

    cpp = subprocess.run([_reader_binary(), path], capture_output=True,
                         text=True)
    assert cpp.returncode == 0, cpp.stderr
    assert cpp.stdout == _py_dump(path)
