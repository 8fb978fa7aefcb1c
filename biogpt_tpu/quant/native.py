"""ctypes bindings to the native codec library (csrc/biogpt_io.cpp).

The C++ codecs are bit-exact peers of the numpy implementations in
``codecs.py`` (cross-checked in tests/test_native.py) and much faster for
multi-GB checkpoint streaming. The library auto-builds on first use via the
csrc Makefile; everything degrades gracefully to the numpy codecs when no
toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

from . import codecs
from .codecs import BLOCK_SIZES, QK

_CSRC_DIR = Path(__file__).resolve().parent.parent.parent / "csrc"
# Search order: the wheel-packaged copy (built by setup.py's build_py hook
# into biogpt_tpu/_lib/), then the source-tree csrc/ (auto-built via make).
_PKG_LIB = Path(__file__).resolve().parent.parent / "_lib" / "libbiogpt_io.so"
_LIB_PATH = _CSRC_DIR / "libbiogpt_io.so"

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False

_FN_NAMES = {
    codecs.GGML_TYPE_Q4_0: "q4_0",
    codecs.GGML_TYPE_Q4_1: "q4_1",
    codecs.GGML_TYPE_Q5_0: "q5_0",
    codecs.GGML_TYPE_Q5_1: "q5_1",
    codecs.GGML_TYPE_Q8_0: "q8_0",
}


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    path = _PKG_LIB if _PKG_LIB.exists() else _LIB_PATH
    if not path.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_CSRC_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None
    if lib.bgpt_abi_version() != 1:
        return None
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    for name in _FN_NAMES.values():
        q = getattr(lib, f"bgpt_quantize_{name}")
        q.argtypes = [f32p, u8p, ctypes.c_int64]
        q.restype = None
        d = getattr(lib, f"bgpt_dequantize_{name}")
        d.argtypes = [u8p, f32p, ctypes.c_int64]
        d.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def quantize_blocks(x: np.ndarray, qtype: int) -> np.ndarray:
    """Native equivalent of codecs.quantize_blocks; falls back to numpy."""
    lib = _load()
    if lib is None:
        return codecs.quantize_blocks(x, qtype)
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1)
    if x.size % QK != 0:
        raise ValueError(f"element count {x.size} not a multiple of {QK}")
    n_blocks = x.size // QK
    out = np.empty((n_blocks, BLOCK_SIZES[qtype]), dtype=np.uint8)
    getattr(lib, f"bgpt_quantize_{_FN_NAMES[qtype]}")(x, out, n_blocks)
    return out


def dequantize_blocks(raw, qtype: int) -> np.ndarray:
    """Native equivalent of codecs.dequantize_blocks; falls back to numpy."""
    lib = _load()
    if lib is None:
        return codecs.dequantize_blocks(raw, qtype)
    buf = (np.frombuffer(raw, dtype=np.uint8)
           if isinstance(raw, (bytes, bytearray))
           else np.ascontiguousarray(raw, dtype=np.uint8))
    bs = BLOCK_SIZES[qtype]
    if buf.size % bs != 0:
        raise ValueError(f"byte count {buf.size} not a multiple of {bs}")
    n_blocks = buf.size // bs
    out = np.empty((n_blocks, QK), dtype=np.float32)
    getattr(lib, f"bgpt_dequantize_{_FN_NAMES[qtype]}")(buf.reshape(-1), out, n_blocks)
    return out
