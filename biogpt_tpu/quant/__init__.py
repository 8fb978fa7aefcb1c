from .codecs import (  # noqa: F401
    QK,
    BLOCK_SIZES,
    GGML_TYPE_F32,
    GGML_TYPE_F16,
    GGML_TYPE_Q4_0,
    GGML_TYPE_Q4_1,
    GGML_TYPE_Q5_0,
    GGML_TYPE_Q5_1,
    GGML_TYPE_Q8_0,
    GGML_TYPE_NAMES,
    ggml_type_for_ftype,
    quantize_rows,
    dequantize_rows,
    quantize_blocks,
    dequantize_blocks,
)
from .layouts import QuantizedTensor, to_planes, from_planes  # noqa: F401
