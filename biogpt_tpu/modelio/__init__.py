from .ggml_format import (  # noqa: F401
    GGML_MAGIC,
    TensorRecord,
    read_model_file,
    iter_tensor_records,
    write_model_file,
    write_header,
    write_tensor_record,
)
from .checkpoint import load_params, params_from_state_dict  # noqa: F401
