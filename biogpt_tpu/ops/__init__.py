from .qmatmul import matmul, embedding_lookup, dequantize  # noqa: F401
