from . import conv, functional, gemm_int8, quant  # noqa: F401
