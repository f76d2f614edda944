from . import formats, quant  # noqa: F401
