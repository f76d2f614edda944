"""mquant_tpu — TPU-native full-static W4A8 PTQ + inference stack for multimodal LLMs.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of StiphyJay/MQuant
(ACM MM 2025, arXiv 2502.00425): modality-specific static quantization (MSQ),
LayerNorm→RMSNorm fusion, QuaRot-style offline rotations + online Hadamard,
Rotation Magnitude Suppression (first-column split), GPTQ weight quantization,
and — beyond the reference's fake-quant — real INT8/INT4 MXU GEMM serving kernels.
"""

__version__ = "0.1.0"

from .core.formats import IntFormat, get_format, INT4, INT8, UINT4, UINT8  # noqa: F401
from .core import quant  # noqa: F401
