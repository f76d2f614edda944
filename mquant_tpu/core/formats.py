"""Integer format descriptors for quantization.

TPU-native rebuild of the reference's ``BitType`` registry
(ref: fake_quant/bit_type.py:7-50). A format is a frozen, hashable value object so it
can be used as a static argument to ``jax.jit`` and stored inside layout descriptors.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class IntFormat:
    """An integer quantization format: bit width + signedness.

    Mirrors the capability of the reference ``BitType`` (bits, signed, upper/lower
    bounds) but as an immutable value usable as a jit-static argument.
    """

    bits: int
    signed: bool
    name: str

    @property
    def qmax(self) -> int:
        if self.signed:
            return 2 ** (self.bits - 1) - 1
        return 2**self.bits - 1

    @property
    def qmin(self) -> int:
        if self.signed:
            return -(2 ** (self.bits - 1))
        return 0

    @property
    def range(self) -> int:
        return 2**self.bits

    @property
    def storage_dtype(self):
        """Narrowest jnp dtype that can hold quantized values of this format."""
        if self.bits <= 8:
            return jnp.int8 if self.signed else jnp.uint8
        if self.bits <= 16:
            return jnp.int16 if self.signed else jnp.uint16
        return jnp.int32 if self.signed else jnp.uint32


def _mk(bits: int, signed: bool) -> IntFormat:
    name = f"{'int' if signed else 'uint'}{bits}"
    return IntFormat(bits=bits, signed=signed, name=name)


INT4 = _mk(4, True)
UINT4 = _mk(4, False)
INT8 = _mk(8, True)
UINT8 = _mk(8, False)
INT16 = _mk(16, True)
# Wide accumulation-side formats kept for parity with the reference registry
# (ref: fake_quant/bit_type.py:42-50 registers uint4/int8/uint8/int16/int18/int20).
INT18 = _mk(18, True)
INT20 = _mk(20, True)

FORMATS: Dict[str, IntFormat] = {
    f.name: f for f in (INT4, UINT4, INT8, UINT8, INT16, INT18, INT20)
}


def get_format(name_or_bits, signed: bool | None = None) -> IntFormat:
    """Look up a format by name ("int8") or by (bits, signed)."""
    if isinstance(name_or_bits, IntFormat):
        return name_or_bits
    if isinstance(name_or_bits, str):
        return FORMATS[name_or_bits]
    bits = int(name_or_bits)
    if signed is None:
        signed = True
    key = f"{'int' if signed else 'uint'}{bits}"
    if key in FORMATS:
        return FORMATS[key]
    return _mk(bits, signed)
