"""Online fast Walsh–Hadamard transform — the hot rotation on the serving path.

TPU-native replacement for the reference's external CUDA kernel
(``fast_hadamard_transform``, ref: docs/install.md:10-16; call sites
fake_quant/quant_utils.py:334-365 and hadamard_utils.py:115-128). Runs before
every MLP down-projection at inference time, so it must be bandwidth-optimal.

Two paths:
  * :func:`online_hadamard` — pure-JAX butterfly + K-block einsum. XLA already
    fuses the log2(m) add/sub passes into a handful of VPU loops; this is the
    default and the CPU/interpret fallback.
  * :func:`fwht_pallas` — explicit Pallas kernel holding a token-tile resident in
    VMEM across all log2(m) passes + the K×K MXU matmul, avoiding HBM round
    trips between passes. Used on TPU for large token counts.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..transform import hadamard as H


@functools.lru_cache(maxsize=None)
def _hadK_cached(n: int):
    # cache NUMPY only — caching a jnp array created inside a trace would leak
    # tracers (constants are lifted into the enclosing trace in jax>=0.9)
    hadK, K = H.get_hadK(n)
    return np.asarray(hadK, np.float32), K


def online_hadamard(x: jax.Array) -> jax.Array:
    """Orthonormal Hadamard transform along the last axis (n = K·2^p).

    Matches the offline fold matrix :func:`mquant_tpu.transform.hadamard.
    transform_matrix` exactly (tested), so folded weights + this online op are
    function-preserving.
    """
    n = x.shape[-1]
    hadK, K = _hadK_cached(n)
    if _use_pallas(x):
        return fwht_pallas(x, hadK, K)
    return H.hadamard_transform(x, jnp.asarray(hadK, x.dtype), K)


def _use_pallas(x: jax.Array) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    # token count large enough to tile; feature dim aligned
    tokens = 1
    for d in x.shape[:-1]:
        tokens *= d
    return tokens >= 8 and x.shape[-1] % 128 == 0


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _fwht_kernel(x_ref, hadk_ref, o_ref, *, K: int, m: int, scale: float):
    """One token-tile: (T, n) resident in VMEM.

    Butterfly over the pow2 factor m via statically unrolled stride-doubling
    passes (reshape + concat on VPU), then the K×K block on the MXU.
    """
    t = x_ref.shape[0]
    xv = x_ref[:].astype(jnp.float32)  # (T, n)
    xv = xv.reshape(t * K, m)
    h = 1
    while h < m:
        xv = xv.reshape(t * K, m // (2 * h), 2, h)
        a = xv[:, :, 0, :]
        b = xv[:, :, 1, :]
        xv = jnp.stack([a + b, a - b], axis=2)
        h *= 2
    xv = xv.reshape(t, K, m) * scale
    if K > 1:
        hk = hadk_ref[:].astype(jnp.float32)  # (K, K)
        xv = jax.lax.dot_general(
            hk, xv,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (K, T, m)
        xv = jnp.swapaxes(xv, 0, 1)
    o_ref[:] = xv.reshape(t, K * m).astype(o_ref.dtype)


def fwht_pallas(x: jax.Array, hadK: jax.Array, K: int, tile_t: int = 256,
                interpret: bool = False) -> jax.Array:
    """Pallas FWHT over the last axis; x: (..., n) flattened to (tokens, n)."""
    n = x.shape[-1]
    m = n // K
    assert H.is_pow2(m)
    lead = x.shape[:-1]
    tokens = int(math.prod(lead)) if lead else 1
    x2 = x.reshape(tokens, n)
    # pad token dim to a tile multiple
    T = tile_t if tokens > tile_t else max(8, 1 << max(0, (tokens - 1).bit_length()))
    pad = (-tokens) % T
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    grid = (x2.shape[0] // T,)
    scale = 1.0 / math.sqrt(m)

    out = pl.pallas_call(
        functools.partial(_fwht_kernel, K=K, m=m, scale=scale),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, jnp.asarray(hadK))
    if pad:
        out = out[:tokens]
    return out.reshape(*lead, n)
