"""Multi-chip offline GPTQ: dp-sharded Hessian accumulation and a
column-sharded quantization walk + realize under one ``jax.sharding.Mesh``.

The reference's only multi-device offline gesture is accelerate layer-
sharding for the 72B case (ref: exam/quant_qwen2vl.py:23-27, SURVEY §2.7).
The TPU-native design instead keeps the mesh busy with the two structurally
parallel axes of GPTQ itself:

* **Hessian accumulation is a batch reduction** — ``H = 2 XᵀX`` over
  calibration activations. The activations shard on ``dp`` (each chip sees
  only its calibration rows) and the output is annotated replicated; XLA
  inserts the cross-chip ``psum`` over ICI (the scaling-book recipe:
  annotate shardings, let the compiler place collectives).

* **The row walk is sequential over INPUT rows, but every OUTPUT column is
  independent given H** — so ``W (in, out)`` shards its out axis across the
  WHOLE mesh (dp and tp gang into one logical column shard; the offline
  stage has no data axis to keep) while ``U``/``diag`` replicate. Per-column
  arithmetic is unchanged, so the sharded walk's integer codes are
  bit-identical to the single-device walk (asserted in
  ``tests/test_sharding.py``).

* **realize** consumes the walk's output under the same mesh: packed-int4
  rows shard exactly like the int8 rows they replace (round-4 TP-aware
  packing), so the quantize→realize→serve chain never leaves the mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from . import core as C

__all__ = ["hessian_dp", "gptq_matrix_sharded"]


def _all_axes(mesh) -> tuple:
    return tuple(mesh.axis_names)


def hessian_dp(x: jax.Array, mesh, axis: str = "dp") -> jax.Array:
    """``2 XᵀX`` with the sample axis of ``x (..., in)`` sharded over
    ``axis``; returns the REPLICATED Hessian (XLA inserts the psum).

    Chunked host-streamed accumulation composes: call per chunk and add —
    each partial H comes back replicated."""
    xs = jax.device_put(
        x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))
    f = jax.jit(lambda v: C.accumulate_hessian(None, v),
                out_shardings=NamedSharding(mesh, P(None, None)))
    with jax.set_mesh(mesh):
        return f(xs)


def gptq_matrix_sharded(
    W: jax.Array,  # (in, out)
    H: jax.Array,  # (in, in)
    mesh,
    bits: int,
    percdamp: float = 0.01,
    act_order: bool = False,
    group_size: Optional[int] = None,
    mse_clip: bool = False,
    sym: bool = True,
) -> C.GPTQResult:
    """``gptq_quantize_matrix`` with the weight's out axis sharded over every
    mesh axis and H replicated. The factorization (O(in³), replicated) and
    the fori_loop walk compile SPMD; all walk tensors — scales, quantized
    codes, the error rank-1 updates — stay column-sharded with no
    collectives, so n chips walk n× the columns in the same time."""
    cols = _all_axes(mesh)
    W = jax.device_put(W, NamedSharding(mesh, P(None, cols)))
    H = jax.device_put(H, NamedSharding(mesh, P(None, None)))
    with jax.set_mesh(mesh):
        res = C.gptq_quantize_matrix(
            W, H, bits=bits, percdamp=percdamp, act_order=act_order,
            group_size=group_size, mse_clip=mse_clip, sym=sym)
        jax.block_until_ready(res.w)
    return res
