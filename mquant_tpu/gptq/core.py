"""GPTQ — Hessian-based error-compensated weight quantization, TPU-native.

Fresh implementation of the GPTQ algorithm (Frantar et al.) with the same
capabilities as the reference's ``GPTQ.fasterquant``
(ref: fake_quant/gptq/gptq_utils.py:197-307): percdamp Cholesky damping,
act_order permutation by diag(H), optional per-group scale re-finding, NaN
guard, and RTN fallback on Cholesky failure. Differences by design:

  * weight layout (in, out): rows are input features; quantization walks input
    rows, propagating error to later rows (the transpose of the reference's
    column walk over torch's (out, in)).
  * the sequential inner loop is a ``lax.fori_loop`` over rows *within* a
    128-row block with masked rank-1 updates (VPU), and the cross-block error
    propagation is one (in, B) × (B, out) matmul on the MXU; the row walk is
    ONE jitted function (compile O(1) in the input dim), vmappable over
    stacked layers; the Hessian factorization is a blocked Cholesky +
    triangular inverse built from the same fixed-shape loop primitives.
  * Cholesky failure cannot raise under jit; it surfaces as NaNs, which the NaN
    guard converts into an RTN fallback via ``jnp.where`` (same observable
    behavior as ref:239-245 + 296-303).
  * conv patch-embeds need no special im2col path (``GPTQConv``,
    ref: gptq_utils.py:15-168): the model zoo already expresses them as linears
    over pre-extracted patches.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.formats import get_format
from ..core import quant as Q

BLOCK = 128


class GPTQResult(NamedTuple):
    w: jax.Array  # fake-quantized weight (in, out), original dtype
    scale: jax.Array  # (n_groups_or_1, out) per-out-channel scales
    used_fallback: jax.Array  # bool scalar: RTN fallback (Cholesky failed)
    zero: Optional[jax.Array] = None  # (n_groups_or_1, out) asym zero points
    perm: Optional[jax.Array] = None  # (in,) act_order permutation (permuted
    # position i holds original row perm[i]); grouped scales index PERMUTED
    # row blocks — realization stores the weight in permuted layout and the
    # serving GEMM gathers the activation (a_perm)


def accumulate_hessian(h: Optional[jax.Array], x: jax.Array) -> jax.Array:
    """H += 2 XᵀX over a batch of activations x (..., in). The running-mean
    normalization of the reference (ref: gptq_utils.py:182-195 ``add_batch``)
    only rescales H uniformly, which cancels in the algorithm; plain
    accumulation is numerically equivalent and cheaper."""
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    hh = 2.0 * (xf.T @ xf)
    return hh if h is None else h + hh


PANEL = 256  # factorization panel (multiple of the 8×128 f32 tile)


def _chol_small(D: jax.Array) -> jax.Array:
    """Unblocked lower Cholesky of a P×P SPD block: fori_loop of rank-1
    downdates (VPU). No ``jnp.linalg.cholesky`` — XLA:TPU's expansion of even
    a small dense Cholesky inside an outer loop measured ~20× slower than
    this masked rank-1 form."""
    P = D.shape[-1]
    ids = jnp.arange(P, dtype=jnp.int32)

    def body(j, carry):
        A, L = carry
        # clamp the pivot: f32 accumulation over thousands of rank-1 downdates
        # can drift a near-singular (damped, rank-deficient-Hessian) pivot
        # slightly negative; the floor keeps the factor finite (the NaN→RTN
        # guard downstream still catches genuinely broken factorizations)
        d = jnp.sqrt(jnp.maximum(
            jax.lax.dynamic_slice(A, (j, j), (1, 1))[0, 0], 1e-12))
        col = jax.lax.dynamic_slice_in_dim(A, j, 1, 1)[:, 0] / d  # (P,)
        col = jnp.where(ids >= j, col, 0.0)
        L = jax.lax.dynamic_update_slice_in_dim(L, col[:, None], j, 1)
        below = jnp.where(ids > j, col, 0.0)
        A = A - below[:, None] * below[None, :]
        return A, L

    _, L = jax.lax.fori_loop(0, P, body, (D, jnp.zeros_like(D)))
    return L


def _tri_inv_small(L: jax.Array) -> jax.Array:
    """Inverse of a P×P lower-triangular block by row-wise forward
    substitution (fori_loop; same rationale as ``_chol_small``)."""
    P = L.shape[-1]
    ids = jnp.arange(P, dtype=jnp.int32)

    def body(i, X):
        li = jax.lax.dynamic_slice_in_dim(L, i, 1, 0)[0]  # (P,)
        s = jnp.dot(jnp.where(ids < i, li, 0.0)[None, :], X,
                    precision=jax.lax.Precision.HIGHEST)[0]  # (P,) matvec
        e = (ids == i).astype(L.dtype)
        d = jax.lax.dynamic_slice(L, (i, i), (1, 1))[0, 0]
        return jax.lax.dynamic_update_slice_in_dim(
            X, ((e - s) / d)[None, :], i, 0)

    return jax.lax.fori_loop(0, P, body, jnp.zeros_like(L))


def _blocked_cholesky(A: jax.Array, P: int = PANEL):
    """Lower Cholesky of an SPD matrix, right-looking blocked form. Returns
    (L, Dinv) where Dinv stacks the inverted P×P diagonal blocks (reused by
    ``_blocked_tri_inv_lower``).

    XLA:TPU's native lowering of big dense ``cholesky``/``triangular_solve``
    recursively expands into temporaries that exceeded HBM at down_proj size
    (18944²: >100 GB requested) and cost ~85 s of compile even at 3584². This
    fori_loop version has O(1) compile in n and O(n²) memory: per panel one
    unblocked P×P Cholesky + inverse (Θ(P) tiny sequential steps), a (n, P)
    panel product, and a masked rank-P downdate on the MXU."""
    n = A.shape[-1]  # must be a multiple of P (caller pads)
    nb = n // P
    row_ids = jnp.arange(n, dtype=jnp.int32)[:, None]

    def body(b, carry):
        A, L, Dinv = carry
        r0 = b * P
        D = jax.lax.dynamic_slice(A, (r0, r0), (P, P))
        Ld = _chol_small(D)
        Ldinv = _tri_inv_small(Ld)
        Dinv = jax.lax.dynamic_update_slice(Dinv, Ldinv[None], (b, 0, 0))
        C = jax.lax.dynamic_slice(A, (0, r0), (n, P))
        # full f32 precision: the factorization feeds sqrt/division chains
        # where the default bf16-pass matmul loses enough bits to flip
        # near-zero pivots negative at down_proj size
        X = jnp.dot(C, Ldinv.T, precision=jax.lax.Precision.HIGHEST)
        X = X * (row_ids >= r0 + P).astype(A.dtype)
        panel = X + jax.lax.dynamic_update_slice(
            jnp.zeros((n, P), A.dtype), Ld, (r0, 0))
        L = jax.lax.dynamic_update_slice(L, panel, (0, r0))
        A = A - jnp.dot(X, X.T, precision=jax.lax.Precision.HIGHEST)
        return A, L, Dinv

    _, L, Dinv = jax.lax.fori_loop(
        0, nb, body,
        (A, jnp.zeros_like(A), jnp.zeros((nb, P, P), A.dtype)))
    return L, Dinv


def _blocked_tri_inv_lower(L: jax.Array, Dinv: jax.Array,
                           P: int = PANEL) -> jax.Array:
    """Inverse of a lower-triangular matrix by blocked forward substitution
    (same O(1)-compile / O(n²)-memory rationale as ``_blocked_cholesky``).
    ``Dinv``: pre-inverted P×P diagonal blocks from the factorization."""
    n = L.shape[-1]
    nb = n // P
    col_ids = jnp.arange(n, dtype=jnp.int32)[None, :]
    prow = jnp.arange(P, dtype=jnp.int32)

    def body(b, Y):
        r0 = b * P
        Drow = jax.lax.dynamic_slice(L, (r0, 0), (P, n))
        Ldinv = jax.lax.dynamic_slice(Dinv, (b, 0, 0), (1, P, P))[0]
        S = jnp.dot(Drow * (col_ids < r0).astype(L.dtype), Y,
                    precision=jax.lax.Precision.HIGHEST)  # (P, n) MXU
        Irow = (col_ids == (r0 + prow)[:, None]).astype(L.dtype)
        Yrow = jnp.dot(Ldinv, Irow - S, precision=jax.lax.Precision.HIGHEST)
        return jax.lax.dynamic_update_slice(Y, Yrow, (r0, 0))

    return jax.lax.fori_loop(0, nb, body, jnp.zeros_like(L))


def _hinv_cholesky(H: jax.Array, percdamp: float) -> jax.Array:
    """Upper-triangular U with H⁻¹ = UᵀU, used for error propagation: the
    i-th diagonal entry scales the i-th row's error and U[i, j>i] carries it
    to later rows.

    Computed via the reversal identity U = J·chol(J H J)⁻¹·J (J = exchange
    matrix): ONE Cholesky + ONE triangular inverse. Mathematically identical
    (uniqueness of the Cholesky factor) to the reference's
    cholesky → cholesky_inverse → upper-cholesky chain
    (ref: gptq_utils.py:236-238) but skips forming H⁻¹ and the second
    factorization. Padding to the panel size with identity blocks commutes
    with the reversal (the padded region factors to identity and is sliced
    away)."""
    n = H.shape[-1]
    H = H.astype(jnp.float32)
    diag = jnp.diagonal(H, axis1=-2, axis2=-1)
    dead = diag == 0
    one = jnp.ones((), jnp.float32)
    H = H + jnp.diag(jnp.where(dead, one, 0 * one))
    damp = jnp.float32(percdamp) * jnp.mean(jnp.abs(diag))
    H = H + damp * jnp.eye(n, dtype=jnp.float32)
    Hr = H[::-1, ::-1]
    pad = (-n) % PANEL
    if pad:
        Hr = jnp.pad(Hr, ((0, pad), (0, pad)))
        Hr = Hr + jnp.diag(jnp.pad(jnp.zeros((n,), jnp.float32), (0, pad),
                                   constant_values=1.0))
    Lg, Dinv = _blocked_cholesky(Hr)
    Lginv = _blocked_tri_inv_lower(Lg, Dinv)
    return Lginv[:n, :n][::-1, ::-1]


def _quantize_rows_block(Wb, Ub, scale, zero, qmin, qmax):
    """Quantize one B-row block sequentially with in-block error propagation.
    Wb (B, out); Ub (B, B) upper-tri slice; scale/zero (out,) or (B, out).
    ``zero`` is the asymmetric zero-point in integer units (None → symmetric):
    q = (clip(round(w/s) + z, qmin, qmax) - z) * s, matching the reference's
    asym_quant_dequant (ref: fake_quant/quant_utils.py:15-35)."""
    B = Wb.shape[0]

    def body(i, carry):
        Wb, Eb = carry
        w = jax.lax.dynamic_slice_in_dim(Wb, i, 1, 0)[0]  # (out,)
        s = scale if scale.ndim == 1 else jax.lax.dynamic_slice_in_dim(scale, i, 1, 0)[0]
        if zero is None:
            q = jnp.clip(jnp.round(w / s), qmin, qmax) * s
        else:
            z = zero if zero.ndim == 1 else jax.lax.dynamic_slice_in_dim(zero, i, 1, 0)[0]
            q = (jnp.clip(jnp.round(w / s) + z, qmin, qmax) - z) * s
        d = jax.lax.dynamic_slice(Ub, (i, i), (1, 1))[0, 0]
        e = (w - q) / d
        # propagate to later rows in the block: Wb[j] -= Ub[i, j] * e  (j > i)
        urow = jax.lax.dynamic_slice_in_dim(Ub, i, 1, 0)[0]  # (B,)
        rows = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
        mask = (rows > i).astype(Wb.dtype)
        Wb = Wb - mask * (urow[:, None] * e[None, :])
        Wb = jax.lax.dynamic_update_slice_in_dim(Wb, q[None, :], i, 0)
        Eb = jax.lax.dynamic_update_slice_in_dim(Eb, e[None, :], i, 0)
        return Wb, Eb

    Eb0 = jnp.zeros_like(Wb)
    return jax.lax.fori_loop(0, B, body, (Wb, Eb0))


@functools.partial(jax.jit, static_argnames=("bits", "act_order", "group_size",
                                             "mse_clip", "sym", "percdamp"))
def gptq_quantize_matrix(
    W: jax.Array,  # (in, out)
    H: jax.Array,  # (in, in) accumulated Hessian
    bits: int,
    percdamp: float = 0.01,
    act_order: bool = False,
    group_size: Optional[int] = None,
    mse_clip: bool = False,
    sym: bool = True,
) -> GPTQResult:
    """One jitted function end-to-end (vmappable over stacked layers):
    act_order permutation → blocked Hessian factorization → sequential row
    walk. Compile time is O(1) in the input dimension (every loop is a
    ``lax.fori_loop`` over fixed-shape panels/blocks)."""
    if act_order:  # quantize most-salient inputs first (ref:225-229)
        perm = jnp.argsort(-jnp.diagonal(H))
        Hp = H[perm][:, perm]
    else:
        perm = None
        Hp = H
    U = _hinv_cholesky(Hp.astype(jnp.float32), percdamp)
    return _gptq_walk(W, jnp.diagonal(Hp), U, perm, bits=bits,
                      act_order=act_order, group_size=group_size,
                      mse_clip=mse_clip, sym=sym)


@functools.partial(jax.jit, static_argnames=("bits", "act_order", "group_size",
                                             "mse_clip", "sym"))
def _gptq_walk(
    W: jax.Array,  # (in, out)
    diag: jax.Array,  # (in,) diagonal of the (permuted) Hessian
    U: jax.Array,  # (in, in) upper factor of Hp⁻¹
    perm: Optional[jax.Array],  # (in,) permutation when act_order
    bits: int,
    act_order: bool,
    group_size: Optional[int],
    mse_clip: bool,
    sym: bool,
) -> GPTQResult:
    fmt = get_format(bits, signed=sym)
    Win = W.astype(jnp.float32)
    n, out = Win.shape
    if act_order:
        Win = Win[perm]
    Win = jnp.where((diag == 0)[:, None], 0.0, Win)  # dead inputs → 0 (ref:205-207)

    # per-out-channel scales; optionally per input-row group (ref:263-273)
    if group_size is None:
        qp = Q.weight_qparams(Win, fmt, per_channel=True, symmetric=sym,
                              mse_clip=mse_clip)
        scales = jnp.broadcast_to(qp.scale.reshape(1, out), (1, out))
        zeros = (None if qp.zero_point is None
                 else jnp.broadcast_to(qp.zero_point.reshape(1, out), (1, out)))
    else:
        g = n // group_size
        Wg = Win.reshape(g, group_size, out)
        qp = Q.weight_qparams(Wg, fmt, symmetric=sym, mse_clip=mse_clip,
                              reduce_axes=(-2,))
        scales = qp.scale.reshape(g, out)
        zeros = None if qp.zero_point is None else qp.zero_point.reshape(g, out)

    pad = (-n) % BLOCK
    Wp = jnp.pad(Win, ((0, pad), (0, 0)))
    Up = jnp.pad(U, ((0, pad), (0, pad)))
    Up = Up + jnp.diag(jnp.pad(jnp.zeros((n,), jnp.float32), (0, pad),
                               constant_values=1.0))
    n_pad = Wp.shape[0]
    nb = n_pad // BLOCK

    def params_for_block(row0, table):
        """Per-row (BLOCK, out) gather from a (g, out) group table, or the
        single (out,) row when ungrouped. Traced row0 — works under fori_loop."""
        if table is None:
            return None
        if group_size is None:
            return table[0]
        gidx = (row0 + jnp.arange(BLOCK)) // group_size
        gidx = jnp.clip(gidx, 0, table.shape[0] - 1)
        return table[gidx]  # (BLOCK, out)

    # lax.fori_loop over blocks (NOT a Python unroll): compile time is O(1) in
    # the input dimension, so a 7B down_proj (148 blocks) compiles as fast as a
    # test-sized matrix. The cross-block propagation multiplies against ALL
    # rows each step ((n_pad, BLOCK) @ (BLOCK, out) on the MXU) and masks out
    # rows already finalized — 2× the FLOPs of a shrinking-slice unroll, but
    # MXU-fast and constant-shape.
    row_ids = jnp.arange(n_pad, dtype=jnp.int32)[:, None]  # (n_pad, 1)

    def block_body(b, W_work):
        row0 = b * BLOCK
        Wb = jax.lax.dynamic_slice(W_work, (row0, 0), (BLOCK, out))
        Ub = jax.lax.dynamic_slice(Up, (row0, row0), (BLOCK, BLOCK))
        Wb, Eb = _quantize_rows_block(
            Wb, Ub, params_for_block(row0, scales), params_for_block(row0, zeros),
            fmt.qmin, fmt.qmax)
        W_work = jax.lax.dynamic_update_slice(W_work, Wb, (row0, 0))
        # cross-block propagation: rows after this block -= U[blk, :]ᵀ @ Eb
        Urows = jax.lax.dynamic_slice(Up, (row0, 0), (BLOCK, n_pad))
        upd = Urows.T @ Eb  # (n_pad, out) MXU
        keep = (row_ids >= row0 + BLOCK).astype(W_work.dtype)
        return W_work - keep * upd

    W_work = jax.lax.fori_loop(0, nb, block_body, Wp)

    Wq = W_work[:n]
    if act_order:
        inv = jnp.argsort(perm)
        Wq = Wq[inv]

    # NaN guard → RTN fallback (ref: gptq_utils.py:239-245, 296-303). The
    # fallback's grid replaces the GPTQ grid in the returned qparams too, so
    # realize-from-qparams stays exact either way.
    bad = ~jnp.all(jnp.isfinite(Wq))
    qp_rtn = Q.weight_qparams(W.astype(jnp.float32), fmt, per_channel=True,
                              symmetric=sym, mse_clip=mse_clip)
    rtn = Q.fake_quantize(W.astype(jnp.float32), qp_rtn, fmt)
    Wq = jnp.where(bad, rtn, Wq)
    g = scales.shape[0]
    scales = jnp.where(bad, jnp.broadcast_to(qp_rtn.scale.reshape(1, out),
                                             (g, out)), scales)
    if zeros is not None:
        zeros = jnp.where(bad, jnp.broadcast_to(
            qp_rtn.zero_point.reshape(1, out), (g, out)), zeros)
    # act_order × group_size: group scales are per PERMUTED row block; after
    # the inverse permutation the (g, out) table no longer maps to contiguous
    # input-row groups. The returned ``perm`` lets realization store the
    # weight in PERMUTED layout (groups contiguous again) with the activation
    # gathered at serve time — exact, one cheap (..., in) gather per call.
    # On RTN fallback the grid is per-out-channel (g rows broadcast) and
    # permutation-independent, but the permuted storage layout still composes
    # with it, so perm is returned either way.
    return GPTQResult(w=Wq.astype(W.dtype), scale=scales, used_fallback=bad,
                      zero=zeros, perm=perm if act_order else None)
