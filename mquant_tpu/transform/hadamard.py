"""Hadamard / fast orthogonal transform machinery.

TPU-native rebuild of the reference Hadamard stack (ref: fake_quant/
hadamard_utils.py:1-200 — itself adapted from QuIP#). Key design differences:

* The reference hardcodes 97k lines of Hadamard matrix literals
  (``get_had12``…``get_had172``). Here all constructible orders are **generated**:
  Sylvester doubling for powers of two, Paley I/II over prime fields and prime-power
  extension fields (GF(27) → H28, GF(25) → H52), and Kronecker products. Orders with
  no classical construction (156, 172) fall back to a **seeded random orthogonal
  block** — mathematically equivalent for rotation purposes (any orthogonal K×K
  block composed with the pow2 butterfly is a valid orthogonal transform; QuaRot's
  "random" mode uses exactly this), with identical runtime cost (the K×K factor is
  a dense matmul either way).
* The transform itself is a pure jittable function: reshape (..., K, 2^p) →
  butterfly FWHT along the pow2 axis → K×K matmul → /√n. XLA maps the butterfly to
  VPU adds and the K-block to the MXU; a fused Pallas kernel for the online path
  lives in ``mquant_tpu.kernels.fwht``.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Same factor table as the reference (ref: fake_quant/hadamard_utils.py:6), plus 40
# which its get_hadK also accepts (ref: hadamard_utils.py:61-64), plus orders the
# reference's literal table lacks but our generator constructs via Paley II:
#   148 = 2(73+1),  73 prime ≡ 1 (mod 4) → Qwen2-VL-7B 18944 = 148·128 EXACT
#   924 = 2(461+1), 461 prime ≡ 1 (mod 4) → Qwen2-VL-72B 29568 = 924·32 EXACT
# (no MLP padding needed for those models: −5.4% gate/up/down FLOPs vs the
# reference's auto_pad to 19968, ref: fake_quant/hadamard_utils.py:9-23).
SUPPORTED_K = [924, 172, 156, 148, 140, 108, 60, 52, 40, 36, 28, 20, 12, 1]

# Orders with no classical construction here → seeded random orthogonal block.
_RANDOM_ORTHO_K = {156, 172}
_RANDOM_ORTHO_SEED = 20250816


def is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


# ---------------------------------------------------------------------------
# finite fields (for Paley constructions over prime powers)
# ---------------------------------------------------------------------------


def _gf_elements(p: int, m: int):
    """Elements + multiplication table of GF(p^m), via polynomial arithmetic
    modulo a found irreducible polynomial. Tiny fields only (q <= ~200)."""
    if m == 1:
        elems = list(range(p))
        mul = [[(a * b) % p for b in elems] for a in elems]
        add = [[(a + b) % p for b in elems] for a in elems]
        return elems, add, mul

    # polynomials as tuples of length m (coeffs little-endian)
    def poly_mul_mod(a, b, modpoly):
        res = [0] * (2 * m)
        for i, ai in enumerate(a):
            if ai:
                for j, bj in enumerate(b):
                    res[i + j] = (res[i + j] + ai * bj) % p
        # reduce by modpoly (monic, degree m, little-endian coeffs length m+1)
        for d in range(2 * m - 1, m - 1, -1):
            c = res[d]
            if c:
                res[d] = 0
                for k in range(m):
                    res[d - m + k] = (res[d - m + k] - c * modpoly[k]) % p
        return tuple(res[:m])

    def find_irreducible():
        # brute force monic degree-m polys; irreducible iff no roots & not a
        # product of lower degree factors — test by checking x^(p^m) == x and
        # gcd conditions is overkill; for tiny fields just test reducibility by
        # trial division by all monic polys of degree 1..m//2.
        def poly_mul(a, b):
            res = [0] * (len(a) + len(b) - 1)
            for i, ai in enumerate(a):
                for j, bj in enumerate(b):
                    res[i + j] = (res[i + j] + ai * bj) % p
            return res

        import itertools

        monics_by_deg = {}
        for d in range(1, m):
            monics_by_deg[d] = [
                list(c) + [1] for c in itertools.product(range(p), repeat=d)
            ]
        for c in __import__("itertools").product(range(p), repeat=m):
            cand = list(c) + [1]
            reducible = False
            for d in range(1, m // 2 + 1):
                for f in monics_by_deg[d]:
                    for g in monics_by_deg[m - d]:
                        prod = poly_mul(f, g)
                        if prod == cand:
                            reducible = True
                            break
                    if reducible:
                        break
                if reducible:
                    break
            if not reducible:
                return cand
        raise RuntimeError("no irreducible polynomial found")

    modpoly = find_irreducible()
    import itertools

    elems = [tuple(c) for c in itertools.product(range(p), repeat=m)]
    idx = {e: i for i, e in enumerate(elems)}
    add = [
        [idx[tuple((a[k] + b[k]) % p for k in range(m))] for b in elems] for a in elems
    ]
    mul = [[idx[poly_mul_mod(a, b, modpoly)] for b in elems] for a in elems]
    # re-index elements as integers 0..q-1
    elems_i = list(range(len(elems)))
    return elems_i, add, mul


def _factor_prime_power(q: int):
    """(p, m) if q = p^m for prime p, else None. Trial division to √q."""
    if q < 2:
        return None
    p = None
    d = 2
    n = q
    while d * d <= n:
        if n % d == 0:
            p = d
            break
        d += 1
    if p is None:
        return q, 1  # q itself is prime
    m = 0
    while n % p == 0:
        n //= p
        m += 1
    return (p, m) if n == 1 else None


def _paley_qr_char(q: int) -> np.ndarray:
    """Quadratic residue character chi over GF(q): chi(0)=0, chi(sq)=1, else -1.
    Returns the q×q Jacobsthal-style matrix Q[i,j] = chi(a_i - a_j)."""
    p, m = _factor_prime_power(q)
    elems, add, mul = _gf_elements(p, m)
    qn = len(elems)
    squares = {mul[a][a] for a in elems if a != 0}
    neg = [None] * qn  # additive inverse index
    for a in elems:
        for b in elems:
            if add[a][b] == 0:
                neg[a] = b
    chi = np.zeros(qn)
    for a in elems:
        if a == 0:
            chi[a] = 0
        elif a in squares:
            chi[a] = 1
        else:
            chi[a] = -1
    Qm = np.zeros((qn, qn))
    for i in elems:
        for j in elems:
            Qm[i, j] = chi[add[i][neg[j]]]
    return Qm


def _paley_I(q: int) -> np.ndarray:
    """Paley construction I: Hadamard matrix of order q+1 for prime power
    q ≡ 3 (mod 4)."""
    Qm = _paley_qr_char(q)
    n = q + 1
    H = np.ones((n, n))
    H[1:, 1:] = Qm + np.eye(q)
    H[1:, 0] = -1.0
    return H


def _paley_II(q: int) -> np.ndarray:
    """Paley construction II: Hadamard matrix of order 2(q+1) for prime power
    q ≡ 1 (mod 4)."""
    Qm = _paley_qr_char(q)
    n = q + 1
    S = np.zeros((n, n))
    S[0, 1:] = 1.0
    S[1:, 0] = 1.0
    S[1:, 1:] = Qm
    # classical form: replace each entry of S by a 2×2 block —
    # S_ij = 0 (the diagonal) → [[1,-1],[-1,-1]]; S_ij = ±1 → ±[[1,1],[1,-1]].
    A = np.array([[1.0, 1.0], [1.0, -1.0]])
    B = np.array([[1.0, -1.0], [-1.0, -1.0]])
    H = np.kron(S, A)
    for i in range(n):
        H[2 * i : 2 * i + 2, 2 * i : 2 * i + 2] = B
    return H


@functools.lru_cache(maxsize=None)
def hadamard_matrix(n: int) -> np.ndarray:
    """Construct an exact {±1} Hadamard matrix of order n, or raise ValueError.

    Covers powers of two (Sylvester), Paley I/II over prime powers, and
    2^k × (constructible base) Kronecker products — which spans every K in
    SUPPORTED_K except {156, 172}.
    """
    if n == 1:
        return np.ones((1, 1))
    if n == 2:
        return np.array([[1.0, 1.0], [1.0, -1.0]])
    if n % 2 == 0 and is_pow2(n):
        h = hadamard_matrix(n // 2)
        return np.kron(np.array([[1.0, 1.0], [1.0, -1.0]]), h)
    if n % 4 != 0:
        raise ValueError(f"no Hadamard matrix of order {n}")
    # Paley I: n = q+1, q prime power ≡ 3 mod 4
    q = n - 1
    fp = _factor_prime_power(q)
    if fp is not None and q % 4 == 3:
        return _paley_I(q)
    # Paley II: n = 2(q+1), q prime power ≡ 1 mod 4
    if n % 2 == 0:
        q = n // 2 - 1
        fp = _factor_prime_power(q)
        if fp is not None and q % 4 == 1:
            return _paley_II(q)
    # Sylvester split: n = 2m with m constructible
    if n % 2 == 0:
        try:
            h = hadamard_matrix(n // 2)
            return np.kron(np.array([[1.0, 1.0], [1.0, -1.0]]), h)
        except ValueError:
            pass
    raise ValueError(f"no Hadamard construction implemented for order {n}")


@functools.lru_cache(maxsize=None)
def _block_K(K: int) -> np.ndarray:
    """Orthogonal K×K block (float64, orthonormal rows: B @ B.T = I).

    Exact Hadamard/√K where constructible; seeded random orthogonal otherwise
    (orders 156/172 — see module docstring for why this is equivalent).
    """
    if K == 1:
        return np.ones((1, 1))
    if K in _RANDOM_ORTHO_K:
        rng = np.random.default_rng(_RANDOM_ORTHO_SEED + K)
        a = rng.standard_normal((K, K))
        qmat, r = np.linalg.qr(a)
        qmat = qmat * np.sign(np.diag(r))[None, :]
        return qmat
    h = hadamard_matrix(K)
    return h / math.sqrt(K)


def get_hadK(n: int) -> Tuple[np.ndarray, int]:
    """Pick the non-pow2 factor K of n and its orthogonal K×K block.

    Same dispatch as the reference (ref: fake_quant/hadamard_utils.py:26-76):
    largest supported K dividing n with n/K a power of two. Returned block is
    orthonormal (already /√K), so the full transform scale is 1/√(n/K).
    """
    for K in SUPPORTED_K:
        if K == 1:
            continue
        if n % K == 0 and is_pow2(n // K):
            return _block_K(K), K
    if not is_pow2(n):
        raise ValueError(f"dimension {n} is not K*2^p for supported K {SUPPORTED_K}")
    return _block_K(1), 1


def auto_pad_size(n: int) -> int:
    """Smallest m >= n of the form K * 2^p with K supported
    (ref: fake_quant/hadamard_utils.py:9-23)."""
    for K in SUPPORTED_K:
        if n % K == 0 and is_pow2(n // K):
            return n
    best = math.inf
    for K in SUPPORTED_K:
        p2 = 2 ** math.ceil(math.log2(math.ceil(n / K)))
        if K * p2 < best:
            best = K * p2
    return int(best)


# ---------------------------------------------------------------------------
# the transform
# ---------------------------------------------------------------------------


def fwht(x: jax.Array) -> jax.Array:
    """Unnormalized fast Walsh–Hadamard transform along the last axis (pow2 dim).

    Iterative reshape butterfly — log2(n) fused VPU add/sub passes under XLA.
    """
    n = x.shape[-1]
    assert is_pow2(n), f"fwht needs a power-of-two dim, got {n}"
    orig_shape = x.shape
    h = 1
    y = x.reshape(-1, n)
    while h < n:
        y = y.reshape(-1, n // (2 * h), 2, h)
        a = y[..., 0, :]
        b = y[..., 1, :]
        y = jnp.stack([a + b, a - b], axis=-2)
        h *= 2
    return y.reshape(orig_shape)


def hadamard_transform(x: jax.Array, hadK: jax.Array | None = None, K: int | None = None) -> jax.Array:
    """Orthonormal Hadamard-style transform along the last axis of size n = K·2^p.

    Matches the reference online path (ref: fake_quant/hadamard_utils.py:115-128
    ``matmul_hadU_cuda``): view (..., K, n/K) → FWHT over n/K → K-block matmul →
    overall orthonormal scaling. Pure JAX version; the fused Pallas kernel is in
    ``mquant_tpu.kernels.fwht``.
    """
    n = x.shape[-1]
    if hadK is None or K is None:
        hadK_np, K = get_hadK(n)
        hadK = jnp.asarray(hadK_np, x.dtype)
    m = n // K
    scale = 1.0 / math.sqrt(m)  # hadK is already orthonormal
    if K == 1:
        return fwht(x) * jnp.asarray(scale, x.dtype)
    xr = x.reshape(*x.shape[:-1], K, m)
    xr = fwht(xr) * jnp.asarray(scale, x.dtype)
    out = jnp.einsum("kl,...lm->...km", hadK.astype(x.dtype), xr)
    return out.reshape(x.shape)


def transform_matrix(n: int, dtype=np.float64) -> np.ndarray:
    """Dense n×n matrix H of :func:`hadamard_transform` (orthogonal).

    Used to fold the transform into weights offline: the online transform of
    activations x @ ... equals the matrix product x @ H.T.
    """
    hadK, K = get_hadK(n)
    m = n // K
    Hm = hadamard_matrix(m) / math.sqrt(m)
    return np.kron(hadK, Hm).astype(dtype)


def random_hadamard_matrix(n: int, key: jax.Array) -> np.ndarray:
    """Randomized Hadamard: H @ diag(±1) (ref: fake_quant/hadamard_utils.py:107-112
    via QuIP# randomized Hadamard transformation). Returns float64 numpy, orthogonal."""
    signs = np.asarray(jax.random.rademacher(key, (n,), dtype=jnp.int32), np.float64)
    H = transform_matrix(n)
    # reference computes matmul_hadU(diag(signs)) == H @ diag(signs)
    return H * signs[None, :]


def random_orthogonal_matrix(n: int, key: jax.Array) -> np.ndarray:
    """QR-based random orthogonal matrix in float64
    (ref: fake_quant/rotation_utils.py:108-125)."""
    a = np.asarray(jax.random.normal(key, (n, n), dtype=jnp.float32), np.float64)
    qmat, r = np.linalg.qr(a)
    return qmat * np.sign(np.diag(r))[None, :]


def get_orthogonal_matrix(n: int, mode: str, key: jax.Array) -> np.ndarray:
    """mode ∈ {"hadamard", "random"} (ref: fake_quant/rotation_utils.py:128-134)."""
    if mode == "hadamard":
        return random_hadamard_matrix(n, key)
    if mode == "random":
        return random_orthogonal_matrix(n, key)
    raise ValueError(f"unknown rotation mode {mode!r}")
