"""Token sampling for the serving path (temperature / top-k / top-p).

The reference (and this framework's eval harness) is greedy-only — benchmark
protocols pin ``do_sample=False``. Production serving needs stochastic
decoding, so the engine's fused decode blocks support it natively:

- a static ``top_k`` cap bounds the categorical to a ``lax.top_k`` slice
  (vocab-sized Gumbel noise + sort per step would waste decode bandwidth;
  beyond ~64 candidates the tail mass is negligible at serving temperatures),
- per-row ``temperature`` and ``top_p`` ride in as arrays, so one compiled
  block serves a pool mixing greedy (t=0) and sampled rows,
- the Gumbel-max trick picks the token (no CDF inversion, one argmax — VPU
  friendly, and exactly categorical over the kept candidates).

Determinism: the engine folds its seed into the per-block PRNG key and each
step folds the loop index, so a fixed (seed, admission order) replays the
same tokens.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sample_tokens(logits: jax.Array, key: jax.Array, temp: jax.Array,
                  top_p: jax.Array, top_k: int,
                  seeds: jax.Array = None,
                  counts: jax.Array = None) -> jax.Array:
    """One sampled token per row. logits (B, V); temp/top_p (B,);
    ``top_k`` static. Rows with temp == 0 get exact argmax (greedy rows in a
    mixed pool pay the top_k slice but not its result).

    With ``seeds``/``counts`` (both (B,) int32), each row's Gumbel noise is
    keyed by (its own seed, its own emitted-token index) instead of the
    shared block key — tokens then depend ONLY on (request seed, position),
    so a sampled request replays identically regardless of pool composition
    or scheduling (per-request determinism, the property an API ``seed``
    parameter promises)."""
    greedy = jnp.argmax(logits, -1).astype(jnp.int32)
    l32 = logits.astype(jnp.float32)
    t = jnp.maximum(temp, 1e-6)[:, None]
    vals, idx = jax.lax.top_k(l32 / t, top_k)  # (B, K) descending
    # nucleus mask over the kept candidates: drop a candidate when the
    # cumulative probability BEFORE it already reaches top_p (the first
    # candidate always survives)
    probs = jax.nn.softmax(vals, -1)
    cum = jnp.cumsum(probs, -1)
    vals = jnp.where(cum - probs < top_p[:, None], vals, -jnp.inf)
    if seeds is not None:
        def row_noise(seed, cnt):
            k = jax.random.fold_in(jax.random.fold_in(key, seed), cnt)
            return jax.random.uniform(k, (top_k,), jnp.float32, 1e-20, 1.0)

        u = jax.vmap(row_noise)(seeds, counts)
    else:
        u = jax.random.uniform(key, vals.shape, jnp.float32, 1e-20, 1.0)
    g = -jnp.log(-jnp.log(u))
    choice = jnp.argmax(vals + g, -1)
    sampled = jnp.take_along_axis(idx, choice[:, None], -1)[:, 0]
    return jnp.where(temp > 0, sampled.astype(jnp.int32), greedy)


def host_sample_first(vals: np.ndarray, idx: np.ndarray, temperature: float,
                      top_p: float, rng: np.random.Generator) -> int:
    """Sample the ADMISSION token on the host from the prefill logits' RAW
    top-k slice (vals descending). One token per request — numpy is fine.
    Returns the POSITION within the slice (callers map to ``idx[pos]`` and
    can form the logprob as ``vals[pos] - lse``)."""
    del idx  # position-based contract; kept for signature clarity
    if temperature <= 0:
        return 0
    v = np.asarray(vals, np.float64) / max(temperature, 1e-6)
    v -= v.max()
    p = np.exp(v)
    p /= p.sum()
    cum = np.cumsum(p)
    keep = (cum - p) < top_p
    p = np.where(keep, p, 0.0)
    p /= p.sum()
    return int(rng.choice(len(p), p=p))
