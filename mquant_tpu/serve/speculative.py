"""Self-speculative decoding: n-gram drafting + exact multi-token verify.

The reference serves decode strictly one token per forward (HF ``generate``
under VLMEvalKit, ref: vlmeval/vlm/base.py:99-121) — every emitted token pays
one full weight stream. Decode on TPU is HBM-bandwidth-bound (the MXU idles
at T=1), so verifying SEVERAL candidate tokens in one forward costs barely
more than one decode step; if the candidates are right, each weight stream
emits several tokens.

This module implements *prompt-lookup / n-gram self-drafting* (the drafter
used by vLLM's ``prompt_lookup`` and HF's ``prompt_lookup_num_tokens``): the
draft for the next k tokens is the continuation of the most recent earlier
occurrence of the current n-gram suffix in the token history. No extra model,
no training — and verification makes the OUTPUT EXACT regardless of draft
quality: tokens are accepted only while they equal the greedy argmax the full
model produces at that position, so the emitted sequence is token-for-token
the plain greedy decode (draft quality affects only speed).

TPU-first shape: the WHOLE loop — drafting (vectorized n-gram match over the
on-device token history), the (1, k+1) verify forward, acceptance, KV-cache
position rollback, history append — runs inside ONE ``lax.while_loop`` jit.
No host round trips, fixed shapes throughout (a failed draft simply verifies
as 1 accepted token = a plain decode step):

  * history is a static (S,) int32 buffer + a traced length L;
  * the n-gram match is a rolled-compare over the whole buffer (VPU work,
    ~S·max_n int compares — negligible next to the verify matmuls);
  * verify feeds [next_tok, d_1..d_k] at cache position P; the causal-with-
    offset mask comes from ``decoder_forward``'s per-position row mask;
  * acceptance m = 1 + longest prefix where d_i == argmax_i; the KV rows for
    rejected tokens are ABANDONED by rolling ``cache["pos"]`` back to P+m —
    the next verify overwrites them, and every attention mask is bounded by
    ``pos``, so stale rows are never read.

Rollback correctness: after verify, rows P..P+k hold KV for
[next_tok, d_1..d_k]. Accepted context is [next_tok, g_0..g_{m-2}] and
d_i == g_{i-1} for all i < m, so rows P..P+m-1 are exactly the accepted
tokens' KV. ``pos = P+m`` keeps precisely those.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.llm import decoder_forward
from .generate import Generator, bucket_len


def ngram_propose(ctx: jax.Array, length: jax.Array, k: int,
                  max_n: int = 3) -> jax.Array:
    """Draft ``k`` tokens: continuation of the latest earlier occurrence of
    the longest matching suffix n-gram (n = max_n..1) of ``ctx[:length]``.

    ctx: (S,) int32 history buffer (entries >= length are ignored garbage).
    Returns (k,) int32 draft. If no n-gram recurs, the draft is arbitrary —
    verification still yields a correct (1-token) step, so no branch is
    needed. All ops are fixed-shape vector compares (VPU)."""
    S = ctx.shape[0]
    idx = jnp.arange(S, dtype=jnp.int32)
    start = jnp.int32(-1)  # draft start index (match end), -1 = none yet
    for n in range(max_n, 0, -1):  # static ladder, longest n-gram wins
        m = jnp.ones((S,), bool)
        for t in range(n):
            # ctx[j + t] == ctx[length - n + t] for every j, via roll
            m = m & (jnp.roll(ctx, -t) == ctx[length - n + t])
        # exclude the suffix itself and matches with no following token:
        # need j + n <= length - 1
        m = m & (idx <= length - n - 1)
        j = jnp.max(jnp.where(m, idx, -1))
        start = jnp.where((start < 0) & (j >= 0), j + n, start)
    start = jnp.clip(start, 0, S - k)  # -1 (no match) → arbitrary draft
    return jax.lax.dynamic_slice(ctx, (start,), (k,))


def _spec_loop_fn(gen: Generator, k: int, max_out: int, hist_len: int,
                  eos_id: Optional[int], force_accept: bool = False):
    """One jit: while_loop of [draft → verify(k+1) → accept → rollback].

    ``force_accept`` is a MEASUREMENT INSTRUMENT only: it accepts all k+1
    tokens per iteration regardless of agreement, so the loop's throughput
    equals the perfect-draft ceiling (k+1 tokens per weight stream). Its
    output is NOT the greedy sequence (tokens are conditioned on unverified
    drafts) — never serve with it; use it to report the acceptance→speedup
    curve endpoint next to the exact path."""
    cfg, specs, state, mode = gen.cfg, gen.specs, gen.state, gen.mode
    alpha = gen._ntk_alpha
    import os

    s4 = (mode == "real" and specs
          and os.environ.get("MQUANT_DECODE_S4", "1") == "1")

    @jax.jit
    def run(params, ctx, length, next_tok, cache):
        if s4:
            from ..kernels.qmm import s4_squeeze_sites

            in_dims = {"q": cfg.hidden, "k": cfg.hidden, "v": cfg.hidden,
                       "gate": cfg.hidden, "up": cfg.hidden,
                       "o": cfg.n_heads * cfg.head_dim,
                       "down": cfg.inter_eff}
            params = dict(params)
            params["layers"] = s4_squeeze_sites(params["layers"], specs,
                                                in_dims)
        out0 = jnp.zeros((max_out + k,), jnp.int32)

        def cond(carry):
            _, _, _, _, out_n, _, done, it = carry
            return (out_n < max_out) & ~done & (it < max_out)

        def body(carry):
            ctx, length, next_tok, cache, out_n, out, done, it = carry
            draft = ngram_propose(ctx, length, k)  # (k,)
            window = jnp.concatenate([next_tok[None], draft])[None]  # (1,k+1)
            pos0 = jnp.asarray(cache["pos"], jnp.int32)
            logits, cache2, _ = decoder_forward(
                cfg, params, window, specs=specs, state=state, mode=mode,
                cache=cache, ntk_alpha=alpha)
            g = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # (k+1,)
            # accept while the draft agrees with greedy: m in [1, k+1]
            agree = jnp.cumprod((draft == g[:-1]).astype(jnp.int32))
            m = (1 + jnp.sum(agree)).astype(jnp.int32)
            if force_accept:  # ceiling instrument — see docstring
                m = jnp.int32(k + 1)
            if eos_id is not None:
                # stop at the first accepted eos (inclusive, trimmed on host)
                pos_i = jnp.arange(k + 1, dtype=jnp.int32)
                is_eos = (g == eos_id) & (pos_i < m)
                first = jnp.min(jnp.where(is_eos, pos_i, k + 1))
                m = jnp.minimum(m, first + 1).astype(jnp.int32)
                done = done | jnp.any(is_eos)
            m = jnp.minimum(m, max_out - out_n).astype(jnp.int32)  # budget
            # emit g[:m]: write all k+1, next iteration's write (at out_n+m)
            # overwrites the rejected tail; out is sliced to out_n on host
            out = jax.lax.dynamic_update_slice(out, g, (out_n,))
            ctx = jax.lax.dynamic_update_slice(ctx, g, (length,))
            # rollback: keep only the m accepted tokens' KV rows
            cache2 = dict(cache2)
            cache2["pos"] = jnp.asarray(pos0 + m, cache["pos"].dtype)
            next_tok = g[m - 1]
            return (ctx, jnp.int32(length + m), next_tok, cache2,
                    jnp.int32(out_n + m), out, done, jnp.int32(it + 1))

        carry = (ctx, length, next_tok, cache, jnp.int32(0), out0,
                 jnp.zeros((), bool), jnp.int32(0))
        ctx, length, _, cache, out_n, out, _, iters = jax.lax.while_loop(
            cond, body, carry)
        return out, out_n, iters

    return run


def speculative_generate(gen: Generator, tokens: jax.Array,
                         max_new_tokens: int = 32, k: int = 7,
                         eos_id: Optional[int] = None,
                         return_stats: bool = False,
                         force_accept: bool = False):
    """Greedy generation via self-speculative decoding. Output is exactly
    the plain greedy decode (``Generator.generate_on_device``); the draft
    only changes how many weight streams it takes. B=1 (interactive
    latency path; batched serving amortizes differently — use the engine).

    Returns a (n,) int32 array of generated tokens (eos-trimmed), plus
    ``{"iters", "accepted_per_iter"}`` when ``return_stats``."""
    assert tokens.ndim == 2 and tokens.shape[0] == 1, "B=1 only"
    T = tokens.shape[1]
    # verify windows may overhang by up to k rows before rollback
    gen.ensure_capacity(bucket_len(T) + max_new_tokens + k + 1)
    last_logits, cache = gen.prefill(tokens)
    first = jnp.argmax(last_logits[0], axis=-1).astype(jnp.int32)

    hist_len = bucket_len(T + max_new_tokens + k + 1, minimum=64)
    ctx = jnp.zeros((hist_len,), jnp.int32)
    ctx = jax.lax.dynamic_update_slice(
        ctx, tokens[0].astype(jnp.int32), (0,))
    ctx = ctx.at[T].set(first)

    key = ("spec", k, max_new_tokens - 1, hist_len, gen._ntk_alpha, eos_id,
           force_accept)
    if key not in gen._prefill_cache:
        gen._prefill_cache[key] = _spec_loop_fn(
            gen, k, max_new_tokens - 1, hist_len, eos_id,
            force_accept=force_accept)
    run = gen._prefill_cache[key]

    import numpy as np

    if eos_id is not None and int(first) == eos_id:
        toks = np.zeros((0,), np.int32)
        stats = {"iters": 0, "accepted_per_iter": float("nan")}
    else:
        out, out_n, iters = run(gen.params, ctx, jnp.int32(T + 1), first,
                                cache)
        out_n, iters = int(out_n), int(iters)
        toks = np.asarray(out)[:out_n]
        toks = np.concatenate([[int(first)], toks]).astype(np.int32)
        if eos_id is not None and eos_id in toks:
            toks = toks[:list(toks).index(eos_id)]
        stats = {"iters": iters + 1,
                 "accepted_per_iter": out_n / max(iters, 1)}
    if return_stats:
        return toks, stats
    return toks
