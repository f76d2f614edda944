"""Greedy generation with KV cache under jit — prefill/decode split.

The reference's inference is HF ``model.generate`` under VLMEvalKit
(ref: vlmeval/vlm/base.py:99-121 → model/modeling_qwen_opt.py:995-1057); TTFT is
not separately measurable there (SURVEY §5 "tracing: none"). Here prefill and
decode are separate jitted functions with static shapes, so TTFT (= one prefill
dispatch) and decode throughput are measurable by construction — and the decode
loop is a ``lax.while_loop`` on device, avoiding per-token host round trips.

Prompt lengths are bucketed to powers of two to bound recompilation
(SURVEY §7.3 "calibration under jit ... bucketed shapes").
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.llm import DecoderConfig, decoder_forward, init_cache


def bucket_len(n: int, minimum: int = 32) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def w4_resident_mode() -> str:
    """How W4 weights live on device for serving — ``MQUANT_W4_RESIDENT``:

    * ``packed`` — ONE resident copy, split-half packed bytes (+ fused
      shared-input groups when the Pallas GEMV is on). Decode streams the
      packed bytes directly (half the int8 HBM traffic); prefill unpacks
      per-GEMM inside the jit (a transient layer-sized int8 buffer — the
      unpack is ~1.5 VPU ops/byte and amortizes at prefill M). This is the
      default under ``MQUANT_GEMV=pallas_w4``: it removes the 1.5× duplicate-
      weight residency that kept the packed decode path from fitting next to
      the full-VLM span at depth 28 on one 16 GB chip.
    * ``dual`` — int8 resident for prefill PLUS a persistent packed copy for
      decode (1.5× weight memory; the round-3 design, kept for A/B).
    * ``int8`` — int8 resident only; decode loops convert in-jit per fused
      loop (native S4 for the XLA dot, packed bytes for the Pallas GEMV).
    """
    import os

    m = os.environ.get("MQUANT_W4_RESIDENT")
    if m in ("packed", "dual", "int8"):
        return m
    return ("packed" if os.environ.get("MQUANT_GEMV", "xla") == "pallas_w4"
            else "int8")


def prepare_w4_resident(cfg: DecoderConfig, params, specs, mode: str):
    """Apply the configured W4 residency to ``params`` (shared by Generator
    and ServingEngine). Returns params unchanged unless real-mode W4 serving
    with layer storage is active."""
    import os

    if not (mode == "real" and specs and isinstance(params, dict)
            and "layers" in params):
        return params
    resident = w4_resident_mode()
    if resident == "int8":
        return params
    from ..kernels.qmm import pack_w4_sites

    in_dims = {"q": cfg.hidden, "k": cfg.hidden, "v": cfg.hidden,
               "gate": cfg.hidden, "up": cfg.hidden,
               "o": cfg.n_heads * cfg.head_dim, "down": cfg.inter_eff}
    # fuse shared-input groups only for the Pallas GEMV (one launch per
    # group); the XLA decode path re-stores per-site packed bytes as native
    # S4 at the top of each fused loop (s4_squeeze_sites handles packed input)
    fuse = os.environ.get("MQUANT_GEMV", "xla") == "pallas_w4"
    # Under TP, per-site packed storage shards exactly like the int8 layout
    # (w_q rows are in/2 — the Megatron in/out axes divide the same way), but
    # the FUSED concat does not: q|k|v slice boundaries land mid-shard on the
    # tp axis. Keep per-site packing when params arrive sharded.
    if fuse:
        for leaf in jax.tree.leaves(params["layers"]):
            sh = getattr(leaf, "sharding", None)
            if sh is not None and getattr(sh, "num_devices", 1) > 1:
                fuse = False
                break
    packed = jax.jit(functools.partial(pack_w4_sites, specs=specs,
                                       in_dims=in_dims, fuse_groups=fuse))(
        params["layers"])
    if resident == "packed":
        return {**{k: v for k, v in params.items() if k != "layers"},
                "layers": packed}
    return {**params, "layers_packed": packed}  # dual


class Generator:
    """Builds and caches jitted prefill/decode closures for one (cfg, specs, mode)."""

    def __init__(self, cfg: DecoderConfig, params, specs=None, state=None,
                 mode: str = "fp", max_len: int = 512, batch: int = 1,
                 kv_quant: bool = False):
        self.cfg = cfg
        self.params = params
        self.specs = specs or {}
        self.state = state
        self.mode = mode
        self.max_len = max_len
        self.batch = batch
        self.kv_quant = kv_quant  # KV cache quant: False | True/8 (int8) | 4
        self._prefill_cache: Dict[Any, Any] = {}
        self._ntk_alpha = 1.0  # set by prefill(); decode reuses it (ref parity)
        self._maybe_prepack()

    def _maybe_prepack(self):
        self.params = prepare_w4_resident(self.cfg, self.params, self.specs,
                                          self.mode)

    # -- jitted building blocks --------------------------------------------

    def _prefill_fn(self, T: int, ntk_alpha: float = 1.0):
        key = (T, ntk_alpha)
        if key not in self._prefill_cache:
            cfg, specs, state, mode = self.cfg, self.specs, self.state, self.mode

            @jax.jit
            def prefill(params, tokens_or_embeds, cache, positions, length,
                        rope_delta):
                # causality + the true-length limit are both enforced by the
                # prefill_fresh T×T causal attention (padded rows' outputs are
                # discarded and their cache rows overwritten during decode)
                logits, cache2, _ = decoder_forward(
                    cfg, params, tokens_or_embeds, specs=specs, state=state,
                    mode=mode, cache=cache, positions=positions,
                    prefill_fresh=True,  # T×T causal attention + flash path
                    ntk_alpha=ntk_alpha,  # dynamic-NTK from the TRUE length
                    last_index=length - 1)  # TTFT: logits only for the last token
                # cache position advances by the TRUE length, not the padded T
                cache2 = dict(cache2)
                cache2["pos"] = cache["pos"] + length
                # M-RoPE: decode tokens continue at max(position)+1, which for
                # image prompts is ≪ token count (HF rope_deltas parity)
                cache2["rope_delta"] = rope_delta
                return logits, cache2

            self._prefill_cache[key] = prefill
        return self._prefill_cache[key]

    def _decode(self):
        key = ("decode1", self._ntk_alpha)
        if key not in self._prefill_cache:
            cfg, specs, state, mode = self.cfg, self.specs, self.state, self.mode
            alpha = self._ntk_alpha  # decode continues with the prefill's alpha

            @jax.jit
            def step(params, tok, cache, pos_override=None):
                base = jnp.broadcast_to(cache["pos"], (tok.shape[0], 1))
                if "rope_delta" in cache:  # M-RoPE continuation (see prefill)
                    base = base + cache["rope_delta"][:, None]
                positions = pos_override if pos_override is not None else base
                logits, cache2, _ = decoder_forward(
                    cfg, params, tok, specs=specs, state=state, mode=mode,
                    cache=cache, positions=positions, ntk_alpha=alpha)
                return logits, cache2

            self._prefill_cache[key] = step
        return self._prefill_cache[key]

    def _decode_n(self, n_tokens: int, eos_id: Optional[int] = None):
        """On-device greedy decode of n_tokens in ONE jit — no per-token host
        round trips. This is the TPU-native serving loop. With ``eos_id`` the
        loop is a ``lax.while_loop`` carrying a per-row done mask: finished
        rows freeze to eos, and the loop exits as soon as EVERY row has
        terminated — an eos-terminated batch stops paying per-step cost at
        the last real token instead of running to max_new_tokens."""
        key = ("decode_n", n_tokens, self._ntk_alpha, eos_id)
        if key not in self._prefill_cache:
            cfg, specs, state, mode = self.cfg, self.specs, self.state, self.mode
            alpha = self._ntk_alpha
            import os

            w4pack = (mode == "real" and specs
                      and os.environ.get("MQUANT_GEMV", "xla") == "pallas_w4"
                      and os.environ.get("MQUANT_DECODE_W4PACK", "1") == "1")
            s4 = (not w4pack and mode == "real" and specs
                  and os.environ.get("MQUANT_DECODE_S4", "1") == "1")

            @jax.jit
            def decode_n(params, first_tok, cache):
                if "layers_packed" in params:
                    # persistent packed decode cache (built at init)
                    packed = params["layers_packed"]
                    params = {k: v for k, v in params.items()
                              if k != "layers_packed"}
                    params["layers"] = packed
                elif s4 or w4pack:
                    # halve decode weight traffic: W4 sites re-stored once
                    # per fused loop — split-half packed bytes for the Pallas
                    # SWAR GEMV (pack_w4_sites) or native S4 for the XLA
                    # fused-convert dot (s4_squeeze_sites)
                    from ..kernels.qmm import pack_w4_sites, s4_squeeze_sites

                    in_dims = {"q": cfg.hidden, "k": cfg.hidden,
                               "v": cfg.hidden, "gate": cfg.hidden,
                               "up": cfg.hidden,
                               "o": cfg.n_heads * cfg.head_dim,
                               "down": cfg.inter_eff}
                    params = dict(params)
                    params["layers"] = (pack_w4_sites if w4pack
                                        else s4_squeeze_sites)(
                        params["layers"], specs, in_dims)
                B = first_tok.shape[0]
                toks0 = jnp.full((B, n_tokens),
                                 eos_id if eos_id is not None else 0, jnp.int32)

                def step(i, tok, cache, out, done):
                    logits, cache2, _ = decoder_forward(
                        cfg, params, tok, specs=specs, state=state, mode=mode,
                        cache=cache, ntk_alpha=alpha)
                    nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                    if eos_id is not None:
                        nxt = jnp.where(done, jnp.int32(eos_id), nxt)
                        done = done | (nxt == eos_id)
                    out = jax.lax.dynamic_update_slice(out, nxt[:, None],
                                       (jnp.int32(0), jnp.asarray(i, jnp.int32)))
                    return nxt[:, None], cache2, out, done

                done0 = (jnp.zeros((B,), jnp.bool_) if eos_id is None
                         else first_tok[:, 0] == eos_id)
                if eos_id is None:
                    def body(i, carry):
                        tok, cache, out, done = carry
                        return step(i, tok, cache, out, done)

                    _, cache, out, _ = jax.lax.fori_loop(
                        0, n_tokens, body, (first_tok, cache, toks0, done0))
                else:
                    def cond(carry):
                        i, _, _, _, done = carry
                        return (i < n_tokens) & ~jnp.all(done)

                    def body(carry):
                        i, tok, cache, out, done = carry
                        tok, cache, out, done = step(i, tok, cache, out, done)
                        return i + 1, tok, cache, out, done

                    _, _, cache, out, _ = jax.lax.while_loop(
                        cond, body, (jnp.int32(0), first_tok, cache, toks0,
                                     done0))
                return out, cache

            self._prefill_cache[key] = decode_n
        return self._prefill_cache[key]

    def generate_on_device(self, tokens: jax.Array, max_new_tokens: int = 32,
                           positions=None,
                           eos_id: Optional[int] = None) -> jax.Array:
        """Greedy generation with the WHOLE decode loop on device. With
        ``eos_id``, rows past their eos are frozen to eos (trim host-side);
        the on-device loop exits early once all rows are done."""
        self.ensure_capacity(tokens.shape[1] + max_new_tokens)
        last_logits, cache = self.prefill(tokens, positions=positions)
        first = jnp.argmax(last_logits, axis=-1)[:, None].astype(jnp.int32)
        out, _ = self._decode_n(max_new_tokens - 1, eos_id)(
            self.params, first, cache)
        return jnp.concatenate([first, out], axis=1)

    # -- public API ---------------------------------------------------------

    def ensure_capacity(self, n: int):
        """Grow the KV cache to hold at least ``n`` positions. jit closures
        retrace automatically on the new cache shapes; callers that know the
        prompt+decode budget (e.g. VLMRunner) call this up front so a long
        chat-templated prompt never overflows a small default cache.

        Growth is sticky: one long request raises ``max_len`` for all later
        requests on this Generator (they then pay the wider decode-attention
        mask). For mixed long/short serving, use separate Generators per
        length class, call :meth:`reset_capacity` between phases, or use the
        slot-pool ``ServingEngine`` (fixed ``max_len`` by construction)."""
        if n > self.max_len:
            self.max_len = bucket_len(n)

    def reset_capacity(self, n: int = 32):
        """Shrink ``max_len`` back down (undo sticky growth) so later short
        requests stop paying a long past request's decode-attention width.
        Cached closures key on cache shapes, so subsequent calls simply
        retrace at the smaller size; in-flight caches are unaffected."""
        self.max_len = bucket_len(max(n, 32))

    def prefill(self, tokens_or_embeds: jax.Array, positions=None
                ) -> Tuple[jax.Array, Dict]:
        """Run (padded) prefill; returns (last-token logits, cache)."""
        B, T = tokens_or_embeds.shape[:2]
        length = T
        # rope_delta from the UNPADDED positions: max over the true region
        # (edge-padded positions repeat the last value so a later max would be
        # fine too, but default arange positions cover the padded bucket)
        if positions is not None:
            axes = (0, -1) if positions.ndim == 3 else (-1,)
            pmax = jnp.max(positions, axis=axes)
            rope_delta = (pmax.astype(jnp.int32) + 1
                          - jnp.asarray(length, jnp.int32))
            rope_delta = jnp.broadcast_to(rope_delta.reshape(-1), (B,))
        else:
            rope_delta = jnp.zeros((B,), jnp.int32)
        Tb = bucket_len(T)
        self.ensure_capacity(Tb)  # prefill writes Tb cache rows
        pad = Tb - T
        if pad:
            if tokens_or_embeds.ndim == 2:
                tokens_or_embeds = jnp.pad(tokens_or_embeds, ((0, 0), (0, pad)))
            else:
                tokens_or_embeds = jnp.pad(
                    tokens_or_embeds, ((0, 0), (0, pad), (0, 0)))
            if positions is not None:
                widen = [(0, 0)] * (positions.ndim - 1) + [(0, pad)]
                positions = jnp.pad(positions, widen, mode="edge")
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(Tb)[None], (B, Tb))
        cache = init_cache(self.cfg, B, self.max_len, quantized=self.kv_quant)
        from ..models.llm import ntk_alpha_for

        # dynamic-NTK alpha from the TRUE prompt length (ref computes it from
        # kv_seq_len at prefill, modeling_qwen_opt.py:696-707); cached on self
        # so subsequent decode steps continue with the same theta
        self._ntk_alpha = ntk_alpha_for(self.cfg, T)
        logits, cache = self._prefill_fn(Tb, self._ntk_alpha)(
            self.params, tokens_or_embeds, cache, positions,
            jnp.asarray(length, jnp.int32), rope_delta)
        return logits[:, 0], cache

    def prefill_chunked(self, tokens_or_embeds: jax.Array, chunk: int = 2048,
                        max_new_tokens: int = 128) -> Tuple[jax.Array, Dict]:
        """Prefill a long prompt in fixed-size chunks: each chunk attends to
        the KV cache written so far plus itself (the auto causal-with-offset
        mask), bounding peak attention memory at O(chunk·T) instead of O(T²)
        and reusing one compiled step for arbitrarily long prompts. Each
        chunk computes logits only for its last token (last_index), so the
        T×vocab lm_head GEMM never runs over interior positions. Returns
        (last-token logits, cache) like :meth:`prefill`.

        Pass the decode budget you actually plan as ``max_new_tokens``: the
        returned cache is allocated at its final size, so a decode LONGER
        than this reserve would silently clamp KV writes onto the last cache
        row (``ensure_capacity`` after the fact cannot grow an allocated
        cache)."""
        from ..models.llm import ntk_alpha_for

        B, T = tokens_or_embeds.shape[:2]
        self.ensure_capacity(T + max_new_tokens)
        self._ntk_alpha = ntk_alpha_for(self.cfg, T)
        alpha = self._ntk_alpha
        key = ("chunk", chunk, alpha)
        if key not in self._prefill_cache:
            cfg, specs, state, mode = self.cfg, self.specs, self.state, self.mode

            @jax.jit
            def step(params, piece, cache):
                Tp = piece.shape[1]
                logits, cache2, _ = decoder_forward(
                    cfg, params, piece, specs=specs, state=state, mode=mode,
                    cache=cache, ntk_alpha=alpha,
                    last_index=jnp.asarray(Tp - 1, jnp.int32))
                return logits, cache2

            self._prefill_cache[key] = step
        step = self._prefill_cache[key]

        cache = init_cache(self.cfg, B, self.max_len, quantized=self.kv_quant)
        logits = None
        for c0 in range(0, T, chunk):
            # a non-multiple tail chunk retraces once for its shorter shape
            piece = tokens_or_embeds[:, c0:c0 + chunk]
            logits, cache = step(self.params, piece, cache)
        return logits[:, -1], cache

    def generate_batch(self, seqs, max_new_tokens: int = 32,
                       eos_id: Optional[int] = None, positions=None):
        """Ragged batched greedy generation: DIFFERENT-length prompts served
        in one batch. Prompts are LEFT-padded to a shared bucket; pad columns
        are masked out of attention for both prefill and decode, and RoPE is
        relative, so each row's uniform position shift cancels in the
        attention logits — every sequence decodes exactly as it would alone.
        Returns a list of per-sequence generated token lists (eos-trimmed).

        ``positions``: optional per-row position ids — (T_i,) or M-RoPE
        (3, T_i) / (3, 1, T_i) arrays. Left-padding shifts each row's
        positions uniformly, and M-RoPE is relative per plane, so the same
        masking argument holds: each row's 3-plane ids are shifted by its
        start column, the left pad is edge-filled (masked out of attention
        anyway), and decode continues at that row's max(position)+1 via a
        per-row rope_delta (HF get_rope_index parity).

        Qwen-VL dynamic NTK: each row derives ITS alpha from ITS OWN prompt
        length (ref: modeling_qwen_opt.py:696-707), passed to the compiled
        functions as a (B,) DATA vector (engine parity, ``serve/engine.py``)
        — no per-alpha recompilation, and a short row batched with a long
        one keeps exactly its solo RoPE theta."""
        import numpy as np

        from ..models.llm import ntk_alpha_for

        B = len(seqs)
        # each entry: a token id list/array (T,) OR an embeds array (1|0,T,H)
        embeds_mode = hasattr(seqs[0], "ndim") and seqs[0].ndim >= 2
        lens = [int(s.shape[-2]) if embeds_mode else len(s) for s in seqs]
        Lmax = max(lens)
        Tb = bucket_len(Lmax)
        self.ensure_capacity(Tb + max_new_tokens)
        starts = np.asarray([Tb - n for n in lens], np.int32)

        pos_b = None
        rope_delta = None
        if positions is not None:
            pos_b = np.zeros((3, B, Tb), np.int64)
            rope_delta = np.zeros((B,), np.int32)
            for i, p in enumerate(positions):
                if p is None:
                    p = np.broadcast_to(np.arange(lens[i])[None],
                                        (3, lens[i]))
                p = np.asarray(p)
                if p.ndim == 1:
                    p = np.broadcast_to(p[None], (3, p.shape[-1]))
                elif p.ndim == 3:
                    p = p[:, 0]  # (3, 1, T) → (3, T)
                s = int(starts[i])
                pos_b[:, i, s:] = p + s
                pos_b[:, i, :s] = p[:, :1] + s  # edge fill (masked columns)
                rope_delta[i] = int(p.max()) + 1 + s - Tb
        if embeds_mode:
            Hd = seqs[0].shape[-1]
            toks = np.zeros((B, Tb, Hd), np.float32)
            for i, s in enumerate(seqs):
                toks[i, Tb - lens[i]:] = np.asarray(
                    s.reshape(lens[i], Hd), np.float32)
            # decoder_forward casts embeds to cfg.dtype on device
        else:
            toks = np.zeros((B, Tb), np.int64)
            for i, s in enumerate(seqs):
                toks[i, Tb - lens[i]:] = np.asarray(s)
        r = np.arange(Tb)
        pre_mask = ((r[None, :, None] >= r[None, None, :])
                    & (r[None, None, :] >= starts[:, None, None]))
        # per-row dynamic-NTK alpha as (B,) DATA (rope_tables broadcasts a
        # vector alpha into per-row tables); scalar consumers (speculative
        # history replay) still see the batch-max alpha. Families without
        # dynamic NTK (all but Qwen-VL — incl. the M-RoPE Qwen2-VL, whose
        # rope_tables rejects vector alpha) keep the scalar 1.0.
        self._ntk_alpha = ntk_alpha_for(self.cfg, Lmax)
        alpha_vec = (jnp.asarray([ntk_alpha_for(self.cfg, n) for n in lens],
                                 jnp.float32)
                     if self.cfg.use_dynamic_ntk else 1.0)

        key = ("ragged_perrow", Tb, pos_b is not None)
        if key not in self._prefill_cache:
            cfg, specs, state, mode = self.cfg, self.specs, self.state, self.mode
            with_pos = pos_b is not None

            @jax.jit
            def prefill_ragged(params, toks, cache, attn_mask, alpha,
                               pos=None, rope_delta=None):
                T = toks.shape[1]
                logits, cache2, _ = decoder_forward(
                    cfg, params, toks, specs=specs, state=state, mode=mode,
                    cache=cache, prefill_fresh=True, attn_mask=attn_mask,
                    ntk_alpha=alpha, positions=pos,
                    last_index=jnp.asarray(T - 1, jnp.int32))
                if with_pos:
                    # per-row M-RoPE continuation: decode resumes at this
                    # row's max(position)+1, not at the shared column count
                    cache2 = dict(cache2)
                    cache2["rope_delta"] = rope_delta
                return logits, cache2  # pos advanced by T (rows are aligned)

            self._prefill_cache[key] = prefill_ragged
        prefill_ragged = self._prefill_cache[key]

        nkey = ("decode_n_ragged_perrow", max_new_tokens - 1, eos_id)
        if nkey not in self._prefill_cache:
            cfg, specs, state, mode = self.cfg, self.specs, self.state, self.mode
            import os

            w4pack = (mode == "real" and specs
                      and os.environ.get("MQUANT_GEMV", "xla") == "pallas_w4"
                      and os.environ.get("MQUANT_DECODE_W4PACK", "1") == "1")
            s4 = (not w4pack and mode == "real" and specs
                  and os.environ.get("MQUANT_DECODE_S4", "1") == "1")

            @jax.jit
            def decode_n_ragged(params, first_tok, cache, starts, alpha):
                if "layers_packed" in params:
                    packed = params["layers_packed"]
                    params = {k: v for k, v in params.items()
                              if k != "layers_packed"}
                    params["layers"] = packed
                elif s4 or w4pack:
                    # same decode weight-stream halving as decode_n: W4
                    # sites re-stored once per fused loop (packed bytes for
                    # the Pallas SWAR GEMV / native S4 for the XLA dot)
                    from ..kernels.qmm import pack_w4_sites, s4_squeeze_sites

                    in_dims = {"q": cfg.hidden, "k": cfg.hidden,
                               "v": cfg.hidden, "gate": cfg.hidden,
                               "up": cfg.hidden,
                               "o": cfg.n_heads * cfg.head_dim,
                               "down": cfg.inter_eff}
                    params = dict(params)
                    params["layers"] = (pack_w4_sites if w4pack
                                        else s4_squeeze_sites)(
                        params["layers"], specs, in_dims)
                nB = first_tok.shape[0]
                toks0 = jnp.full((nB, max_new_tokens - 1),
                                 eos_id if eos_id is not None else 0, jnp.int32)

                def step(i, tok, cache, out, done):
                    logits, cache2, _ = decoder_forward(
                        cfg, params, tok, specs=specs, state=state, mode=mode,
                        cache=cache, attn_start=starts, ntk_alpha=alpha)
                    nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                    if eos_id is not None:
                        nxt = jnp.where(done, jnp.int32(eos_id), nxt)
                        done = done | (nxt == eos_id)
                    out = jax.lax.dynamic_update_slice(out, nxt[:, None],
                                       (jnp.int32(0), jnp.asarray(i, jnp.int32)))
                    return nxt[:, None], cache2, out, done

                done0 = (jnp.zeros((nB,), jnp.bool_) if eos_id is None
                         else first_tok[:, 0] == eos_id)
                if eos_id is None:
                    def body(i, carry):
                        tok, cache, out, done = carry
                        return step(i, tok, cache, out, done)

                    _, cache, out, _ = jax.lax.fori_loop(
                        0, max_new_tokens - 1, body,
                        (first_tok, cache, toks0, done0))
                else:
                    # eos early-exit: per-row done mask freezes finished rows;
                    # the whole batch stops once every row has terminated
                    def cond(carry):
                        i, _, _, _, done = carry
                        return (i < max_new_tokens - 1) & ~jnp.all(done)

                    def body(carry):
                        i, tok, cache, out, done = carry
                        tok, cache, out, done = step(i, tok, cache, out, done)
                        return i + 1, tok, cache, out, done

                    _, _, cache, out, _ = jax.lax.while_loop(
                        cond, body, (jnp.int32(0), first_tok, cache, toks0,
                                     done0))
                return out

            self._prefill_cache[nkey] = decode_n_ragged
        decode_n_ragged = self._prefill_cache[nkey]

        cache = init_cache(self.cfg, B, self.max_len, quantized=self.kv_quant)
        starts_d = jnp.asarray(starts)
        if pos_b is not None:
            logits, cache = prefill_ragged(
                self.params, jnp.asarray(toks), cache,
                jnp.asarray(pre_mask[:, None]), alpha_vec,
                jnp.asarray(pos_b), jnp.asarray(rope_delta))
        else:
            logits, cache = prefill_ragged(self.params, jnp.asarray(toks),
                                           cache,
                                           jnp.asarray(pre_mask[:, None]),
                                           alpha_vec)
        tok = jnp.argmax(logits[:, -1], axis=-1)[:, None].astype(jnp.int32)
        outs = [[int(t)] for t in np.asarray(tok[:, 0])]
        if max_new_tokens > 1:
            # production path: the whole decode loop fused on device (with or
            # without eos — the fused loop handles early exit itself)
            rest = np.asarray(decode_n_ragged(self.params, tok, cache,
                                              starts_d, alpha_vec))
            for i in range(B):
                outs[i] += [int(t) for t in rest[i]]
        if eos_id is not None:
            outs = [o[:o.index(eos_id)] if eos_id in o else o for o in outs]
        return outs

    def generate(self, tokens: jax.Array, max_new_tokens: int = 32,
                 eos_id: Optional[int] = None, positions=None):
        """Greedy decode. Returns (B, <=max_new_tokens) int32 array."""
        self.ensure_capacity(tokens.shape[1] + max_new_tokens)
        last_logits, cache = self.prefill(tokens, positions=positions)
        step = self._decode()
        tok = jnp.argmax(last_logits, axis=-1)[:, None].astype(jnp.int32)
        out = [tok]
        for _ in range(max_new_tokens - 1):
            logits, cache = step(self.params, tok, cache)
            tok = jnp.argmax(logits[:, -1], axis=-1)[:, None].astype(jnp.int32)
            out.append(tok)
            if eos_id is not None and bool((tok == eos_id).all()):
                break
        return jnp.concatenate(out, axis=1)


def _force(x) -> float:
    """Force completion by fetching one scalar. On remote-tunnel backends
    ``block_until_ready`` does not actually wait for execution, and repeated
    identical (fn, args) calls are memoized — timing code must fetch a value
    and vary its inputs."""
    import numpy as np

    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def measure_ttft(gen: Generator, tokens: jax.Array, iters: int = 5) -> float:
    """Median wall-clock prefill latency in seconds (after warmup compile).
    Each iteration uses distinct tokens to defeat any dispatch memoization.

    NOTE: on the tunnel backend each dispatch carries ~30 ms of HTTP RTT that
    is an artifact of this dev environment, not of the model — use
    :func:`measure_ttft_chained` for the model-latency component."""
    import time

    logits, cache = gen.prefill(tokens)
    _force(logits)
    times = []
    for i in range(iters):
        toks_i = (tokens + i + 1) % 100 + 1
        t0 = time.perf_counter()
        logits, _ = gen.prefill(toks_i)
        _force(logits)
        times.append(time.perf_counter() - t0)
    # min, not median: the runtime adds large one-off warmup spikes (first
    # execution of a program after load can be ~3× slow); noise is additive
    return min(times)


def measure_ttft_chained(gen: Generator, tokens: jax.Array, chain: int = 8,
                         iters: int = 3) -> float:
    """Model-latency prefill time: CHAIN full prefills (incl. KV-cache write)
    executed inside ONE jit, divided by chain — excludes per-dispatch host/RTT
    overhead, which on the tunneled dev chip (~30 ms) would otherwise swamp
    the model difference being measured. Each chained prefill feeds the next's
    tokens (data-dependent, so none can be elided)."""
    import time

    import jax as _jax

    cfg, specs, state, mode = gen.cfg, gen.specs, gen.state, gen.mode
    B, T = tokens.shape
    kv_quant = gen.kv_quant

    @_jax.jit
    def f(params, toks):
        def body(i, carry):
            acc, toks = carry
            cache = init_cache(cfg, B, gen.max_len, quantized=kv_quant)
            logits, cache2, _ = decoder_forward(
                cfg, params, toks, specs=specs, state=state, mode=mode,
                cache=cache, prefill_fresh=True,
                last_index=jnp.asarray(T - 1, jnp.int32))
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            toks = toks.at[:, 0].set(nxt[0] % 1000 + 1)
            return acc + nxt, toks

        acc, _ = jax.lax.fori_loop(0, chain, body,
                                   (jnp.zeros((B,), jnp.int32), toks))
        return acc

    r = f(gen.params, tokens)
    _force(r)
    best = float("inf")
    for i in range(iters):
        t0 = time.perf_counter()
        r = f(gen.params, (tokens + i + 1) % 1000 + 1)
        _force(r)
        best = min(best, time.perf_counter() - t0)
    return best / chain


def measure_request(gen: Generator, tokens: jax.Array, gen_tokens: int = 128,
                    iters: int = 3) -> float:
    """Measured end-to-end serving request latency: ONE wall-clock span over
    prefill + ``gen_tokens`` greedy decode (the on-device fused loop), forced
    at the end. Two dispatches → ~60 ms of dev-tunnel HTTP RTT rides along
    (noted by callers; a production host pays µs). Distinct tokens per iter
    defeat dispatch memoization; best-of-N drops the runtime's warmup spikes."""
    import time

    out = gen.generate_on_device(tokens, max_new_tokens=gen_tokens)  # compile
    _force(out)
    best = float("inf")
    for i in range(iters):
        toks_i = (tokens + i + 1) % 100 + 1
        t0 = time.perf_counter()
        out = gen.generate_on_device(toks_i, max_new_tokens=gen_tokens)
        _force(out)
        best = min(best, time.perf_counter() - t0)
    return best


def measure_decode_tps(gen: Generator, tokens: jax.Array, n_tokens: int = 64,
                       on_device: bool = True) -> float:
    """Decode throughput (tokens/s) after prefill, excluding compile.

    on_device=True measures the production serving loop (all steps fused in one
    jit); False measures the host-driven per-token loop (interactive mode)."""
    import time

    last_logits, cache = gen.prefill(tokens)
    tok = jnp.argmax(last_logits, axis=-1)[:, None].astype(jnp.int32)
    if on_device:
        dec = gen._decode_n(n_tokens)
        out, _ = dec(gen.params, tok, cache)  # warmup compile
        _force(out)
        best = float("inf")
        for i in range(3):  # best-of-3: one-off runtime warmup spikes are ~3×
            t0 = time.perf_counter()
            out, _ = dec(gen.params, (tok + 1 + i) % 100, cache)
            _force(out)
            best = min(best, time.perf_counter() - t0)
        return n_tokens * tokens.shape[0] / best
    step = gen._decode()
    logits, cache2 = step(gen.params, tok, cache)  # warmup compile
    _force(logits)
    t0 = time.perf_counter()
    for _ in range(n_tokens):
        logits, cache = step(gen.params, tok, cache)
        tok = jnp.argmax(logits[:, -1], axis=-1)[:, None].astype(jnp.int32)
    _force(tok)
    dt = time.perf_counter() - t0
    return n_tokens * tokens.shape[0] / dt
