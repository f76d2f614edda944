"""Continuous-batching serving engine: slot-based KV cache, admit-on-the-fly.

The reference serves requests one generate() call at a time (ref:
vlmeval/vlm/base.py:99-121 — HF generate under VLMEvalKit, no batching, no
scheduler; SURVEY §1 "no separate serving stack"). This engine is the
TPU-native production counterpart: a fixed pool of B cache SLOTS over one
compiled decode step, with vLLM-style continuous batching — requests join
and leave the running batch at fused-block boundaries instead of waiting
for the whole batch to finish.

TPU-first design (everything static-shaped, two compiled programs total):

  * The KV cache is one (L, B, S, KVH, hd) pytree whose ``pos`` is a (B,)
    VECTOR: every row is an independent request at its own write offset
    (``models/llm.py`` per-row ``dynamic_update_slice`` + per-row causal
    mask). No re-padding, no cache shuffling when the batch composition
    changes — admission writes one row, retirement just frees the slot id.
  * Admission: the prompt is prefilled as a B=1 ``prefill_fresh`` call
    (bucketed length → handful of compiles) and its cache row is inserted
    into the pool with one ``dynamic_update_slice`` at the slot index;
    ``pos[slot]`` and ``rope_delta[slot]`` are set functionally.
  * Decode: ONE fused ``steps_per_block``-step ``fori_loop`` over the whole
    pool per host round trip — the scheduler touches the host only at block
    boundaries (admit/retire decisions), so tunnel/dispatch RTT is amortized
    ``steps_per_block``× while latency to admit a new request is bounded by
    one block.
  * Finished rows freeze (their argmax is replaced by pad) and their ``pos``
    stops advancing, so an idle slot costs attention-mask width but never
    corrupts, and the row is fully overwritten at the next admission.
  * Prefix caching: ``register_prefix`` prefills a shared system prompt once
    and stores its KV row; matching requests prefill only their suffix
    against a copy of that row (same causal-with-offset mask — exact).
  * Chunked admission (``admit_chunk > 0``): a long prompt prefills in
    fixed-size pieces, ONE piece per scheduler tick, so admitting it never
    stalls the running pool's decode for more than one chunk's latency.

Per-request dynamic-NTK alpha (Qwen-VL long context): under
``cfg.use_dynamic_ntk`` every admission derives ITS alpha from ITS prompt
length (ref: modeling_qwen_opt.py:696-707) and the decode/speculative blocks
take the pool's (B,) alpha vector as DATA — per-row rope tables inside one
compiled block (``models/llm.py rope_tables``), so a long-prompt request and
a short one decode together exactly, with no per-alpha recompilation.
Prefix-cache rows record the alpha their K rows were embedded with and only
match requests at the same alpha.
"""

from __future__ import annotations

import dataclasses
import functools
from collections import deque
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llm import DecoderConfig, decoder_forward, init_cache
from .generate import bucket_len


@dataclasses.dataclass
class _Request:
    rid: int
    tokens_or_embeds: Any  # (T,) ids or (T, H) embeds
    max_new_tokens: int
    positions: Any = None  # optional (T,) or M-RoPE (3, T) position ids
    out: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    slot: int = -1
    next_tok: int = 0  # next token to feed (the last emitted one)
    draft_ids: Any = None  # embeds prompts: known token ids for drafting
    temperature: float = 0.0  # 0 = greedy; >0 samples (needs sample_top_k)
    top_p: float = 1.0
    seed: int = 0  # per-request sampling seed (schedule-independent replay)
    presence_penalty: float = 0.0  # subtract from logits of seen tokens
    frequency_penalty: float = 0.0  # ... scaled by occurrence count
    lps: List[float] = dataclasses.field(default_factory=list)  # logprobs


@dataclasses.dataclass
class _Admitting:
    """A long prompt mid-admission: its scratch cache row + prefill cursor.
    One chunk advances per scheduler tick, so a long prompt never stalls the
    decode pool for more than one chunk's latency (vLLM's chunked-prefill
    admission policy, rebuilt on static shapes)."""
    req: _Request
    slot: int
    row: Dict  # B=1 cache at engine max_len, pos = tokens prefilled so far
    cursor: int  # next prompt index to feed
    first_logits: Any = None  # last chunk's last-token logits


class ServingEngine:
    """Slot-based continuous-batching greedy server over one decoder.

    >>> eng = ServingEngine(cfg, params, slots=4, max_len=256)
    >>> ra = eng.submit(prompt_a, max_new_tokens=32)
    >>> rb = eng.submit(prompt_b, max_new_tokens=8)
    >>> outs = eng.run()          # {rid: [tok, ...]}, continuous batching
    """

    def __init__(self, cfg: DecoderConfig, params, specs=None, state=None,
                 mode: str = "fp", slots: int = 4, max_len: int = 512,
                 kv_quant: bool = False, eos_id: Optional[int] = None,
                 steps_per_block: int = 8, ntk_alpha: float = 1.0,
                 admit_chunk: int = 0, spec_k: int = 0,
                 sample_top_k: int = 0, seed: int = 0,
                 admit_batch_tokens: int = 4096):
        self.cfg = cfg
        self.params = params
        self.specs = specs or {}
        self.state = state
        self.mode = mode
        self.slots = slots
        self.max_len = max_len
        self.kv_quant = kv_quant
        self.eos_id = eos_id
        self.steps_per_block = steps_per_block
        self.ntk_alpha = ntk_alpha
        # cap on a batched admission prefill's padded (k × Tb) token count:
        # bounds the prefill's activation memory next to the resident
        # weights (k is additionally bucketed to 1/2/4/8 per compiled size)
        self.admit_batch_tokens = admit_batch_tokens
        # per-request dynamic NTK (Qwen-VL): each slot carries its own alpha,
        # derived from ITS prompt length at admission (ref parity:
        # modeling_qwen_opt.py:696-707 computes alpha per request); the decode
        # block takes the (B,) vector as DATA (per-row rope tables in
        # models/llm.py rope_tables), so one compiled block serves any mix.
        self._dyn = bool(getattr(cfg, "use_dynamic_ntk", False))
        self.alphas = np.full((slots,), float(ntk_alpha), np.float32)
        # >0: prompts longer than this prefill in admit_chunk pieces, one
        # piece per scheduler tick, so admission never stalls the decode
        # pool longer than one chunk (chunked-prefill admission)
        self.admit_chunk = admit_chunk
        self._jit: Dict[Any, Any] = {}
        self._queue: deque[_Request] = deque()
        self._active: List[Optional[_Request]] = [None] * slots
        self._admitting: Optional[_Admitting] = None
        # registered shared prefixes (system prompts): list of
        # (ids tuple, device cache row with pos=len) — longest match wins
        self._prefixes: List[Any] = []
        self.prefix_hits = 0
        self._next_rid = 0
        self._requests: Dict[int, _Request] = {}  # rid → request (all states)
        # the decode attention streams the whole KV BUFFER every step
        # (models/llm.py: k_all is the full cache), so max_len is a CAP, not
        # the allocation: the buffer starts at a small bucket and grows to
        # the bucketed high-water mark of admitted work (_grow). Each new
        # bucket retraces the admit/block jits once (persisted by the
        # compile cache); the steady-state decode then streams only
        # ceil(need/256)*256 rows instead of max_len.
        self.cache = init_cache(cfg, slots, self._cache_bucket(256),
                                quantized=kv_quant)
        self.cache["pos"] = jnp.zeros((slots,), jnp.int32)
        self.cache["rope_delta"] = jnp.zeros((slots,), jnp.int32)
        # spec_k > 0: decode blocks run BATCHED self-speculative rounds —
        # per-slot n-gram drafts over an on-device token history, one
        # (B, k+1) verify forward, per-row acceptance + pos rollback. Each
        # round emits 1..k+1 tokens per active row; outputs stay exactly
        # the per-slot greedy sequences (see serve/speculative.py for the
        # single-request form and the rollback-correctness argument).
        self.spec_k = spec_k
        if spec_k:
            cap = max_len + spec_k + 1
            self.hist = jnp.zeros((slots, cap), jnp.int32)
            self.hist_len = jnp.zeros((slots,), jnp.int32)
        # sample_top_k > 0 compiles the sampling epilogue into admissions and
        # decode blocks: per-row temperature/top_p (a pool can mix greedy and
        # sampled rows), Gumbel-max over the static top-k slice, seed-keyed
        # determinism. Mutually exclusive with spec_k (the draft-verify
        # exactness argument is greedy-specific).
        self.sample_top_k = sample_top_k
        self.seed = seed
        assert not (sample_top_k and spec_k), \
            "sampling and speculative decoding are mutually exclusive"
        if sample_top_k:
            # per-slot token-occurrence counts (prompt + emitted) for
            # presence/frequency penalties — (B, V) int32 lives on device,
            # updated inside the block, row overwritten at admission
            self.tok_counts = jnp.zeros((slots, cfg.vocab), jnp.int32)
        self._block_ctr = 0
        self._force_accept = False  # ceiling instrument (bench only)
        # acceptance accounting: emitted tokens / (active rows × rounds)
        self.spec_emitted = 0
        self.spec_row_rounds = 0
        # decode blocks re-store W4 sites as native S4 INSIDE the block jit
        # (same storage + kernel path as the serial fused loop, so outputs
        # match `generate_on_device`; S4 cannot cross the jit boundary)
        import os

        self._w4pack = (mode == "real" and bool(specs)
                        and os.environ.get("MQUANT_GEMV", "xla") == "pallas_w4"
                        and os.environ.get("MQUANT_DECODE_W4PACK", "1") == "1")
        self._s4 = (not self._w4pack and mode == "real" and bool(specs)
                    and os.environ.get("MQUANT_DECODE_S4", "1") == "1")
        # W4 residency (single packed copy by default under the Pallas GEMV;
        # see generate.w4_resident_mode). The in-block s4/w4pack conversions
        # above become no-ops on already-packed storage.
        from .generate import prepare_w4_resident

        self.params = prepare_w4_resident(cfg, self.params, specs, mode)

    # -- public API ---------------------------------------------------------

    def submit(self, tokens_or_embeds, max_new_tokens: int = 32,
               positions=None, draft_ids=None, temperature: float = 0.0,
               top_p: float = 1.0, seed: Optional[int] = None,
               presence_penalty: float = 0.0,
               frequency_penalty: float = 0.0) -> int:
        """Queue a request. ``tokens_or_embeds``: (T,) int ids or (T, H)
        spliced embeds (VLM prompts). ``positions``: optional per-token
        position ids — (T,) or M-RoPE (3, T)/(3, 1, T) (image prompts);
        decode continues at max(position)+1 per row (HF rope_deltas parity).
        ``draft_ids``: optional token ids of an embeds prompt (the VLM
        runner knows them even though it submits embeds) — with ``spec_k``
        they seed the slot's n-gram history so drafts can copy from the
        prompt (OCR / document-QA answers largely quote their context).
        Returns a request id."""
        arr = np.asarray(tokens_or_embeds)
        assert arr.ndim in (1, 2), arr.shape
        T = arr.shape[0]
        # chunked admission writes bounded pieces, so only the true rows
        # must fit; whole-prompt admission also writes the padded bucket;
        # speculation's verify windows overhang by up to spec_k rows before
        # rollback (a clamped window write would corrupt valid rows)
        need = (T + max_new_tokens if self.admit_chunk
                else max(T + max_new_tokens, bucket_len(T, 16)))
        need += self.spec_k
        assert need <= self.max_len, (
            f"prompt {T} + decode {max_new_tokens} exceeds engine max_len "
            f"{self.max_len}")
        self._grow(need)
        if positions is not None:
            positions = np.asarray(positions)
            if positions.ndim == 1:
                positions = np.broadcast_to(positions[None], (3, T))
            elif positions.ndim == 3:
                positions = positions[:, 0]
            assert positions.shape == (3, T), positions.shape
        if temperature > 0 or presence_penalty or frequency_penalty:
            assert self.sample_top_k > 0, \
                "sampling/penalties need ServingEngine(sample_top_k=...)"
        # sampling noise is keyed by (request seed, emitted index) ONLY, so
        # an explicit seed replays the same tokens under any pool schedule;
        # the default derives from (engine seed, rid) — deterministic for a
        # fixed submission order
        rseed = (int(seed) if seed is not None
                 else (self.seed * 1000003 + self._next_rid * 7919)
                 & 0x7FFFFFFF)
        r = _Request(self._next_rid, arr, max_new_tokens, positions=positions,
                     draft_ids=None if draft_ids is None
                     else np.asarray(draft_ids, np.int32).reshape(-1),
                     temperature=float(temperature), top_p=float(top_p),
                     seed=rseed, presence_penalty=float(presence_penalty),
                     frequency_penalty=float(frequency_penalty))
        self._next_rid += 1
        self._queue.append(r)
        self._requests[r.rid] = r
        return r.rid

    def warmup(self, prompt_lens=(16, 64, 256), embeds: bool = False,
               with_positions: bool = False) -> None:
        """Precompile (admission buckets + decode block) so the first real
        requests don't pay XLA compile latency (seconds on TPU). Executes
        the jits once on THROWAWAY cache copies (jit caches populate on
        call; the functions donate their cache arguments), then discards
        every result — engine state is untouched."""
        z = jnp.zeros((), jnp.int32)
        for T in prompt_lens:
            Tb = bucket_len(int(T), minimum=16)
            if Tb + self.spec_k > self.max_len:
                continue
            self._grow(Tb + self.spec_k)  # scratch rows must hold the bucket
            admit = self._prefill_insert_fn(Tb, embeds, with_positions)
            prompt = (jnp.zeros((1, Tb, self.cfg.hidden), jnp.float32)
                      if embeds else jnp.zeros((1, Tb), jnp.int64))
            kw = {}
            if with_positions:
                kw["pos"] = jnp.zeros((3, 1, Tb), jnp.int32)
                kw["rope_delta"] = z
            scratch = jax.tree.map(jnp.copy, self.cache)
            admit(self.params, prompt, jnp.ones((), jnp.int32), scratch,
                  z, jnp.float32(self.ntk_alpha), **kw)
            # batched-admission sizes this pool can dispatch for the bucket
            # (concurrent same-bucket bursts admit as ONE (k, Tb) prefill;
            # without warming them the first burst compiles mid-serving)
            max_k = max(1, self.admit_batch_tokens // Tb)
            cap = min(8, 1 << (max_k.bit_length() - 1))
            k = 2
            # a size-k batch dispatches when a chunk of (k/2, k] members
            # fits the pool, i.e. while k/2 < slots (chunks never exceed
            # free slots, but the 1/2/4/8 rounding can exceed them)
            while k <= cap and k // 2 < self.slots:
                admit_n = self._prefill_insert_multi_fn(Tb, k, embeds,
                                                        with_positions)
                kn = {}
                if with_positions:
                    kn["pos"] = jnp.zeros((3, k, Tb), jnp.int32)
                    kn["rope_deltas"] = jnp.zeros((k,), jnp.int32)
                scratch = jax.tree.map(jnp.copy, self.cache)
                admit_n(self.params,
                        jnp.zeros((k, Tb, self.cfg.hidden), jnp.float32)
                        if embeds else jnp.zeros((k, Tb), jnp.int64),
                        jnp.ones((k,), jnp.int32), scratch,
                        jnp.arange(k, dtype=jnp.int32),
                        jnp.full((k,), self.ntk_alpha, jnp.float32), **kn)
                k *= 2
        tok = jnp.zeros((self.slots, 1), jnp.int32)
        active = jnp.zeros((self.slots,), bool).at[0].set(True)
        scratch = jax.tree.map(jnp.copy, self.cache)
        if self.spec_k:
            blk = self._spec_block_fn(self.steps_per_block)
            blk(self.params, tok, active, scratch, jnp.copy(self.hist),
                jnp.copy(self.hist_len),
                jnp.full((self.slots,), 4, jnp.int32))
        elif self.sample_top_k:
            blk = self._decode_block_fn(self.steps_per_block)
            blk(self.params, tok, active, scratch,
                bkey=jax.random.key(0),
                temp=jnp.zeros((self.slots,), jnp.float32),
                top_p=jnp.ones((self.slots,), jnp.float32),
                seeds=jnp.zeros((self.slots,), jnp.int32),
                counts=jnp.zeros((self.slots,), jnp.int32),
                pres=jnp.zeros((self.slots,), jnp.float32),
                freq=jnp.zeros((self.slots,), jnp.float32),
                tok_counts=jnp.copy(self.tok_counts))
        else:
            blk = self._decode_block_fn(self.steps_per_block)
            blk(self.params, tok, active, scratch)

    def cancel(self, rid: int) -> bool:
        """Abort a request wherever it is: queued (dropped), mid-admission
        (scratch row abandoned), or active (marked done — its slot frees at
        the next retirement sweep; the pool's other rows are untouched, the
        same isolation argument as eos retirement). Returns False for
        unknown/already-finished ids."""
        r = self._requests.get(rid)
        if r is None or r.done:
            return False
        if r in self._queue:
            self._queue.remove(r)
            r.done = True
            return True
        if self._admitting is not None and self._admitting.req is r:
            self._admitting = None
            r.done = True
            return True
        r.done = True  # active: retired (and slot freed) next sweep
        return True

    def release(self, rid: int) -> None:
        """Drop a finished request's bookkeeping (its prompt/embeds array,
        output tokens, logprobs). Long-lived engines (the HTTP server) must
        call this after reading results, or ``_requests`` grows without
        bound; ``run()``-style batch callers may keep entries around to read
        ``logprobs_of`` afterwards."""
        self._requests.pop(rid, None)

    def logprobs_of(self, rid: int) -> List[float]:
        """Per-emitted-token logprobs under the model distribution (greedy
        and sampled alike), parallel to the request's output tokens."""
        return list(self._requests[rid].lps)

    def partial_output(self, rid: int) -> List[int]:
        """Tokens emitted so far for a request (streaming observability).
        Safe to call between ``step_block`` ticks; eos never appears (it is
        dropped before appending), so snapshots are prefixes of the final
        output."""
        return list(self._requests[rid].out)

    def _cache_bucket(self, n: int, step: int = 256) -> int:
        return max(16, min(self.max_len, -(-int(n) // step) * step))

    def _cache_S(self) -> int:
        return int(self.cache["k"].shape[2])

    def _grow(self, need: int) -> None:
        """Grow the pool's KV buffer (sequence axis) to the bucket holding
        ``need`` rows. One device pad-copy; jits retrace at the new shape
        (once per bucket). Registered prefix rows pad along, so they stay
        insertable into the pool."""
        S = self._cache_S()
        newS = self._cache_bucket(need)
        if newS <= S:
            return
        assert self._admitting is None,             "grow() must not interleave with a chunked admission in flight"

        def pad_seq(tree, to):
            out = dict(tree)
            for nm in ("k", "v", "k_scale", "v_scale", "k_zp", "v_zp"):
                if nm in out:
                    a = out[nm]
                    cfgpad = [(0, 0)] * a.ndim
                    cfgpad[2] = (0, to - a.shape[2])
                    out[nm] = jnp.pad(a, cfgpad)
            return out

        self.cache = pad_seq(self.cache, newS)
        self._prefixes = [(ids, pad_seq(row, newS), al)
                          for ids, row, al in self._prefixes]

    def register_prefix(self, tokens, expect_len: Optional[int] = None
                        ) -> None:
        """Prefill a shared prompt prefix (a system prompt) ONCE and store
        its KV row on device; later token-id requests that start with it
        skip re-prefilling the prefix — admission cost drops from
        O(prefix+suffix) to O(suffix) weight streams (automatic prefix
        caching, the serving optimization the reference's one-shot HF
        generate cannot express). Exactness: the suffix attends to the
        stored prefix KV through the same causal-with-offset mask every
        cache continuation uses. Longest registered match wins.

        With a LOSSY KV cache (kv_quant), whole-prompt prefill and prefix
        continuation are different numerical semantics: fresh prefill
        attends its own fp K/V locally, while a continuation reads the
        dequantized rows. The stored rows themselves are bit-exact; the
        suffix's K/V carries the cache's quantization noise. At int8 this
        does not flip greedy tokens in practice; at int4 it can — same
        trade-off as chunked prefill over a quantized cache.

        Dynamic NTK (Qwen-VL): the rope theta is baked into the stored K
        rows, so a request only matches a prefix embedded at ITS alpha —
        i.e. the alpha of the FULL prompt, not of the prefix alone. Pass
        ``expect_len`` (the anticipated full-prompt length of the traffic
        this prefix serves) so the rows are embedded in that NTK band;
        registering a short system prompt without it would park the entry
        at alpha(len(prefix)) where long-context requests never hit it.
        Register once per expected band if traffic spans several."""
        arr = np.asarray(tokens, np.int64).reshape(-1)
        Lp = int(arr.shape[0])
        Tb = bucket_len(Lp, minimum=16)
        assert Tb <= self.max_len, (Lp, self.max_len)
        padded = np.zeros((1, Tb), np.int64)
        padded[0, :Lp] = arr
        palpha = self._alpha_for(expect_len if expect_len is not None else Lp)
        self._grow(Lp)  # the prefix row must fit (and insert into) the pool
        S_row = self._cache_S()
        key = ("prefix_fill", Tb, S_row)
        if key not in self._jit:
            cfg, specs, state, mode = (self.cfg, self.specs, self.state,
                                       self.mode)

            @jax.jit
            def fill(params, prompt, length, alpha):
                row = init_cache(cfg, 1, S_row,
                                 quantized=self.kv_quant)
                _, row, _ = decoder_forward(
                    cfg, params, prompt, specs=specs, state=state, mode=mode,
                    cache=row, prefill_fresh=True, ntk_alpha=alpha,
                    last_index=length - 1)
                row = dict(row)
                row["pos"] = length  # TRUE length, not the padded bucket
                return row

            self._jit[key] = fill
        row = self._jit[key](self.params, jnp.asarray(padded),
                             jnp.asarray(Lp, jnp.int32),
                             jnp.float32(palpha))
        # the alpha the rows were embedded with rides along: under dynamic
        # NTK a request only matches a prefix prefilled at ITS alpha (the
        # rope theta is baked into the stored K rows)
        self._prefixes.append((tuple(int(t) for t in arr), row, palpha))
        self._prefixes.sort(key=lambda p: -len(p[0]))

    def _alpha_for(self, seq_len: int) -> float:
        """This request's NTK alpha — from ITS full prompt length under
        dynamic NTK (ref: modeling_qwen_opt.py:696-707), else the engine-wide
        constant."""
        if not self._dyn:
            return self.ntk_alpha
        from ..models.llm import ntk_alpha_for

        return ntk_alpha_for(self.cfg, seq_len)

    def run(self) -> Dict[int, List[int]]:
        """Serve until queue and pool are empty. Returns {rid: tokens}
        (eos-trimmed). Requests submitted while running (e.g. from a
        callback) are admitted at the next block boundary."""
        finished: Dict[int, List[int]] = {}
        while self._queue or any(self._active) or self._admitting:
            self._admit()
            self._decode_block()
            for i, r in enumerate(self._active):
                if r is not None and r.done:
                    finished[r.rid] = r.out
                    self._active[i] = None
        return finished

    def stats(self) -> Dict[str, Any]:
        """Scheduler observability: queue depth, slot occupancy, prefix-cache
        hits, speculation acceptance (tokens emitted per active row-round)."""
        occ = sum(r is not None for r in self._active)
        s = {"queued": len(self._queue), "active": occ,
             "slots": self.slots, "occupancy": occ / self.slots,
             "admitting": self._admitting is not None,
             "prefix_hits": self.prefix_hits,
             "prefixes_registered": len(self._prefixes)}
        if self.spec_k:
            s["spec_accept_per_round"] = (
                self.spec_emitted / self.spec_row_rounds
                if self.spec_row_rounds else float("nan"))
        return s

    def step_block(self) -> Dict[int, List[int]]:
        """One scheduler tick: admit what fits, run one fused decode block,
        retire finished rows. Returns requests that finished this tick."""
        self._admit()
        if any(self._active):
            self._decode_block()
        finished = {}
        for i, r in enumerate(self._active):
            if r is not None and r.done:
                finished[r.rid] = r.out
                self._active[i] = None
        return finished

    # -- admission ----------------------------------------------------------

    def _prefill_insert_fn(self, Tb: int, embeds: bool, has_pos: bool):
        # the request's NTK alpha rides in as a TRACED scalar (rope_tables
        # scales theta from data) so a new NTK band never recompiles the
        # admission prefill — the same mechanism the decode blocks use
        key = ("admit", Tb, embeds, has_pos)
        if key not in self._jit:
            cfg, specs, state, mode = self.cfg, self.specs, self.state, self.mode
            topk = self.sample_top_k

            @functools.partial(jax.jit, donate_argnums=(3,))
            def admit(params, prompt, length, cache, slot, alpha, pos=None,
                      rope_delta=None):
                # scratch row sized to the PROMPT bucket (static at trace
                # time): prefill_fresh attends locally, so the row is only
                # a write target — a pool-length row would cost a full-S
                # allocation + write per admission for a Tb-token prompt
                row = init_cache(cfg, 1, prompt.shape[1],
                                 quantized=self.kv_quant)
                logits, row, _ = decoder_forward(
                    cfg, params, prompt, specs=specs, state=state, mode=mode,
                    cache=row, prefill_fresh=True, ntk_alpha=alpha,
                    positions=pos, last_index=length - 1)
                z = jnp.zeros((), jnp.int32)
                new = dict(cache)
                for nm in ("k", "v", "k_scale", "v_scale", "k_zp", "v_zp"):
                    if nm in cache:
                        new[nm] = jax.lax.dynamic_update_slice(
                            cache[nm], row[nm],
                            (z, slot) + (z,) * (cache[nm].ndim - 2))
                new["pos"] = cache["pos"].at[slot].set(length)
                new["rope_delta"] = cache["rope_delta"].at[slot].set(
                    jnp.int32(0) if rope_delta is None else rope_delta)
                tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                l32 = logits[:, 0].astype(jnp.float32)
                lse = jax.scipy.special.logsumexp(l32, axis=-1)
                if topk:  # sampling engines also get the RAW top-k slice
                    # (+ lse, so the host can form the chosen token's
                    # model-distribution logprob: logit - lse)
                    return (tok, *jax.lax.top_k(l32, topk), lse), new
                lp = jnp.max(l32, axis=-1) - lse  # greedy token's logprob
                return (tok, lp), new

            self._jit[key] = admit
        return self._jit[key]

    def _prefill_insert_multi_fn(self, Tb: int, k: int, embeds: bool,
                                 has_pos: bool):
        """Batched admission: k same-bucket prompts prefill as ONE (k, Tb)
        forward and insert into k slots. Each row keeps its true length
        (per-row ``last_index`` head gather) and its own NTK alpha. One
        dispatch + one compiled program instead of k — admission cost on a
        remote chip is dominated by per-call round trips, and the batched
        prefill also uses the MXU better than k serial (1, Tb) calls."""
        key = ("admitN", Tb, k, embeds, has_pos)
        if key not in self._jit:
            cfg, specs, state, mode = self.cfg, self.specs, self.state, self.mode
            topk = self.sample_top_k

            @functools.partial(jax.jit, donate_argnums=(3,))
            def admit_n(params, prompts, lengths, cache, slots, alphas,
                        pos=None, rope_deltas=None):
                # scratch rows sized to the PROMPT bucket, not the pool
                # buffer: prefill_fresh attends locally, so the rows are
                # only a write target — k × S full-length rows would make a
                # short-prompt burst's transient KV dwarf its token count
                rows = init_cache(cfg, k, Tb, quantized=self.kv_quant)
                # M-RoPE models take a scalar alpha (per-row alpha is
                # unsupported there); the group key holds alpha fixed then
                alpha = alphas[0] if has_pos else alphas
                logits, rows, _ = decoder_forward(
                    cfg, params, prompts, specs=specs, state=state, mode=mode,
                    cache=rows, prefill_fresh=True, ntk_alpha=alpha,
                    positions=pos, last_index=lengths - 1)
                new = dict(cache)
                for nm in ("k", "v", "k_scale", "v_scale", "k_zp", "v_zp"):
                    if nm in cache:
                        # (L, k, Tb, ...) rows scatter into the first Tb
                        # columns of the slot axis (the stale tail beyond a
                        # row's pos is never attended); pad rows (bucketed
                        # k) duplicate a real row's slot with IDENTICAL
                        # data, so write order can't matter
                        new[nm] = cache[nm].at[:, slots, :Tb].set(
                            rows[nm].astype(cache[nm].dtype))
                new["pos"] = cache["pos"].at[slots].set(lengths)
                new["rope_delta"] = cache["rope_delta"].at[slots].set(
                    jnp.zeros((k,), jnp.int32) if rope_deltas is None
                    else rope_deltas)
                tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                l32 = logits[:, 0].astype(jnp.float32)
                lse = jax.scipy.special.logsumexp(l32, axis=-1)
                if topk:
                    return (tok, *jax.lax.top_k(l32, topk), lse), new
                lp = jnp.max(l32, axis=-1) - lse
                return (tok, lp), new

            self._jit[key] = admit_n
        return self._jit[key]

    def _row_step_fn(self, Tp: int, embeds: bool, has_pos: bool):
        """One admission piece: forward against the scratch row at its
        current pos (causal-with-offset), pos advances by the TRUE piece
        length (padded tail rows are overwritten by the next piece/decode).
        ``alpha`` (traced scalar): the request's FULL-prompt NTK alpha (what
        a one-shot prefill would use) applied to every piece."""
        key = ("row_step", Tp, embeds, has_pos)
        if key not in self._jit:
            cfg, specs, state, mode = (self.cfg, self.specs, self.state,
                                       self.mode)

            @functools.partial(jax.jit, donate_argnums=(2,))
            def step(params, piece, row, piece_len, alpha, pos=None):
                pos0 = row["pos"]
                logits, row2, _ = decoder_forward(
                    cfg, params, piece, specs=specs, state=state, mode=mode,
                    cache=row, ntk_alpha=alpha, positions=pos,
                    last_index=piece_len - 1)
                row2 = dict(row2)
                row2["pos"] = pos0 + piece_len
                return logits, row2

            self._jit[key] = step
        return self._jit[key]

    def _insert_fn(self):
        """Insert a finished scratch row into the pool cache at a slot."""
        if "insert" not in self._jit:
            @functools.partial(jax.jit, donate_argnums=(0,))
            def insert(cache, row, slot, length, rope_delta):
                z = jnp.zeros((), jnp.int32)
                new = dict(cache)
                for nm in ("k", "v", "k_scale", "v_scale", "k_zp", "v_zp"):
                    if nm in cache:
                        new[nm] = jax.lax.dynamic_update_slice(
                            cache[nm], row[nm],
                            (z, slot) + (z,) * (cache[nm].ndim - 2))
                new["pos"] = cache["pos"].at[slot].set(length)
                new["rope_delta"] = cache["rope_delta"].at[slot].set(
                    rope_delta)
                return new

            self._jit["insert"] = insert
        return self._jit["insert"]

    def _match_prefix(self, r: _Request):
        """Longest registered prefix this ids-request starts with (and is
        strictly longer than), or None.

        Embeds (VLM) requests match through their ``draft_ids``: a text
        prefix that precedes every image token has embeds equal to the
        embedding-table lookups of its ids (splice only replaces image-pad
        positions), and — for M-RoPE — per-plane positions equal to arange
        (text before the first image), so its KV rows are identical to the
        registered token-id prefill. Both conditions are checked."""
        if r.tokens_or_embeds.ndim == 1 and r.positions is None:
            ids = tuple(int(t) for t in r.tokens_or_embeds)
        elif (r.tokens_or_embeds.ndim == 2 and r.draft_ids is not None
              and r.draft_ids.shape[0] == r.tokens_or_embeds.shape[0]):
            ids = tuple(int(t) for t in r.draft_ids)
        else:
            return None
        ralpha = self._alpha_for(int(r.tokens_or_embeds.shape[0]))
        for ptoks, row, palpha in self._prefixes:  # sorted longest-first
            if len(ptoks) < len(ids) and ids[:len(ptoks)] == ptoks:
                if palpha != ralpha:
                    # dynamic NTK: the stored rows were embedded at a
                    # different theta than this request needs — unusable
                    continue
                if r.positions is not None:
                    L = len(ptoks)
                    if not np.array_equal(
                            np.asarray(r.positions)[:, :L],
                            np.broadcast_to(np.arange(L), (3, L))):
                        continue
                return ptoks, row
        return None

    def _begin_admission(self, r: _Request, slot: int, prefix):
        """Start staged admission: scratch row = copied prefix row (or a
        fresh one), cursor past the matched prefix."""
        if prefix is not None:
            ptoks, prow = prefix
            if "copy" not in self._jit:
                self._jit["copy"] = jax.jit(
                    lambda t: jax.tree.map(jnp.copy, t))
            row = self._jit["copy"](prow)  # donation must not eat the registry
            cursor = len(ptoks)
            self.prefix_hits += 1
        else:
            row = init_cache(self.cfg, 1, self._cache_S(),
                             quantized=self.kv_quant)
            row["pos"] = jnp.zeros((), jnp.int32)
            cursor = 0
        self._admitting = _Admitting(r, slot, row, cursor)

    def _advance_admission(self):
        """Feed ONE piece of the admitting prompt; insert into the pool when
        the prompt is exhausted."""
        a = self._admitting
        arr = a.req.tokens_or_embeds
        T = arr.shape[0]
        chunk = self.admit_chunk or T
        end = min(a.cursor + chunk, T)
        plen = end - a.cursor
        Tp = min(bucket_len(plen, minimum=16), max(chunk, 16))
        # never write past the ROW's end (tail-bucket overhang): the piece
        # writes at row pos == a.cursor
        Tp = min(Tp, int(a.row["k"].shape[2]) - a.cursor)
        if arr.ndim == 1:
            piece = np.zeros((1, Tp), np.int64)
            piece[0, :plen] = arr[a.cursor:end]
        else:
            piece = np.zeros((1, Tp, arr.shape[1]), np.float32)
            piece[0, :plen] = arr[a.cursor:end]
        extra = {}
        if a.req.positions is not None:
            p = a.req.positions[:, a.cursor:end]
            p = np.pad(p, ((0, 0), (0, Tp - plen)), mode="edge")
            extra["pos"] = jnp.asarray(p[:, None])
        step = self._row_step_fn(Tp, arr.ndim == 2,
                                 a.req.positions is not None)
        logits, a.row = step(self.params, jnp.asarray(piece), a.row,
                             jnp.asarray(plen, jnp.int32),
                             jnp.float32(self._alpha_for(T)), **extra)
        a.cursor = end
        if a.cursor < T:
            return
        # prompt exhausted: first token + insert into the pool
        r = a.req
        rope_delta = (0 if r.positions is None
                      else int(r.positions.max()) + 1 - T)
        self.cache = self._insert_fn()(
            self.cache, a.row, jnp.asarray(a.slot, jnp.int32),
            jnp.asarray(T, jnp.int32), jnp.asarray(rope_delta, jnp.int32))
        l32 = logits[:, 0].astype(jnp.float32)
        lse = jax.scipy.special.logsumexp(l32, axis=-1)
        first = int(np.asarray(jnp.argmax(l32, axis=-1))[0])
        lp = float(np.asarray(jnp.max(l32, axis=-1) - lse)[0])
        topk = None
        if self.sample_top_k:
            vals, idx = jax.lax.top_k(l32, self.sample_top_k)
            topk = (np.asarray(vals)[0], np.asarray(idx)[0],
                    float(np.asarray(lse)[0]))
        self._admitting = None
        self._finish_admit(r, a.slot, first, topk=topk, lp=lp)

    def _req_rng(self, r: _Request) -> np.random.Generator:
        return np.random.default_rng(r.seed)

    def _prompt_counts(self, r: _Request):
        ids = (r.tokens_or_embeds if r.tokens_or_embeds.ndim == 1
               else r.draft_ids)
        row = np.zeros((self.cfg.vocab,), np.int32)
        if ids is not None:
            np.add.at(row, np.clip(np.asarray(ids, np.int64), 0,
                                   self.cfg.vocab - 1), 1)
        return row

    def _finish_admit(self, r: _Request, slot: int, tok: int, topk=None,
                      lp: float = 0.0):
        if topk is not None:
            vals, idx, lse = topk
            cnts = None
            if r.presence_penalty or r.frequency_penalty:
                # penalties over the prompt's occurrence counts, applied to
                # the top-k slice (same order of operations as the block:
                # penalize raw logits, then temperature-scale)
                cnts = self._prompt_counts(r)
                c = cnts[np.asarray(idx, np.int64)]
                vals = (np.asarray(vals, np.float64)
                        - r.presence_penalty * (c > 0)
                        - r.frequency_penalty * c)
            if r.temperature > 0:
                from .sampling import host_sample_first

                pos = host_sample_first(vals, idx, r.temperature, r.top_p,
                                        self._req_rng(r))
            else:
                pos = int(np.argmax(vals))
            tok = int(idx[pos])
            lp = float(topk[0][pos]) - lse  # raw model-distribution logprob
            if self.sample_top_k:
                if cnts is None:
                    cnts = self._prompt_counts(r)
                if not (self.eos_id is not None and tok == self.eos_id):
                    cnts[tok] += 1
                self.tok_counts = self.tok_counts.at[slot].set(
                    jnp.asarray(cnts))
        r.slot = slot
        if self._dyn:
            self.alphas[slot] = self._alpha_for(
                int(r.tokens_or_embeds.shape[0]))
        if self.eos_id is not None and tok == self.eos_id:
            r.done = True  # eos-trimmed: empty output
        else:
            r.next_tok = tok
            r.out.append(tok)
            r.lps.append(lp)
            r.done = len(r.out) >= r.max_new_tokens
        if self.spec_k:
            # seed the slot's draft history: prompt ids (direct, or the
            # caller-supplied draft_ids for embeds prompts — image-pad ids
            # included: they never match generated text, so they only cost
            # buffer space) + the first token
            row = np.zeros((self.hist.shape[1],), np.int32)
            ids = (r.tokens_or_embeds if r.tokens_or_embeds.ndim == 1
                   else r.draft_ids)
            n = 0
            if ids is not None:
                n = min(int(ids.shape[0]), self.hist.shape[1] - 1)
                row[:n] = ids[:n]
            row[n] = tok
            self.hist = self.hist.at[slot].set(jnp.asarray(row))
            self.hist_len = self.hist_len.at[slot].set(n + 1)
        # done-at-admission rows hold the slot until the caller's retire
        # sweep this same tick
        self._active[slot] = r

    def _admit(self):
        # an in-flight staged admission advances by exactly one piece per
        # tick, so decode latency for the running pool is bounded by one
        # chunk; nothing else admits until it lands (FIFO)
        if self._admitting is not None:
            self._advance_admission()
            if self._admitting is not None:
                return
        # plain admissions are COLLECTED here, grouped by length bucket and
        # dispatched as batched (k, Tb) prefills, then ALL first tokens are
        # fetched in one device_get at the end of the tick: each dispatch
        # and each forced np.asarray is a host↔device round trip (expensive
        # when the chip sits behind a network tunnel), and nothing
        # downstream needs admission k's token before admission k+1's
        # prefill runs
        dispatched = []  # (members [(r, slot), ...], first device tuple)
        plain = []  # (r, slot, prompt_row, T, alpha, pos, rope_delta, Tb)

        def flush():
            self._dispatch_plain(plain, dispatched)
            if not dispatched:
                return
            firsts = jax.device_get([d[1] for d in dispatched])
            for (members, _), f in zip(dispatched, firsts):
                for i, (r, slot) in enumerate(members):
                    if self.sample_top_k:
                        tok, vals, idx, lse = f
                        self._finish_admit(r, slot, int(tok[i]),
                                           topk=(vals[i], idx[i],
                                                 float(lse[i])))
                    else:
                        tok, lp = f
                        self._finish_admit(r, slot, int(tok[i]),
                                           lp=float(lp[i]))
            dispatched.clear()

        free = [i for i, r in enumerate(self._active) if r is None]
        while free and self._queue:
            slot = free.pop(0)
            r = self._queue.popleft()
            arr = r.tokens_or_embeds
            T = arr.shape[0]
            prefix = self._match_prefix(r)
            suffix_len = T - (len(prefix[0]) if prefix else 0)
            if prefix is not None or (self.admit_chunk
                                      and suffix_len > self.admit_chunk):
                self._begin_admission(r, slot, prefix)
                if self.admit_chunk and suffix_len > self.admit_chunk:
                    self._advance_admission()  # one piece this tick
                    if self._admitting is not None:
                        flush()
                        return
                else:
                    while self._admitting is not None:
                        self._advance_admission()
                continue
            Tb = bucket_len(T, minimum=16)
            if arr.ndim == 1:
                prompt = np.zeros((Tb,), np.int64)
                prompt[:T] = arr
            else:
                prompt = np.zeros((Tb, arr.shape[1]), np.float32)
                prompt[:T] = arr
            pos = rope_delta = None
            if r.positions is not None:
                # (3, Tb) edge-padded M-RoPE ids; decode resumes at
                # max(position)+1 via the slot's rope_delta
                pos = np.pad(r.positions, ((0, 0), (0, Tb - T)), mode="edge")
                rope_delta = int(r.positions.max()) + 1 - T
            plain.append((r, slot, prompt, T, self._alpha_for(T), pos,
                          rope_delta, Tb))
        flush()

    def _dispatch_plain(self, plain, dispatched):
        """Group collected plain admissions by (bucket, kind) and dispatch
        each group as ONE batched prefill (size bucketed to 1/2/4/8, padded
        by repeating the last member — pad rows write identical data to the
        same slot, so scatter order cannot matter). Groups are capped at
        ``admit_batch_tokens`` total padded tokens so the batched prefill's
        activations stay within the chip's memory headroom."""
        if not plain:
            return
        groups: Dict[Any, list] = {}
        for item in plain:
            r, slot, prompt, T, alpha, pos, rope_delta, Tb = item
            gkey = (Tb, prompt.ndim == 2, pos is not None,
                    # M-RoPE models take one scalar alpha per prefill call
                    round(alpha, 6) if pos is not None else None)
            groups.setdefault(gkey, []).append(item)
        plain.clear()
        for (Tb, embeds, has_pos, _), items in groups.items():
            # cap = power-of-two floor of the token budget, clamped to 8:
            # cutting chunks AT the cap keeps every dispatched k within both
            # the admit_batch_tokens cap and the 1/2/4/8 compiled-size set,
            # and pad rows only appear on the non-power-of-two remainder
            max_k = max(1, self.admit_batch_tokens // Tb)
            cap = min(8, 1 << (max_k.bit_length() - 1))
            while items:
                chunk, items = items[:cap], items[cap:]
                k = 1 << (len(chunk) - 1).bit_length()  # 1/2/4/8 bucket
                if k == 1:
                    r, slot, prompt, T, alpha, pos, rope_delta, _ = chunk[0]
                    admit = self._prefill_insert_fn(Tb, embeds, has_pos)
                    extra = {}
                    if has_pos:
                        extra["pos"] = jnp.asarray(pos[:, None])
                        extra["rope_delta"] = jnp.asarray(rope_delta,
                                                          jnp.int32)
                    first, self.cache = admit(
                        self.params, jnp.asarray(prompt[None]),
                        jnp.asarray(T, jnp.int32), self.cache,
                        jnp.asarray(slot, jnp.int32),
                        jnp.float32(alpha), **extra)
                    dispatched.append(([(r, slot)], first))
                    continue
                padded = chunk + [chunk[-1]] * (k - len(chunk))
                prompts = np.stack([c[2] for c in padded])
                lengths = np.asarray([c[3] for c in padded], np.int32)
                slots = np.asarray([c[1] for c in padded], np.int32)
                alphas = np.asarray([c[4] for c in padded], np.float32)
                admit_n = self._prefill_insert_multi_fn(Tb, k, embeds,
                                                        has_pos)
                extra = {}
                if has_pos:
                    extra["pos"] = jnp.asarray(
                        np.stack([c[5] for c in padded], axis=1))
                    extra["rope_deltas"] = jnp.asarray(
                        np.asarray([c[6] for c in padded], np.int32))
                first, self.cache = admit_n(
                    self.params, jnp.asarray(prompts),
                    jnp.asarray(lengths), self.cache, jnp.asarray(slots),
                    jnp.asarray(alphas), **extra)
                dispatched.append(([(c[0], c[1]) for c in chunk], first))

    # -- decode -------------------------------------------------------------

    def _decode_block_fn(self, n_steps: int):
        key = ("block", n_steps)
        if key not in self._jit:
            cfg, specs, state, mode = self.cfg, self.specs, self.state, self.mode
            alpha = self.ntk_alpha
            topk = self.sample_top_k

            s4, w4pack = self._s4, self._w4pack

            @functools.partial(jax.jit, donate_argnums=(3,))
            def block(params, tok, active, cache, bkey=None, temp=None,
                      top_p=None, seeds=None, counts=None, pres=None,
                      freq=None, tok_counts=None, alphas=None):
                # per-request dynamic NTK: (B,) alpha vector as DATA — one
                # compiled block serves any alpha mix (per-row rope tables)
                alpha_eff = alphas if alphas is not None else alpha
                if "layers_packed" in params:
                    # persistent packed decode cache (built at init)
                    _pk = params["layers_packed"]
                    params = {k: v for k, v in params.items()
                              if k != "layers_packed"}
                    params["layers"] = _pk
                elif s4 or w4pack:
                    # half the per-step weight stream (packed bytes for the
                    # Pallas SWAR GEMV, or native-S4 for the XLA dot; the
                    # repack amortizes over the block's n_steps)
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
                B = tok.shape[0]
                out0 = jnp.zeros((B, n_steps), jnp.int32)
                lp0 = jnp.zeros((B, n_steps), jnp.float32)

                def body(i, carry):
                    tok, cache, out, lps, tcnt = carry
                    logits, cache2, _ = decoder_forward(
                        cfg, params, tok, specs=specs, state=state,
                        mode=mode, cache=cache, ntk_alpha=alpha_eff)
                    if topk:
                        from .sampling import sample_tokens

                        # presence/frequency penalties over prompt+emitted
                        # occurrence counts, applied before token choice
                        step_logits = (logits[:, -1]
                                       - pres[:, None] * (tcnt > 0)
                                       - freq[:, None] * tcnt)
                        nxt = sample_tokens(step_logits, bkey, temp,
                                            top_p, topk, seeds=seeds,
                                            counts=counts + i)
                        tcnt = tcnt.at[jnp.arange(tcnt.shape[0]), nxt].add(
                            active.astype(jnp.int32))
                    else:
                        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                    nxt = jnp.where(active, nxt, jnp.int32(0))
                    # emitted token's model-distribution logprob (raw model
                    # distribution — penalties shape the choice, not the
                    # reported probability)
                    l32 = logits[:, -1].astype(jnp.float32)
                    lp = (jnp.take_along_axis(l32, nxt[:, None], -1)[:, 0]
                          - jax.scipy.special.logsumexp(l32, axis=-1))
                    # frozen rows: pos does not advance (their cache row is
                    # rewritten wholesale at the next admission anyway, but a
                    # long-idle slot must not walk its pos off the cache end)
                    cache2 = dict(cache2)
                    cache2["pos"] = jnp.where(active, cache2["pos"],
                                              cache["pos"])
                    at = (jnp.int32(0), jnp.asarray(i, jnp.int32))
                    out = jax.lax.dynamic_update_slice(out, nxt[:, None], at)
                    lps = jax.lax.dynamic_update_slice(lps, lp[:, None], at)
                    return nxt[:, None], cache2, out, lps, tcnt

                tc0 = (tok_counts if tok_counts is not None
                       else jnp.zeros((B, 1), jnp.int32))
                _, cache, out, lps, tc = jax.lax.fori_loop(
                    0, n_steps, body, (tok, cache, out0, lp0, tc0))
                if tok_counts is not None:
                    return out, lps, cache, tc
                return out, lps, cache

            self._jit[key] = block
        return self._jit[key]

    def _spec_block_fn(self, n_rounds: int):
        """n_rounds of batched self-speculation: per-row n-gram draft from
        the slot's history, ONE (B, k+1) verify forward, per-row acceptance
        m_b ∈ [1, k+1] and per-row ``pos`` rollback. Frozen/done rows ride
        along with m=0 (their pos never advances; their stale KV rows are
        overwritten at the next admission). Emits per-row up to
        n_rounds·(k+1) tokens per host round trip."""
        key = ("spec_block", n_rounds, self._force_accept)
        if key not in self._jit:
            from .speculative import ngram_propose

            cfg, specs, state, mode = (self.cfg, self.specs, self.state,
                                       self.mode)
            alpha, k, eos_id = self.ntk_alpha, self.spec_k, self.eos_id
            force, s4, w4pack = self._force_accept, self._s4, self._w4pack

            @functools.partial(jax.jit, donate_argnums=(3, 4, 5))
            def block(params, tok, active, cache, hist, hist_len, budget,
                      alphas=None):
                alpha_eff = alphas if alphas is not None else alpha
                if "layers_packed" in params:
                    _pk = params["layers_packed"]
                    params = {k: v for k, v in params.items()
                              if k != "layers_packed"}
                    params["layers"] = _pk
                elif s4 or w4pack:
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
                B = tok.shape[0]
                W = n_rounds * (k + 1)
                out0 = jnp.zeros((B, W), jnp.int32)
                done0 = ~active

                def body(i, carry):
                    tok, cache, hist, hist_len, out, olp, cnt, done = carry
                    draft = jax.vmap(
                        lambda h, n: ngram_propose(h, n, k))(hist, hist_len)
                    window = jnp.concatenate([tok, draft], axis=1)  # (B,k+1)
                    pos0 = cache["pos"]
                    logits, cache2, _ = decoder_forward(
                        cfg, params, window, specs=specs, state=state,
                        mode=mode, cache=cache, ntk_alpha=alpha_eff)
                    g = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    agree = jnp.cumprod(
                        (draft == g[:, :-1]).astype(jnp.int32), axis=1)
                    m = (1 + jnp.sum(agree, axis=1)).astype(jnp.int32)
                    if force:  # ceiling instrument (never serve with it)
                        m = jnp.full_like(m, k + 1)
                    if eos_id is not None:
                        pos_i = jnp.arange(k + 1, dtype=jnp.int32)[None]
                        is_eos = (g == eos_id) & (pos_i < m[:, None])
                        first = jnp.min(jnp.where(is_eos, pos_i, k + 1),
                                        axis=1)
                        m = jnp.minimum(m, first + 1).astype(jnp.int32)
                        done_new = jnp.any(is_eos, axis=1)
                    else:
                        done_new = jnp.zeros((B,), bool)
                    m = jnp.minimum(m, budget - cnt)
                    m = jnp.where(done, 0, m).astype(jnp.int32)
                    done = done | done_new | (cnt + m >= budget)
                    # per-row writes at each row's own offset; rows with
                    # m=0 write garbage past their count — ignored by cnt /
                    # hist_len bounds and overwritten next round
                    wrow = lambda buf, vals, at: jax.lax.dynamic_update_slice(
                        buf, vals, (at,))
                    l32 = logits.astype(jnp.float32)
                    glp = (jnp.take_along_axis(l32, g[..., None], -1)[..., 0]
                           - jax.scipy.special.logsumexp(l32, axis=-1))
                    out = jax.vmap(wrow)(out, g, cnt)
                    olp = jax.vmap(wrow)(olp, glp, cnt)
                    hist = jax.vmap(wrow)(hist, g, hist_len)
                    hist_len = hist_len + m
                    cnt = cnt + m
                    cache2 = dict(cache2)
                    cache2["pos"] = (pos0 + m).astype(pos0.dtype)
                    nxt = jnp.take_along_axis(
                        g, jnp.clip(m - 1, 0, k)[:, None], axis=1)
                    tok = jnp.where(m[:, None] > 0, nxt, tok)
                    return tok, cache2, hist, hist_len, out, olp, cnt, done

                cnt0 = jnp.zeros((B,), jnp.int32)
                olp0 = jnp.zeros_like(out0, jnp.float32)
                (_, cache, hist, hist_len, out, olp, cnt,
                 _) = jax.lax.fori_loop(
                    0, n_rounds, body,
                    (tok, cache, hist, hist_len, out0, olp0, cnt0, done0))
                return out, olp, cnt, cache, hist, hist_len

            self._jit[key] = block
        return self._jit[key]

    def _spec_decode_block(self):
        tok = np.zeros((self.slots, 1), np.int32)
        active = np.zeros((self.slots,), bool)
        budget = np.zeros((self.slots,), np.int32)
        for i, r in enumerate(self._active):
            if r is not None and not r.done:
                tok[i, 0] = r.next_tok
                active[i] = True
                budget[i] = r.max_new_tokens - len(r.out)
        if not active.any():
            return
        block = self._spec_block_fn(self.steps_per_block)
        extra = ({"alphas": jnp.asarray(self.alphas)} if self._dyn else {})
        out, olp, cnt, self.cache, self.hist, self.hist_len = block(
            self.params, jnp.asarray(tok), jnp.asarray(active), self.cache,
            self.hist, self.hist_len, jnp.asarray(budget), **extra)
        out, olp, cnt = jax.device_get((out, olp, cnt))  # one round trip
        self.spec_emitted += int(cnt.sum())
        self.spec_row_rounds += int(active.sum()) * self.steps_per_block
        for i, r in enumerate(self._active):
            if r is None or r.done:
                continue
            for j in range(cnt[i]):
                t = int(out[i, j])
                if self.eos_id is not None and t == self.eos_id:
                    r.done = True
                    break
                r.out.append(t)
                r.lps.append(float(olp[i, j]))
                r.next_tok = t
                if len(r.out) >= r.max_new_tokens:
                    r.done = True
                    break

    def _decode_block(self):
        if self.spec_k:
            return self._spec_decode_block()
        n = self.steps_per_block
        tok = np.zeros((self.slots, 1), np.int32)
        active = np.zeros((self.slots,), bool)
        for i, r in enumerate(self._active):
            if r is not None and not r.done:
                tok[i, 0] = r.next_tok
                active[i] = True
        if not active.any():
            return
        block = self._decode_block_fn(n)
        dyn_extra = ({"alphas": jnp.asarray(self.alphas)}
                     if self._dyn else {})
        if self.sample_top_k:
            temp = np.zeros((self.slots,), np.float32)
            top_p = np.ones((self.slots,), np.float32)
            seeds = np.zeros((self.slots,), np.int32)
            counts = np.zeros((self.slots,), np.int32)
            pres = np.zeros((self.slots,), np.float32)
            freq = np.zeros((self.slots,), np.float32)
            for i, r in enumerate(self._active):
                if r is not None and not r.done:
                    temp[i], top_p[i] = r.temperature, r.top_p
                    seeds[i] = r.seed
                    counts[i] = len(r.out)  # emitted index of the next token
                    pres[i] = r.presence_penalty
                    freq[i] = r.frequency_penalty
            # noise entropy comes entirely from (per-row seed, per-row
            # count) — the base key is a constant, so scheduling can't
            # change a request's tokens
            bkey = jax.random.key(0)
            out, lps, self.cache, self.tok_counts = block(
                self.params, jnp.asarray(tok), jnp.asarray(active),
                self.cache, bkey=bkey, temp=jnp.asarray(temp),
                top_p=jnp.asarray(top_p), seeds=jnp.asarray(seeds),
                counts=jnp.asarray(counts), pres=jnp.asarray(pres),
                freq=jnp.asarray(freq), tok_counts=self.tok_counts,
                **dyn_extra)
        else:
            out, lps, self.cache = block(self.params, jnp.asarray(tok),
                                         jnp.asarray(active), self.cache,
                                         **dyn_extra)
        # one transfer for both outputs: each forced np.asarray is its own
        # host↔device round trip (which dominates per-block overhead when
        # the chip is remote)
        out, lps = jax.device_get((out, lps))
        for i, r in enumerate(self._active):
            if r is None or r.done:
                continue
            for j in range(out.shape[1]):
                t = int(out[i, j])
                if self.eos_id is not None and t == self.eos_id:
                    r.done = True
                    break
                r.out.append(t)
                r.lps.append(float(lps[i, j]))
                r.next_tok = t
                if len(r.out) >= r.max_new_tokens:
                    r.done = True
                    break
