"""Generic quantizable LLM decoder — the text tower of every supported VLM.

One functional decoder covers Qwen (Qwen-VL-Chat's LLM, ref:
model/modeling_qwen_opt.py), Qwen2 (Qwen2-VL / MiniCPM-V, HF qwen2), InternLM2
(InternVL2, GQA) and ChatGLM (GLM-4V) via config flags; per-model loaders in
``mquant_tpu.models.loader`` map HF checkpoints into this layout (doing the
qkv-split surgery the reference performs offline in exam/qwen_opt.py).

TPU-first design decisions (vs the reference's per-layer nn.Module stack):
  * layer parameters are STACKED along a leading (L,) axis and the forward is a
    single ``lax.scan`` over layers → compile time O(1) in depth, and offline
    transforms (rotations, RTN) fold over all layers in one einsum.
  * KV cache is a pytree of (L, B, S, KVH, hd) arrays updated with
    ``dynamic_update_slice`` inside the scan — prefill/decode are two jitted
    functions with static shapes (TTFT measurable by construction).
  * calibration statistics are scan OUTPUTS (stacked per layer) merged into
    running stats outside — the functional replacement of the reference's
    stateful observer hooks (ref: fake_quant/quant_utils.py:116-133).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..observe import observers as O
from . import layers as L
from .layers import SiteSpec, qlinear

# site names within one decoder layer
LLM_SITES = ("q", "k", "v", "o", "gate", "up", "down")


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab: int
    hidden: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    intermediate: int
    head_dim: int = 0
    rope_theta: float = 1_000_000.0
    norm_eps: float = 1e-6
    qkv_bias: bool = True  # Qwen1/Qwen2 style
    o_bias: bool = False
    tie_embeddings: bool = False
    rope_partial: float = 1.0  # fraction of head_dim receiving RoPE (GLM-4: 0.5)
    rope_interleaved: bool = False  # GLM pairwise-interleaved rotary
    mrope_sections: Tuple[int, ...] = ()  # Qwen2-VL M-RoPE (t, h, w) sections
    use_dynamic_ntk: bool = False  # Qwen-VL long-context NTK theta scaling
    ntk_seq_length: int = 2048  # training seq_length the NTK ratio is taken over
    intermediate_pad: int = 0  # Hadamard-friendly padded intermediate (0 = none)
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        if self.head_dim == 0:
            object.__setattr__(self, "head_dim", self.hidden // self.n_heads)

    @property
    def inter_eff(self) -> int:
        return self.intermediate_pad or self.intermediate


def init_decoder_params(cfg: DecoderConfig, key: jax.Array, dtype=None) -> Dict:
    """Random-init params in the stacked layout (testing / benchmarking)."""
    dtype = dtype or cfg.dtype
    k = jax.random.split(key, 8)
    Lx, Hd, KV, hd, I = cfg.n_layers, cfg.hidden, cfg.n_kv_heads, cfg.head_dim, cfg.inter_eff
    H = cfg.n_heads

    def w(key, *shape, scale=None):
        scale = scale or (1.0 / (shape[-2] ** 0.5))
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    def maybe_b(*shape):
        return jnp.zeros(shape, dtype)

    params = {
        "embed": {"w": w(k[0], cfg.vocab, Hd, scale=0.02)},
        "layers": {
            "ln1": {"w": jnp.ones((Lx, Hd), dtype)},
            "q": {"w": w(k[1], Lx, Hd, H * hd), "b": maybe_b(Lx, H * hd) if cfg.qkv_bias else None},
            "k": {"w": w(k[2], Lx, Hd, KV * hd), "b": maybe_b(Lx, KV * hd) if cfg.qkv_bias else None},
            "v": {"w": w(k[3], Lx, Hd, KV * hd), "b": maybe_b(Lx, KV * hd) if cfg.qkv_bias else None},
            "o": {"w": w(k[4], Lx, H * hd, Hd), "b": maybe_b(Lx, Hd) if cfg.o_bias else None},
            "ln2": {"w": jnp.ones((Lx, Hd), dtype)},
            "gate": {"w": w(k[5], Lx, Hd, I), "b": None},
            "up": {"w": w(k[6], Lx, Hd, I), "b": None},
            "down": {"w": w(k[7], Lx, I, Hd), "b": None},
        },
        "ln_f": {"w": jnp.ones((Hd,), dtype)},
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = {"w": w(jax.random.fold_in(key, 99), Hd, cfg.vocab, scale=0.02)}
    return params


# ---------------------------------------------------------------------------
# rope
# ---------------------------------------------------------------------------


def ntk_alpha_for(cfg: DecoderConfig, seq_len: int) -> float:
    """Dynamic-NTK alpha for a prompt of ``seq_len`` tokens — the Qwen-VL
    long-context rule (ref: model/modeling_qwen_opt.py:696-707):
    alpha = max(2^ceil(log2(seq_len/seq_length) + 1) - 1, 1). Computed from the
    STATIC prefill length so it is a compile-time constant; decode reuses the
    prefill's alpha (the reference caches ``_ntk_alpha_cached`` the same way)."""
    import math

    if not cfg.use_dynamic_ntk:
        return 1.0
    context_value = math.log(max(seq_len, 1) / cfg.ntk_seq_length, 2) + 1
    alpha = 2 ** math.ceil(context_value) - 1
    return float(max(alpha, 1))


def rope_tables(cfg: DecoderConfig, positions: jax.Array, dtype,
                ntk_alpha: float = 1.0):
    """cos/sin for positions.

    positions: (B, T) for standard RoPE, or (3, B, T) for Qwen2-VL M-RoPE where
    the three planes are (temporal, height, width) position ids and head_dim
    channels are split into ``mrope_sections`` consuming one plane each
    (capability parity with HF Qwen2-VL's multimodal rotary).

    ``ntk_alpha`` scales the base theta by alpha^(rd/(rd-2)) — the dynamic-NTK
    long-context extension (ref: modeling_qwen_opt.py:1201-1213). It may be a
    traced (B,) VECTOR: each batch row gets its own theta (per-request alpha
    in the slot-pool serving engine — alpha is data, not a compile-time
    constant, so one compiled block serves any alpha mix).
    """
    rd = int(cfg.head_dim * cfg.rope_partial)
    theta = cfg.rope_theta
    if isinstance(ntk_alpha, jax.Array) and ntk_alpha.ndim >= 1:
        assert not (cfg.mrope_sections and positions.ndim == 3), \
            "per-row NTK alpha not supported with M-RoPE"
        if positions.ndim == 3:
            positions = positions[0]
        # per-row inv_freq: th_b = theta·alpha_b^(rd/(rd-2)); inv = th_b^(-2i/rd)
        th = theta * ntk_alpha.astype(jnp.float32)[:, None] ** (rd / (rd - 2))
        exps = jnp.arange(0, rd, 2, dtype=jnp.float32) / rd  # (rd/2,)
        inv = th ** -exps[None, :]  # (B, rd/2)
        freqs = positions[..., None].astype(jnp.float32) * inv[:, None, :]
        emb = jnp.concatenate([freqs, freqs], axis=-1)  # (B, T, rd)
        return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)
    if isinstance(ntk_alpha, jax.Array):
        # traced 0-d alpha (passed as DATA through a jit boundary): scale
        # unconditionally — exact no-op when alpha == 1 (1**x == 1, *1 exact)
        theta = theta * ntk_alpha.astype(jnp.float32) ** (rd / (rd - 2))
    elif ntk_alpha != 1.0:
        theta = theta * ntk_alpha ** (rd / (rd - 2))
    if cfg.mrope_sections and positions.ndim == 3:
        cos3, sin3 = L.rotary_embedding(positions, rd, theta, dtype)  # (3,B,T,rd)
        # sections are in half-dim units; the table is [freqs, freqs] concat
        half = rd // 2
        secs = list(cfg.mrope_sections)
        assert sum(secs) == half, (secs, half)
        idx = []
        for i, s in enumerate(secs):
            idx += [i] * s
        idx = jnp.asarray(idx + idx)  # (rd,) plane id per channel
        plane = jax.nn.one_hot(idx, 3, dtype=cos3.dtype)  # (rd, 3)
        cos = jnp.einsum("pbtd,dp->btd", cos3, plane)
        sin = jnp.einsum("pbtd,dp->btd", sin3, plane)
        return cos, sin
    if positions.ndim == 3:
        positions = positions[0]
    return L.rotary_embedding(positions, rd, theta, dtype)


def _apply_rope(cfg: DecoderConfig, q, k, cos, sin):
    rd = int(cfg.head_dim * cfg.rope_partial)
    if cfg.rope_partial < 1.0:
        q_r, q_p = q[..., :rd], q[..., rd:]
        k_r, k_p = k[..., :rd], k[..., rd:]
        q_r, k_r = _rope_core(cfg, q_r, k_r, cos, sin)
        return (jnp.concatenate([q_r, q_p], -1), jnp.concatenate([k_r, k_p], -1))
    return _rope_core(cfg, q, k, cos, sin)


def _rope_core(cfg, q, k, cos, sin):
    if cfg.rope_interleaved:
        # GLM-style: channels are (re, im) interleaved pairs; the table layout is
        # [freqs, freqs] so pair i's angle lives at channel i (first half).
        half = q.shape[-1] // 2

        def rot(v):
            v2 = v.reshape(*v.shape[:-1], half, 2)
            re, im = v2[..., 0], v2[..., 1]
            cs = cos[..., :, None, :half]
            sn = sin[..., :, None, :half]
            nre = re * cs - im * sn
            nim = im * cs + re * sn
            return jnp.stack([nre, nim], axis=-1).reshape(v.shape).astype(v.dtype)

        return rot(q), rot(k)
    return L.apply_rope(q, k, cos, sin)


# ---------------------------------------------------------------------------
# decoder forward
# ---------------------------------------------------------------------------


def _layer_step(
    cfg: DecoderConfig,
    specs: Dict[str, SiteSpec],
    mode: str,
    h: jax.Array,  # (B, T, hidden)
    lp: Dict,  # this layer's params (no leading L axis)
    lstate: Optional[Dict],
    cache_kv: Optional[Tuple[jax.Array, jax.Array]],  # (B, S, KVH, hd) each
    cache_pos: Optional[jax.Array],  # scalar: write offset
    cos, sin,
    attn_mask,  # (B, 1, T, S) bool
    tape: Optional[L.Tape],
    prefill_fresh: bool = False,  # cache starts empty: write it but attend to
    # the local (T-long) k/v with a causal mask — smaller attention + flash path
    fused_decode: bool = False,  # T==1 fp-cache decode: cache write + GQA
    # attention in ONE Pallas launch (kernels/attn_decode.py); caller
    # guarantees the mask is exactly attn_start ≤ col ≤ pos
    attn_start: Optional[jax.Array] = None,  # (B,) first attendable column
):
    B, T, Hd = h.shape
    hd, H, KV = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads

    def site(nm):
        return specs.get("llm." + nm)

    x = L.rms_norm(h, lp["ln1"]["w"], cfg.norm_eps)
    q, k, v = L.qlinear_group(x, [lp["q"], lp["k"], lp["v"]],
                              ["llm.q", "llm.k", "llm.v"], specs, lstate,
                              mode, tape)
    q = q.reshape(B, T, H, hd)
    k = k.reshape(B, T, KV, hd)
    v = v.reshape(B, T, KV, hd)
    q, k = _apply_rope(cfg, q, k, cos, sin)

    if fused_decode:
        # Fused single-token decode attention: the cache-row write
        # (dynamic_update_slice) + masked GQA einsum below collapse into ONE
        # Pallas launch — saves the full-cache-copy update and the HBM round
        # trips of the (1, S) score/prob intermediates (the largest non-GEMV
        # decode segment per scripts/decode_layer_ablate.py). Exact: same
        # operand dtypes / f32 accumulation as the einsum path.
        from ..kernels.attn_decode import attn_decode_fused

        new_cache = dict(cache_kv)
        attn, new_cache["k"], new_cache["v"] = attn_decode_fused(
            q, k, v, cache_kv["k"], cache_kv["v"],
            jnp.asarray(cache_pos, jnp.int32), scale=hd**-0.5,
            start=attn_start,
            interpret=jax.default_backend() not in ("tpu", "axon"))
        attn = attn.reshape(B, T, H * hd)
        h = h + qlinear(attn, lp["o"], "llm.o", site("o"), lstate, mode, tape)
        x = L.rms_norm(h, lp["ln2"]["w"], cfg.norm_eps)
        g, u = L.qlinear_group(x, [lp["gate"], lp["up"]],
                               ["llm.gate", "llm.up"], specs, lstate, mode,
                               tape)
        d = _mlp_tail(cfg, site("down"), mode, g, u, lp["down"], lstate, tape)
        return h + d, new_cache

    causal = False
    if cache_kv is None and attn_mask is None:
        causal = True  # plain causal self-attention (flash-eligible)
    if cache_kv is not None:
        z = jnp.zeros((), jnp.int32)
        pos = jnp.asarray(cache_pos, jnp.int32)
        # cache dtype is the (jit-static) type tag: int8 ⇒ int8 KV,
        # uint8 ⇒ nibble-packed uint4 KV, else fp
        quantized = cache_kv["k"].dtype == jnp.int8
        packed4 = cache_kv["k"].dtype == jnp.uint8

        if pos.ndim == 1:
            # per-row write offsets (continuous-batching slots: each row of
            # the cache is an independent request at its own position)
            def upd(buf, val):
                val = val.astype(buf.dtype)

                def one(b, v, p):
                    return jax.lax.dynamic_update_slice(
                        b, v, (p,) + (z,) * (b.ndim - 1))

                return jax.vmap(one)(buf, val, pos)
        else:
            def upd(buf, val):
                return jax.lax.dynamic_update_slice(
                    buf, val.astype(buf.dtype), (z, pos) + (z,) * (buf.ndim - 2))

        new_cache = dict(cache_kv)
        if packed4:
            kq, ks, kz = _kv_pack4(k)
            vq, vs, vz = _kv_pack4(v)
            new_cache["k"] = upd(cache_kv["k"], kq)
            new_cache["v"] = upd(cache_kv["v"], vq)
            new_cache["k_scale"] = upd(cache_kv["k_scale"], ks)
            new_cache["v_scale"] = upd(cache_kv["v_scale"], vs)
            new_cache["k_zp"] = upd(cache_kv["k_zp"], kz)
            new_cache["v_zp"] = upd(cache_kv["v_zp"], vz)
        elif quantized:
            # per-token-per-head symmetric int8 (halves KV memory + decode
            # attention bandwidth; the reference's parsed-but-unwired
            # --k_bits/--v_bits capability, ref: fake_quant/utils.py:221-267)
            def qkv_quant(val):
                amax = jnp.max(jnp.abs(val.astype(jnp.float32)), axis=-1)
                scale = jnp.maximum(amax / 127.0, 1e-8)
                qv = jnp.clip(jnp.round(val.astype(jnp.float32)
                                        / scale[..., None]), -127, 127)
                return qv.astype(jnp.int8), scale

            kq, ks = qkv_quant(k)
            vq, vs = qkv_quant(v)
            new_cache["k"] = upd(cache_kv["k"], kq)
            new_cache["v"] = upd(cache_kv["v"], vq)
            new_cache["k_scale"] = upd(cache_kv["k_scale"], ks)
            new_cache["v_scale"] = upd(cache_kv["v_scale"], vs)
        else:
            new_cache["k"] = upd(cache_kv["k"], k)
            new_cache["v"] = upd(cache_kv["v"], v)
        if prefill_fresh:
            k_all, v_all = k, v  # attend locally; padded rows are discarded
            if attn_mask is None:
                causal = True
            # else: caller supplied a (B,1,T,T) mask (e.g. left-padded ragged
            # batches: causal AND col≥row_start) — honored over plain causal
        elif packed4:
            k_all = _kv_unpack4(new_cache["k"], new_cache["k_scale"],
                                new_cache["k_zp"], h.dtype)
            v_all = _kv_unpack4(new_cache["v"], new_cache["v_scale"],
                                new_cache["v_zp"], h.dtype)
        elif quantized:
            k_all = (new_cache["k"].astype(jnp.float32)
                     * new_cache["k_scale"][..., None]).astype(h.dtype)
            v_all = (new_cache["v"].astype(jnp.float32)
                     * new_cache["v_scale"][..., None]).astype(h.dtype)
        else:
            k_all, v_all = new_cache["k"], new_cache["v"]
    else:
        k_all, v_all = k, v
        new_cache = None

    attn = L.attention(q, k_all.astype(q.dtype), v_all.astype(q.dtype), attn_mask,
                       causal=causal)
    attn = attn.reshape(B, T, H * hd)
    h = h + qlinear(attn, lp["o"], "llm.o", site("o"), lstate, mode, tape)

    x = L.rms_norm(h, lp["ln2"]["w"], cfg.norm_eps)
    g, u = L.qlinear_group(x, [lp["gate"], lp["up"]], ["llm.gate", "llm.up"],
                           specs, lstate, mode, tape)
    d = _mlp_tail(cfg, site("down"), mode, g, u, lp["down"], lstate, tape)
    h = h + d
    return h, new_cache


def _mlp_tail(cfg, dspec, mode, g, u, dp, lstate, tape):
    """swiglu → down-projection. MQUANT_FUSED_TAIL=1 routes the tail
    (swiglu → hadamard → int8 quantize) through one fused Pallas VMEM pass
    (``kernels.fwht.fused_swiglu_had_quant``) when the static-per-tensor
    real-int conditions hold. OFF by default: measured at 7B prefill
    (T=1024, v5e) the fused kernel LOSES ~2.5 ms total to XLA's own fusion
    of the composable chain (68.4 vs 65.9 ms TTFT at tile 128; larger tiles
    exceed Mosaic's scoped-VMEM budget) — XLA overlaps the chain with the
    surrounding GEMMs better than the monolithic kernel. Kept for retuning
    on other topologies."""
    import os

    T = g.shape[-2]
    dstate = None if lstate is None else lstate.get("llm.down")
    fused_ok = (
        mode == "real" and dspec is not None and tape is None
        and dspec.online_had == "full" and dspec.a_bits == 8
        and dspec.a_static and dspec.a_symmetric and dspec.out_bits is None
        and "w_col0" not in dp and "w_q" in dp
        and dstate is not None and dstate.get("act") is not None
        and dstate["act"].zero_point is None
        and jnp.ndim(dstate["act"].scale) == 0
        and T >= 256 and T % 256 == 0
        and jax.default_backend() in ("tpu", "axon")
        and os.environ.get("MQUANT_FUSED_TAIL", "0") == "1"
    )
    if fused_ok:
        from ..kernels.fwht import fused_swiglu_had_quant
        from ..kernels.qmm import quantized_matmul_pre

        sc = dstate["act"].scale
        q8 = fused_swiglu_had_quant(g, u, sc)
        y = quantized_matmul_pre(q8, sc, dp, g.dtype)
        if dp.get("b") is not None:
            y = y + dp["b"].astype(y.dtype)
        return y
    a = L.swiglu(g, u)
    return qlinear(a, dp, "llm.down", dspec, lstate, mode, tape)


def _use_fused_decode_attn(cfg: DecoderConfig, cache, T: int,
                           prefill_fresh: bool, attn_mask) -> bool:
    """Static (trace-time) eligibility for the fused decode-attention kernel
    (kernels/attn_decode.py). Engages only where its built-in mask
    (attn_start ≤ col ≤ pos) is exactly what the einsum path would derive:
    T == 1, live cache, no caller-supplied mask. ``MQUANT_ATTN``: auto
    (default — currently resolves to the XLA path: the model-level A/B at the
    flagship serving config, depth 28 / prefill 1024 / pallas_w4 GEMV, measured
    fused at 114.3 vs XLA 118.0 tok/s — the per-layer microbench win of
    ~48 µs (scripts/decode_layer_ablate.py) does not survive inside the fused
    while_loop, where XLA overlaps the einsum chain with the streaming GEMVs;
    scripts/attn_fused_ab.py reproduces), fused (forced; interpret-mode on
    CPU, used by the parity tests), xla (off)."""
    if attn_mask is not None or cache is None or prefill_fresh or T != 1:
        return False
    if cache["k"].dtype != cfg.dtype:
        return False  # int8 / nibble-packed uint4 KV, or mismatched fp cache
    hd, H, KV = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
    if hd % 128 != 0 or H % KV != 0:
        return False
    # both (S, KVH·hd) VMEM scratch buffers must fit comfortably; S must
    # accommodate the 8-row aligned write-back window
    S = cache["k"].shape[2]
    if S % 8 != 0:
        return False
    if 2 * S * KV * hd * jnp.dtype(cfg.dtype).itemsize > 12 * 2**20:
        return False
    knob = os.environ.get("MQUANT_ATTN", "auto")
    if knob == "fused":
        return True
    # auto == xla for now (measured slower at the serving config, see above);
    # the kernel also has no GSPMD partitioning rule, so it could never
    # auto-engage where anything is sharded
    return False


def decoder_forward(
    cfg: DecoderConfig,
    params: Dict,
    tokens_or_embeds: jax.Array,  # (B, T) int tokens or (B, T, hidden) embeds
    specs: Optional[Dict[str, SiteSpec]] = None,
    state: Optional[Dict] = None,
    mode: str = "fp",
    cache: Optional[Dict] = None,  # {"k": (L,B,S,KVH,hd), "v": ..., "pos":
    # scalar (aligned rows) or (B,) per-row write offsets (slot engine)}
    positions: Optional[jax.Array] = None,
    attn_mask: Optional[jax.Array] = None,  # (B, 1, T, S) bool
    collect_stats: bool = False,
    collect_samples: bool = False,
    token_mask: Optional[jax.Array] = None,  # (B, T) valid-token mask for calib
    last_index: Optional[jax.Array] = None,  # serving prefill: compute logits
    # only at this position (skips the B·T·hidden·vocab GEMM for all others)
    prefill_fresh: bool = False,  # cache is empty (pos 0): write it but attend
    # to the local T-long k/v causally — T×T attention + flash eligibility
    ntk_alpha: Optional[float] = None,  # dynamic-NTK alpha; None = derive from
    # the static prefill length (decode callers pass the prefill's alpha).
    # May be a traced (B,) vector: per-row alpha (slot-pool serving)
    attn_start: Optional[jax.Array] = None,  # (B,) int32 first attendable
    # cache column per row (left-padded ragged batches: pad columns hold
    # garbage K/V). Composes with the derived causal mask — callers pass this
    # instead of a materialized attn_mask so the fused decode kernel stays
    # eligible.
):
    """Full decoder forward. Returns (logits, new_cache, stats | None).

    ``specs``/``mode`` are jit-static; stats (when collected) are stacked per
    layer: each site maps to ObserverStats with leading (L,) axes.
    """
    specs = specs or {}
    if tokens_or_embeds.ndim == 2:
        h = params["embed"]["w"][tokens_or_embeds].astype(cfg.dtype)
    else:
        h = tokens_or_embeds.astype(cfg.dtype)
    B, T = h.shape[:2]

    if positions is None:
        offset = jnp.asarray(cache["pos"] if cache is not None else 0)
        if offset.ndim == 1:  # per-row slot positions
            positions = offset[:, None] + jnp.arange(T)[None, :]
        else:
            positions = jnp.arange(T)[None, :] + offset  # (B=1 broadcast, T)
        positions = jnp.broadcast_to(positions, (B, T))
        if cache is not None and "rope_delta" in cache:
            # M-RoPE decode: generated tokens continue at max(prefill
            # positions)+1, not at the token count — with an image in the
            # prompt the two differ by hundreds (HF get_rope_index/rope_deltas
            # parity). The attention mask below still uses cache["pos"] (the
            # true token count); only the RoPE angle shifts.
            positions = positions + cache["rope_delta"][:, None]
    if ntk_alpha is None:
        # prefill (no cache or fresh cache) derives alpha from its own static
        # length; a bare decode step without an explicit alpha uses 1.0 (the
        # reference's initial cached value)
        ntk_alpha = (ntk_alpha_for(cfg, T)
                     if (cache is None or prefill_fresh) else 1.0)
    cos, sin = rope_tables(cfg, positions, jnp.float32, ntk_alpha=ntk_alpha)

    fused_decode = _use_fused_decode_attn(cfg, cache, T, prefill_fresh,
                                          attn_mask)
    if (attn_mask is None and cache is not None and not prefill_fresh
            and not fused_decode):
        S = cache["k"].shape[2]
        p = jnp.asarray(cache["pos"])
        if p.ndim == 1:  # per-row slot positions → (B, 1, T, S) mask
            rows = p[:, None, None] + jnp.arange(T)[None, :, None]
            cols = jnp.arange(S)[None, None, :]
            attn_mask = (cols <= rows)[:, None]
        else:
            rows = p + jnp.arange(T)[:, None]
            cols = jnp.arange(S)[None, :]
            attn_mask = (cols <= rows)[None, None]
        if attn_start is not None:  # exclude left-pad columns
            st = jnp.asarray(attn_start, jnp.int32).reshape(-1)
            attn_mask = attn_mask & (
                jnp.arange(S)[None, None, None, :]
                >= st[:, None, None, None])
    # no-cache + no mask → causal handled inside the attention (flash path)
    # fused_decode → the mask (attn_start ≤ col ≤ pos) is realized inside
    # the Pallas kernel; attn_mask stays None

    # split quant state: per-layer sites (stacked (L,...) leaves, scanned) vs
    # global sites like lm_head (used outside the scan)
    layer_site_names = {"llm." + s for s in LLM_SITES}
    lstate = None
    if state:
        lstate = {k: v for k, v in state.items() if k in layer_site_names} or None

    # Stacked-GEMV decode: under the packed-W4 Pallas GEMV, take the big
    # packed byte arrays OUT of the scanned xs and pass them to the kernels
    # whole, with the layer index resolved INSIDE the kernel's block specs
    # (kernels/qmm.py::_qmm_pallas_w4_stacked). A dynamic-slice feeding a
    # Pallas custom call cannot fuse into the operand read, so the scanned
    # form materialized every layer's full weight slice per decode step —
    # measured 123.5 → 160.9 tok/s at the depth-28 serving config (176.5
    # with the packed-W4 lm_head, scripts/head_w4_ab.py).
    big_w: Dict = {}
    layers_in = params["layers"]
    # T ≤ 32 matches the kernel-side GEMV cutoff (quantized_matmul_pre):
    # besides plain decode (T=1, batched pools included via the batch dim)
    # this covers the speculative verify forward (T=k+1), which streams the
    # full weight stack per step just like decode does.
    if (T <= 32 and mode == "real" and cache is not None
            and os.environ.get("MQUANT_GEMV", "xla") == "pallas_w4"):
        _in_dims = {"q": cfg.hidden, "k": cfg.hidden, "v": cfg.hidden,
                    "gate": cfg.hidden, "up": cfg.hidden,
                    "o": cfg.n_heads * cfg.head_dim, "down": cfg.inter_eff}
        lay2 = {}
        for site, entry in layers_in.items():
            indim = _in_dims.get(site)
            if isinstance(entry, dict) and indim is not None:
                e2 = dict(entry)
                for key in ("w_q", "w_q_fused"):
                    arr = e2.get(key)
                    # split-half PACKED storage only (rows == in/2): split
                    # sites (w_col0, in−1 rows) and unpacked int8 never match
                    if (arr is not None and hasattr(arr, "dtype")
                            and arr.dtype == jnp.int8 and arr.ndim == 3
                            and arr.shape[0] == cfg.n_layers
                            and arr.shape[-2] * 2 == indim
                            and arr.size >= (1 << 20)
                            and "a_perm" not in e2
                            and e2.get("w_zp") is None
                            and e2["w_scale"].ndim == 2):
                        big_w[(site, key)] = arr
                        del e2[key]
                lay2[site] = e2
            else:
                lay2[site] = entry
        if big_w:
            layers_in = lay2

    def body(carry, xs):
        h = carry
        lp, lst, cache_kv, lidx = xs
        if big_w:
            lp = {s: (dict(e) if isinstance(e, dict) else e)
                  for s, e in lp.items()}
            for (site, key), arr in big_w.items():
                lp[site][key + "_all"] = arr
                lp[site]["layer_idx"] = lidx[None]
        tape = L.Tape(specs=specs, collect_samples=collect_samples) if collect_stats else None
        if tape is not None and token_mask is not None:
            tape.mask = token_mask
        h, new_cache = _layer_step(
            cfg, specs, mode, h, lp, lst, cache_kv,
            cache["pos"] if cache is not None else None,
            cos, sin, attn_mask, tape, prefill_fresh=prefill_fresh,
            fused_decode=fused_decode, attn_start=attn_start,
        )
        ys = {}
        if new_cache is not None:
            ys["cache"] = new_cache
        if tape is not None:
            ys["stats"] = tape.stats
            if collect_samples:
                ys["samples"] = tape.samples
        return h, ys

    cache_arrays = None
    _CACHE_SCALARS = ("pos", "rope_delta")  # no leading (L,) axis → not scanned
    if cache is not None:
        cache_arrays = {k: v for k, v in cache.items() if k not in _CACHE_SCALARS}
    xs = (layers_in, lstate, cache_arrays,
          jnp.arange(cfg.n_layers, dtype=jnp.int32))
    # MQUANT_SCAN_UNROLL (recorded experiment — keep 1): unrolling the layer
    # scan was hypothesized to let the scheduler overlap layer i's small-op
    # attention tail with layer i+1's weight DMA, but MEASURED at the depth-28
    # serving config it is sharply slower (117.9 → 64.0 tok/s at unroll=2,
    # 46.8 at 4 — scripts/decode_unroll_ab.py): the unrolled body defeats the
    # loop's in-place cache aliasing and re-materializes per-layer state.
    unroll = int(os.environ.get("MQUANT_SCAN_UNROLL", "1"))
    h, ys = jax.lax.scan(body, h, xs, unroll=max(1, unroll))

    if last_index is not None:
        li = jnp.asarray(last_index, jnp.int32)
        if li.ndim == 1:
            # per-row last positions (batched admission prefill: rows in the
            # same length bucket keep their own true lengths)
            h = jnp.take_along_axis(h, li[:, None, None], axis=1)
        else:
            h = jax.lax.dynamic_slice_in_dim(h, li, 1, 1)
    h = L.rms_norm(h, params["ln_f"]["w"], cfg.norm_eps)
    if cfg.tie_embeddings:
        logits = h @ params["embed"]["w"].T.astype(h.dtype)
    else:
        logits = qlinear(h, params["lm_head"], "llm.lm_head", specs.get("llm.lm_head"), state, mode)

    new_cache = None
    if cache is not None:
        new_cache = dict(ys["cache"])
        new_cache["pos"] = cache["pos"] + T
        if "rope_delta" in cache:
            new_cache["rope_delta"] = cache["rope_delta"]
    stats = ys.get("stats") if isinstance(ys, dict) else None
    samples = ys.get("samples") if isinstance(ys, dict) else None
    return logits, new_cache, (stats, samples) if collect_stats else None


def init_cache(cfg: DecoderConfig, batch: int, max_len: int, dtype=None,
               quantized=False) -> Dict:
    """KV cache. ``quantized`` ∈ {False, True/8, 4}:

    - True/8: int8 values + per-token-per-head symmetric scales — half the
      memory/bandwidth of bf16 (the k/v-cache quantization the reference only
      parses flags for, ref: fake_quant/utils.py:221-267).
    - 4: nibble-packed uint4 values (two per uint8 byte along head_dim) +
      per-token-per-head ASYMMETRIC scale/zero-point — quarter memory. The
      asymmetric grid matters at 4 bits: per-(token, head) K/V slices are
      not zero-centred, and symmetric int4 (-7..7) wastes half its codes on
      one side.

    Dtype is the type tag (static under jit): uint8 k/v ⇒ int4-packed,
    int8 ⇒ int8, else fp."""
    dtype = dtype or cfg.dtype
    shape = (cfg.n_layers, batch, max_len, cfg.n_kv_heads, cfg.head_dim)
    if int(quantized) == 4:
        assert cfg.head_dim % 2 == 0, cfg.head_dim
        return {
            "k": jnp.zeros(shape[:-1] + (cfg.head_dim // 2,), jnp.uint8),
            "v": jnp.zeros(shape[:-1] + (cfg.head_dim // 2,), jnp.uint8),
            "k_scale": jnp.zeros(shape[:-1], jnp.float32),
            "v_scale": jnp.zeros(shape[:-1], jnp.float32),
            "k_zp": jnp.zeros(shape[:-1], jnp.float32),
            "v_zp": jnp.zeros(shape[:-1], jnp.float32),
            "pos": jnp.zeros((), jnp.int32),
        }
    if quantized:
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.zeros(shape[:-1], jnp.float32),
            "v_scale": jnp.zeros(shape[:-1], jnp.float32),
            "pos": jnp.zeros((), jnp.int32),
        }
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "pos": jnp.zeros((), jnp.int32),
    }


def _kv_pack4(val: jax.Array):
    """(…, hd) fp → nibble-packed uint4 with per-(…,) asym scale/zp."""
    v32 = val.astype(jnp.float32)
    mn, mx = v32.min(axis=-1), v32.max(axis=-1)
    scale = jnp.maximum((mx - mn) / 15.0, 1e-8)
    zp = jnp.clip(jnp.round(-mn / scale), 0, 15)
    q = jnp.clip(jnp.round(v32 / scale[..., None]) + zp[..., None],
                 0, 15).astype(jnp.uint8)
    return q[..., 0::2] | (q[..., 1::2] << 4), scale, zp


def _kv_unpack4(packed: jax.Array, scale: jax.Array, zp: jax.Array,
                out_dtype) -> jax.Array:
    """Inverse of :func:`_kv_pack4`: (…, hd/2) uint8 → (…, hd) fp."""
    lo = (packed & 0xF).astype(jnp.float32)
    hi = (packed >> 4).astype(jnp.float32)
    q = jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)
    return ((q - zp[..., None]) * scale[..., None]).astype(out_dtype)
