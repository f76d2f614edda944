"""Perceiver-style resampler — the cross-modal module of Qwen-VL and MiniCPM-V.

A fixed set of learned queries cross-attends over the vision-encoder output and
projects to the LLM width. Covers:
  * Qwen-VL's ``attn_pool`` (256 queries, width 4096→hidden, precomputed
    ``pos_embed_kv``; ref: model/visual_opt.py:98-233 — already surgically
    rewritten by the reference into separate q/k/v/out linears + ``proj_fc``,
    which is the natural layout here too),
  * MiniCPM-V-2.6's adaptive-resolution resampler (ref: plugin/resampler.py:72-243,
    sincos 2D pos-embed cache :114-129, key_padding_mask :192-243).

Quant sites: ``res.kv_proj`` (optional), ``res.q/k/v/out/proj_fc`` — the wrap
set of ``qwenvl_add_act_qaunt``/``minicpmv_add_act_qaunt``
(ref: fake_quant/quant_utils.py:576-611).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L
from .layers import SiteSpec, qlinear


@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    n_queries: int  # 256 (Qwen-VL) / 64 (MiniCPM-V)
    width: int  # resampler embed dim (= LLM hidden for MiniCPM-V)
    kv_dim: int  # vision encoder output width
    n_heads: int
    out_dim: int = 0  # proj_fc output (0 → width, no proj)
    has_kv_proj: bool = True  # kv_dim → width projection
    norm_kind: str = "ln"
    norm_eps: float = 1e-6
    use_pos_embed: bool = True
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.width // self.n_heads


def init_resampler_params(cfg: ResamplerConfig, key: jax.Array,
                          n_pos: int = 1024, dtype=None) -> Dict:
    dtype = dtype or cfg.dtype
    ks = jax.random.split(key, 8)

    def w(k, i, o):
        return (jax.random.normal(k, (i, o), jnp.float32) / i**0.5).astype(dtype)

    def norm(n):
        d = {"w": jnp.ones((n,), dtype)}
        if cfg.norm_kind == "ln":
            d["b"] = jnp.zeros((n,), dtype)
        return d

    W = cfg.width
    p: Dict[str, Any] = {
        "query": {"w": (jax.random.normal(ks[0], (cfg.n_queries, W), jnp.float32)
                        * 0.02).astype(dtype)},
        "ln_q": norm(W),
        "ln_kv": norm(W),
        "q": {"w": w(ks[1], W, W), "b": jnp.zeros((W,), dtype)},
        "k": {"w": w(ks[2], W, W), "b": jnp.zeros((W,), dtype)},
        "v": {"w": w(ks[3], W, W), "b": jnp.zeros((W,), dtype)},
        "out": {"w": w(ks[4], W, W), "b": jnp.zeros((W,), dtype)},
        "ln_post": norm(W),
    }
    if cfg.has_kv_proj:
        p["kv_proj"] = {"w": w(ks[5], cfg.kv_dim, W), "b": None}
    if cfg.out_dim:
        p["proj_fc"] = {"w": w(ks[6], W, cfg.out_dim),
                        "b": jnp.zeros((cfg.out_dim,), dtype)}
    if cfg.use_pos_embed:
        p["pos_embed_kv"] = {"w": (jax.random.normal(ks[7], (n_pos, W), jnp.float32)
                                   * 0.02).astype(dtype)}
    return p


def sincos_2d_pos_embed(dim: int, gh: int, gw: int) -> np.ndarray:
    """2D sin-cos positional embedding (gh*gw, dim) — host-side, cached by the
    caller per resolution bucket (the functional replacement of MiniCPM-V's
    runtime pos-embed cache, ref: plugin/resampler.py:114-129)."""
    assert dim % 4 == 0
    d4 = dim // 4
    omega = 1.0 / (10000.0 ** (np.arange(d4) / d4))
    ys, xs = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")

    def enc(pos):
        a = pos.reshape(-1, 1) * omega[None, :]
        return np.concatenate([np.sin(a), np.cos(a)], axis=1)

    return np.concatenate([enc(ys.astype(np.float64)), enc(xs.astype(np.float64))],
                          axis=1)


def resampler_forward(
    cfg: ResamplerConfig,
    params: Dict,
    kv_feats: jax.Array,  # (B, S, kv_dim) vision encoder output
    specs: Optional[Dict[str, SiteSpec]] = None,
    state: Optional[Dict] = None,
    mode: str = "fp",
    key_mask: Optional[jax.Array] = None,  # (B, S) 1 = valid
    pos_embed_kv: Optional[jax.Array] = None,  # (S, width) override
    collect_stats: bool = False,
    collect_samples: bool = False,
    prefix: str = "res",
):
    """Returns (out (B, n_queries, out_dim or width), stats|None)."""
    specs = specs or {}
    tape = L.Tape(specs=specs, collect_samples=collect_samples) if collect_stats else None
    if tape is not None and key_mask is not None:
        tape.mask = key_mask

    def site(nm):
        return specs.get(f"{prefix}.{nm}")

    def nrm(x, np_):
        # bias presence decides LN vs RMSN (fusion drops the bias)
        if cfg.norm_kind == "ln" and np_.get("b") is not None:
            return L.layer_norm(x, np_["w"], np_.get("b"), cfg.norm_eps)
        return L.rms_norm(x, np_["w"], cfg.norm_eps)

    B, S, _ = kv_feats.shape
    x = kv_feats.astype(cfg.dtype)
    if cfg.has_kv_proj and "kv_proj" in params:
        x = qlinear(x, params["kv_proj"], f"{prefix}.kv_proj", site("kv_proj"),
                    state, mode, tape)
    kv = nrm(x, params["ln_kv"])
    if pos_embed_kv is None and cfg.use_pos_embed and "pos_embed_kv" in params:
        pos_embed_kv = params["pos_embed_kv"]["w"][:S]
    k_in = kv + pos_embed_kv[None].astype(kv.dtype) if pos_embed_kv is not None else kv

    q_in = nrm(params["query"]["w"][None].astype(cfg.dtype), params["ln_q"])
    q_in = jnp.broadcast_to(q_in, (B, cfg.n_queries, cfg.width))

    def qlin(x, pname, masked):
        # the key/value path carries the padding mask; query-side activations
        # (learned queries, attention output) are always fully valid
        if tape is not None:
            tape.mask = key_mask if masked else None
        return qlinear(x, params[pname], f"{prefix}.{pname}", site(pname),
                       state, mode, tape)

    q = qlin(q_in, "q", masked=False)
    k = qlin(k_in, "k", masked=True)
    v = qlin(kv, "v", masked=True)

    hd, H = cfg.head_dim, cfg.n_heads
    q = q.reshape(B, cfg.n_queries, H, hd)
    k = k.reshape(B, S, H, hd)
    v = v.reshape(B, S, H, hd)
    mask = None
    if key_mask is not None:
        mask = (key_mask[:, None, None, :] > 0)
    attn = L.attention(q, k, v, mask).reshape(B, cfg.n_queries, H * hd)
    out = qlin(attn, "out", masked=False)
    out = nrm(out, params["ln_post"])
    if "proj_fc" in params:
        out = qlin(out, "proj_fc", masked=False)
    if collect_stats:
        return out, (tape.stats, tape.samples)
    return out, None
