"""HF checkpoint loaders: safetensors → stacked parameter pytrees + surgery.

The reference performs weight surgery as an offline checkpoint-rewrite step
(``exam/qwen_opt.py``: split fused attn projections, de-interleave per-head
layouts, matrix ``proj`` → ``proj_fc`` Linear, precompute pos embeds;
``exam/minicpmv_opt.py``: resampler in_proj → q/k/v) and patches model code.
Here the same surgery happens at weight-LOAD time, mapping HF names straight
into the stacked (L, in, out) layout the TPU decoder scans over.

Conventions: HF torch linears store (out, in); ours are (in, out) → transpose.
All loaders return numpy trees (cast to device dtype by the caller).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np


class TensorStore:
    """Lazy name→array access over sharded/single safetensors or torch .bin."""

    def __init__(self, model_dir: str):
        self.dir = model_dir
        self._maps: Dict[str, str] = {}
        idx = os.path.join(model_dir, "model.safetensors.index.json")
        if os.path.exists(idx):
            with open(idx) as f:
                self._maps = json.load(f)["weight_map"]
            self._mode = "sharded"
        elif os.path.exists(os.path.join(model_dir, "model.safetensors")):
            self._mode = "single"
        elif os.path.exists(os.path.join(model_dir, "pytorch_model.bin")):
            self._mode = "torch"
            import torch

            self._torch_state = torch.load(
                os.path.join(model_dir, "pytorch_model.bin"), map_location="cpu",
                weights_only=True)
        else:
            raise FileNotFoundError(f"no checkpoint found in {model_dir}")
        self._open_files: Dict[str, object] = {}

    def _file_for(self, name: str):
        from safetensors import safe_open

        fn = (self._maps.get(name, "model.safetensors")
              if self._mode == "sharded" else "model.safetensors")
        if fn not in self._open_files:
            self._open_files[fn] = safe_open(
                os.path.join(self.dir, fn), framework="np")
        return self._open_files[fn]

    def __contains__(self, name: str) -> bool:
        if self._mode == "torch":
            return name in self._torch_state
        try:
            return name in self._file_for(name).keys()
        except Exception:
            return False

    def get(self, name: str, dtype=np.float32) -> np.ndarray:
        if self._mode == "torch":
            import torch

            t = self._torch_state[name]
            if t.dtype == torch.bfloat16:
                t = t.float()
            return np.asarray(t.numpy(), dtype)
        f = self._file_for(name)
        arr = f.get_tensor(name)
        if arr.dtype == np.dtype("V2") or str(arr.dtype) == "bfloat16":
            # numpy-framework safetensors returns ml_dtypes bfloat16
            import ml_dtypes

            arr = arr.view(ml_dtypes.bfloat16).astype(np.float32)
        return np.asarray(arr, dtype)

    def lin(self, prefix: str, bias: bool = True) -> dict:
        """HF Linear (out,in)+(out,) → our {"w": (in,out), "b": ...}."""
        w = self.get(prefix + ".weight").T
        b = self.get(prefix + ".bias") if bias and (prefix + ".bias") in self else None
        return {"w": w, "b": b}

    def norm(self, prefix: str) -> dict:
        d = {"w": self.get(prefix + ".weight")}
        if (prefix + ".bias") in self:
            d["b"] = self.get(prefix + ".bias")
        return d


def _stack(dicts: list) -> dict:
    """List of per-layer nested dicts → layer-stacked arrays (None preserved)."""
    out = {}
    for k in dicts[0]:
        vals = [d[k] for d in dicts]
        if isinstance(vals[0], dict):
            out[k] = _stack(vals)
        else:
            out[k] = None if vals[0] is None else np.stack(vals)
    return out


def _split_cols(w_t: np.ndarray, sizes: list[int]):
    """Split a fused HF (out, in) weight along OUT into consecutive groups,
    returning our-layout (in, out_i) pieces."""
    outs = []
    o = 0
    for s in sizes:
        outs.append(w_t[o:o + s].T)
        o += s
    return outs


# ---------------------------------------------------------------------------
# Qwen2-VL (HF `qwen2_vl`)
# ---------------------------------------------------------------------------


def load_qwen2vl(cfg, model_dir: str) -> Dict:
    """HF Qwen2-VL → params. Surgery: fused visual ``attn.qkv`` split in
    contiguous thirds; conv3d patch embed flattened to the patchify layout;
    2B's tied lm_head untied (ref: exam/quant_qwen2vl.py:35-48)."""
    ts = TensorStore(model_dir)
    lcfg, vcfg, mcfg = cfg.llm, cfg.vit, cfg.merger

    # -- LLM -- (naming varies across transformers versions)
    if "model.language_model.embed_tokens.weight" in ts:
        pref = "model.language_model."
    elif "model.embed_tokens.weight" in ts:
        pref = "model."
    else:
        pref = "language_model.model."
    layers = []
    for i in range(lcfg.n_layers):
        b = f"{pref}layers.{i}."
        layers.append({
            "ln1": ts.norm(b + "input_layernorm"),
            "q": ts.lin(b + "self_attn.q_proj"),
            "k": ts.lin(b + "self_attn.k_proj"),
            "v": ts.lin(b + "self_attn.v_proj"),
            "o": ts.lin(b + "self_attn.o_proj"),
            "ln2": ts.norm(b + "post_attention_layernorm"),
            "gate": ts.lin(b + "mlp.gate_proj"),
            "up": ts.lin(b + "mlp.up_proj"),
            "down": ts.lin(b + "mlp.down_proj"),
        })
    embed = ts.get(pref + "embed_tokens.weight")
    llm = {
        "embed": {"w": embed},
        "layers": _stack(layers),
        "ln_f": ts.norm(pref + "norm"),
    }
    # untie before fusion/rotation, as the reference does for 2B
    llm["lm_head"] = ({"w": ts.get("lm_head.weight").T, "b": None}
                      if "lm_head.weight" in ts else {"w": embed.T.copy(), "b": None})

    # -- visual --
    vp = ("model.visual." if "model.visual.patch_embed.proj.weight" in ts
          else "visual.")
    conv = ts.get(vp + "patch_embed.proj.weight")  # (out, C, T, ph, pw)
    out_c = conv.shape[0]
    # flatten order must match patchify_qwen2vl: (ph, pw, t, c)
    w_pe = conv.transpose(3, 4, 2, 1, 0).reshape(-1, out_c)
    blocks = []
    for i in range(vcfg.n_layers):
        b = f"{vp}blocks.{i}."
        qkvw = ts.get(b + "attn.qkv.weight")  # (3W, W)
        qw, kw, vw = _split_cols(qkvw, [vcfg.width] * 3)
        qkvb = ts.get(b + "attn.qkv.bias") if (b + "attn.qkv.bias") in ts else None
        if qkvb is not None:
            qb, kb, vb = np.split(qkvb, 3)
        else:
            qb = kb = vb = None
        blocks.append({
            "ln1": ts.norm(b + "norm1"),
            "q": {"w": qw, "b": qb},
            "k": {"w": kw, "b": kb},
            "v": {"w": vw, "b": vb},
            "o": ts.lin(b + "attn.proj"),
            "ln2": ts.norm(b + "norm2"),
            "fc1": ts.lin(b + "mlp.fc1"),
            "fc2": ts.lin(b + "mlp.fc2"),
        })
    vit = {"patch_embed": {"w": w_pe, "b": None}, "blocks": _stack(blocks)}

    merger = {
        "ln_q": ts.norm(vp + "merger.ln_q"),
        "mlp0": ts.lin(vp + "merger.mlp.0"),
        "mlp2": ts.lin(vp + "merger.mlp.2"),
    }
    return {"llm": llm, "vit": vit, "merger": merger}


# ---------------------------------------------------------------------------
# Qwen-VL (remote-code `qwen`) — surgery parity with exam/qwen_opt.py
# ---------------------------------------------------------------------------


def load_qwenvl(cfg, model_dir: str) -> Dict:
    """HF Qwen-VL-Chat (stock checkpoint) → params, performing at load time the
    conversion exam/qwen_opt.py does offline: c_attn → q/k/v (:78-108), visual
    in_proj per-head de-interleave (:110-151), attn_pool in_proj → q/k/v
    (:33-49), proj → proj_fc (:51-59), fc_sub_mean synthesis (:61-76)."""
    ts = TensorStore(model_dir)
    lcfg, vcfg, rcfg = cfg.llm, cfg.vit, cfg.resampler

    layers = []
    for i in range(lcfg.n_layers):
        b = f"transformer.h.{i}."
        ca_w = ts.get(b + "attn.c_attn.weight")  # (3H, H)
        qw, kw, vw = _split_cols(ca_w, [lcfg.hidden] * 3)
        ca_b = ts.get(b + "attn.c_attn.bias")
        qb, kb, vb = np.split(ca_b, 3)
        layers.append({
            "ln1": ts.norm(b + "ln_1"),
            "q": {"w": qw, "b": qb}, "k": {"w": kw, "b": kb}, "v": {"w": vw, "b": vb},
            "o": {"w": ts.get(b + "attn.c_proj.weight").T, "b": None},
            "ln2": ts.norm(b + "ln_2"),
            # Qwen MLP: out = c_proj(w1(x) * silu(w2(x))) → gate=w2, up=w1
            "gate": {"w": ts.get(b + "mlp.w2.weight").T, "b": None},
            "up": {"w": ts.get(b + "mlp.w1.weight").T, "b": None},
            "down": {"w": ts.get(b + "mlp.c_proj.weight").T, "b": None},
        })
    llm = {
        "embed": {"w": ts.get("transformer.wte.weight")},
        "layers": _stack(layers),
        "ln_f": ts.norm("transformer.ln_f"),
        "lm_head": {"w": ts.get("lm_head.weight").T, "b": None},
    }

    vp = "transformer.visual."
    W = vcfg.width
    H = vcfg.n_heads
    hd = W // H
    blocks = []
    for i in range(vcfg.n_layers):
        b = f"{vp}transformer.resblocks.{i}."
        inw = ts.get(b + "attn.in_proj.weight")  # (3W, W) INTERLEAVED per head
        inb = ts.get(b + "attn.in_proj.bias")
        # per-head interleaved [q_h0,k_h0,v_h0,q_h1,...] → contiguous q,k,v
        # (ref: exam/qwen_opt.py:110-151)
        w3 = inw.reshape(H, 3, hd, W)
        b3 = inb.reshape(H, 3, hd)
        qw = w3[:, 0].reshape(W, W).T
        kw = w3[:, 1].reshape(W, W).T
        vw = w3[:, 2].reshape(W, W).T
        blocks.append({
            "ln1": ts.norm(b + "ln_1"),
            "q": {"w": qw, "b": b3[:, 0].reshape(-1)},
            "k": {"w": kw, "b": b3[:, 1].reshape(-1)},
            "v": {"w": vw, "b": b3[:, 2].reshape(-1)},
            "o": ts.lin(b + "attn.out_proj"),
            "ln2": ts.norm(b + "ln_2"),
            "fc1": ts.lin(b + "mlp.c_fc"),
            "fc2": ts.lin(b + "mlp.c_proj"),
        })
    conv = ts.get(vp + "conv1.weight")  # (out, C, ph, pw), no bias
    w_pe = conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0])

    from ..transform.fuse import sub_mean_matrix

    vit = {
        "patch_embed": {"w": w_pe, "b": None},
        "pos_embed": {"w": ts.get(vp + "positional_embedding")},
        "ln_pre": ts.norm(vp + "ln_pre"),
        "ln_post": ts.norm(vp + "ln_post"),
        "fc_sub_mean": {"w": sub_mean_matrix(W), "b": None},
        "blocks": _stack(blocks),
    }

    # attn_pool: nn.MultiheadAttention in_proj → q/k/v (ref: exam/qwen_opt.py:33-49)
    ap = vp + "attn_pool."
    D = rcfg.width
    inw = ts.get(ap + "attn.in_proj_weight")
    inb = ts.get(ap + "attn.in_proj_bias")
    qw, kw, vw = _split_cols(inw, [D] * 3)
    qb, kb, vb = np.split(inb, 3)
    res = {
        "query": {"w": ts.get(ap + "query")},
        "ln_q": ts.norm(ap + "ln_q"),
        "ln_kv": ts.norm(ap + "ln_kv"),
        "kv_proj": {"w": ts.get(ap + "kv_proj.weight").T, "b": None},
        "q": {"w": qw, "b": qb}, "k": {"w": kw, "b": kb}, "v": {"w": vw, "b": vb},
        "out": ts.lin(ap + "attn.out_proj"),
        "ln_post": ts.norm(vp + "ln_post"),
        "pos_embed_kv": {"w": ts.get(ap + "pos_embed")},
        # matrix `proj` → proj_fc Linear with zero bias (ref: exam/qwen_opt.py:51-59)
        "proj_fc": {"w": ts.get(vp + "proj"),
                    "b": np.zeros(ts.get(vp + "proj").shape[1], np.float32)},
    }
    return {"llm": llm, "vit": vit, "res": res}


# ---------------------------------------------------------------------------
# InternVL2 (InternViT + InternLM2)
# ---------------------------------------------------------------------------


def load_internvl(cfg, model_dir: str) -> Dict:
    """InternVL2-8B. Surgery: vision fused qkv split; InternLM2's GQA-interleaved
    ``wqkv`` (groups × (q_per_group + 2) × head_dim layout,
    ref: internvl_rotation.py:99-123) split into contiguous q/k/v; fused
    mlp1 = [LN, fc1, GELU, fc2]."""
    ts = TensorStore(model_dir)
    lcfg, vcfg = cfg.llm, cfg.vit
    H, KV, hd = lcfg.n_heads, lcfg.n_kv_heads, lcfg.head_dim
    gsize = H // KV  # queries per kv group

    layers = []
    for i in range(lcfg.n_layers):
        b = f"language_model.model.layers.{i}."
        wqkv = ts.get(b + "attention.wqkv.weight")  # ((H+2KV)*hd, hidden)
        w3 = wqkv.reshape(KV, gsize + 2, hd, lcfg.hidden)
        qw = w3[:, :gsize].reshape(H * hd, lcfg.hidden).T
        kw = w3[:, gsize].reshape(KV * hd, lcfg.hidden).T
        vw = w3[:, gsize + 1].reshape(KV * hd, lcfg.hidden).T
        layers.append({
            "ln1": ts.norm(b + "attention_norm"),
            "q": {"w": qw, "b": None}, "k": {"w": kw, "b": None},
            "v": {"w": vw, "b": None},
            "o": {"w": ts.get(b + "attention.wo.weight").T, "b": None},
            "ln2": ts.norm(b + "ffn_norm"),
            "gate": {"w": ts.get(b + "feed_forward.w1.weight").T, "b": None},
            "up": {"w": ts.get(b + "feed_forward.w3.weight").T, "b": None},
            "down": {"w": ts.get(b + "feed_forward.w2.weight").T, "b": None},
        })
    llm = {
        "embed": {"w": ts.get("language_model.model.tok_embeddings.weight")},
        "layers": _stack(layers),
        "ln_f": ts.norm("language_model.model.norm"),
        "lm_head": {"w": ts.get("language_model.output.weight").T, "b": None},
    }

    vpre = "vision_model."
    blocks = []
    W = vcfg.width
    for i in range(vcfg.n_layers):
        b = f"{vpre}encoder.layers.{i}."
        qkvw = ts.get(b + "attn.qkv.weight")
        qw, kw, vw = _split_cols(qkvw, [W] * 3)
        qkvb = ts.get(b + "attn.qkv.bias")
        qb, kb, vb = np.split(qkvb, 3)
        blocks.append({
            "ln1": ts.norm(b + "norm1"),
            "q": {"w": qw, "b": qb}, "k": {"w": kw, "b": kb}, "v": {"w": vw, "b": vb},
            "o": ts.lin(b + "attn.proj"),
            "ls1": {"w": ts.get(b + "ls1")},
            "ln2": ts.norm(b + "norm2"),
            "fc1": ts.lin(b + "mlp.fc1"),
            "fc2": ts.lin(b + "mlp.fc2"),
            "ls2": {"w": ts.get(b + "ls2")},
        })
    conv = ts.get(vpre + "embeddings.patch_embedding.weight")
    w_pe = conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0])
    vit = {
        "patch_embed": {"w": w_pe,
                        "b": ts.get(vpre + "embeddings.patch_embedding.bias")},
        "pos_embed": {"w": ts.get(vpre + "embeddings.position_embedding")[0, 1:]},
        "blocks": _stack(blocks),
    }
    proj = {
        "ln": ts.norm("mlp1.0"),
        "fc1": ts.lin("mlp1.1"),
        "fc2": ts.lin("mlp1.3"),
    }
    return {"llm": llm, "vit": vit, "proj": proj}


# ---------------------------------------------------------------------------
# MiniCPM-V-2.6 (SigLIP + resampler + Qwen2)
# ---------------------------------------------------------------------------


def load_minicpmv(cfg, model_dir: str) -> Dict:
    """MiniCPM-V-2.6. Surgery: resampler nn.MultiheadAttention in_proj → q/k/v
    and proj → proj_fc (ref: exam/minicpmv_opt.py:20-48)."""
    ts = TensorStore(model_dir)
    lcfg, vcfg, rcfg = cfg.llm, cfg.vit, cfg.resampler

    layers = []
    for i in range(lcfg.n_layers):
        b = f"llm.model.layers.{i}."
        layers.append({
            "ln1": ts.norm(b + "input_layernorm"),
            "q": ts.lin(b + "self_attn.q_proj"),
            "k": ts.lin(b + "self_attn.k_proj"),
            "v": ts.lin(b + "self_attn.v_proj"),
            "o": ts.lin(b + "self_attn.o_proj"),
            "ln2": ts.norm(b + "post_attention_layernorm"),
            "gate": ts.lin(b + "mlp.gate_proj"),
            "up": ts.lin(b + "mlp.up_proj"),
            "down": ts.lin(b + "mlp.down_proj"),
        })
    llm = {
        "embed": {"w": ts.get("llm.model.embed_tokens.weight")},
        "layers": _stack(layers),
        "ln_f": ts.norm("llm.model.norm"),
        "lm_head": {"w": ts.get("llm.lm_head.weight").T, "b": None},
    }

    vpre = "vpm."
    W = vcfg.width
    blocks = []
    for i in range(vcfg.n_layers):
        b = f"{vpre}encoder.layers.{i}."
        blocks.append({
            "ln1": ts.norm(b + "layer_norm1"),
            "q": ts.lin(b + "self_attn.q_proj"),
            "k": ts.lin(b + "self_attn.k_proj"),
            "v": ts.lin(b + "self_attn.v_proj"),
            "o": ts.lin(b + "self_attn.out_proj"),
            "ln2": ts.norm(b + "layer_norm2"),
            "fc1": ts.lin(b + "mlp.fc1"),
            "fc2": ts.lin(b + "mlp.fc2"),
        })
    conv = ts.get(vpre + "embeddings.patch_embedding.weight")
    w_pe = conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0])
    vit = {
        "patch_embed": {"w": w_pe,
                        "b": ts.get(vpre + "embeddings.patch_embedding.bias")},
        "pos_embed": {"w": ts.get(vpre + "embeddings.position_embedding.weight")},
        "ln_post": ts.norm(vpre + "post_layernorm"),
        "blocks": _stack(blocks),
    }

    rp = "resampler."
    D = rcfg.width
    inw = ts.get(rp + "attn.in_proj_weight")
    inb = ts.get(rp + "attn.in_proj_bias")
    qw, kw, vw = _split_cols(inw, [D] * 3)
    qb, kb, vb = np.split(inb, 3)
    res = {
        "query": {"w": ts.get(rp + "query")},
        "ln_q": ts.norm(rp + "ln_q"),
        "ln_kv": ts.norm(rp + "ln_kv"),
        "kv_proj": {"w": ts.get(rp + "kv_proj.weight").T, "b": None},
        "q": {"w": qw, "b": qb}, "k": {"w": kw, "b": kb}, "v": {"w": vw, "b": vb},
        "out": ts.lin(rp + "attn.out_proj"),
        "ln_post": ts.norm(rp + "ln_post"),
        "proj_fc": {"w": ts.get(rp + "proj"),
                    "b": np.zeros(ts.get(rp + "proj").shape[1], np.float32)},
    }
    return {"llm": llm, "vit": vit, "res": res}


# ---------------------------------------------------------------------------
# GLM-4V (EVA2CLIP + ChatGLM)
# ---------------------------------------------------------------------------


def load_glm4v(cfg, model_dir: str) -> Dict:
    """GLM-4V-9B. Surgery: fused MQA ``query_key_value`` split [q | k | v];
    fused ``dense_h_to_4h`` split into [gate | up] halves (swiglu); EVA blocks'
    fused qkv split; conv downsample → 2×2-merge linear."""
    ts = TensorStore(model_dir)
    lcfg, vcfg = cfg.llm, cfg.vit
    H, KV, hd = lcfg.n_heads, lcfg.n_kv_heads, lcfg.head_dim

    layers = []
    for i in range(lcfg.n_layers):
        b = f"transformer.encoder.layers.{i}."
        qkvw = ts.get(b + "self_attention.query_key_value.weight")
        qw, kw, vw = _split_cols(qkvw, [H * hd, KV * hd, KV * hd])
        qkvb = ts.get(b + "self_attention.query_key_value.bias")
        qb = qkvb[:H * hd]
        kb = qkvb[H * hd:H * hd + KV * hd]
        vb = qkvb[H * hd + KV * hd:]
        h4 = ts.get(b + "mlp.dense_h_to_4h.weight")  # (2*ffn, hidden)
        gw, uw = _split_cols(h4, [lcfg.intermediate] * 2)
        layers.append({
            "ln1": ts.norm(b + "input_layernorm"),
            "q": {"w": qw, "b": qb}, "k": {"w": kw, "b": kb}, "v": {"w": vw, "b": vb},
            "o": {"w": ts.get(b + "self_attention.dense.weight").T, "b": None},
            "ln2": ts.norm(b + "post_attention_layernorm"),
            "gate": {"w": gw, "b": None},
            "up": {"w": uw, "b": None},
            "down": {"w": ts.get(b + "mlp.dense_4h_to_h.weight").T, "b": None},
        })
    llm = {
        "embed": {"w": ts.get("transformer.embedding.word_embeddings.weight")},
        "layers": _stack(layers),
        "ln_f": ts.norm("transformer.encoder.final_layernorm"),
        "lm_head": {"w": ts.get("transformer.output_layer.weight").T, "b": None},
    }

    vpre = "transformer.vision."
    W = vcfg.width
    blocks = []
    for i in range(vcfg.n_layers):
        b = f"{vpre}transformer.layers.{i}."
        qkvw = ts.get(b + "attention.query_key_value.weight")
        qw, kw, vw = _split_cols(qkvw, [W] * 3)
        qkvb = ts.get(b + "attention.query_key_value.bias")
        qb, kb, vb = np.split(qkvb, 3)
        blocks.append({
            "ln1": ts.norm(b + "input_layernorm"),
            "q": {"w": qw, "b": qb}, "k": {"w": kw, "b": kb}, "v": {"w": vw, "b": vb},
            "o": ts.lin(b + "attention.dense"),
            "ln2": ts.norm(b + "post_attention_layernorm"),
            "fc1": ts.lin(b + "mlp.fc1"),
            "fc2": ts.lin(b + "mlp.fc2"),
        })
    conv = ts.get(vpre + "patch_embedding.proj.weight")
    w_pe = conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0])
    vit = {
        "patch_embed": {"w": w_pe, "b": ts.get(vpre + "patch_embedding.proj.bias")},
        "pos_embed": {"w": ts.get(vpre + "patch_embedding.position_embedding.weight")[1:]},
        "blocks": _stack(blocks),
    }
    dconv = ts.get(vpre + "conv.weight")  # (out, in, 2, 2)
    proj = {
        "conv": {"w": dconv.transpose(2, 3, 1, 0).reshape(-1, dconv.shape[0]),
                 "b": ts.get(vpre + "conv.bias")},
        "linear_proj": {"w": ts.get(vpre + "linear_proj.linear_proj.weight").T, "b": None},
        "norm1": ts.norm(vpre + "linear_proj.norm1"),
        "gate": {"w": ts.get(vpre + "linear_proj.gate_proj.weight").T, "b": None},
        "h_to_4h": {"w": ts.get(vpre + "linear_proj.dense_h_to_4h.weight").T, "b": None},
        "4h_to_h": {"w": ts.get(vpre + "linear_proj.dense_4h_to_h.weight").T, "b": None},
        "boi": {"w": ts.get(vpre + "boi")[0]},
        "eoi": {"w": ts.get(vpre + "eoi")[0]},
    }
    return {"llm": llm, "vit": vit, "proj": proj}


LOADERS = {
    "qwen2vl": load_qwen2vl,
    "qwenvl": load_qwenvl,
    "internvl": load_internvl,
    "minicpmv": load_minicpmv,
    "glm4v": load_glm4v,
}


def load_model(family_name: str, cfg, model_dir: str, dtype=None) -> Dict:
    """Load + surgically convert an HF checkpoint into our param layout,
    optionally casting to `dtype` (jax arrays)."""
    params = LOADERS[family_name](cfg, model_dir)
    if dtype is not None:
        import jax.numpy as jnp

        def cast(x):
            return None if x is None else jnp.asarray(x, dtype)

        import jax

        params = jax.tree.map(cast, params, is_leaf=lambda x: x is None)
    return params
