"""Quantization artifact serialization.

The reference has only stage-level pickles (whole-model ``torch.save`` behind
--dump_gptq/--load_gptq, ref: exam/quant_qwenvl.py:181-196) and NEVER persists
calibrated activation scales — calibration reruns every invocation
(SURVEY §5 "checkpoint/resume"). Here the complete quantization artifact —
transformed/quantized params, static activation scales, rotation metadata,
specs — is one directory:

    artifact/
      params.msgpack      # weight pytree (possibly int-realized)
      state.msgpack       # static activation QuantParams per site
      meta.json           # specs, rotation info, model config, versions

msgpack via flax.serialization (framework-neutral, no pickle), structure
restored against a template pytree.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _to_serializable(tree):
    """None leaves → sentinel (msgpack can't hold None in flax state dicts)."""

    def conv(x):
        return np.asarray(x)

    def walk(t):
        if t is None:
            return {"__none__": np.zeros((0,), np.int8)}
        if isinstance(t, dict):
            return {k: walk(v) for k, v in t.items()}
        if isinstance(t, tuple) and hasattr(t, "_fields"):  # NamedTuple
            return {"__namedtuple__": type(t).__name__,
                    **{k: walk(v) for k, v in t._asdict().items()}}
        return conv(t)

    return walk(tree)


# Quantization metadata that must stay full-precision on load: casting
# per-channel dequant scales (or the fp-kept RMS-split column ``w_col0``) to
# bf16's 8-bit mantissa would degrade the real-int path's dequant accuracy and
# defeat the point of keeping col0 in fp.
_NO_CAST_KEYS = frozenset({"w_scale", "scale", "zero_point", "w_col0",
                           "k_scale", "v_scale", "k_zp", "v_zp"})


def _from_serializable(t, dtype=None):
    from ..core.quant import QuantParams

    if isinstance(t, dict):
        if "__none__" in t:
            return None
        if t.get("__namedtuple__") == "QuantParams":
            return QuantParams(
                scale=_from_serializable(t["scale"]),
                zero_point=_from_serializable(t["zero_point"]))
        return {k: _from_serializable(v, None if k in _NO_CAST_KEYS else dtype)
                for k, v in t.items() if k != "__namedtuple__"}
    arr = jnp.asarray(t)
    if dtype is not None and jnp.issubdtype(arr.dtype, jnp.floating):
        arr = arr.astype(dtype)
    return arr


def save_artifact(path: str, params: Dict, state: Optional[Dict] = None,
                  specs: Optional[Dict] = None, meta: Optional[Dict] = None):
    from flax import serialization

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(_to_serializable(params)))
    if state is not None:
        with open(os.path.join(path, "state.msgpack"), "wb") as f:
            f.write(serialization.msgpack_serialize(_to_serializable(state)))
    m = dict(meta or {})
    if specs is not None:
        m["specs"] = {k: dataclasses.asdict(v) for k, v in specs.items()}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(m, f, indent=1, default=str)


def load_artifact(path: str, dtype=None) -> Tuple[Dict, Optional[Dict], Dict, Dict]:
    """Returns (params, state, specs, meta)."""
    from flax import serialization

    from ..models.layers import SiteSpec

    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        params = _from_serializable(serialization.msgpack_restore(f.read()), dtype)
    state = None
    sp = os.path.join(path, "state.msgpack")
    if os.path.exists(sp):
        with open(sp, "rb") as f:
            state = _from_serializable(serialization.msgpack_restore(f.read()))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    specs = {}
    for k, v in meta.pop("specs", {}).items():
        v = dict(v)
        v["online_had"] = v.get("online_had") or None
        for fk in ("w_bits", "a_bits", "out_bits"):
            if v.get(fk) in ("None", None):
                v[fk] = None
            elif isinstance(v[fk], str):
                v[fk] = int(v[fk])
        specs[k] = SiteSpec(**v)
    return params, state, specs, meta


# ---------------------------------------------------------------------------
# model-config (de)serialization — artifacts must be self-describing so the
# deploy path (artifact → HTTP server) needs no Python-side config object
# ---------------------------------------------------------------------------

_CONFIG_MODULES = ("llm", "vision", "resampler", "projectors", "qwen2vl",
                   "qwenvl", "internvl", "minicpmv", "glm4v", "buckets")


def config_to_dict(cfg) -> Dict:
    """Nested config dataclass → JSON-safe dict (class names by value,
    dtypes by name, tuples tagged so they survive the round trip)."""

    def enc(v):
        if dataclasses.is_dataclass(v) and not isinstance(v, type):
            return {"__class__": type(v).__name__,
                    "fields": {f.name: enc(getattr(v, f.name))
                               for f in dataclasses.fields(v)}}
        if isinstance(v, tuple):
            return {"__tuple__": [enc(x) for x in v]}
        if isinstance(v, list):
            return [enc(x) for x in v]
        if isinstance(v, (type, np.dtype)):  # jnp.float32 / ml_dtypes.bfloat16
            return {"__dtype__": np.dtype(v).name}
        return v

    return enc(cfg)


def _config_class(name: str):
    import importlib

    for m in _CONFIG_MODULES:
        mod = importlib.import_module(f"mquant_tpu.models.{m}")
        c = getattr(mod, name, None)
        if c is not None and dataclasses.is_dataclass(c):
            return c
    raise KeyError(f"unknown config class {name!r}")


def config_from_dict(d: Dict):
    """Inverse of :func:`config_to_dict`."""

    def dec(v):
        if isinstance(v, dict) and "__class__" in v:
            cls = _config_class(v["__class__"])
            return cls(**{k: dec(x) for k, x in v["fields"].items()})
        if isinstance(v, dict) and "__tuple__" in v:
            return tuple(dec(x) for x in v["__tuple__"])
        if isinstance(v, dict) and "__dtype__" in v:
            return np.dtype(v["__dtype__"])
        if isinstance(v, list):
            return [dec(x) for x in v]
        return v

    return dec(d)


# ---------------------------------------------------------------------------
# safetensors interop — the de-facto standard weight format, so the quantized
# artifact (int-realized weights + scales + static act scales) can be consumed
# by non-JAX toolchains. Structure (dict nesting, QuantParams namedtuples,
# None slots) is recorded in the safetensors metadata and restored on load.
# ---------------------------------------------------------------------------


def _st_flatten(tree, prefix: str, out: Dict, meta: Dict):
    if tree is None:
        meta[prefix] = "none"
        return
    if isinstance(tree, dict):
        meta[prefix] = "dict"
        for k, v in tree.items():
            assert "/" not in str(k), k
            _st_flatten(v, f"{prefix}/{k}" if prefix else str(k), out, meta)
        return
    if isinstance(tree, tuple) and hasattr(tree, "_fields"):  # NamedTuple
        meta[prefix] = f"nt:{type(tree).__name__}"
        for k, v in tree._asdict().items():
            _st_flatten(v, f"{prefix}/{k}", out, meta)
        return
    out[prefix] = np.asarray(tree)


def _nt_class(name: str):
    from ..core.quant import QuantParams
    from ..observe.observers import ObserverStats

    return {"QuantParams": QuantParams, "ObserverStats": ObserverStats}[name]


def export_safetensors(tree: Dict, path: str, extra_meta: Optional[Dict] = None):
    """Write a params/state pytree as one .safetensors file (bf16 tensors
    are stored natively — safetensors supports ml_dtypes bfloat16)."""
    from safetensors.numpy import save_file

    out: Dict[str, np.ndarray] = {}
    meta: Dict[str, str] = {}
    _st_flatten(tree, "", out, meta)
    md = {"mquant_structure": json.dumps(meta)}
    if extra_meta:
        md.update({k: str(v) for k, v in extra_meta.items()})
    save_file(out, path, metadata=md)


def import_safetensors(path: str) -> Tuple[Dict, Dict]:
    """Inverse of :func:`export_safetensors` → (tree, metadata)."""
    from safetensors.numpy import load_file
    from safetensors import safe_open

    flat = load_file(path)
    with safe_open(path, framework="numpy") as f:
        md = dict(f.metadata() or {})
    meta = json.loads(md.pop("mquant_structure"))

    root: Dict = {}

    def set_path(key: str, val):
        parts = key.split("/") if key else []
        cur = root
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        if parts:
            cur[parts[-1]] = val
        return cur

    for k, v in flat.items():
        set_path(k, jnp.asarray(v))
    for k, kind in meta.items():
        if kind == "none":
            set_path(k, None)
    # rebuild namedtuples bottom-up (deepest paths first)
    for k, kind in sorted(meta.items(), key=lambda kv: -kv[0].count("/")):
        if not kind.startswith("nt:"):
            continue
        cls = _nt_class(kind[3:])
        parts = k.split("/") if k else []
        cur = root
        for p in parts[:-1]:
            cur = cur[p]
        node = cur[parts[-1]] if parts else root
        nt = cls(**{f: node.get(f) for f in cls._fields})
        if parts:
            cur[parts[-1]] = nt
        else:
            root = nt
    return root, md
