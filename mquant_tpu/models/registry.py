"""Model registry — the functional equivalent of the reference's per-model
pipeline dispatch (``exam/quant_{qwenvl,qwen2vl,internvl,minicpmv}.py`` +
``Model_Setting`` tables, ref: exam/quant_qwen2vl.py:23-27) plus GLM-4V (which
the reference ships only as plugin model files)."""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple


class ModelFamily(NamedTuple):
    name: str
    config_fn: Callable[[], Any]  # preset → config
    tiny_fn: Callable[[], Any]
    init_fn: Callable  # (cfg, key) → params
    forward_fn: Callable  # (cfg, params, tokens, ...) → (logits, cache, stats)
    subsystems: tuple  # MSQ site prefixes


def _lazy(modname):
    import importlib

    return importlib.import_module(f"mquant_tpu.models.{modname}")


def get_family(name: str) -> ModelFamily:
    key = name.lower().replace("-", "").replace("_", "")
    if "qwen2vl" in key:
        m = _lazy("qwen2vl")
        presets = {"qwen2vl2b": m.Qwen2VLConfig.qwen2vl_2b,
                   "qwen2vl7b": m.Qwen2VLConfig.qwen2vl_7b,
                   "qwen2vl72b": m.Qwen2VLConfig.qwen2vl_72b}
        cfg_fn = presets.get(key, m.Qwen2VLConfig.qwen2vl_7b)
        return ModelFamily("qwen2vl", cfg_fn, m.Qwen2VLConfig.tiny,
                           m.init_qwen2vl_params, m.qwen2vl_forward,
                           ("vis", "merger", "llm"))
    if "qwenvl" in key or "qwen-vl" in key:
        m = _lazy("qwenvl")
        return ModelFamily("qwenvl", m.QwenVLConfig.qwenvl_chat,
                           m.QwenVLConfig.tiny, m.init_qwenvl_params,
                           m.qwenvl_forward, ("vis", "res", "llm"))
    if "internvl" in key:
        m = _lazy("internvl")
        return ModelFamily("internvl", m.InternVLConfig.internvl2_8b,
                           m.InternVLConfig.tiny, m.init_internvl_params,
                           m.internvl_forward, ("vis", "proj", "llm"))
    if "minicpm" in key:
        m = _lazy("minicpmv")
        return ModelFamily("minicpmv", m.MiniCPMVConfig.minicpmv_2_6,
                           m.MiniCPMVConfig.tiny, m.init_minicpmv_params,
                           m.minicpmv_forward, ("vis", "res", "llm"))
    if "glm" in key:
        m = _lazy("glm4v")
        return ModelFamily("glm4v", m.GLM4VConfig.glm4v_9b, m.GLM4VConfig.tiny,
                           m.init_glm4v_params, m.glm4v_forward,
                           ("vis", "proj", "llm"))
    raise ValueError(f"unknown model family {name!r}")


SUPPORTED_MODELS = ("Qwen-VL-Chat", "Qwen2-VL-2B", "Qwen2-VL-7B", "Qwen2-VL-72B",
                    "InternVL2-8B", "MiniCPM-V-2_6", "GLM-4V-9B")
