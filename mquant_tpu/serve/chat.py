"""Chat prompt construction per model family.

Capability parity with the reference's context builders: Qwen-VL's ChatML
``make_context`` (ref: model/qwen_generation_utils.py:119) with ``<img>`` tags
(ref: model/tokenization_qwen.py from_list_format), Qwen2-VL's vision
start/end + image_pad ChatML, InternVL's <image> convention, MiniCPM-V's
interleaved messages (ref: exam/minicpmv.py:60-125 generate_with_interleaved),
GLM-4V's boi/eoi span. Token ids come from an injectable tokenizer; the
image-slot count is supplied by the caller (depends on resolution).
"""

from __future__ import annotations

from typing import List, Optional


def build_chat_prompt(family: str, question: str, n_image_tokens: int,
                      system: Optional[str] = None) -> dict:
    """→ {"text_before", "text_after", "image_slot"} pieces; the runner encodes
    text pieces and splices ``n_image_tokens`` image-pad tokens between them."""
    system = system or "You are a helpful assistant."
    if n_image_tokens == 0:
        # text-only context: same chat scaffold, no image markers
        if family == "glm4v":
            return {"text_before": "[gMASK]<sop><|user|>\n",
                    "text_after": f"{question}<|assistant|>\n",
                    "n_image_tokens": 0}
        before = (f"<|im_start|>system\n{system}<|im_end|>\n<|im_start|>user\n"
                  if family != "minicpmv" else "<|im_start|>user\n")
        return {"text_before": before,
                "text_after": f"{question}<|im_end|>\n<|im_start|>assistant\n",
                "n_image_tokens": 0}
    if family == "qwen2vl":
        before = (f"<|im_start|>system\n{system}<|im_end|>\n"
                  f"<|im_start|>user\n<|vision_start|>")
        after = f"<|vision_end|>{question}<|im_end|>\n<|im_start|>assistant\n"
    elif family == "qwenvl":
        # ChatML with Picture tags (ref: make_context + from_list_format)
        before = (f"<|im_start|>system\n{system}<|im_end|>\n"
                  f"<|im_start|>user\nPicture 1: <img>")
        after = f"</img>\n{question}<|im_end|>\n<|im_start|>assistant\n"
    elif family == "internvl":
        before = f"<|im_start|>system\n{system}<|im_end|>\n<|im_start|>user\n<img>"
        after = f"</img>\n{question}<|im_end|>\n<|im_start|>assistant\n"
    elif family == "minicpmv":
        before = f"<|im_start|>user\n<image>"
        after = f"</image>\n{question}<|im_end|>\n<|im_start|>assistant\n"
    elif family == "glm4v":
        before = "[gMASK]<sop><|user|>\n"
        after = f"\n{question}<|assistant|>\n"
    else:
        before, after = "", question
    return {"text_before": before, "text_after": after,
            "n_image_tokens": n_image_tokens}


def build_interleaved(family: str, segments: List, n_image_tokens: int) -> List[dict]:
    """Interleaved text/image message building (the reference's MiniCPM-V
    ``generate_with_interleaved``): segments is a list of strings and the
    literal marker "<image>"; returns [{"kind": "text"|"image", ...}] pieces."""
    out = []
    for seg in segments:
        if seg == "<image>":
            out.append({"kind": "image", "n_tokens": n_image_tokens})
        else:
            out.append({"kind": "text", "text": seg})
    return out


def build_multi_image_prompt(family: str, question: str,
                             n_tokens_per_image: List[int],
                             system: Optional[str] = None) -> List[dict]:
    """Multi-image chat context → ordered pieces
    [{"kind": "text", "text": ...} | {"kind": "image", "n_tokens": ...}].

    Image markup parity per family: Qwen-VL numbers pictures
    ("Picture k: <img>…</img>\\n", ref: model/tokenization_qwen.py
    from_list_format + modeling_qwen_opt.py:598-616 multi-span handling),
    Qwen2-VL repeats <|vision_start|>…<|vision_end|>, InternVL numbers
    "Image-k: <img>…</img>\\n", MiniCPM-V repeats <image>…</image>, GLM-4V
    repeats its boi/eoi span."""
    system = system or "You are a helpful assistant."
    k = len(n_tokens_per_image)
    if k == 0:
        p = build_chat_prompt(family, question, 0, system=system)
        return [{"kind": "text", "text": p["text_before"] + p["text_after"]}]
    if k == 1:
        p = build_chat_prompt(family, question, n_tokens_per_image[0],
                              system=system)
        return [{"kind": "text", "text": p["text_before"]},
                {"kind": "image", "n_tokens": p["n_image_tokens"]},
                {"kind": "text", "text": p["text_after"]}]

    if family == "glm4v":
        head, tail = "[gMASK]<sop><|user|>\n", f"\n{question}<|assistant|>\n"
        open_tag, close_tag, numbered = "", "", None
    elif family == "qwen2vl":
        head = (f"<|im_start|>system\n{system}<|im_end|>\n<|im_start|>user\n")
        tail = f"{question}<|im_end|>\n<|im_start|>assistant\n"
        open_tag, close_tag, numbered = "<|vision_start|>", "<|vision_end|>", None
    elif family == "qwenvl":
        head = f"<|im_start|>system\n{system}<|im_end|>\n<|im_start|>user\n"
        tail = f"{question}<|im_end|>\n<|im_start|>assistant\n"
        open_tag, close_tag, numbered = "<img>", "</img>\n", "Picture {k}: "
    elif family == "internvl":
        head = f"<|im_start|>system\n{system}<|im_end|>\n<|im_start|>user\n"
        tail = f"{question}<|im_end|>\n<|im_start|>assistant\n"
        open_tag, close_tag, numbered = "<img>", "</img>\n", "Image-{k}: "
    elif family == "minicpmv":
        head, tail = "<|im_start|>user\n", (f"\n{question}<|im_end|>\n"
                                            f"<|im_start|>assistant\n")
        open_tag, close_tag, numbered = "<image>", "</image>", None
    else:
        head, tail, open_tag, close_tag, numbered = "", question, "", "", None

    pieces: List[dict] = []
    text = head
    for i, n in enumerate(n_tokens_per_image):
        if numbered:
            text += numbered.format(k=i + 1)
        text += open_tag
        pieces.append({"kind": "text", "text": text})
        pieces.append({"kind": "image", "n_tokens": n})
        text = close_tag
    pieces.append({"kind": "text", "text": text + tail})
    return pieces
