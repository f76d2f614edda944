"""Model-as-judge answer extraction for MCQ scoring.

The reference routes MCQ predictions that exact matching cannot parse to a
ChatGPT judge (ref: third/VLMEvalKit/vlmeval/dataset/image_mcq.py:216-224;
the judge prompt + retry loop live in vlmeval/dataset/utils/
multiple_choice.py:175-301 ``build_prompt``/``extract_answer_from_item``).
A zero-egress TPU deployment has no OpenAI endpoint — the native equivalent
lets ANY served model be the judge: a text-generation callable (the
framework's own ``VLMRunner``/``Generator``, or an HTTP
``/v1/completions`` endpoint) produces the matching verdict and the same
exact-matching rules parse it. The result plugs straight into
``score_mcq(rows, extract_fn=...)``.

The judge only ever runs on rows the exact matcher already failed, so a
weak judge can't FLIP a correct extraction — it can only rescue rows that
would otherwise score zero (same contract as the reference's fallback).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

__all__ = ["judge_prompt", "make_model_judge", "runner_judge"]


def judge_prompt(question: str, options: Dict[str, str],
                 prediction: str) -> str:
    """The answer-matching prompt: same task contract as the reference's
    judge (match a free-form answer to one option letter; Z when nothing
    matches), with two few-shot examples."""
    opts = "\n".join(f"{k}. {v}" for k, v in options.items())
    letters = ", ".join(options)
    return (
        "Match the answer to one option of a single-choice question. "
        f"Reply with exactly one letter among {letters}; reply Z if no "
        "option matches the answer.\n"
        "Question: What animal is shown?\nOptions:\nA. a cat\nB. a dog\n"
        "Answer: it looks like a small dog to me\nReply: B\n"
        "Question: What animal is shown?\nOptions:\nA. a cat\nB. a dog\n"
        "Answer: an elephant\nReply: Z\n"
        f"Question: {question}\nOptions:\n{opts}\n"
        f"Answer: {prediction}\nReply: "
    )


def make_model_judge(generate: Callable[[str], str], retries: int = 2):
    """Wrap a text-generation callable as a ``score_mcq`` ``extract_fn``.

    ``generate(prompt) -> str`` can be anything that talks to a model: a
    ``VLMRunner`` closure (see :func:`runner_judge`), a raw ``Generator``
    + tokenizer, or an HTTP client against ``serve.server``'s
    ``/v1/completions``. The verdict is parsed with the SAME exact-matching
    rules as direct predictions (``scoring.extract_option`` — the
    reference parses its judge's output with ``can_infer`` too,
    ref multiple_choice.py:290-295); an unparseable or Z verdict after
    ``retries`` attempts yields None (row scores 0)."""
    from .scoring import extract_option

    def extract(prediction: str, options: Dict[str, str],
                question: str = "") -> Optional[str]:
        prompt = judge_prompt(question, options, prediction)
        for _ in range(max(retries, 1)):
            try:
                verdict = str(generate(prompt))
            except Exception:
                return None
            got = extract_option(verdict, options)
            if got is not None:
                return got
            if verdict.strip()[:1].upper() == "Z":
                return None
        return None

    return extract


def runner_judge(runner, max_new_tokens: int = 8, retries: int = 2):
    """The framework's own served model as the judge: an ``extract_fn``
    riding a ``VLMRunner`` (text-only generate). Typical use — evaluate a
    quantized candidate model while a full-precision (or int8) judge
    instance answers the matching queries."""

    def generate(prompt: str) -> str:
        return runner.generate({"text": prompt},
                               max_new_tokens=max_new_tokens)

    return make_model_judge(generate, retries=retries)
