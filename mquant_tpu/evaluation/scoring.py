"""Benchmark scoring functions — the metric layer of the eval harness.

Reimplements the scoring rules of the benchmarks the reference evaluates on
through its vendored VLMEvalKit (ref: docs/*.md run MME / OCRBench /
TextVQA_VAL / DocVQA_VAL; dataset classes third/VLMEvalKit/vlmeval/dataset/):

  * MME          — binary yes/no; per-category acc and acc+ (both questions of
                   an image correct), score = 100·(acc + acc+)
  * MCQ (MMBench-style) — option-letter extraction with fallback matching
  * VQA (TextVQA-style) — soft accuracy min(#matches/3, 1) over 10 annotators
  * ANLS (DocVQA) — average normalized Levenshtein similarity, τ = 0.5
  * OCRBench     — substring containment over answer variants

Pure text functions — fully unit-testable without datasets.
"""

from __future__ import annotations

import re
import string
from collections import defaultdict
from typing import Dict, List, Optional, Sequence


def _norm_text(s: str) -> str:
    s = s.lower().strip()
    s = re.sub(rf"[{re.escape(string.punctuation)}]", "", s)
    return re.sub(r"\s+", " ", s)


# ---------------------------------------------------------------------------
# yes/no (MME)
# ---------------------------------------------------------------------------


def extract_yes_no(pred: str) -> Optional[str]:
    """Word-level XOR extraction — the VLMEvalKit Y/N protocol
    (ref: third/VLMEvalKit/vlmeval/dataset/utils/yorn.py:206-213
    ``YOrN_Extraction``): punctuation becomes word boundaries, and the
    answer counts only when exactly one of the two words appears
    ("yes and no" is unparseable; "norway" contains neither word)."""
    s = str(pred).lower()
    s = re.sub(rf"[{re.escape(string.punctuation)}]", " ", s)
    words = s.split()
    has_yes, has_no = "yes" in words, "no" in words
    if has_yes and not has_no:
        return "yes"
    if has_no and not has_yes:
        return "no"
    return None


_MME_SUPER = {
    "perception": ("OCR", "artwork", "celebrity", "color", "count",
                   "existence", "landmark", "position", "posters", "scene"),
    "reasoning": ("code_reasoning", "commonsense_reasoning",
                  "numerical_calculation", "text_translation"),
}


def score_mme(rows: List[dict]) -> Dict[str, float]:
    """rows: {category, image_id, answer (Yes/No), prediction}. Returns per-
    category and total MME scores (acc% + acc+%, where acc+ requires BOTH
    questions of an image right — ref: third/VLMEvalKit/vlmeval/dataset/
    utils/yorn.py:4-61 ``MME_rating``), plus the perception/reasoning
    super-category sums when their standard categories are all present."""
    by_cat = defaultdict(lambda: defaultdict(list))
    for r in rows:
        ok = extract_yes_no(r["prediction"]) == r["answer"].strip().lower()
        by_cat[r.get("category", "all")][r.get("image_id", id(r))].append(ok)
    out = {}
    total = 0.0
    for cat, imgs in by_cat.items():
        flat = [ok for pair in imgs.values() for ok in pair]
        acc = sum(flat) / max(len(flat), 1)
        accp = sum(all(pair) for pair in imgs.values()) / max(len(imgs), 1)
        out[cat] = 100.0 * (acc + accp)
        total += out[cat]
    for sup, cats in _MME_SUPER.items():
        if all(c in out for c in cats):
            out[sup] = sum(out[c] for c in cats)
    out["total"] = total
    return out


# ---------------------------------------------------------------------------
# multiple choice (MMBench / MMMU style)
# ---------------------------------------------------------------------------


def extract_option(pred: str, options: Dict[str, str]) -> Optional[str]:
    """Extract the chosen option letter from a free-form prediction — the
    VLMEvalKit exact-matching protocol (ref: third/VLMEvalKit/vlmeval/utils/
    matching_util.py:7-69 ``can_infer``), reimplemented:

    1. break words on ``.()[],:;!*#{}`` and look for the option LETTERS
       (case-sensitive) as standalone words; exactly one hit wins;
    2. any other count (0 or ambiguous ≥2) falls through to lowercase-
       containment of the option CONTENTS in the prediction; again only a
       UNIQUE candidate wins.

    Returns None where the reference returns False/"Z" (no answer — the
    row scores 0 under exact matching, same metric)."""
    p = str(pred)
    s = p
    for ch in ".()[],:;!*#{}":
        s = s.replace(ch, " ")
    words = [w.strip() for w in s.split()]
    hits = [k for k in options if k in words]
    if len(hits) == 1:
        return hits[0]
    low = p.lower()
    cands = [k for k, v in options.items()
             if v is not None and str(v).lower() in low]
    if len(cands) == 1:
        return cands[0]
    return None


def score_mcq(rows: List[dict], extract_fn=None) -> Dict[str, float]:
    """rows: {options: {A:..,B:..}, answer: 'B', prediction}. Plain (non-
    circular) accuracy; circular consistency when rows carry a shared
    ``group`` id (all rotations must be right — MMBench protocol).

    ``extract_fn(prediction, options[, question]) -> Optional[letter]``:
    pluggable fallback extraction consulted when the built-in
    exact/containment matching finds nothing — the hook where VLMEvalKit
    plugs its ChatGPT judge (ref: third/VLMEvalKit/vlmeval/dataset/
    image_mcq.py:216-224); the default, like the reference's default, is
    exact matching only. A three-parameter callable (e.g.
    ``evaluation.judge.make_model_judge`` — any served model as the judge)
    also receives the row's ``question``."""
    wants_question = False
    if extract_fn is not None:
        import inspect

        try:
            wants_question = len(
                inspect.signature(extract_fn).parameters) >= 3
        except (TypeError, ValueError):
            pass
    ok_rows = []
    groups = defaultdict(list)
    for r in rows:
        got = extract_option(r["prediction"], r["options"])
        if got is None and extract_fn is not None:
            if wants_question:
                got = extract_fn(r["prediction"], r["options"],
                                 r.get("question", ""))
            else:
                got = extract_fn(r["prediction"], r["options"])
        ok = got == r["answer"]
        ok_rows.append(ok)
        if r.get("group") is not None:
            groups[r["group"]].append(ok)
    res = {"acc": 100.0 * sum(ok_rows) / max(len(ok_rows), 1)}
    if groups:
        res["acc_circular"] = 100.0 * sum(
            all(v) for v in groups.values()) / len(groups)
    return res


# ---------------------------------------------------------------------------
# VQA soft accuracy (TextVQA)
# ---------------------------------------------------------------------------


def vqa_accuracy(pred: str, gt_answers: Sequence[str]) -> float:
    p = _norm_text(pred)
    matches = sum(_norm_text(a) == p for a in gt_answers)
    return min(matches / 3.0, 1.0)


def score_vqa(rows: List[dict]) -> Dict[str, float]:
    accs = [vqa_accuracy(r["prediction"], r["answers"]) for r in rows]
    return {"acc": 100.0 * sum(accs) / max(len(accs), 1)}


# ---------------------------------------------------------------------------
# ANLS (DocVQA)
# ---------------------------------------------------------------------------


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def anls(pred: str, gts: Sequence[str], tau: float = 0.5) -> float:
    p = _norm_text(pred)
    best = 0.0
    for g in gts:
        gn = _norm_text(g)
        if not gn and not p:
            best = max(best, 1.0)
            continue
        d = _levenshtein(p, gn) / max(len(p), len(gn), 1)
        s = 1.0 - d
        best = max(best, s if s >= tau else 0.0)
    return best


def score_anls(rows: List[dict]) -> Dict[str, float]:
    vals = [anls(r["prediction"], r["answers"]) for r in rows]
    return {"anls": 100.0 * sum(vals) / max(len(vals), 1)}


# ---------------------------------------------------------------------------
# OCRBench
# ---------------------------------------------------------------------------


def score_ocrbench(rows: List[dict]) -> Dict[str, float]:
    """Substring containment over answer variants (OCRBench protocol: 10 points
    per hit, 1000 total over the real 1000-sample set; here normalized %)."""
    hits = 0
    for r in rows:
        p = _norm_text(r["prediction"])
        answers = r["answers"] if isinstance(r.get("answers"), (list, tuple)) \
            else [r.get("answer", "")]
        if any(_norm_text(str(a)) in p for a in answers if str(a)):
            hits += 1
    return {"score": 100.0 * hits / max(len(rows), 1)}


# ---------------------------------------------------------------------------
# POPE (object-hallucination yes/no, reported as accuracy + F1 over "yes")
# ---------------------------------------------------------------------------


def score_pope(rows: List[dict]) -> Dict[str, float]:
    """Yes/no accuracy, precision, recall and F1 with "yes" as the positive
    class — the VLMEvalKit POPE protocol exactly (ref: third/VLMEvalKit/
    vlmeval/dataset/utils/yorn.py:119-163 ``POPE_rating``), which uses TWO
    conventions at once: accuracy is strict extraction equality (an
    unparseable prediction is wrong), while precision/recall/F1 binarize
    the prediction as yes-vs-everything-else (unparseable counts as "no").
    Rows with a comma-separated ``category`` are exploded into one row per
    category first (ref ``data.explode``), affecting the overall numbers;
    per-category F1/acc come back as ``<cat>_f1`` / ``<cat>_acc``."""
    flat = []
    for r in rows:
        cats = str(r.get("category", "")).split(",") if r.get("category") else [None]
        gt = extract_yes_no(str(r.get("answer", "")))
        pred = extract_yes_no(r["prediction"])
        for c in cats:
            flat.append((c, gt, pred))

    def rate(sub):
        y_true = [g == "yes" for _, g, _ in sub]
        y_pred = [p == "yes" for _, _, p in sub]
        tp = sum(t and p for t, p in zip(y_true, y_pred))
        fp = sum((not t) and p for t, p in zip(y_true, y_pred))
        fn = sum(t and (not p) for t, p in zip(y_true, y_pred))
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        acc = sum(p == g and p is not None
                  for _, g, p in sub) / max(len(sub), 1)
        return 100.0 * acc, 100.0 * prec, 100.0 * rec, 100.0 * f1

    acc, prec, rec, f1 = rate(flat)
    out = {"score": acc, "precision": prec, "recall": rec, "f1": f1}
    cats = sorted({c for c, _, _ in flat if c})
    for c in cats:
        cacc, _, _, cf1 = rate([t for t in flat if t[0] == c])
        out[f"{c}_acc"], out[f"{c}_f1"] = cacc, cf1
    return out


# ---------------------------------------------------------------------------
# ChartQA (relaxed accuracy: exact string OR numeric within 5%)
# ---------------------------------------------------------------------------


def relaxed_accuracy(pred: str, gt: str, tolerance: float = 0.05) -> float:
    """ChartQA protocol: numeric answers match within ±5% relative error,
    non-numeric answers by normalized exact match."""
    p = _norm_text(pred).rstrip("%")
    g = _norm_text(str(gt)).rstrip("%")
    try:
        pv, gv = float(p), float(g)
        if gv == 0:
            return float(pv == 0)
        return float(abs(pv - gv) / abs(gv) <= tolerance)
    except ValueError:
        return float(p == g)


def score_chartqa(rows: List[dict]) -> Dict[str, float]:
    total = 0.0
    for r in rows:
        answers = r["answers"] if isinstance(r.get("answers"), (list, tuple)) \
            else [r.get("answer", "")]
        total += max((relaxed_accuracy(r["prediction"], a) for a in answers),
                     default=0.0)
    return {"score": 100.0 * total / max(len(rows), 1)}


# ---------------------------------------------------------------------------
# HallusionBench (aAcc / qAcc / fAcc)
# ---------------------------------------------------------------------------


def score_hallusion(rows: List[dict]) -> Dict[str, float]:
    """HallusionBench protocol: per-row yes/no accuracy (aAcc) plus two
    all-or-nothing group accuracies — a QUESTION counts only if every
    visual variant of it is answered correctly (qAcc, grouped by
    category/set/question), and a FIGURE counts only if every question
    about it is correct (fAcc, grouped by category/set/figure). Row fields:
    ``answer`` (yes/no or 1/0), ``prediction``, and the grouping ids
    ``category``/``set_id``/``figure_id``/``question_id`` (the
    HallusionBench TSV columns). Unparseable predictions are wrong."""
    qa_groups: Dict[str, List[bool]] = {}
    fig_groups: Dict[str, List[bool]] = {}
    hits = []
    for r in rows:
        gt = str(r.get("answer", "")).strip().lower()
        gt = {"1": "yes", "0": "no"}.get(gt, gt)
        hit = extract_yes_no(r["prediction"]) == gt
        hits.append(hit)
        cat = r.get("l2-category", r.get("category", ""))
        sid = r.get("set_id", "")
        qa_groups.setdefault(
            f"{cat}|{sid}|{r.get('question_id', '')}", []).append(hit)
        fig_groups.setdefault(
            f"{cat}|{sid}|{r.get('figure_id', '')}", []).append(hit)

    def allacc(groups):
        return 100.0 * sum(all(v) for v in groups.values()) / max(len(groups), 1)

    return {"score": 100.0 * sum(hits) / max(len(hits), 1),
            "aAcc": 100.0 * sum(hits) / max(len(hits), 1),
            "qAcc": allacc(qa_groups), "fAcc": allacc(fig_groups)}


# ---------------------------------------------------------------------------
# Image captioning (COCO_VAL / NoCaps protocol): BLEU-4 + CIDEr-D
# ---------------------------------------------------------------------------


def _ngrams(tokens: Sequence[str], n: int) -> Dict[tuple, int]:
    out: Dict[tuple, int] = defaultdict(int)
    for i in range(len(tokens) - n + 1):
        out[tuple(tokens[i:i + n])] += 1
    return out


def corpus_bleu(preds: List[str], refs_list: List[Sequence[str]],
                max_n: int = 4) -> float:
    """Corpus-level BLEU with clipped n-gram precision, uniform 1/N weights,
    and closest-reference-length brevity penalty (Papineni et al. 2002 —
    the metric VLMEvalKit's COCO caption eval reports as Bleu_4)."""
    import math

    num = [0] * max_n
    den = [0] * max_n
    pred_len = 0
    ref_len = 0
    for pred, refs in zip(preds, refs_list):
        pt = _norm_text(pred).split()
        rts = [_norm_text(r).split() for r in refs]
        pred_len += len(pt)
        ref_len += min((abs(len(rt) - len(pt)), len(rt)) for rt in rts)[1]
        for n in range(1, max_n + 1):
            pg = _ngrams(pt, n)
            if not pg:
                continue
            clip: Dict[tuple, int] = defaultdict(int)
            for rt in rts:
                for g, c in _ngrams(rt, n).items():
                    clip[g] = max(clip[g], c)
            num[n - 1] += sum(min(c, clip[g]) for g, c in pg.items())
            den[n - 1] += sum(pg.values())
    if any(x == 0 for x in num) or any(x == 0 for x in den):
        return 0.0
    logp = sum(math.log(a / b) for a, b in zip(num, den)) / max_n
    bp = 1.0 if pred_len > ref_len else math.exp(1 - ref_len / max(pred_len, 1))
    return 100.0 * bp * math.exp(logp)


def cider_d(preds: List[str], refs_list: List[Sequence[str]],
            max_n: int = 4, sigma: float = 6.0) -> float:
    """CIDEr-D (Vedantam et al. 2015): TF-IDF-weighted n-gram cosine
    similarity averaged over n=1..4, with candidate-count clipping and a
    Gaussian length penalty; document frequencies computed over the eval
    set's reference captions (the standard corpus-free protocol)."""
    import math

    toks_p = [_norm_text(p).split() for p in preds]
    toks_r = [[_norm_text(r).split() for r in refs] for refs in refs_list]
    # document frequency per n-gram over images (a ref n-gram counts once
    # per image regardless of how many of its captions contain it)
    df: List[Dict[tuple, int]] = [defaultdict(int) for _ in range(max_n)]
    for refs in toks_r:
        for n in range(max_n):
            seen = set()
            for rt in refs:
                seen.update(_ngrams(rt, n + 1).keys())
            for g in seen:
                df[n][g] += 1
    n_img = max(len(refs_list), 1)

    def tfidf(counts: Dict[tuple, int], n: int) -> Dict[tuple, float]:
        return {g: c * math.log(n_img / max(df[n][g], 1))
                for g, c in counts.items()}

    def norm(v: Dict[tuple, float]) -> float:
        return math.sqrt(sum(x * x for x in v.values()))

    scores = []
    for pt, refs in zip(toks_p, toks_r):
        per_n = []
        for n in range(max_n):
            pg = _ngrams(pt, n + 1)
            sim = 0.0
            for rt in refs:
                rg = _ngrams(rt, n + 1)
                # CIDEr-D clips candidate counts by the reference's counts
                cg = {g: min(c, rg.get(g, 0)) for g, c in pg.items()}
                vp, vr = tfidf(cg, n), tfidf(rg, n)
                dot = sum(vp[g] * vr[g] for g in vp if g in vr)
                np_, nr = norm(tfidf(pg, n)), norm(vr)
                if np_ > 0 and nr > 0:
                    delta = len(pt) - len(rt)
                    sim += (dot / (np_ * nr)
                            * math.exp(-delta * delta / (2 * sigma * sigma)))
            per_n.append(10.0 * sim / max(len(refs), 1))
        scores.append(sum(per_n) / max_n)
    return 100.0 * sum(scores) / max(len(scores), 1) / 10.0


def score_caption(rows: List[dict]) -> Dict[str, float]:
    """COCO-style captioning: references come as ``answers`` (list) or a
    single ``answer`` string; reports BLEU-4 and CIDEr-D (score = CIDEr,
    the headline metric of VLMEvalKit's COCO_VAL)."""
    preds = [r["prediction"] for r in rows]
    refs = [r.get("answers") or [r.get("answer", "")] for r in rows]
    bleu = corpus_bleu(preds, refs)
    cider = cider_d(preds, refs)
    return {"score": cider, "CIDEr": cider, "Bleu_4": bleu}


SCORERS = {
    "MME": score_mme,
    "MMBench": score_mcq,
    "MCQ": score_mcq,
    "TextVQA_VAL": score_vqa,
    "VQA": score_vqa,
    "DocVQA_VAL": score_anls,
    "ANLS": score_anls,
    "OCRBench": score_ocrbench,
    "POPE": score_pope,
    "ChartQA_TEST": score_chartqa,
    "ChartQA": score_chartqa,
    "HallusionBench": score_hallusion,
    "Caption": score_caption,
    "COCO_VAL": score_caption,
    # Protocol aliases: these benchmarks score under one of the rule sets
    # above (VLMEvalKit routes them the same way — MCQ letter extraction,
    # VQA soft accuracy, ANLS, or caption metrics).
    "SEEDBench_IMG": score_mcq,
    "ScienceQA_TEST": score_mcq,
    "ScienceQA_VAL": score_mcq,
    "MMMU_DEV_VAL": score_mcq,
    "AI2D_TEST": score_mcq,
    "MMStar": score_mcq,
    "RealWorldQA": score_mcq,
    "VizWiz": score_vqa,
    "GQA_TestDev_Balanced": score_vqa,
    "OK-VQA": score_vqa,
    "InfoVQA_VAL": score_anls,
    "InfoVQA_TEST": score_anls,
    "NoCaps": score_caption,
}
