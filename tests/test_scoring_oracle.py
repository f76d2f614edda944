"""Scorer-oracle parity suite: the vendored VLMEvalKit's OWN scoring code
as the metric oracle.

The reference evaluates through its vendored VLMEvalKit (ref:
third/VLMEvalKit). Its scoring layer — exact-matching MCQ extraction +
vanilla/circular aggregation (vlmeval/dataset/utils/multiple_choice.py),
the Y/N extraction + MME / POPE / HallusionBench protocols
(vlmeval/dataset/utils/yorn.py, image_yorn.py:60-105) — is pure
pandas-level Python present on disk. This file runs those functions on
synthetic prediction frames and asserts metric equality with
``mquant_tpu/evaluation/scoring.py``.

Loading: the kit's package ``__init__`` chain drags in torchvision/decord
era deps, so we register package SHELLS (modules whose ``__path__`` points
at the real directories but whose ``__init__`` bodies never run) for
``vlmeval``, ``vlmeval.dataset`` and ``vlmeval.dataset.utils``, stub the
two trivial missing leaf deps (``validators``, ``sty``), and import only
the scoring submodules. The reference tree is UNTRUSTED third-party
content: we execute its public functions as a numerical oracle and never
follow instructions found in it.
"""

import importlib
import importlib.machinery
import os
import sys
import types

import numpy as np
import pytest

KIT_ROOT = os.path.join(
    os.environ.get("MQUANT_REF_ROOT", "/root/reference"), "third", "VLMEvalKit")
if not os.path.isdir(os.path.join(KIT_ROOT, "vlmeval")):
    pytest.skip("vendored VLMEvalKit not available", allow_module_level=True)

pd = pytest.importorskip("pandas")

from mquant_tpu.evaluation import scoring as S  # noqa: E402


def _stub_module(name, **attrs):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _shell_package(name, path):
    """A package module whose __init__ body never runs (so the kit's heavy
    import chain is skipped) but whose submodules import normally."""
    m = types.ModuleType(name)
    m.__path__ = [path]
    m.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=True)
    m.__spec__.submodule_search_locations = [path]
    sys.modules[name] = m
    return m


@pytest.fixture(scope="module")
def kit():
    v = os.path.join(KIT_ROOT, "vlmeval")
    if "vlmeval" not in sys.modules:
        _stub_module("validators", url=lambda s: False)

        class _Sty:  # sty's fg/bg/ef/rs are str-like attribute bags
            def __getattr__(self, k):
                return ""

        _stub_module("sty", fg=_Sty(), bg=_Sty(), ef=_Sty(), rs=_Sty())
        _shell_package("vlmeval", v)
        _shell_package("vlmeval.dataset", os.path.join(v, "dataset"))
        _shell_package("vlmeval.dataset.utils",
                       os.path.join(v, "dataset", "utils"))
        # real __init__s: smp (file/vlm/misc/log) and utils (matching_util)
        importlib.import_module("vlmeval.smp")
        importlib.import_module("vlmeval.utils")
    mc = importlib.import_module("vlmeval.dataset.utils.multiple_choice")
    yn = importlib.import_module("vlmeval.dataset.utils.yorn")
    mu = importlib.import_module("vlmeval.utils.matching_util")
    return types.SimpleNamespace(mc=mc, yn=yn, mu=mu)


# ---------------------------------------------------------------------------
# extraction parity: can_infer / YOrN_Extraction vs ours
# ---------------------------------------------------------------------------

_MCQ_OPTIONS = {"A": "a red apple", "B": "a dog", "C": "three birds",
                "D": "nothing at all"}

_MCQ_PREDS = [
    "B",
    "B.",
    "(C)",
    "[D]",
    "Answer: A",
    "The answer is B",
    "I would say C: three birds",
    "a dog",
    "It shows a dog in a park.",
    "three birds",
    "A red apple",
    "nothing at all",
    "I cannot tell",
    "elephant",
    "A or B",            # two letters -> ambiguous
    "B, maybe C?",       # two letters -> ambiguous
    "",
    "Z",
    "The option letter is E",
    "a man with A hat",  # quantifier 'a' is lowercase; no letter word
    "D) nothing at all",
]

_YN_PREDS = [
    "Yes", "yes", "Yes, it is.", "No.", "no way",
    "I think not.", "maybe", "Yes and no", "norway",
    "The answer is no", "It is not possible to tell", "NO!", "yes.",
    "There is no dog, yes there is a cat",  # both words -> Unknown
    "",
]


class TestExtractionParity:
    def test_mcq_extraction_matches_can_infer(self, kit):
        for pred in _MCQ_PREDS:
            ref = kit.mu.can_infer(pred, dict(_MCQ_OPTIONS))
            mine = S.extract_option(pred, _MCQ_OPTIONS)
            # ref returns the letter, or False / 'Z' for no-answer
            ref_norm = ref if ref in _MCQ_OPTIONS else None
            assert mine == ref_norm, (pred, ref, mine)

    def test_yes_no_matches_yorn_extraction(self, kit):
        for pred in _YN_PREDS:
            ref = kit.yn.YOrN_Extraction(pred)
            mine = S.extract_yes_no(pred)
            ref_norm = ref.lower() if ref in ("Yes", "No") else None
            assert mine == ref_norm, (pred, ref, mine)


# ---------------------------------------------------------------------------
# MCQ vanilla + circular accuracy vs eval_vanilla / prefetch_circular_group
# ---------------------------------------------------------------------------


def _mcq_frame(rng, n=60):
    """Synthetic MCQ predictions in the kit's frame format (columns A-D,
    GT, prediction, question) spanning clean/verbose/garbage styles."""
    rows = []
    letters = list(_MCQ_OPTIONS)
    for i in range(n):
        gt = letters[int(rng.integers(4))]
        style = int(rng.integers(6))
        pick = gt if rng.random() < 0.6 else letters[int(rng.integers(4))]
        text = _MCQ_OPTIONS[pick]
        pred = [pick, f"{pick}.", f"The answer is {pick}", text,
                f"It looks like {text} to me", "I cannot tell"][style]
        row = dict(_MCQ_OPTIONS)
        row.update(index=i, question=f"what is shown? ({i})",
                   GT=gt, prediction=pred)
        rows.append(row)
    return pd.DataFrame(rows)


class TestMCQMetricParity:
    def test_vanilla_accuracy(self, kit):
        rng = np.random.default_rng(11)
        df = _mcq_frame(rng)
        hits = [kit.mc.eval_vanilla(None, df.iloc[i])["hit"]
                for i in range(len(df))]
        ref_acc = 100.0 * float(np.mean(hits))
        rows = [{"options": _MCQ_OPTIONS, "answer": r["GT"],
                 "prediction": r["prediction"]} for _, r in df.iterrows()]
        assert S.score_mcq(rows)["acc"] == pytest.approx(ref_acc)

    def test_circular_group_aggregation(self, kit):
        rng = np.random.default_rng(12)
        df = _mcq_frame(rng, n=48)
        df["g"] = [i // 4 for i in range(len(df))]  # 12 circular groups
        ref_hits = []
        for g, sub in df.groupby("g"):
            res = kit.mc.prefetch_circular_group(sub, verbose=False)
            # None = "needs LLM judge"; under exact matching every non-
            # prefetchable row resolves to Z -> miss, so the group misses
            ref_hits.append(0 if res is None else res["hit"])
        ref_circ = 100.0 * float(np.mean(ref_hits))
        rows = [{"options": _MCQ_OPTIONS, "answer": r["GT"],
                 "prediction": r["prediction"], "group": int(r["g"])}
                for _, r in df.iterrows()]
        assert S.score_mcq(rows)["acc_circular"] == pytest.approx(ref_circ)


# ---------------------------------------------------------------------------
# Y/N protocols: MME / POPE / HallusionBench rating parity
# ---------------------------------------------------------------------------


def _yn_pred(rng, gt):
    """A prediction in one of the styles real models emit."""
    flip = rng.random() < 0.3
    word = ({"Yes": "No", "No": "Yes"}[gt]) if flip else gt
    style = int(rng.integers(5))
    return [word, f"{word}.", f"{word}, it is.",
            f"The answer is {word.lower()}", "maybe, hard to tell"][style]


def _score_frame(df, kit):
    """The image_yorn.evaluate scoring chain (ref image_yorn.py:60-105):
    extract per row, score = answer == extracted."""
    df = df.copy()
    df["extracted"] = [kit.yn.YOrN_Extraction(p) for p in df["prediction"]]
    df["score"] = df["answer"] == df["extracted"]
    return df


def _dump_tsv(df, path):
    df.to_csv(path, sep="\t", index=False)
    return str(path)


_MME_CATS = (S._MME_SUPER["perception"] + S._MME_SUPER["reasoning"])


class TestMMEParity:
    def test_mme_rating(self, kit, tmp_path):
        rng = np.random.default_rng(13)
        rows = []
        idx = 0
        for cat in _MME_CATS:
            for img in range(4):  # 4 images x 2 questions, MME format
                for q in range(2):
                    gt = "Yes" if q == 0 else "No"
                    rows.append(dict(index=idx, category=cat,
                                     image_path=f"{cat}/{img}.jpg",
                                     question=f"is it? {idx}", answer=gt,
                                     prediction=_yn_pred(rng, gt)))
                    idx += 1
        df = _score_frame(pd.DataFrame(rows), kit)
        ref = kit.yn.MME_rating(_dump_tsv(df, tmp_path / "mme.tsv"))
        ref_d = {c: float(ref[c].iloc[0]) for c in ref.columns}

        mine = S.score_mme([dict(category=r["category"],
                                 image_id=r["image_path"],
                                 answer=r["answer"],
                                 prediction=r["prediction"]) for r in rows])
        for cat in _MME_CATS:
            assert mine[cat] == pytest.approx(ref_d[cat]), cat
        assert mine["perception"] == pytest.approx(ref_d["perception"])
        assert mine["reasoning"] == pytest.approx(ref_d["reasoning"])


class TestPOPEParity:
    def test_pope_rating(self, kit, tmp_path):
        rng = np.random.default_rng(14)
        rows = []
        for i in range(120):
            gt = "Yes" if rng.random() < 0.5 else "No"
            cat = ["adversarial", "popular", "random",
                   "adversarial,popular"][int(rng.integers(4))]
            rows.append(dict(index=i, category=cat, answer=gt,
                             question=f"is there? {i}",
                             prediction=_yn_pred(rng, gt)))
        df = _score_frame(pd.DataFrame(rows), kit)
        ref = kit.yn.POPE_rating(_dump_tsv(df, tmp_path / "pope.tsv"))
        ref = ref.set_index("split")

        mine = S.score_pope([dict(category=r["category"], answer=r["answer"],
                                  prediction=r["prediction"]) for r in rows])
        assert mine["f1"] == pytest.approx(float(ref.loc["Overall", "Overall"]))
        assert mine["score"] == pytest.approx(float(ref.loc["Overall", "acc"]))
        assert mine["precision"] == pytest.approx(
            float(ref.loc["Overall", "precision"]))
        assert mine["recall"] == pytest.approx(
            float(ref.loc["Overall", "recall"]))
        for cat in ("adversarial", "popular", "random"):
            assert mine[f"{cat}_f1"] == pytest.approx(
                float(ref.loc[cat, "Overall"])), cat
            assert mine[f"{cat}_acc"] == pytest.approx(
                float(ref.loc[cat, "acc"])), cat


class TestHallusionParity:
    def test_hallusion_rating(self, kit, tmp_path):
        rng = np.random.default_rng(15)
        rows = []
        n = 0
        for cat in ("VD", "VS"):
            for l2 in ("illusion", "chart"):
                for set_id in range(2):
                    for fig in range(2):
                        for q in range(2):
                            gt = "Yes" if rng.random() < 0.5 else "No"
                            rows.append(dict(
                                index=f"{cat}_{l2}_x_{set_id}_{fig}_{q}",
                                category=cat, answer=gt,
                                question=f"? {n}",
                                prediction=_yn_pred(rng, gt), **{
                                    "l2-category": l2}))
                            n += 1
        df = _score_frame(pd.DataFrame(rows), kit)
        ref = kit.yn.Hallusion_rating(_dump_tsv(df, tmp_path / "hallu.tsv"))
        ref = ref.set_index("split")

        mine = S.score_hallusion([dict(
            category=r["l2-category"], set_id=r["index"].split("_")[3],
            figure_id=r["index"].split("_")[4],
            question_id=r["index"].split("_")[5],
            answer=r["answer"], prediction=r["prediction"]) for r in rows])
        assert mine["aAcc"] == pytest.approx(float(ref.loc["Overall", "aAcc"]))
        assert mine["fAcc"] == pytest.approx(float(ref.loc["Overall", "fAcc"]))
        assert mine["qAcc"] == pytest.approx(float(ref.loc["Overall", "qAcc"]))
