"""Generic evaluation loop + dataset abstraction.

Contract parity with the reference harness (ref: evaluation/eval.py:9-58
``eval_dataset``: iterate rows → model.generate(message) → dump results file →
dataset.evaluate → print metric table; dataset API per
third/VLMEvalKit/vlmeval/dataset/__init__.py:191 ``build_dataset`` and the
dataset classes' ``build_prompt``/``evaluate``).

Datasets load from VLMEvalKit-format TSV files when available (the reference's
data cache format) — this environment has no network, so tests use the
synthetic dataset. Results dump to xlsx when pandas/openpyxl can, else CSV.
"""

from __future__ import annotations

import base64
import io
import os
import time
from typing import Callable, Dict, List, Optional

import numpy as np

from .scoring import SCORERS


class EvalDataset:
    """Minimal dataset API: rows with question/images/answers + a scorer."""

    name = "base"
    scorer = "VQA"

    def __len__(self):
        raise NotImplementedError

    def build_prompt(self, i: int) -> Dict:
        """→ {"text": str, "image": np.ndarray | None, ...scoring fields}"""
        raise NotImplementedError

    def evaluate(self, results: List[dict],
                 extract_fn=None) -> Dict[str, float]:
        """``extract_fn``: optional MCQ answer-extraction fallback (judge-model
        hook, ref image_mcq.py:216-224) — forwarded to MCQ-protocol scorers,
        ignored for other protocols."""
        from .scoring import score_mcq

        fn = SCORERS[self.scorer]
        if extract_fn is not None and fn is score_mcq:
            return fn(results, extract_fn=extract_fn)
        return fn(results)


class TSVDataset(EvalDataset):
    """VLMEvalKit-format TSV: columns index/question/answer/image (base64, or a
    stringified LIST of base64 strings for multi-image rows) and optional
    category/A-H options.

    ``circular=True`` expands every MCQ row into K option-rotations sharing a
    ``group`` id — the dataset-side MMBench circular protocol (ref:
    third/VLMEvalKit/vlmeval/dataset/image_mcq.py MMBench construction; the
    scorer's all-rotations-right consistency lives in scoring.score_mcq)."""

    def __init__(self, path: str, name: Optional[str] = None,
                 scorer: Optional[str] = None, circular: Optional[bool] = None):
        import csv

        self.rows = []
        with open(path, newline="") as f:
            for row in csv.DictReader(f, delimiter="\t"):
                self.rows.append(row)
        self.name = name or os.path.basename(path).rsplit(".", 1)[0]
        self.scorer = scorer or _infer_scorer(self.name)
        if circular is None:  # MMBench runs circular by protocol
            circular = "mmbench" in self.name.lower()
        self.circular = circular
        if circular:
            self.rows = self._expand_circular(self.rows)

    @staticmethod
    def _expand_circular(rows):
        """Each MCQ row → one variant per cyclic rotation of its option
        CONTENTS (letters stay A..; the answer letter moves with its content).
        Non-MCQ rows pass through untouched."""
        out = []
        for row in rows:
            letters = [k for k in "ABCDEFGH" if row.get(k)]
            ans = row.get("answer", "")
            if len(letters) < 2 or ans not in letters:
                out.append(row)
                continue
            contents = [row[k] for k in letters]
            gid = row.get("index", len(out))
            for r in range(len(letters)):
                v = dict(row)
                rot = contents[r:] + contents[:r]  # rotation r
                for k, c in zip(letters, rot):
                    v[k] = c
                # the answer's content moved from position i to (i - r) mod K
                i = letters.index(ans)
                v["answer"] = letters[(i - r) % len(letters)]
                v["group"] = gid
                v["index"] = f"{gid}_r{r}"
                out.append(v)
        return out

    def __len__(self):
        return len(self.rows)

    @staticmethod
    def _b64_to_arr(b64: str) -> np.ndarray:
        from PIL import Image

        img = Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")
        return np.asarray(img, np.float32) / 255.0

    def _decode_image(self, row):
        b64 = row.get("image")
        if not b64:
            return None
        if b64.lstrip().startswith("["):  # multi-image row: list of base64
            import ast

            return [self._b64_to_arr(s) for s in ast.literal_eval(b64)]
        return self._b64_to_arr(b64)

    def build_prompt(self, i: int) -> Dict:
        row = self.rows[i]
        text = row.get("question", "")
        opts = {k: row[k] for k in "ABCDEFGH" if row.get(k)}
        if opts:
            text += "\n" + "\n".join(f"{k}. {v}" for k, v in opts.items())
            text += "\nAnswer with the option's letter from the given choices directly."
        out = {"text": text, "image": self._decode_image(row),
               "answer": row.get("answer", ""), "index": row.get("index", i)}
        if opts:
            out["options"] = opts
        if row.get("category"):
            out["category"] = row["category"]
        if row.get("group") is not None:
            out["group"] = row["group"]
        if row.get("image_id") or row.get("image_path"):
            out["image_id"] = row.get("image_id") or row.get("image_path")
        for k in ("l2-category", "set_id", "figure_id", "question_id"):
            if row.get(k) is not None:  # HallusionBench grouping columns
                out[k] = row[k]
        return out


def _infer_scorer(name: str) -> str:
    n = name.lower()
    if "mme" in n:
        return "MME"
    if ("mmbench" in n or "mcq" in n or "mmmu" in n or "mmstar" in n
            or "ai2d" in n or "seedbench" in n or "scienceqa" in n
            or "realworldqa" in n or "mathvista" in n or "ccbench" in n):
        # letter-option protocols all score through the (circular-aware)
        # MCQ scorer — VLMEvalKit routes these the same way
        return "MCQ"
    if "docvqa" in n or "infovqa" in n or "sroie" in n:
        return "ANLS"
    if "ocr" in n:
        return "OCRBench"
    if "hallusion" in n:
        return "HallusionBench"
    if "pope" in n:
        return "POPE"
    if "chartqa" in n:
        return "ChartQA"
    if "coco" in n or "caption" in n or "nocaps" in n:
        return "Caption"
    return "VQA"


class SyntheticVQADataset(EvalDataset):
    """Deterministic toy dataset for harness tests (no downloads)."""

    name = "SyntheticVQA"
    scorer = "VQA"

    def __init__(self, n: int = 8, image_size: int = 16):
        self.n = n
        self.size = image_size

    def __len__(self):
        return self.n

    def build_prompt(self, i: int) -> Dict:
        rng = np.random.default_rng(i)
        return {"text": f"What is shown in image {i}?",
                "image": rng.uniform(size=(self.size, self.size, 3)).astype(np.float32),
                "answers": [f"object {i % 3}"] * 10,
                "index": i}


def build_dataset(name_or_path: str, data_root: Optional[str] = None) -> EvalDataset:
    """Name → dataset (contract parity with vlmeval build_dataset). Looks for
    `<root>/<name>.tsv` (the VLMEvalKit cache layout)."""
    if name_or_path == "SyntheticVQA":
        return SyntheticVQADataset()
    root = data_root or os.environ.get("LMUData", os.path.expanduser("~/LMUData"))
    path = name_or_path if os.path.exists(name_or_path) else \
        os.path.join(root, f"{name_or_path}.tsv")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"dataset {name_or_path!r} not found at {path}; place VLMEvalKit-"
            f"format TSVs under {root} or pass a file path")
    return TSVDataset(path, name=os.path.basename(name_or_path))


def eval_dataset(generate_fn: Callable[[Dict], str], dataset: EvalDataset,
                 out_dir: str = "output", model_name: str = "model",
                 limit: Optional[int] = None, verbose: bool = False,
                 shard: Optional[tuple] = None,
                 batch_fn: Optional[Callable[[list], list]] = None,
                 batch_size: int = 0,
                 extract_fn: Optional[Callable] = None) -> Dict:
    """Eval loop (ref: evaluation/eval.py:9-58). ``generate_fn`` maps one
    prompt struct → prediction text. Dumps results + prints the metric table.

    ``shard=(i, n)`` evaluates every n-th row starting at i — the data-parallel
    fan-out of VLMEvalKit's mp_util (ref: third/VLMEvalKit/vlmeval/utils/
    mp_util.py): run n processes/hosts with distinct shards and merge the
    result files with :func:`merge_results`.

    ``batch_fn`` + ``batch_size > 1``: rows are evaluated ``batch_size`` at a
    time through a list→list function (``VLMRunner.serve_engine`` — the
    continuous-batching pool — or ``generate_batch``), the throughput path
    the reference's serial HF-generate loop cannot express.

    ``extract_fn(prediction, options)``: optional MCQ extraction fallback
    (judge-model hook, ref image_mcq.py:216-224) forwarded to the scorer.
    """
    os.makedirs(out_dir, exist_ok=True)
    n = min(len(dataset), limit) if limit else len(dataset)
    rows_iter = range(n) if shard is None else range(shard[0], n, shard[1])
    results = []
    t0 = time.time()
    if batch_fn is not None and batch_size > 1:
        idxs = list(rows_iter)
        for j in range(0, len(idxs), batch_size):
            group = idxs[j:j + batch_size]
            prompts = [dataset.build_prompt(i) for i in group]
            preds = batch_fn(prompts)
            for i, prompt, pred in zip(group, prompts, preds):
                row = dict(prompt)
                row.pop("image", None)
                row["prediction"] = pred
                results.append(row)
                if verbose:
                    print(f"[{i+1}/{n}] {pred[:60]!r}")
    else:
        for i in rows_iter:
            prompt = dataset.build_prompt(i)
            pred = generate_fn(prompt)
            row = dict(prompt)
            row.pop("image", None)
            row["prediction"] = pred
            results.append(row)
            if verbose:
                print(f"[{i+1}/{n}] {pred[:60]!r}")
    dt = time.time() - t0

    stamp = time.strftime("%Y%m%d_%H%M%S")
    out_path = os.path.join(out_dir, f"{model_name}_{dataset.name}_{stamp}")
    try:
        import pandas as pd

        pd.DataFrame(results).to_excel(out_path + ".xlsx", index=False)
        out_file = out_path + ".xlsx"
    except Exception:
        import csv

        out_file = out_path + ".csv"
        with open(out_file, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=sorted({k for r in results for k in r}))
            w.writeheader()
            w.writerows(results)

    metrics = (dataset.evaluate(results, extract_fn=extract_fn)
               if shard is None else {"sharded": 1.0})
    print(f"== {dataset.name} ({len(results)} samples, {dt:.1f}s) "
          f"→ {out_file}")
    for k, v in metrics.items():
        print(f"   {k}: {v:.2f}" if isinstance(v, float) else f"   {k}: {v}")
    return {"metrics": metrics, "results_file": out_file, "n": n,
            "seconds": dt}


def merge_results(dataset: EvalDataset, result_files) -> Dict[str, float]:
    """Merge sharded eval result files (csv/xlsx) and score them."""
    rows = []
    for f in result_files:
        if f.endswith(".xlsx"):
            import pandas as pd

            rows += pd.read_excel(f).to_dict("records")
        else:
            import csv

            with open(f, newline="") as fh:
                rows += list(csv.DictReader(fh))
    for r in rows:  # csv stringifies lists
        if isinstance(r.get("answers"), str) and r["answers"].startswith("["):
            import ast

            r["answers"] = ast.literal_eval(r["answers"])
        if isinstance(r.get("options"), str) and r["options"].startswith("{"):
            import ast

            r["options"] = ast.literal_eval(r["options"])
    return dataset.evaluate(rows)
