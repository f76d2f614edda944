"""Data-parallel eval fan-out: N worker processes, each evaluating every
N-th dataset row (the shard contract of ``eval_dataset(shard=(i, n))``),
then one merge+score over the shard files.

This is the operational counterpart of VLMEvalKit's mp_util fan-out (ref:
third/VLMEvalKit/vlmeval/utils/mp_util.py) — but process-isolated, so each
worker owns its own jax runtime and can be pinned to its own host/chip
(DCN-style data parallelism; within a chip, prefer ``--eval_batch`` which
batches rows through one engine pool instead).

Run: python scripts/dp_eval.py --model qwen2vl --tiny \
        --dataset SyntheticVQA --workers 4 --limit 16
Each worker re-runs the (deterministic) pipeline; for real deployments pass
--artifact so workers load the quantized artifact instead of re-quantizing.
"""

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker_main(args):
    """One shard: build the runner, evaluate rows shard_i::workers."""
    from mquant_tpu.evaluation.adapter import VLMRunner
    from mquant_tpu.evaluation.eval import build_dataset, eval_dataset

    if args.artifact:
        from mquant_tpu.utils.checkpoint import (config_from_dict,
                                                 load_artifact)

        params, state, specs, meta = load_artifact(args.artifact)
        cfg = config_from_dict(meta["config_dict"])
        mode = ("real" if (meta.get("quantize_config") or {}).get(
            "realize_int") else "fake")
        runner = VLMRunner(meta["model"], cfg, params, specs=specs,
                           state=state, mode=mode)
    else:
        import jax

        from mquant_tpu.models.registry import get_family

        fam = get_family(args.model)
        cfg = fam.tiny_fn() if args.tiny else fam.config_fn()
        params = fam.init_fn(cfg, jax.random.key(0))
        runner = VLMRunner(fam.name, cfg, params, max_new_tokens=5)
    ds = build_dataset(args.dataset)
    eval_dataset(runner.generate, ds, out_dir=args.out_dir,
                 model_name=f"{args.model}_shard{args.shard_i}",
                 limit=args.limit, shard=(args.shard_i, args.workers))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="qwen2vl")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--artifact", default=None)
    p.add_argument("--dataset", default="SyntheticVQA")
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--out_dir", default=None)
    p.add_argument("--shard_i", type=int, default=None,
                   help="(internal) run as shard worker i")
    args = p.parse_args()
    args.out_dir = args.out_dir or tempfile.mkdtemp(prefix="dp_eval_")

    if args.shard_i is not None:
        return worker_main(args)

    procs = []
    for i in range(args.workers):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--model", args.model, "--dataset", args.dataset,
               "--workers", str(args.workers), "--shard_i", str(i),
               "--out_dir", args.out_dir]
        if args.tiny:
            cmd.append("--tiny")
        if args.artifact:
            cmd += ["--artifact", args.artifact]
        if args.limit:
            cmd += ["--limit", str(args.limit)]
        env = dict(os.environ, JAX_PLATFORMS=os.environ.get(
            "JAX_PLATFORMS", "cpu"))
        procs.append(subprocess.Popen(cmd, env=env))
    rcs = [pr.wait() for pr in procs]
    assert all(rc == 0 for rc in rcs), rcs

    from mquant_tpu.evaluation.eval import build_dataset, merge_results

    files = sorted(glob.glob(os.path.join(args.out_dir, "*_shard*.*")))
    files = [f for f in files if f.endswith((".csv", ".xlsx"))]
    metrics = merge_results(build_dataset(args.dataset), files)
    print(json.dumps({"workers": args.workers, "files": len(files),
                      "metrics": metrics}), flush=True)


if __name__ == "__main__":
    main()
