#!/usr/bin/env python
"""Process-isolated test runner — the suite gate.

One pytest process PER FILE: a 400-test single process accumulates XLA:CPU
compiled programs and live engine scheduler threads for ~45 minutes, and was
observed (round-3 verdict) to segfault inside `backend_compile_and_load` at
70% — a fragility of the monolithic process, not of any test. Per-file
isolation bounds the blast radius (a crash fails ONE file, visibly), resets
the compile cache/thread state between files, and gives every file a
wall-clock budget.

Usage:
  python scripts/run_tests.py            # full suite, per-file isolation
  python scripts/run_tests.py --fast     # fast gate (skips the slow files)
  python scripts/run_tests.py tests/test_kernels.py ...   # explicit files

Exit code: 0 iff every file passed. Per-file durations are recorded in
.test_durations.json (informational).
"""

import argparse
import glob
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Files excluded from the fast gate: threading-heavy serving stacks and the
# multi-minute compile-heavy drivers. The full run covers them.
SLOW = {
    "test_server.py", "test_engine.py", "test_speculative.py",
    "test_pipeline.py", "test_qwen2vl.py", "test_model_families.py",
    "test_gptq_driver.py", "test_evaluation.py", "test_outlier_stress.py",
    "test_quality_proxy.py", "test_autobits.py", "test_sharding.py",
}

PER_FILE_TIMEOUT = int(os.environ.get("MQUANT_TEST_FILE_TIMEOUT", "1200"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*")
    ap.add_argument("--fast", action="store_true",
                    help="fast gate: skip the slow serving/driver files")
    ap.add_argument("-x", "--exitfirst", action="store_true",
                    help="stop at the first failing file")
    args = ap.parse_args()

    files = args.files or sorted(
        glob.glob(os.path.join(ROOT, "tests", "test_*.py")))
    if args.fast:
        files = [f for f in files if os.path.basename(f) not in SLOW]

    results = {}
    failed = []
    t_all = time.time()
    for f in files:
        name = os.path.basename(f)
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-m", "pytest", f, "-q", "--no-header", "-p",
                 "no:cacheprovider"],
                cwd=ROOT, capture_output=True, text=True,
                timeout=PER_FILE_TIMEOUT)
            ok = r.returncode == 0
            tail = (r.stdout or "").strip().splitlines()
            summary = tail[-1] if tail else "(no output)"
        except subprocess.TimeoutExpired:
            ok, summary = False, f"TIMEOUT after {PER_FILE_TIMEOUT}s"
            r = None
        dt = time.time() - t0
        results[name] = {"ok": ok, "seconds": round(dt, 1),
                         "summary": summary}
        print(f"{'PASS' if ok else 'FAIL'}  {name:32s} {dt:7.1f}s  {summary}",
              flush=True)
        if not ok:
            failed.append(name)
            if r is not None:
                print("\n".join((r.stdout or "").splitlines()[-30:]),
                      file=sys.stderr, flush=True)
                print("\n".join((r.stderr or "").splitlines()[-10:]),
                      file=sys.stderr, flush=True)
            if args.exitfirst:
                break

    total = time.time() - t_all
    with open(os.path.join(ROOT, ".test_durations.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    n_ok = sum(1 for v in results.values() if v["ok"])
    print(f"\n{n_ok}/{len(results)} files passed in {total/60:.1f} min"
          + (f"; FAILED: {', '.join(failed)}" if failed else ""), flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
