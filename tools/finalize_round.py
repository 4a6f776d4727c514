"""Mandatory last step before the end-of-round snapshot commit.

Round 4 shipped a red pytest suite and a 116/120 correctness artifact
because a query landed AFTER docs/QUERY_INDEX.md and
CORRECTNESS_local_r{N}.json were generated (VERDICT r4, What's wrong
#1).  This tool makes that impossible to repeat: it regenerates both
artifacts from the live registry and then REQUIRES `pytest tests/` to
be green, exiting non-zero (and thus failing loudly in the terminal)
if any step fails.

Order matters:
  1. tools/gen_query_index.py   -> docs/QUERY_INDEX.md (from registry())
  2. tools/gen_correctness.py   -> CORRECTNESS_local_r{N}.json
     (skipped with SPARK_GRAFT_SKIP_CORRECTNESS=1 when the artifact for
     the current round is already fresh -- gen_correctness takes ~10min)
  3. python -m pytest tests/ -q -- must be fully green

Benchmarks are separate (they need an IDLE box): run `python bench.py`
2+ times (each writes a BENCH_session_r{N}_s{K}.json draft; the
committed canonical is never overwritten), then
`python tools/fold_bench.py` to fold the drafts into
BENCH_local_r{N}.json + the mover ledger (since r9).

Run:  python tools/finalize_round.py
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, cmd: list[str]) -> None:
    print(f"== {label}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, cwd=ROOT)
    if proc.returncode != 0:
        print(f"FINALIZE FAILED at step: {label}", flush=True)
        sys.exit(proc.returncode)


def main() -> None:
    py = sys.executable
    run("regen query index", [py, "tools/gen_query_index.py"])
    if os.environ.get("SPARK_GRAFT_SKIP_CORRECTNESS") != "1":
        run("regen correctness artifact", [py, "tools/gen_correctness.py"])
    run("pytest green gate", [py, "-m", "pytest", "tests/", "-q"])
    print("FINALIZE OK — safe to snapshot", flush=True)


if __name__ == "__main__":
    main()
