"""Summarize TPU queue outputs (bench_artifacts/tpuq/*.out) as markdown.

Pulls the salient line(s) from each job: TFLOP/s baselines, bench JSON
metric lines, q/s rows, and the completion marker. Run after (or during) a
queue drain: python scripts/tpuq/summarize.py
"""

from __future__ import annotations

import pathlib
import re

OUT = pathlib.Path(__file__).resolve().parent.parent.parent / \
    "bench_artifacts" / "tpuq"

SALIENT = re.compile(
    r"TFLOP/s|\"metric\"|q/s|qps|recall|PASS|FAIL|Recall@|nDCG|NDCG|"
    r"bytes/token|latency")


def main():
    for f in sorted(OUT.glob("*.out")):
        lines = [ln for ln in f.read_text().splitlines() if ln.strip()]
        status = lines[-1] if lines and lines[-1].startswith("== ") else "(running)"
        print(f"\n### {f.stem} — {status}")
        for ln in lines:
            if ln.startswith("== ") or ln.startswith("WARNING"):
                continue
            if SALIENT.search(ln):
                print(f"    {ln.strip()[:200]}")


if __name__ == "__main__":
    main()
