"""Results reporter: train.log tree -> per-mf summary sheets (.xlsx + .csv).

Behavior parity with reference ``summary_results.py``: walks
``<root>/<setting>/mf<k>/<dataset>/train.log``, extracts the LAST
``summary/best_ndcg5`` JSON line (reverse scan of the tail), normalizes [0,1]
metrics to percent, and emits one sheet per mf with per-dataset ``N@5``/
``R@1`` columns plus averages. Output is a dependency-free .xlsx (see
``evdr_tpu.tools.xlsx``) plus per-mf CSVs.
"""

from __future__ import annotations

import argparse
import csv
import json
import re
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional

from evdr_tpu.tools.xlsx import write_xlsx

SUMMARY_RE = re.compile(r"(\{.*\"summary/best_ndcg5\".*\})\s*$")
TAIL_LINES = 3000


def parse_train_log(train_log: Path) -> Optional[Dict[str, float]]:
    """Last summary/best_ndcg5 line -> {"N@5": pct, "R@1": pct} or None."""
    if not train_log.exists():
        return None
    try:
        lines = train_log.read_text(encoding="utf-8", errors="ignore").splitlines()
    except OSError:
        return None
    for line in reversed(lines[-TAIL_LINES:]):
        m = SUMMARY_RE.search(line.strip())
        if not m:
            continue
        try:
            obj = json.loads(m.group(1))
        except json.JSONDecodeError:
            continue
        d = obj.get("summary/best_ndcg5")
        if not isinstance(d, dict):
            continue
        ndcg, recall = d.get("NDCG@5"), d.get("Recall@1")
        if ndcg is None or recall is None:
            continue
        ndcg, recall = float(ndcg), float(recall)
        if 0.0 <= ndcg <= 1.0:
            ndcg *= 100.0
        if 0.0 <= recall <= 1.0:
            recall *= 100.0
        return {"N@5": ndcg, "R@1": recall}
    return None


def collect_results(root) -> Dict[str, Dict[str, Dict[str, Dict[str, float]]]]:
    """-> {mf: {setting: {dataset: {"N@5":, "R@1":}}}}"""
    root = Path(root)
    out: Dict = defaultdict(lambda: defaultdict(dict))
    for log in sorted(root.glob("*/mf*/*/train.log")):
        dataset = log.parent.name
        mf = log.parent.parent.name          # "mf5"
        setting = log.parent.parent.parent.name
        metrics = parse_train_log(log)
        if metrics is not None:
            out[mf][setting][dataset] = metrics
    return out


def build_sheets(collected) -> Dict[str, list]:
    sheets = {}
    for mf in sorted(collected, key=lambda s: int(s[2:]) if s[2:].isdigit() else 0):
        settings = collected[mf]
        datasets = sorted({d for per in settings.values() for d in per})
        header = (["setting"]
                  + [f"{d}_N@5" for d in datasets]
                  + [f"{d}_R@1" for d in datasets]
                  + ["avg_N@5", "avg_R@1"])
        rows = [header]
        for setting in sorted(settings):
            per = settings[setting]
            n5 = [per[d]["N@5"] if d in per else None for d in datasets]
            r1 = [per[d]["R@1"] if d in per else None for d in datasets]
            have_n5 = [x for x in n5 if x is not None]
            have_r1 = [x for x in r1 if x is not None]
            rows.append(
                [setting] + n5 + r1
                + [round(sum(have_n5) / len(have_n5), 2) if have_n5 else None,
                   round(sum(have_r1) / len(have_r1), 2) if have_r1 else None])
        sheets[mf] = rows
    return sheets


def write_report(root, out_xlsx) -> Dict[str, list]:
    collected = collect_results(root)
    if not collected:
        raise FileNotFoundError(f"no parseable train.log under {root}")
    sheets = build_sheets(collected)
    write_xlsx(out_xlsx, sheets)
    out_xlsx = Path(out_xlsx)
    for mf, rows in sheets.items():
        with open(out_xlsx.with_suffix(f".{mf}.csv"), "w", newline="") as f:
            csv.writer(f).writerows(rows)
    return sheets


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("results_root")
    p.add_argument("out_xlsx")
    a = p.parse_args(argv)
    sheets = write_report(a.results_root, a.out_xlsx)
    for mf, rows in sheets.items():
        print(f"[report] {mf}: {len(rows) - 1} settings x {len(rows[0]) - 3} columns")
    print(f"[report] -> {a.out_xlsx}")


if __name__ == "__main__":
    main()
