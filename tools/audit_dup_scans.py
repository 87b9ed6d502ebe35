"""Audit every registry query's physical plan for duplicated scans.

Round-14 found three instances of one disease: a frame referenced on
two plan branches whose column pruning diverges, so ReuseExchange
never fires and an expensive subtree (corpus scan + transform) runs
twice per query (bm25 df_ build, knn_graph/dedup edge union, q11
grand-total build). This sweep makes the hunt systematic instead of
anecdotal: for each query it counts physical scans of the same
parquet path and reports paths scanned more than once, plus whether
the plan already mitigates (ReusedExchange / InMemoryRelation /
checkpoint ExistingRDD).

A multi-scan row is a LEAD, not a verdict: scalar-subquery shapes
(q22, above_avg) legitimately scan a pruned base table twice, and
self-joins read their cached band table once by design. Judge each
lead by what the duplicated subtree COSTS (scan+tokenize+join vs a
pruned columnar scan).

Usage: python tools/audit_dup_scans.py [--sf-dir DIR] [query ...]
Prints one line per query with duplicate scan paths; summary at end.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from langchain_memvid_spark.plans.registry import QUERIES  # noqa: E402
from langchain_memvid_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and args[0] == "--sf-dir":
        sf_dir = args[1]
        args = args[2:]
    names = args or list(QUERIES)
    spark = get_spark("dup-scan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    flagged = []
    for name in names:
        try:
            df = QUERIES[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            print(f"SKIP  {name}: {type(e).__name__}: {str(e)[:100]}")
            continue
        paths: dict[str, int] = {}
        for m in re.finditer(r"Scan parquet[^\n]*", plan):
            line = m.group(0)
            pm = re.search(r"file:[^\s,\]]+", line)
            key = pm.group(0) if pm else line[:120]
            paths[key] = paths.get(key, 0) + 1
        dups = {p: c for p, c in paths.items() if c > 1}
        mitig = []
        for tag in ("ReusedExchange", "InMemoryRelation", "Scan ExistingRDD"):
            n = plan.count(tag)
            if n:
                mitig.append(f"{tag}x{n}")
        if dups:
            short = {p.rsplit("/", 1)[-1]: c for p, c in dups.items()}
            flagged.append(name)
            print(f"DUP   {name}: {short} mitig={','.join(mitig) or 'none'}")
        else:
            print(f"ok    {name}")
    print(f"\n{len(flagged)} queries with multi-scanned paths: {flagged}")


if __name__ == "__main__":
    main()
