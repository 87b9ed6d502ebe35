"""Fifth sf10 ladder widening batch: the 18 registry queries not yet
in SCALE.md's 100x tables.  Same protocol as batches 1-4: one rig,
8 GB JVM (session default), min of 2 reps per query, sf0.1 vs
.localdata/sf10.

Usage: python tools/ladder_batch5.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from langchain_memvid_spark.plans.registry import QUERIES  # noqa: E402
from langchain_memvid_spark.session import get_spark  # noqa: E402

BATCH5 = [
    "dedup_exact",
    "simhash",
    "minhash_signatures",
    "knn_topk_l2",
    "knn_topk_filtered",
    "media_header_info",
    "orders_rollup",
    "orders_unpivot",
    "top_customers_per_nation",
    "quality_filter_summary",
    "vs_metadata_filter_typed",
    "stream_ingest_ivf",
    # trained-component ANN (KMeans / PQ / MLlib LSH fits dominate):
    "ivf_kmeans_search",
    "pq_search",
    "pq_reconstruction_error",
    "pq_compression_stats",
    "ivfpq_search",
    "lsh_ann_search",
]


def main() -> None:
    names = sys.argv[1:] or BATCH5
    spark = get_spark("ladder-batch5")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, float]] = {}
    for sf_label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"), ("sf10", ".localdata/sf10")):
        # warm parquet footers + python workers once per SF
        spark.read.parquet(f"{sf_dir}/region.parquet").count()
        for name in names:
            best = float("inf")
            rows = -1
            for _ in range(2):
                # r9: operators mark reusable scans with .cache(), and
                # the cache manager matches re-built identical plans —
                # without clearing, rep 2 would measure the warm-cache
                # path (video groups "ran" 0.8x at 100x).  Clear so the
                # row measures the cold signature-scan protocol r1-r8
                # rows used.
                spark.catalog.clearCache()
                t0 = time.time()
                rows = QUERIES[name].fn(spark, sf_dir).count()
                best = min(best, time.time() - t0)
            out.setdefault(name, {})[sf_label] = round(best, 2)
            print(f"# {sf_label} {name}: {best:.2f}s ({rows} rows)", file=sys.stderr, flush=True)
    for name in names:
        a, b = out[name].get("sf0.1"), out[name].get("sf10")
        ratio = round(b / a, 1) if a and b else None
        print(json.dumps({"query": name, "sf0.1": a, "sf10": b, "x": ratio}))


if __name__ == "__main__":
    main()
