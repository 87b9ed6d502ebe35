"""Production-shaped 100× ladder row for stream_similarity_join
(VERDICT r8 item 4).

The registry query's witness is QUADRATIC BY DESIGN (nprobe=nlist,
every-10th-row queries) so its sf10 row measures witness cost, not
the production shape.  This harness measures the shape a deployment
actually runs:

  - corpus: the SF's embeddings table ingested into an IVF store with
    nlist = nlist_for_corpus(n) (size-derived, core/ivf.py) and
    nprobe ≪ nlist at a PINNED scan fraction (nprobe/nlist = 1/4 at
    every SF, the hard-won rule: on near-iid vectors recall tracks
    the scan fraction, so only a pinned fraction is comparable
    across rungs);
  - query stream: a BOUNDED, CONSTANT-SIZE set — 64 query vectors in
    4 parquet files, maxFilesPerTrigger=1 → 4 microbatches of 16 —
    the same stream at every SF, so wall-clock growth is corpus
    growth alone;
  - recall witness: streamed top-k vs the same store at full probe
    (exact), recall@k printed and bounded.

Usage: python tools/ladder_stream_simjoin.py [reps]
Prints one JSON line per SF plus the ratio line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from langchain_memvid_spark.config import EngineConfig, IndexConfig  # noqa: E402
from langchain_memvid_spark.core.ivf import nlist_for_corpus  # noqa: E402
from langchain_memvid_spark.core.store import SparkVectorStore  # noqa: E402
from langchain_memvid_spark.session import get_spark  # noqa: E402
from langchain_memvid_spark.streaming import documents as sd  # noqa: E402

K = 5
N_QUERIES = 64
N_FILES = 4
SCAN_FRACTION = 4  # nprobe = nlist // SCAN_FRACTION


def run_sf(spark, sf_dir: str, reps: int) -> dict:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    nlist = nlist_for_corpus(n)
    nprobe = max(2, nlist // SCAN_FRACTION)
    cfg = EngineConfig(
        index=IndexConfig(
            metric="ip", ivf=True, nlist=nlist, nprobe=nprobe,
            ivf_min_points_factor=5, rerank_candidates=0,
        )
    )
    store = SparkVectorStore(spark, config=cfg)
    store.add_dataframe(
        emb.withColumn("__t", F.concat(F.lit("doc-"), F.col("vec_id"))),
        text_col="__t", order_col="vec_id", embedding_col="embedding",
    )

    # bounded CONSTANT query stream: the same 64 vectors at every SF
    # (vec_id 0..63 exist at every rung), 4 files → 4 microbatches
    qdir = tempfile.mkdtemp(prefix="simjoin_queries_")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).localCheckpoint()
    queries.repartition(N_FILES).write.mode("overwrite").parquet(f"{qdir}/q")

    best = float("inf")
    out = None
    for _ in range(reps):
        base = tempfile.mkdtemp(prefix="simjoin_run_")
        t0 = time.time()
        out = sd.stream_similarity_join(
            spark, f"{qdir}/q", f"{base}/results", f"{base}/ckpt", store,
            k=K, max_files_per_trigger=1,
        )
        got = {
            (r["query_id"], r["doc_id"])
            for r in out.select("query_id", "doc_id").collect()
        }
        best = min(best, time.time() - t0)

    # recall witness: same store, full probe (exact)
    store.config.index.nprobe = nlist
    exact = {
        (r["query_id"], r["doc_id"])
        for r in store.similarity_join(
            queries.select(F.col("vec_id").alias("query_id"), "embedding"),
            k=K, n_queries=N_QUERIES,
        ).collect()
    }
    store.config.index.nprobe = nprobe
    recall = len(got & exact) / len(exact)
    shutil.rmtree(qdir, ignore_errors=True)
    return {
        "n_corpus": n, "nlist": nlist, "nprobe": nprobe,
        "wall_s": round(best, 2), "recall": round(recall, 3),
        "n_queries": N_QUERIES, "k": K,
    }


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark("ladder-stream-simjoin")
    spark.sparkContext.setLogLevel("ERROR")
    rows = {}
    for label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"), ("sf10", ".localdata/sf10")):
        rows[label] = run_sf(spark, sf_dir, reps)
        print(json.dumps({"sf": label, **rows[label]}), flush=True)
    ratio = round(rows["sf10"]["wall_s"] / rows["sf0.1"]["wall_s"], 1)
    corpus_ratio = round(rows["sf10"]["n_corpus"] / rows["sf0.1"]["n_corpus"], 1)
    print(json.dumps({"wall_x": ratio, "corpus_x": corpus_ratio}))


if __name__ == "__main__":
    main()
