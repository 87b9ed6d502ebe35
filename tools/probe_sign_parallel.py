"""Follow-up probe: why does one microbatch's dhash_video_frames cost
25 s at sf10 AFTER widen_for_decode (tools/probe_clip_gate_decomp.py)?
Times the signer over one arrivals part file at several explicit
partition counts, plus the pure-IO baseline (length agg), so
parallelism, shuffle, and decode separate cleanly.

Usage: python tools/probe_sign_parallel.py [sf_dir]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from langchain_memvid_spark.multimodal import binary as mm  # noqa: E402
from langchain_memvid_spark.session import get_spark  # noqa: E402
from langchain_memvid_spark.sources.catalog import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf10"
    spark = get_spark("probe-sign-parallel")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="probe_sign_")
    res: dict = {"sf_dir": sf_dir}
    try:
        corpus = mm.synthesize_video_clip_corpus(docs, clip_every=5)
        arrivals = corpus.filter(F.col("media_id") < mm.VARIANT_ID_OFFSET)
        arrivals.repartition(3).write.mode("overwrite").parquet(f"{base}/arrivals")
        part = sorted(glob.glob(f"{base}/arrivals/part-*"))[0]
        res["part_mb"] = round(os.path.getsize(part) / 2**20, 1)

        batch = spark.read.parquet(part)
        res["read_partitions"] = batch.rdd.getNumPartitions()

        t0 = time.monotonic()
        n = batch.agg(F.count(F.lit(1)), F.sum(F.length("content"))).head()
        res["io_agg"] = {"s": round(time.monotonic() - t0, 2),
                         "rows": n[0], "mb": round((n[1] or 0) / 2**20, 1)}

        for label, df in (
            ("asread", batch),
            ("widen", mm.widen_for_decode(batch)),
            ("rep32", batch.repartition(32)),
            ("rep128", batch.repartition(128)),
        ):
            t0 = time.monotonic()
            cnt = mm.dhash_video_frames(df).count()
            res[f"sign_{label}"] = {"s": round(time.monotonic() - t0, 2), "n": cnt}
            print(f"# sign_{label}: {res[f'sign_{label}']}", file=sys.stderr, flush=True)
        print(json.dumps(res))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
