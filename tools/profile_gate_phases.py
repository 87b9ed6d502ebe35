"""Decompose a streaming media gate's wall time into phases.

The bench rows for the five streaming media gates are end-to-end:
fixture synthesis + corpus signing + stream machinery + the per-
microbatch kernel.  The ladder tools already isolate the KERNEL's
scaling; this tool answers the other question — where the sf0.1
BENCH seconds actually go — so optimization effort lands on the
dominant term instead of the most visible one (guide §1.1).

Phases for stream_video_contains_clip (the others share the shape):
  synth_corpus   mapInPandas fixture -> arrivals parquet write
  sign_corpus    store.sign_and_append of the clip corpus
  band_count     banded_signature_table persist + count (once/stream)
  stream         writeStream start -> awaitTermination (3 microbatches)
    per-batch    foreachBatch body wall time, recorded per batch_id
  read_back      final spark.read.parquet of the verdicts

Usage: python tools/profile_gate_phases.py [sf_dir] [gate]
  gate in {vcc, vsr, vac, vci, ingest}; default vcc.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from langchain_memvid_spark.multimodal import binary as mm  # noqa: E402
from langchain_memvid_spark.multimodal.sigstore import MediaSignatureStore  # noqa: E402
from langchain_memvid_spark.session import get_spark  # noqa: E402
from langchain_memvid_spark.streaming.documents import _read_table_stream  # noqa: E402
from langchain_memvid_spark.streaming.media import (  # noqa: E402
    MEDIA_STREAM_SCHEMA,
    _infer_sig_cols,
    _persisted_corpus_bands,
)


def profile_vcc(spark, sf_dir: str) -> dict:
    t: dict[str, float] = {}
    batches: dict[int, float] = {}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = tempfile.mkdtemp(prefix="prof_vcc_")

    t0 = time.time()
    corpus = mm.synthesize_video_clip_corpus(docs, clip_every=5)
    arrivals = corpus.filter(F.col("media_id") < mm.VARIANT_ID_OFFSET)
    arrivals.repartition(3).write.mode("overwrite").parquet(f"{base}/arrivals")
    t["synth_arrivals"] = time.time() - t0

    t0 = time.time()
    store = MediaSignatureStore(spark, f"{base}/csigs", "video")
    store.sign_and_append(
        mm.synthesize_video_clip_corpus(
            docs.filter(F.col("doc_id") % 5 == 0), clip_every=5
        ).filter(F.col("media_id") >= mm.VARIANT_ID_OFFSET)
    )
    t["sign_corpus"] = time.time() - t0

    t0 = time.time()
    clip_sig = store.signatures()
    every_n = store.every_n
    corpus_bands = _persisted_corpus_bands(
        clip_sig, _infer_sig_cols(clip_sig, "dhash", "clip_sig"), frame_grain=True
    )
    n_corpus_band_rows = corpus_bands.count()
    t["band_count"] = time.time() - t0

    def _process(batch_df, batch_id: int) -> None:
        b0 = time.time()
        out = mm.video_contains_clip_vs_corpus(
            batch_df,
            clip_sig=clip_sig,
            corpus_bands=corpus_bands,
            n_corpus_band_rows=n_corpus_band_rows,
            max_hamming=3,
            every_n=every_n,
            salvage=False,
        )
        out.write.mode("overwrite").parquet(f"{base}/matches/batch_id={batch_id}")
        batches[batch_id] = time.time() - b0

    stream = _read_table_stream(spark, f"{base}/arrivals", MEDIA_STREAM_SCHEMA, 1)
    t0 = time.time()
    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    t["stream_total"] = time.time() - t0
    corpus_bands.unpersist()

    t0 = time.time()
    n = spark.read.parquet(f"{base}/matches").count()
    t["read_back"] = time.time() - t0

    t["batches"] = {str(k): round(v, 3) for k, v in sorted(batches.items())}
    t["stream_machinery"] = t["stream_total"] - sum(batches.values())
    t["rows"] = n
    return t


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("gate-phase-profile")
    spark.sparkContext.setLogLevel("ERROR")
    # warm python workers so phase 1 isn't billed the spin-up
    mm.synthesize_video_clip_corpus(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), clip_every=5
    ).count()
    total0 = time.time()
    t = profile_vcc(spark, sf_dir)
    t["total"] = time.time() - total0
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in t.items()}, indent=1))


if __name__ == "__main__":
    main()
