"""sf0.1 -> sf10 ladder row for the STREAMING multimodal ingest gate
at hash_bits=256 (VERDICT r9 item 8): the 64-bit gate has its row via
the registry query (stream_media_ingest_gate); this proves the WIDE
path holds the same profile under the streaming harness — corpus
signed once into a MediaSignatureStore at 256-bit, the scrape batch
arrives as a 3-microbatch file stream, every microbatch runs the
incremental kernel against the persisted signature table through the
TYPED store-handle gate.

Protocol: same as tools/ladder_batch5.py — one rig, 8 GB JVM session
default, min of 2 reps, cache-cold (fresh temp dirs per rep: signing,
checkpoints, and verdicts never reuse state).

Usage: python tools/ladder_stream_media_wide.py [hash_bits]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from langchain_memvid_spark.multimodal import binary as mm  # noqa: E402
from langchain_memvid_spark.multimodal.sigstore import MediaSignatureStore  # noqa: E402
from langchain_memvid_spark.session import get_spark  # noqa: E402
from langchain_memvid_spark.sources.catalog import load_table  # noqa: E402
from langchain_memvid_spark.streaming.media import stream_media_dedup_vs_corpus  # noqa: E402

HASH_BITS = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def run_once(spark, sf_dir: str) -> tuple[float, int]:
    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="ladder_stream_media_wide_")
    try:
        t0 = time.monotonic()
        store = MediaSignatureStore(
            spark, f"{base}/sigs", "image", hash_bits=HASH_BITS
        )
        store.sign_and_append(
            mm.synthesize_image_corpus(
                docs, variant_every=None, base_w=17, base_h=16
            )
        )
        batch = mm.synthesize_image_batch(
            docs, variant_every=7, novel_remainder=3, base_w=17, base_h=16
        )
        batch.repartition(3).write.mode("overwrite").parquet(f"{base}/arrivals")
        out = stream_media_dedup_vs_corpus(
            spark,
            f"{base}/arrivals",
            f"{base}/verdicts",
            f"{base}/ckpt",
            store=store,
            max_files_per_trigger=1,
        )
        n = out.count()
        return time.monotonic() - t0, n
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    spark = get_spark("ladder-stream-media-wide")
    spark.sparkContext.setLogLevel("ERROR")
    res = {}
    for sf_label, sf_dir in (
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf10", ".localdata/sf10"),
    ):
        spark.read.parquet(f"{sf_dir}/region.parquet").count()
        best, rows = float("inf"), -1
        for _ in range(2):
            spark.catalog.clearCache()
            secs, n = run_once(spark, sf_dir)
            best, rows = min(best, secs), n
        res[sf_label] = round(best, 2)
        res[f"{sf_label}_rows"] = rows
    res["x"] = round(res["sf10"] / res["sf0.1"], 1)
    print(json.dumps({"query": f"stream_media_ingest_gate@{HASH_BITS}bit", **res}))


if __name__ == "__main__":
    main()
