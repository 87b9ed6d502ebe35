"""Fixture-split sf10 ladder for the STREAMING cross-modality gate
(VERDICT r10 item 7): the r10 SCALE.md row for
`stream_video_contains_image` timed the registry query end-to-end, so
its 18x at 100x was dominated by FIXTURE cost (synthesizing +
parquet-writing the full video corpus as streamed arrivals, signing
the image corpus into the MediaSignatureStore) that the batch
`video_contains_image` row never pays.  This tool pre-persists BOTH
fixtures outside the timed region and times ONLY the gate: stream
start -> 3 microbatches through video_contains_image_pairs against
the persisted signature table -> exactly-once partition overwrites.

Protocol: one rig, 8 GB JVM session default, min of 2 reps,
cache-cold operator state per rep (fresh checkpoint/output dirs; the
arrivals and the signature table are the REUSED ingest artifacts —
that amortization is the design, the same rationale that keeps
bucketed_colocated_join's layout write out of the bench headline).

Usage: python tools/ladder_stream_vci.py
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
from langchain_memvid_spark.streaming.media import stream_video_contains_image  # noqa: E402


def main() -> None:
    spark = get_spark("ladder-stream-vci")
    spark.sparkContext.setLogLevel("ERROR")
    res = {}
    for sf_label, sf_dir in (
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf10", ".localdata/sf10"),
    ):
        spark.read.parquet(f"{sf_dir}/region.parquet").count()
        docs = load_table(spark, sf_dir, "documents")
        base = tempfile.mkdtemp(prefix="ladder_stream_vci_")
        try:
            # FIXTURES, untimed (ingest artifacts, written once):
            # the image corpus signed into the store + the video
            # arrivals parquet the stream will read
            t_fix = time.monotonic()
            store = MediaSignatureStore(spark, f"{base}/isigs", "image")
            store.sign_and_append(
                mm.synthesize_image_corpus(docs, variant_every=None)
            )
            videos = mm.synthesize_video_with_planted_images(docs, plant_every=5)
            videos.repartition(3).write.mode("overwrite").parquet(
                f"{base}/arrivals"
            )
            fix_s = time.monotonic() - t_fix

            best, rows = float("inf"), -1
            for rep in range(2):
                spark.catalog.clearCache()
                out_dir = f"{base}/matches_{rep}"
                ckpt = f"{base}/ckpt_{rep}"
                t0 = time.monotonic()
                out = stream_video_contains_image(
                    spark,
                    f"{base}/arrivals",
                    out_dir,
                    ckpt,
                    image_sig=store,
                    max_files_per_trigger=1,
                )
                rows = out.count()
                best = min(best, time.monotonic() - t0)
            res[sf_label] = {
                "gate_s": round(best, 2),
                "fixture_s": round(fix_s, 2),
                "rows": rows,
            }
            print(f"# {sf_label}: gate {best:.2f}s, fixtures {fix_s:.2f}s, "
                  f"{rows} rows", file=sys.stderr, flush=True)
        finally:
            shutil.rmtree(base, ignore_errors=True)
    a, b = res["sf0.1"]["gate_s"], res["sf10"]["gate_s"]
    print(json.dumps({
        "query": "stream_video_contains_image (gate only)",
        "sf0.1": a, "sf10": b, "x": round(b / a, 1),
        "fixture_s": {k: v["fixture_s"] for k, v in res.items()},
    }))


if __name__ == "__main__":
    main()
