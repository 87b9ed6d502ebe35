"""Fixture-split sf10 ladder for the STREAMING soundtrack gate
(`stream_video_audio_contains_clip`) — same protocol as
tools/ladder_stream_vcc.py: the clip corpus signed once into the
span-grain audio_span store and the video arrivals parquet
pre-persisted OUTSIDE the timed region; the timed region is stream
start -> 3 microbatches -> exactly-once partition overwrites.  Min of
2 reps, cache cleared between reps.

Usage: python tools/ladder_stream_vac.py
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

from langchain_memvid_spark.multimodal import binary as mm  # noqa: E402
from langchain_memvid_spark.multimodal.sigstore import MediaSignatureStore  # noqa: E402
from langchain_memvid_spark.session import get_spark  # noqa: E402
from langchain_memvid_spark.sources.catalog import load_table  # noqa: E402
from langchain_memvid_spark.streaming.media import (  # noqa: E402
    stream_video_audio_contains_clip,
)


def main() -> None:
    spark = get_spark("ladder-stream-vac")
    spark.sparkContext.setLogLevel("ERROR")
    res = {}
    for sf_label, sf_dir in (
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf10", ".localdata/sf10"),
    ):
        spark.read.parquet(f"{sf_dir}/region.parquet").count()
        docs = load_table(spark, sf_dir, "documents")
        base = tempfile.mkdtemp(prefix="ladder_stream_vac_")
        try:
            t_fix = time.monotonic()
            media = mm.synthesize_video_with_soundtrack(
                docs, clip_every=5, span_samples=256
            )
            store = MediaSignatureStore(
                spark, f"{base}/clip_spans", "audio_span", span_samples=256
            )
            store.sign_and_append(media)
            arrivals = media.filter(F.col("media_type") == "video")
            arrivals.repartition(3).write.mode("overwrite").parquet(
                f"{base}/arrivals"
            )
            fix_s = time.monotonic() - t_fix

            best, rows = float("inf"), -1
            for rep in range(2):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                out = stream_video_audio_contains_clip(
                    spark,
                    f"{base}/arrivals",
                    f"{base}/matches_{rep}",
                    f"{base}/ckpt_{rep}",
                    clip_sig=store,
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
        "query": "stream_video_audio_contains_clip (gate only)",
        "sf0.1": a, "sf10": b, "x": round(b / a, 1),
        "fixture_s": {k: v["fixture_s"] for k, v in res.items()},
    }))


if __name__ == "__main__":
    main()
