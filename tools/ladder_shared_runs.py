"""Fixture-split gate-only ladder for the SHARED-RUN family (VERDICT
r13 item 4): the r13 100x rows for video/audio_shared_runs were
end-to-end (fixture synthesis dominated and carried the documented
1.2-1.4x invocation spread), so the kernel's own scaling was not on
record.  Protocol per the ladder_stream_vcc.py pattern: the overlap
fixture is synthesized and WRITTEN TO PARQUET outside the timed
region; the timed region is the operator over the file-backed media
(decode+sign -> band -> (band,val) join + min-hamming collapse ->
gaps-and-islands window), min of 2 reps, cache cleared between reps.

Also times the r14 streaming gate (stream_video_shared_runs: corpus
store signed + arrivals parquet outside the timed region; timed region
is stream start -> 3 microbatches -> exactly-once overwrites) and
prints a one-line sign/band/join/window decomposition of the video
kernel at each rung.

Usage: python tools/ladder_shared_runs.py [sf0.1_dir sf10_dir]
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
from langchain_memvid_spark.streaming.media import stream_video_shared_runs  # noqa: E402


def _decompose_video(spark, media, n_band_rows):
    """Cumulative-stage split of the video shared-run kernel: sign
    (decode+dhash, checkpointed), band (4x explode), join (band
    equi-join + per-aligned-frame min-hamming collapse), window
    (gaps-and-islands + island agg).  Stages reuse the prior stage's
    materialized frame, so each diff isolates one term."""
    from langchain_memvid_spark.operators.dedup import hamming_band_table

    t0 = time.monotonic()
    sigs = mm.dhash_video_frames(media).localCheckpoint(eager=True)
    sigs.count()
    t_sign = time.monotonic() - t0

    t0 = time.monotonic()
    bands = hamming_band_table(
        sigs.select("media_id", "frame_no", "dhash"),
        ["dhash"], n_bands=4, band_bits=16,
    ).localCheckpoint(eager=True)
    bands.count()
    t_band = time.monotonic() - t0

    # join + collapse: replicate the kernel's hits subtree over the
    # cached bands (SMJ/broadcast pick as in _shared_run_pairs_from_sigs)
    from langchain_memvid_spark.operators.dedup import (
        _PAIR_BROADCAST_ROW_LIMIT,
        hamming_distance_col,
    )

    a = bands.select(
        F.col("media_id").alias("a_id"), F.col("frame_no").alias("a_fno"),
        F.col("dhash").alias("__a0"), "band", "val",
    )
    b = bands.select(
        F.col("media_id").alias("b_id"), F.col("frame_no").alias("b_fno"),
        F.col("dhash").alias("__b0"), "band", "val",
    )
    joined = (
        F.broadcast(a).join(b, ["band", "val"])
        if n_band_rows <= _PAIR_BROADCAST_ROW_LIMIT
        else a.hint("merge").join(b, ["band", "val"])
    )
    hits = (
        joined.filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id", "b_id", "b_fno",
            (F.col("a_fno") - F.col("b_fno")).alias("delta"),
            hamming_distance_col(["__a0"], ["__b0"]).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .groupBy("a_id", "b_id", "delta", "b_fno")
        .agg(F.min("hamming").alias("hamming"))
        .localCheckpoint(eager=True)
    )
    t0 = time.monotonic()
    hits.count()
    t_join = time.monotonic() - t0

    from pyspark.sql import Window

    w = Window.partitionBy("a_id", "b_id", "delta").orderBy("b_fno")
    t0 = time.monotonic()
    (
        hits.withColumn("__island", F.col("b_fno") - F.row_number().over(w))
        .groupBy("a_id", "b_id", "delta", "__island")
        .agg(F.count("*").alias("run_frames"))
        .filter(F.col("run_frames") >= 2)
        .count()
    )
    t_window = time.monotonic() - t0
    return {
        "sign_s": round(t_sign, 2), "band_s": round(t_band, 2),
        "join_s": round(t_join, 2), "window_s": round(t_window, 2),
    }


def main() -> None:
    dirs = sys.argv[1:3] or ["/root/testdata/sf0.1", ".localdata/sf10"]
    spark = get_spark("ladder-shared-runs")
    spark.sparkContext.setLogLevel("ERROR")
    res: dict = {"video": {}, "audio": {}, "stream": {}, "decomp": {}}
    for sf_label, sf_dir in zip(("sf0.1", "sf10"), dirs):
        spark.read.parquet(f"{sf_dir}/region.parquet").count()
        # widen the UNTIMED fixture synthesis (documents reads as 1-2
        # splits even at sf10, and a 1-partition mapInPandas synth of
        # 500k AVIs would serialize the prep); the timed region reads
        # the written parquet back like any real scrape directory
        docs = load_table(spark, sf_dir, "documents").repartition(64)
        base = tempfile.mkdtemp(prefix="ladder_shared_runs_")
        try:
            t_fix = time.monotonic()
            vmedia = mm.synthesize_video_overlap_corpus(docs, overlap_every=5)
            vmedia.write.mode("overwrite").parquet(f"{base}/vmedia")
            amedia = mm.synthesize_audio_overlap_corpus(
                docs, overlap_every=5, span_samples=256
            )
            amedia.write.mode("overwrite").parquet(f"{base}/amedia")
            fix_s = round(time.monotonic() - t_fix, 2)
            vread = spark.read.parquet(f"{base}/vmedia")
            aread = spark.read.parquet(f"{base}/amedia")

            d = F.col("doc_id")
            r = docs.select(
                F.sum(3 + d % 4).alias("fb"),
                F.sum(F.when(d % 5 == 0, 4 + d % 3 + d % 2).otherwise(0)).alias("fo"),
                F.sum(F.when(d % 5 == 0, 1).otherwise(0)).alias("nv"),
            ).head()
            n_vframes = int(r["fb"] or 0) + int(r["fo"] or 0)
            n_aspans = n_vframes  # same S/L arithmetic at span grain

            for tag, op, src, nbr in (
                ("video", mm.video_shared_run_pairs, vread, 4 * n_vframes),
                ("audio", None, aread, 4 * n_aspans),
            ):
                best, rows = float("inf"), -1
                for _ in range(2):
                    spark.catalog.clearCache()
                    t0 = time.monotonic()
                    if tag == "video":
                        out = mm.video_shared_run_pairs(
                            src, min_run=2, max_hamming=3, n_band_rows=nbr
                        )
                    else:
                        out = mm.audio_shared_run_pairs(
                            src, span_samples=256, min_run=2, max_hamming=3,
                            n_band_rows=nbr,
                        )
                    rows = out.count()
                    best = min(best, time.monotonic() - t0)
                res[tag][sf_label] = round(best, 2)
                print(f"# {sf_label} {tag}: kernel {best:.2f}s ({rows} rows, "
                      f"fixtures {fix_s}s)", file=sys.stderr, flush=True)

            # streaming gate: corpus store + arrivals prepared outside
            t_prep = time.monotonic()
            store = MediaSignatureStore(spark, f"{base}/csigs", "video")
            store.sign_and_append(
                vread.filter(F.col("media_id") < mm.VARIANT_ID_OFFSET)
            )
            vread.filter(F.col("media_id") >= mm.VARIANT_ID_OFFSET).repartition(
                3
            ).write.mode("overwrite").parquet(f"{base}/arrivals")
            prep_s = round(time.monotonic() - t_prep, 2)
            best, rows = float("inf"), -1
            for rep in range(2):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                out = stream_video_shared_runs(
                    spark, f"{base}/arrivals", f"{base}/m_{rep}",
                    f"{base}/c_{rep}", corpus_sig=store,
                    max_files_per_trigger=1,
                )
                rows = out.count()
                best = min(best, time.monotonic() - t0)
            res["stream"][sf_label] = round(best, 2)
            print(f"# {sf_label} stream gate: {best:.2f}s ({rows} rows, "
                  f"prep {prep_s}s)", file=sys.stderr, flush=True)

            spark.catalog.clearCache()
            res["decomp"][sf_label] = _decompose_video(
                spark, vread, 4 * n_vframes
            )
            print(f"# {sf_label} decomp: {res['decomp'][sf_label]}",
                  file=sys.stderr, flush=True)
        finally:
            shutil.rmtree(base, ignore_errors=True)

    def x(d):
        return round(d["sf10"] / d["sf0.1"], 1) if "sf10" in d else None

    print(json.dumps({
        "video_kernel": {**res["video"], "x": x(res["video"])},
        "audio_kernel": {**res["audio"], "x": x(res["audio"])},
        "stream_gate": {**res["stream"], "x": x(res["stream"])},
        "video_decomp": res["decomp"],
    }))


if __name__ == "__main__":
    main()
