"""Decomposition probe for the clip-containment gate's 100x term
(VERDICT r12 item 1 — MEASURE FIRST, the twice-proven r11/r12 lesson).

The r12 profile left `stream_video_contains_clip` at 17x gate-only at
100x and attributed it to candidate volume (~48 M pairs at sf10) plus
the per-batch SMJ sort of the batch band table.  Before implementing
the prescribed semi-join prune, this probe splits ONE microbatch's
cost into the actual terms and measures the prune's selectivity:

  corpus   — band the clip table once (the per-stream cost)
  sign     — dhash_video_frames over the widened batch
  band     — batch-side band explode
  join     — (band, val) join + offset filters, candidate count
  hits     — + hamming <= max_hamming filter
  full     — + groupBy verify (the complete vs-corpus kernel)

and the candidate-cut levers, each timed on the SAME cached inputs:

  smj        — the op's current >limit path (merge join)
  bcast      — force-broadcast the corpus band table
  prune+smj  — semi-join batch band rows against the corpus
               DISTINCT (band, val) key set first, then merge join
  prune+bcast — the prune then a broadcast join

Selectivity math that decides whether the prune can work at all: at
64-bit hashes the band value space is 2^16 = 65,536; a clip corpus
with >> 65k frames SATURATES it (every (band, val) key exists), so the
prune would delete nothing — this probe prints the measured distinct
key count and the surviving-row fraction so the decision is data,
not folklore.

Usage: python tools/probe_clip_gate_decomp.py [sf_dir] [hash_bits]
       (defaults .localdata/sf10 and 64; hash_bits=256 measures the
        wide-hash knob at the same density — fixtures pre-persisted
        untimed, same protocol as tools/ladder_stream_vci.py)
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
from langchain_memvid_spark.multimodal.sigstore import MediaSignatureStore  # noqa: E402
from langchain_memvid_spark.operators.dedup import (  # noqa: E402
    hamming_band_table,
    hamming_distance_col,
)
from langchain_memvid_spark.session import get_spark  # noqa: E402
from langchain_memvid_spark.sources.catalog import load_table  # noqa: E402


def timed(label: str, fn, res: dict) -> float:
    t0 = time.monotonic()
    out = fn()
    dt = time.monotonic() - t0
    res[label] = {"s": round(dt, 2), "n": out}
    print(f"# {label}: {dt:.2f}s  n={out}", file=sys.stderr, flush=True)
    return dt


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf10"
    hash_bits = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("probe-clip-gate-decomp")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="probe_clip_gate_")
    res: dict = {"sf_dir": sf_dir, "hash_bits": hash_bits}
    try:
        # FIXTURES, untimed — identical to the registry query's split:
        # clips (spliced runs) signed into the store, full videos are
        # the arrivals, 3 files = 3 microbatches at maxFilesPerTrigger=1
        t0 = time.monotonic()
        corpus = mm.synthesize_video_clip_corpus(docs, clip_every=5)
        store = MediaSignatureStore(
            spark, f"{base}/csigs", "video", hash_bits=hash_bits
        )
        store.sign_and_append(corpus.filter(F.col("media_id") >= mm.VARIANT_ID_OFFSET))
        arrivals = corpus.filter(F.col("media_id") < mm.VARIANT_ID_OFFSET)
        arrivals.repartition(3).write.mode("overwrite").parquet(f"{base}/arrivals")
        res["fixture_s"] = round(time.monotonic() - t0, 2)
        print(f"# fixtures: {res['fixture_s']}s", file=sys.stderr, flush=True)

        clip_sig = store.signatures()
        sig_cols = [c for c in clip_sig.columns if c.startswith("dhash")]
        band_bits = 16 if len(sig_cols) == 1 else 64

        # corpus prep (once per stream)
        cb = mm.banded_signature_table(clip_sig, sig_cols, frame_grain=True).persist()
        timed("corpus_band", lambda: cb.count(), res)
        timed(
            "corpus_distinct_keys",
            lambda: cb.select("band", "val").distinct().count(),
            res,
        )

        # ONE microbatch = one arrivals part file
        part = sorted(glob.glob(f"{base}/arrivals/part-*"))[0]
        batch = spark.read.parquet(part)

        frames = mm.dhash_video_frames(
            mm.widen_for_decode(batch), hash_bits=hash_bits
        ).persist()
        timed("sign", lambda: frames.count(), res)

        fb = hamming_band_table(
            frames.select("media_id", "frame_no", "n_frames", *sig_cols),
            sig_cols, n_bands=4, band_bits=band_bits,
        ).persist()
        timed("band", lambda: fb.count(), res)

        # prune selectivity: batch band rows whose (band, val) exists in
        # the corpus key set — rows the semi join would KEEP
        keys = cb.select("band", "val").distinct()
        timed(
            "prune_survivors",
            lambda: fb.join(F.broadcast(keys), ["band", "val"], "left_semi").count(),
            res,
        )

        a_sig = [f"__a{j}" for j in range(len(sig_cols))]
        b_sig = [f"__b{j}" for j in range(len(sig_cols))]
        fbj = fb.select(
            F.col("media_id").alias("video_id"),
            F.col("n_frames").alias("a_nf"),
            F.col("frame_no").alias("a_fno"),
            *[F.col(c).alias(al) for c, al in zip(sig_cols, a_sig)],
            "band", "val",
        )
        cbj = cb.select(
            F.col("media_id").alias("clip_id"),
            F.col("n_frames").alias("b_nf"),
            F.col("frame_no").alias("b_fno"),
            *[F.col(c).alias(al) for c, al in zip(sig_cols, b_sig)],
            "band", "val",
        )
        offset = F.col("a_fno") - F.col("b_fno")
        off_ok = (
            (F.col("a_nf") > F.col("b_nf"))
            & (offset >= 0)
            & (offset <= F.col("a_nf") - F.col("b_nf"))
        )

        def cand(joined):
            return joined.filter(off_ok)

        def hits(joined):
            return (
                cand(joined)
                .select(
                    "video_id", "clip_id",
                    offset.cast("int").alias("offset"),
                    "b_fno", "b_nf",
                    hamming_distance_col(a_sig, b_sig).alias("hamming"),
                )
                .filter(F.col("hamming") <= 3)
            )

        def full(joined):
            return (
                hits(joined)
                .groupBy("video_id", "clip_id", "offset", "b_nf")
                .agg(
                    F.countDistinct("b_fno").alias("ok"),
                    F.max("hamming").alias("mh"),
                )
                .filter(F.col("ok") == F.col("b_nf"))
            )

        smj = cbj.hint("merge").join(fbj, ["band", "val"])
        bcast = fbj.join(F.broadcast(cbj), ["band", "val"])
        pruned = fbj.join(F.broadcast(keys), ["band", "val"], "left_semi")
        psmj = cbj.hint("merge").join(pruned, ["band", "val"])
        pbcast = pruned.join(F.broadcast(cbj), ["band", "val"])

        timed("cand_smj", lambda: cand(smj).count(), res)
        timed("hits_smj", lambda: hits(smj).count(), res)
        timed("full_smj", lambda: full(smj).count(), res)
        timed("full_bcast", lambda: full(bcast).count(), res)
        timed("full_prune_smj", lambda: full(psmj).count(), res)
        timed("full_prune_bcast", lambda: full(pbcast).count(), res)
        print(json.dumps(res))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
