"""Production ingest pipeline — the shapes a training-data corpus at
scale actually runs, end to end on the engine's operators (no
reference analog: this is the SURVEY north-star extension surface):

  1. scrape clean     html_extract (boilerplate strip + entity decode)
  2. quality gate     quality_scores + pii_scrub
  3. corpus signing   minhash_signatures persisted ONCE at ingest
  4. incremental batch dedup vs the EXISTING corpus (one corpus scan,
     zero corpus-side shuffle; never re-signs corpus text)
  5. streaming gate   the same suppression for streamed arrivals
     (persisted SimHash set, stateless stream-static anti join)
  6. salvage decode   corrupt media quarantines per-row, never kills
     the scan

Run: python examples/ingest_pipeline.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from langchain_memvid_spark.operators import dedup, textops
from langchain_memvid_spark.multimodal import binary as mm
from langchain_memvid_spark.session import get_spark
from langchain_memvid_spark.sources.catalog import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
spark = get_spark("ingest-pipeline", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
docs = load_table(spark, sf_dir, "documents")

# -- 1. scrape clean: wrap each doc in an HTML page, then extract ----------
sid = F.col("doc_id").cast("string")
pages = docs.select(
    "doc_id",
    F.concat(
        F.lit("<html><head><script>var x=1; if (x>0) { x=2; }</script></head><body><p>"),
        F.col("text"),
        F.lit("</p><!-- crawler --></body></html>"),
    ).alias("html"),
)
cleaned = textops.html_extract(pages)
print("cleaned pages:", cleaned.count(), "— mean visible ratio:",
      round(cleaned.agg(F.avg("text_ratio")).first()[0], 3))

# -- 2. quality + PII gates ------------------------------------------------
quality = textops.quality_scores(docs)
kept = quality.filter(F.col("quality_score") >= 0.3)
print("quality gate keeps", kept.count(), "of", docs.count())
scrubbed = textops.pii_scrub(docs)
print("pii: redacted", scrubbed.agg(F.sum("n_emails")).first()[0], "emails")

# -- 3. split corpus vs a new arriving batch; sign the corpus ONCE ---------
corpus = docs.filter(F.col("doc_id") % 10 != 0)
batch = docs.filter(F.col("doc_id") % 10 == 0)
workdir = tempfile.mkdtemp(prefix="ingest_pipeline_")
sig_path = os.path.join(workdir, "corpus_minhash")
dedup.minhash_signatures(corpus).write.parquet(sig_path)  # at real scale:
# written alongside the corpus at ingest, maintained incrementally

# -- 4. incremental batch dedup against the persisted signatures -----------
corpus_sig = spark.read.parquet(sig_path)
verdicts = dedup.incremental_near_dup(batch, corpus_sig=corpus_sig)
novel = verdicts.filter(~F.col("is_dup"))
print("batch:", verdicts.count(), "docs —",
      verdicts.filter("is_dup").count(), "already in corpus,",
      novel.count(), "novel (these ingest)")

# -- 5. the same gate for STREAMED arrivals (signature set, not text) ------
simhash_path = os.path.join(workdir, "corpus_simhash")
dedup.simhash(corpus).select("simhash").write.parquet(simhash_path)
# a stream would then run:
#   sd.near_dedup_stream_vs_corpus(doc_stream, spark.read.parquet(simhash_path))
# -- stateless stream-static anti join; no microbatch re-signs the corpus
print("streaming gate: corpus signature set persisted,",
      spark.read.parquet(simhash_path).count(), "signatures")

# -- 6. salvage decode: one corrupt blob must not kill the scan ------------
media = mm.synthesize_real_media(docs.limit(50))
corrupted = mm.corrupt_media_prefix(media, 7)  # every 7th blob loses its magic
scan = mm.decode_media_info(corrupted, salvage=True)
bad = scan.filter(F.col("error").isNotNull())
print("media scan:", scan.count(), "rows,", bad.count(),
      "quarantined — e.g.", bad.select("error").first()[0])

spark.stop()
print("ingest pipeline example complete")
