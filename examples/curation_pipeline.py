"""Corpus-curation pipeline — the selection/ordering shapes between a
cleaned corpus and a training run, end to end on the engine's
operators (no reference analog: SURVEY north-star extension surface):

  1. typo-grade fuzzy dedup   edit_distance_pairs on title keys
                              (q-gram blocked, zero-FN bound, exact
                              levenshtein verify)
  2. budgeted selection       token_budget_select — best documents up
                              to a global token budget, two-phase
                              prefix sum (no SinglePartition)
  3. exemplar linking         topk_join — each selected doc's nearest
                              curated exemplars by embedding cosine
                              (block-GEMM above the pair bound;
                              topk_join_ivf is the gated scale path)
  4. deterministic shuffle    seeded_shuffle — reproducible global
                              permutation for sharding
  5. packing                  sequence_packing over the shuffled order

Run: python examples/curation_pipeline.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from langchain_memvid_spark.operators import dedup, textops, topk
from langchain_memvid_spark.session import get_spark
from langchain_memvid_spark.sources.catalog import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
spark = get_spark("curation-pipeline", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
docs = load_table(spark, sf_dir, "documents")
emb = load_table(spark, sf_dir, "embeddings")

# -- 1. typo-grade fuzzy dedup on title keys -------------------------------
titles = docs.select("doc_id", F.substring(F.trim(F.col("text")), 1, 20).alias("title"))
typo_pairs = dedup.edit_distance_pairs(
    titles, id_col="doc_id", str_col="title", max_d=4, q=3
)
# keep the smallest doc_id per fuzzy group (same keeper rule as exact dedup)
losers = typo_pairs.select(F.col("b_id").alias("doc_id")).distinct()
deduped = docs.join(losers, "doc_id", "left_anti")
print("fuzzy title dedup:", docs.count(), "->", deduped.count(), "docs")

# -- 2. budgeted quality selection -----------------------------------------
selected = textops.token_budget_select(deduped, budget=4000)
n_sel, cum = selected.count(), selected.agg(F.max("cum_tokens")).first()[0]
print(f"token budget 4000: kept {n_sel} docs, {cum} tokens")

# -- 3. link each selected doc to its nearest curated exemplars ------------
# (embeddings stand in for the docs' vectors; every 10th is "curated")
probe = emb.join(
    selected.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
)
exemplars = emb.filter(F.col("vec_id") % 10 == 0)
links = topk.topk_join(probe, exemplars, k=2)
print("exemplar links:", links.count(), "(2 per selected doc with a vector)")

# -- 4 + 5. deterministic shuffle, then pack the shuffled order ------------
order = textops.seeded_shuffle(selected.join(docs, "doc_id").select("doc_id"), seed=7)
shuffled = (
    selected.join(docs.select("doc_id", "text"), "doc_id")
    .join(order, "doc_id")
    # re-key doc order by shuffle position so packing consumes the
    # permuted stream (packing lays docs end-to-end in key order)
    .select(F.col("pos").alias("doc_id"), "text")
)
packed = textops.sequence_packing(shuffled, budget=256)
print(
    "packed sequences:",
    packed.agg(F.countDistinct("seq_id")).first()[0],
    "of 256 tokens each",
)
spark.stop()
print("curation pipeline OK")
