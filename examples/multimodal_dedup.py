"""Multimodal near-dup pipeline — the dedup matrix on binary media
columns, end to end (no reference analog: SURVEY north-star extension
surface; the reference decodes video frames for QR payloads,
video/default.py:288-322 — this engine dedups the media itself):

  1. image near-dup      dHash over the engine PNG codec, 4×16-bit
                         hamming-band LSH candidates, exact
                         bit_count(XOR) verify (zero FN by pigeonhole)
  2. video near-dup      per-frame dHash in ONE seek-skipping AVI
                         walk; candidates band-match at the SAME
                         frame_no; pairs verify at full frame depth
                         (a clip never pairs with its source)
  3. audio near-dup      65-window energy-envelope hash — duration-
                         and volume-invariant loudness contours
  4. salvage scan        the corrupt-blob quarantine mode a 100 TB
                         scrape needs (error column, not job death)

Run: python examples/multimodal_dedup.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from langchain_memvid_spark.multimodal import binary as mm
from langchain_memvid_spark.session import get_spark
from langchain_memvid_spark.sources.catalog import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
spark = get_spark("multimodal-dedup", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
docs = load_table(spark, sf_dir, "documents").limit(100)

# -- 1. image near-dup ------------------------------------------------------
images = mm.synthesize_image_corpus(docs, variant_every=7)
img_pairs = mm.image_near_dup_pairs(images, max_hamming=3)
print("image near-dup pairs:", img_pairs.count())

# -- 2. video near-dup (temporally aligned, full-depth verify) --------------
videos = mm.synthesize_video_corpus(docs, variant_every=7)
vid_pairs = mm.video_near_dup_pairs(videos, max_hamming=3)
print("video near-dup pairs:", vid_pairs.count())

# -- 3. audio near-dup (duration/volume-invariant envelope) -----------------
clips = mm.synthesize_audio_corpus(docs, variant_every=7)
aud_pairs = mm.audio_near_dup_pairs(clips, max_hamming=3)
print("audio near-dup pairs:", aud_pairs.count())

# -- 3b. incremental: tonight's scrape batch vs the kept corpus -------------
# sign the corpus ONCE (8 bytes/image), then every nightly batch is one
# corpus scan with zero corpus-side shuffle.
corpus_sigs = mm.dhash_images(images)
batch = mm.synthesize_image_batch(docs, variant_every=7, novel_remainder=3)
verdicts = mm.incremental_image_near_dup(batch, corpus_sig=corpus_sigs)
n_dup = verdicts.filter("is_dup").count()
print("incremental batch:", verdicts.count(), "images,", n_dup, "already in corpus")

# -- 4. keeper rule + salvage scan ------------------------------------------
# drop the b-side of each pair (same min-id keeper as text dedup), then
# scan what survived in salvage mode: corrupt blobs quarantine per-row.
from pyspark.sql import functions as F  # noqa: E402

losers = img_pairs.select(F.col("b_id").alias("media_id")).distinct()
kept = images.join(losers, "media_id", "left_anti")
scanned = mm.decode_media_info(mm.corrupt_media_prefix(kept, 11), salvage=True)
bad = scanned.filter(F.col("error").isNotNull()).count()
print("kept images:", kept.count(), "| quarantined in salvage scan:", bad)

# -- 5. the PERSISTED lifecycle: MediaSignatureStore ------------------------
# production shape: signatures live in a parquet table owned by the
# store (config sidecar pins modality/width/stride; probes go through
# the Hadoop FS, so the same code works on file://, HDFS, S3).  Gate
# each batch against the table, append only the keepers, compact on a
# maintenance cadence.
import tempfile  # noqa: E402

from langchain_memvid_spark.multimodal.sigstore import MediaSignatureStore  # noqa: E402

store_path = tempfile.mkdtemp(prefix="example_sigstore_") + "/image_sigs"
store = MediaSignatureStore(spark, store_path, "image")
store.sign_and_append(images)  # corpus signed ONCE, 8 B/image persisted
gate = store.dedup_batch(batch)  # tonight's scrape vs the table
keepers = batch.join(
    gate.filter(~F.col("is_dup") & F.col("decoded")).select("media_id"), "media_id"
)
appended = store.sign_and_append(keepers)
store.compact()
print("signature store:", store.count(), "signatures after appending",
      appended, "keepers")

# -- 6. cross-modality: which videos contain a known image? ------------------
# frames and images share the dHash space — slideshow scrapes and
# re-encoded stills surface as (video, frame, image) matches against
# the SAME persisted signature table (width from the sidecar).
planted = mm.synthesize_video_with_planted_images(docs, plant_every=5)
matches = mm.video_contains_image_pairs(planted, image_sig=store)
print("videos containing corpus images:",
      matches.select("video_id").distinct().count(),
      "| frame-level matches:", matches.count())

# -- 7. takedowns: remove_media_ids --------------------------------------
# a deleted/DMCA'd media item must stop producing dup verdicts — the
# anti-join + sidecar-staged swap removes its signature rows.  NOTE
# the production subtlety: remove the whole NEAR-DUP CLUSTER, not one
# id — image 0's 1-pixel variant would otherwise still catch the
# re-upload (dedup_exact's keeper rule gives you the member list).
cluster_0 = [0, 0 + mm.VARIANT_ID_OFFSET]
removed = store.remove_media_ids(cluster_0 + [5])
reuploads = images.filter(F.col("media_id").isin(0, 5)).select(
    (F.col("media_id") + 900).alias("media_id"), "media_type", "content"
)
regate = store.dedup_batch(reuploads)
print("takedown removed", removed, "signature rows |",
      "re-uploads of removed items still gating as dup:",
      regate.filter(F.col("is_dup")).count(), "of", regate.count())

# -- 8. clip containment: video-in-video ---------------------------------
# trimmed re-uploads escape near-dup (equal frame counts required
# there); containment groups the frame band join by offset delta and
# verifies the full clip run at each offset.
clips = mm.synthesize_video_clip_corpus(docs, clip_every=5)
pairs = mm.video_contains_clip_pairs(clips, max_hamming=3)
print("clip containments:", pairs.count(),
      "| sample:", pairs.orderBy("a_id").limit(3).collect())

# -- 9. audio containment at arbitrary trim points (hop spans) -----------
# fixed spans detect span-aligned trims only; hop_samples < span signs
# OVERLAPPING spans so any hop-aligned trim surfaces (blocked-content
# filters want hop = span/2 or finer), at span/hop x the signature
# rows — offsets then count in hop units.
aclips = mm.synthesize_audio_clip_corpus_hop(docs, clip_every=5, span_samples=256)
apairs = mm.audio_contains_clip_pairs(
    aclips, span_samples=256, hop_samples=128, max_hamming=3
)
print("audio containments at half-span trims:", apairs.count())

# -- 10. soundtrack containment: audio-track-in-video --------------------
# the containment matrix's fourth cell: an arriving video's AUDIO
# TRACK ('01wb' chunk walk, the WAV signer's exact envelope-span
# hash) checked against the known audio clip corpus — licensed-music
# detection over video uploads.  Both sides sign at the same
# (span_samples, hop, hash_bits).
vmedia = mm.synthesize_video_with_soundtrack(docs, clip_every=5,
                                             span_samples=256)
clip_sig = mm.envelope_hash_audio_spans(vmedia, span_samples=256)
smatches = mm.video_audio_contains_clip_vs_corpus(
    vmedia, clip_sig=clip_sig, span_samples=256, max_hamming=3
)
print("soundtrack containments:", smatches.count(),
      "| sample:", smatches.orderBy("video_id").limit(3).collect())

spark.stop()
print("multimodal dedup pipeline OK")
