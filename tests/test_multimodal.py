import pytest
from pyspark.sql import functions as F

from langchain_memvid_spark.multimodal import binary as mm
from langchain_memvid_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return mm.synthesize_media(docs).cache()


def test_media_schema(media):
    assert media.schema.simpleString() == mm.MEDIA_SCHEMA.simpleString().replace(
        "n_frames:int", "n_frames:int"
    )
    assert media.count() == 500


def test_extract_features_deterministic(media):
    f1 = mm.extract_features(media).orderBy("media_id").limit(3).collect()
    f2 = mm.extract_features(media).orderBy("media_id").limit(3).collect()
    assert [r["features"] for r in f1] == [r["features"] for r in f2]
    assert all(len(r["features"]) == mm.FEATURE_DIM for r in f1)
    assert all(r["content_bytes"] == 32 for r in f1)  # sha256 blob


def test_real_decoder_is_stubbed(media):
    with pytest.raises(Exception) as ei:
        mm.extract_features(media, decoder="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, NotImplementedError)


def test_resize_changes_dims(media):
    out = mm.resize_images(media, 32, 24)
    row = out.limit(1).collect()[0]
    assert row["width"] == 32 and row["height"] == 24


def test_sample_frames(spark, media):
    vids = media.withColumn("media_type", F.lit("video"))
    frames = mm.sample_frames(vids, every_nth=2)
    # n_frames = doc_id % 8 + 1; sampled = ceil(n/2) per media
    got = {r["media_id"]: r["n"] for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    for mid, n in list(got.items())[:20]:
        total = mid % 8 + 1
        assert n == (total + 1) // 2
