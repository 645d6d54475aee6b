"""End-to-end curation pipeline: stage-count conservation, canonical
survivorship, scrubbing, and bit-for-bit reproducibility."""

from pyspark.sql import functions as F

from beehive_spark.pipeline.curate import curate_corpus
from beehive_spark.queries import load


def test_curate_counts_partition_input(spark, sf_dir, tmp_path):
    out = str(tmp_path / "curated")
    stats = curate_corpus(spark, sf_dir, out, n_shards=4)
    assert stats["n_input"] == load(spark, sf_dir, "documents").count()
    assert (
        stats["kept"]
        + stats["dropped_quality"]
        + stats["dropped_exact_dup"]
        + stats["dropped_near_dup"]
        == stats["n_input"]
    )
    # the sharded output IS the kept set
    assert stats["shard_rows"] == stats["kept"] > 0
    assert stats["dropped_exact_dup"] + stats["dropped_near_dup"] > 0

    shards = spark.read.parquet(out + "/shards")
    assert shards.count() == stats["kept"]
    assert shards.select("doc_id").distinct().count() == stats["kept"]
    # scrub happened: no 4+ digit runs survive in curated text
    assert shards.filter(F.col("text").rlike(r"\d{4,}")).count() == 0

    # every drop has a reason; every keep is in the output
    report = spark.read.parquet(out + "/report")
    assert report.count() == stats["n_input"]
    kept_ids = {r["doc_id"] for r in report.filter("fate = 'kept'").collect()}
    out_ids = {r["doc_id"] for r in shards.select("doc_id").collect()}
    assert kept_ids == out_ids


def test_curate_deterministic(spark, sf_dir, tmp_path):
    out1, out2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    s1 = curate_corpus(spark, sf_dir, out1, n_shards=4)
    s2 = curate_corpus(spark, sf_dir, out2, n_shards=4)
    assert s1 == s2
    a = sorted(
        tuple(r)
        for r in spark.read.parquet(out1 + "/shards").select(
            "doc_id", "text", "shard"
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in spark.read.parquet(out2 + "/shards").select(
            "doc_id", "text", "shard"
        ).collect()
    )
    assert a == b
