"""End-to-end curation pipeline: stage-count conservation, canonical
survivorship, scrubbing, and bit-for-bit reproducibility."""

import pytest

pytestmark = pytest.mark.slow  # e2e curation write (stage logic covered fast by test_curation)

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


def test_longest_survivorship_keeps_most_complete_copy(spark, sf_dir, tmp_path):
    """With survivorship="longest", near-dup clusters keep their
    longest alive member; stage-count conservation still holds and the
    kept count matches the default policy (same clusters, different
    representatives)."""
    from beehive_spark.pipeline.curate import curate_corpus

    a = curate_corpus(spark, sf_dir, str(tmp_path / "a"))
    b = curate_corpus(
        spark, sf_dir, str(tmp_path / "b"), survivorship="longest"
    )
    for r in (a, b):
        assert (
            r["kept"]
            + r["dropped_quality"]
            + r["dropped_exact_dup"]
            + r["dropped_near_dup"]
            == r["n_input"]
        )
    assert a["kept"] == b["kept"]
    # the longest policy's kept set dominates by length within clusters
    import pyspark.sql.functions as F

    from beehive_spark.queries import load
    from beehive_spark.queries.llm import dedup_clusters

    kept_b = spark.read.parquet(str(tmp_path / "b" / "report")).filter(
        F.col("fate") == "kept"
    ).select("doc_id")
    clusters = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    meta = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    alive = clusters.join(meta, "doc_id")
    keeper_len = (
        alive.join(kept_b, "doc_id")
        .groupBy("cluster_id")
        .agg(F.max("n_chars").alias("keeper_chars"))
    )
    # no alive cluster-mate that was DROPPED as near_dup is longer than
    # its cluster's kept representative
    dropped_b = spark.read.parquet(str(tmp_path / "b" / "report")).filter(
        F.col("fate") == "near_dup"
    ).select("doc_id")
    viol = (
        alive.join(dropped_b, "doc_id")
        .join(keeper_len, "cluster_id")
        .filter(F.col("n_chars") > F.col("keeper_chars"))
        .count()
    )
    assert viol == 0
