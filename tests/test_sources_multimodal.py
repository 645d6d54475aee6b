"""Tests for sources/sinks and multimodal plumbing."""

import hashlib

import pytest
from pyspark.sql import functions as F

from beehive_spark.functions.multimodal import (
    FEATURE_DIM,
    extract_features,
    wrap_as_media,
)
from beehive_spark.sources import (
    build_upsert_sql,
    read_table,
    table_exists,
    upsert_partition,
)


def test_read_table_parquet_with_predicate(spark, sf_dir):
    df = read_table(spark, sf_dir, "nation", predicate="n_regionkey = 2")
    assert df.count() == 5
    assert all(r["n_regionkey"] == 2 for r in df.collect())


def test_table_exists_parquet(spark, sf_dir):
    assert table_exists(spark, sf_dir, "orders")
    assert not table_exists(spark, sf_dir, "gaac")


def test_build_upsert_sql():
    sql = build_upsert_sql("person", ["person_id", "changed_by"], ["changed_by"])
    assert sql == (
        "INSERT INTO person (person_id, changed_by) VALUES (%s, %s) "
        "ON DUPLICATE KEY UPDATE changed_by = VALUES(changed_by)"
    )
    with pytest.raises(ValueError):
        build_upsert_sql("t", ["a"], [])


class FakeCursor:
    def __init__(self, log):
        self.log = log

    def executemany(self, sql, rows):
        self.log.append((sql, list(rows)))


class FakeConn:
    def __init__(self, log):
        self.log = log
        self.committed = False
        self.closed = False

    def cursor(self):
        return FakeCursor(self.log)

    def commit(self):
        self.log.append(("COMMIT", None))

    def close(self):
        self.closed = True


def test_upsert_partition_batches_and_commits():
    log = []
    rows = [{"a": i, "b": i * 10} for i in range(5)]
    n = upsert_partition(
        iter(rows), "SQL", ["a", "b"], lambda: FakeConn(log), batch_size=2
    )
    assert n == 5
    batches = [r for sql, r in log if sql == "SQL"]
    assert [len(b) for b in batches] == [2, 2, 1]
    assert batches[0] == [(0, 0), (1, 10)]
    assert log[-1][0] == "COMMIT"


def test_multimodal_feature_extraction(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    media = wrap_as_media(docs, "doc_id", "text")
    assert [f.name for f in media.schema.fields] == ["media_id", "content", "meta"]
    feats = extract_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 50
    # deterministic digest/feature must equal a local recomputation
    sample = docs.limit(1).collect()[0]
    local = sample["text"].encode()
    r = rows[sample["doc_id"]]
    assert r["digest"] == hashlib.sha256(local).hexdigest()
    assert r["n_bytes"] == len(local)
    assert len(r["feature"]) == FEATURE_DIM
    dg = hashlib.sha256(local).digest()
    assert abs(r["feature"][0] - dg[0] / 255.0) < 1e-6


def test_multimodal_real_decoder_stubbed(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(2)
    media = wrap_as_media(docs, "doc_id", "text")
    with pytest.raises(Exception) as ei:
        extract_features(media, use_real_decoder=True).collect()
    assert "NotImplementedError" in str(ei.value) or "media decoding" in str(ei.value)
