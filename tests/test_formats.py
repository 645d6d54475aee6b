"""Multi-format source/sink round-trips preserve rows and types."""

from pyspark.sql import functions as F

from beehive_spark.queries import load
from beehive_spark.sources.formats import (
    convert_to_parquet,
    read_csv,
    read_csv_strict,
    read_jsonl,
    read_orc,
    write_csv,
    write_jsonl,
    write_orc,
)

DDL = (
    "c_custkey BIGINT, c_name STRING, c_nationkey BIGINT, "
    "c_acctbal DOUBLE, c_mktsegment STRING"
)


def _cust(spark, sf_dir):
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
        "c_acctbal",
        "c_mktsegment",
    )


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_roundtrip_with_schema(spark, sf_dir, tmp_path):
    src = _cust(spark, sf_dir)
    p = str(tmp_path / "cust_csv")
    write_csv(src, p)
    back = read_csv(spark, p, schema=DDL)
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)


def test_csv_strict_failfast_on_bad_schema(spark, sf_dir, tmp_path):
    src = _cust(spark, sf_dir)
    p = str(tmp_path / "cust_csv2")
    write_csv(src, p)
    bad = "c_custkey BIGINT, c_name BIGINT, c_nationkey BIGINT, c_acctbal DOUBLE, c_mktsegment STRING"
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import CapturedException

    with pytest.raises((Py4JJavaError, CapturedException, Exception)):
        read_csv_strict(spark, p, bad).collect()


def test_jsonl_roundtrip_with_schema(spark, sf_dir, tmp_path):
    src = _cust(spark, sf_dir)
    p = str(tmp_path / "cust_jsonl")
    write_jsonl(src, p)
    back = read_jsonl(spark, p, schema=DDL).select(*src.columns)
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    src = _cust(spark, sf_dir)
    p = str(tmp_path / "cust_orc")
    write_orc(src, p)
    back = read_orc(spark, p).select(*src.columns)
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)


def test_convert_to_parquet_normalizes_csv(spark, sf_dir, tmp_path):
    src = _cust(spark, sf_dir)
    csv_p = str(tmp_path / "ingest_csv")
    pq_p = str(tmp_path / "ingest_parquet")
    write_csv(src, csv_p)
    back = convert_to_parquet(spark, csv_p, pq_p, "csv", schema=DDL, header="true")
    assert _sorted_rows(back.select(*src.columns)) == _sorted_rows(src)
    # the parquet copy prunes + pushes down: filter must reach the scan
    plan = (
        back.filter(F.col("c_custkey") == 1)
        .select("c_name")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "IsNotNull(c_custkey)" in plan
