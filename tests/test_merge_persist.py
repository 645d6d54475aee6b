"""Mapping persistence + mid-job resume (reference preparation.js:107-132).

The reference's `persist` mode saves each table's id map so a crashed
merge can restart without redoing id assignment.  Here `MergePipeline.
run(map_dir=...)` writes every (src_id, dest_id, is_new) map to
parquet partitioned by source; a re-run with the same map_dir loads
the durable maps instead of recomputing (verified by making both
`assign_ids` and `consolidate` explode) and reproduces the identical
merged output.
"""

import pytest

pytestmark = pytest.mark.slow  # e2e persist/resume twin of the merge pipeline
from pyspark.sql import functions as F

import beehive_spark.pipeline.merge as mergemod
from beehive_spark.pipeline import MergePipeline
from tests.test_merge_pipeline import build_fixture


def _stable(df):
    """Rows of df minus the regenerated-uuid column, order-insensitive."""
    cols = sorted(c for c in df.columns if c != "uuid")
    return sorted(
        (tuple(r[c] for c in cols) for r in df.select(*cols).collect()), key=repr
    )


@pytest.fixture(scope="module")
def persisted(spark, tmp_path_factory):
    src, dst = build_fixture(spark)
    map_dir = str(tmp_path_factory.mktemp("maps"))
    pipe = MergePipeline(spark, source_tag="locP")
    res = pipe.run(src, dst, map_dir=map_dir)
    return src, dst, res, map_dir


def test_maps_written_per_table(spark, persisted):
    _, _, res, map_dir = persisted
    for t in ("person", "users", "location", "visit_type", "program_workflow"):
        back = spark.read.parquet(f"{map_dir}/{t}")
        assert set(back.columns) == {"src_id", "dest_id", "is_new", "source"}
        assert back.filter(F.col("source") == "locP").count() > 0
        # persisted map == in-memory map used by the run
        disk = sorted(
            (r["src_id"], r["dest_id"])
            for r in back.filter("source = 'locP'").collect()
        )
        mem = sorted(
            (r["src_id"], r["dest_id"]) for r in res.mappings[t].collect()
        )
        assert disk == mem, t


def test_resume_skips_id_recompute(spark, persisted, monkeypatch):
    src, dst, res1, map_dir = persisted

    def boom(*a, **k):  # any id re-assignment on resume is a bug
        raise AssertionError("id assignment re-ran during resume")

    monkeypatch.setattr(mergemod, "assign_ids", boom)
    monkeypatch.setattr(mergemod, "consolidate", boom)
    monkeypatch.setattr(mergemod, "next_id_base", boom)

    pipe2 = MergePipeline(spark, source_tag="locP")
    res2 = pipe2.run(src, dst, map_dir=map_dir)

    for t in res1.merged:
        assert _stable(res1.merged[t]) == _stable(res2.merged[t]), t
    for t in res1.mappings:
        assert sorted(map(tuple, res1.mappings[t].collect())) == sorted(
            map(tuple, res2.mappings[t].collect())
        ), t


def test_partial_resume_recomputes_missing_table(spark, persisted):
    """Crash mid-phase-1: some maps persisted, some not — the re-run
    recomputes only the missing ones and lands on the same output."""
    import shutil

    src, dst, res1, map_dir = persisted
    shutil.rmtree(f"{map_dir}/location")
    shutil.rmtree(f"{map_dir}/visit_type")
    pipe2 = MergePipeline(spark, source_tag="locP")
    res2 = pipe2.run(src, dst, map_dir=map_dir)
    for t in res1.merged:
        assert _stable(res1.merged[t]) == _stable(res2.merged[t]), t


def test_multi_source_maps_coexist(spark, tmp_path):
    """Two source instances persist into one map_dir; the hive-style
    source partition keeps them separate and queryable together."""
    src, dst = build_fixture(spark)
    map_dir = str(tmp_path / "maps")
    MergePipeline(spark, source_tag="locX").run(src, dst, map_dir=map_dir)
    MergePipeline(spark, source_tag="locY").run(src, dst, map_dir=map_dir)
    back = spark.read.parquet(f"{map_dir}/person")
    srcs = {r["source"] for r in back.select("source").distinct().collect()}
    assert srcs == {"locX", "locY"}
