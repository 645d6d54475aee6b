"""End-to-end merge-pipeline test on synthetic src/dst instances.

Fixture seeds every hard property from FIXTURES.md §'Required fixture
properties': admin/daemon rows on both sides with src admin uid != 1,
overlapping metadata by business key, overlapping users (disjunctive),
uuid collisions, self-FK forward references, a >=3-level creator
hierarchy, and NULL-heavy rows.  Assertions pin the reference's own
runtime invariants (counts, FK closure, uuid uniqueness, idempotency)
plus the corrected behaviors listed in SURVEY.md §7.4.
"""

import pytest

pytestmark = pytest.mark.slow  # e2e merge pipeline (operators covered fast by test_operators)
from pyspark.sql import functions as F

from beehive_spark.operators import orphan_check
from beehive_spark.pipeline import MergePipeline
from beehive_spark.pipeline.merge import AlreadyMergedError, IntegrityError
from beehive_spark.pipeline.specs import SPEC_BY_NAME, fk_pairs


def d(i):
    return f"2020-01-{i:02d} 00:00:00"


def build_fixture(spark):
    def T(schema, rows):
        return spark.createDataFrame(rows, schema)

    dst = {
        "users": T(
            "user_id int, system_id string, username string, person_id int,"
            "creator int, date_created string, changed_by int, retired boolean,"
            "retired_by int, uuid string",
            [
                (1, "admin", "admin", 1, 1, d(1), None, False, None, "uu-u1"),
                (2, "daemon", "daemon", 2, 1, d(1), None, False, None, "uu-u2"),
                (3, "clerk", "clerk3", 3, 1, d(2), None, False, None, "uu-u3"),
                (4, "nurse", "nurse4", 4, 1, d(2), None, False, None, "uu-nurse4"),
            ],
        ),
        "person": T(
            "person_id int, gender string, birthdate string, creator int,"
            "date_created string, changed_by int, voided boolean, voided_by int,"
            "void_reason string, uuid string",
            [
                (1, "M", None, 1, d(1), None, False, None, None, "uu-p1"),
                (2, "F", None, 1, d(1), None, False, None, None, "uu-p2"),
                (3, "M", "1980-01-01", 1, d(2), None, False, None, None, "uu-p3"),
                (4, "F", "1985-05-05", 1, d(2), None, False, None, None, "uu-p4"),
            ],
        ),
        "person_name": T(
            "person_name_id int, person_id int, given_name string, creator int,"
            "date_created string, changed_by int, voided_by int, uuid string",
            [(1, 3, "Cleo", 1, d(2), None, None, "uu-n1")],
        ),
        "person_attribute_type": T(
            "person_attribute_type_id int, name string, creator int,"
            "date_created string, changed_by int, retired_by int, uuid string",
            [(1, "Phone", 1, d(1), None, None, "uu-pat1")],
        ),
        "role": T("role string, description string, uuid string",
                  [("Admin", None, "uu-r1"), ("Clerk", None, "uu-r2")]),
        "privilege": T("privilege string, description string, uuid string",
                       [("read", None, "uu-pr1"), ("write", None, "uu-pr2")]),
        "role_privilege": T("role string, privilege string",
                            [("Admin", "read"), ("Admin", "write"),
                             ("Clerk", "read")]),
        "user_role": T("user_id int, role string", [(1, "Admin"), (3, "Clerk")]),
        "location": T(
            "location_id int, name string, parent_location int, creator int,"
            "date_created string, changed_by int, retired_by int, uuid string",
            [(1, "HQ", None, 1, d(1), None, None, "uu-l1"),
             (2, "Annex", 1, 1, d(1), None, None, "uu-l2")],
        ),
        "patient": T(
            "patient_id int, tribe int, creator int, date_created string,"
            "changed_by int, voided_by int",
            [(4, None, 1, d(2), None, None)],
        ),
        "visit_type": T(
            "visit_type_id int, name string, creator int, date_created string,"
            "changed_by int, retired_by int, uuid string",
            [(1, "Outpatient", 1, d(1), None, None, "uu-vt1"),
             (2, "Emergency", 1, d(1), None, None, "uu-vt2")],
        ),
        "visit": T(
            "visit_id int, patient_id int, visit_type_id int, location_id int,"
            "date_started string, creator int, date_created string,"
            "changed_by int, voided_by int, uuid string",
            [(1, 4, 1, 1, d(3), 1, d(3), None, None, "uu-v1")],
        ),
        "obs": T(
            "obs_id int, person_id int, concept_id int, encounter_id int,"
            "location_id int, obs_group_id int, previous_version int,"
            "value_numeric double, creator int, voided_by int,"
            "date_created string, uuid string",
            [(1, 4, 100, None, 1, None, None, 7.5, 1, None, d(3), "uu-o1")],
        ),
        "program": T(
            "program_id int, concept_id int, name string, retired boolean,"
            "creator int, date_created string, changed_by int, uuid string",
            [(1, 100, "HIV Care", False, 1, d(1), None, "uu-pg1")],
        ),
        "program_workflow": T(
            "program_workflow_id int, program_id int, concept_id int,"
            "retired boolean, creator int, date_created string,"
            "changed_by int, uuid string",
            [(1, 1, 200, False, 1, d(1), None, "uu-pw1")],
        ),
    }

    src = {
        "users": T(
            "user_id int, system_id string, username string, person_id int,"
            "creator int, date_created string, changed_by int, retired boolean,"
            "retired_by int, uuid string",
            [
                (5, "admin", "admin", 5, 5, d(1), None, False, None, "su-u5"),
                (6, "daemon", "daemon", 6, 5, d(1), None, False, None, "su-u6"),
                (7, "clerk", "clerk3", 7, 5, d(2), None, False, None, "su-u7"),
                (8, "lab", "lab8", 8, 5, d(2), None, False, None, "uu-nurse4"),
                (10, "reg", "reg10", 10, 5, d(10), None, False, None, "su-u10"),
                (11, "doc", "doc11", 11, 10, d(11), None, False, None, "su-u11"),
                (12, "tech", "tech12", 12, 11, d(12), None, False, None, "su-u12"),
            ],
        ),
        "person": T(
            "person_id int, gender string, birthdate string, creator int,"
            "date_created string, changed_by int, voided boolean, voided_by int,"
            "void_reason string, uuid string",
            [
                (5, "M", None, 5, d(1), None, False, None, None, "su-p5"),
                (6, "F", None, 5, d(1), None, False, None, None, "su-p6"),
                (7, "M", None, 5, d(2), None, False, None, None, "su-p7"),
                (8, "F", None, 5, d(2), None, False, None, None, "su-p8"),
                (10, "M", None, 5, d(10), None, False, None, None, "su-p10"),
                (11, "F", None, 10, d(11), None, False, None, None, "su-p11"),
                (12, "M", None, 11, d(12), None, False, None, None, "su-p12"),
                (20, "F", "1990-09-09", 11, d(20), 12, False, None, None, "su-p20"),
                (21, "M", "bad-date", 12, d(21), None, True, 12, "dup", "uu-p4"),
            ],
        ),
        "person_name": T(
            "person_name_id int, person_id int, given_name string, creator int,"
            "date_created string, changed_by int, voided_by int, uuid string",
            [
                (1, 20, "Pat", 11, d(20), None, None, "su-n1"),
                (2, 21, "Sam", 12, d(21), None, None, "su-n2"),
            ],
        ),
        "person_attribute_type": T(
            "person_attribute_type_id int, name string, creator int,"
            "date_created string, changed_by int, retired_by int, uuid string",
            [(1, "Phone", 5, d(1), None, None, "su-pat1"),
             (2, "NID", 5, d(2), None, None, "su-pat2")],
        ),
        "role": T("role string, description string, uuid string",
                  [("Admin", "dup", "su-r1"), ("Lab", None, "su-r2")]),
        "privilege": T("privilege string, description string, uuid string",
                       [("read", "dup", "su-pr1"), ("lab:run", None, "su-pr2")]),
        "role_privilege": T("role string, privilege string",
                            [("Admin", "read"), ("Lab", "lab:run")]),
        "user_role": T("user_id int, role string", [(5, "Admin"), (10, "Lab")]),
        "location": T(
            "location_id int, name string, parent_location int, creator int,"
            "date_created string, changed_by int, retired_by int, uuid string",
            [
                (1, "HQ", None, 5, d(1), None, None, "su-l1"),
                (2, "Lab Wing", 1, 5, d(2), None, None, "su-l2"),
                (3, "Depot", 4, 10, d(3), None, None, "su-l3"),  # forward self-FK
                (4, "Warehouse", None, 10, d(4), None, None, "su-l4"),
            ],
        ),
        "patient": T(
            "patient_id int, tribe int, creator int, date_created string,"
            "changed_by int, voided_by int",
            [(20, None, 11, d(20), None, None), (7, 3, 5, d(2), None, None)],
        ),
        "visit_type": T(
            "visit_type_id int, name string, creator int, date_created string,"
            "changed_by int, retired_by int, uuid string",
            [(1, "Outpatient", 5, d(1), None, None, "su-vt1"),
             (2, "Lab Visit", 5, d(2), None, None, "su-vt2")],
        ),
        "visit": T(
            "visit_id int, patient_id int, visit_type_id int, location_id int,"
            "date_started string, creator int, date_created string,"
            "changed_by int, voided_by int, uuid string",
            [(1, 20, 2, 2, d(20), 10, d(20), None, None, "su-v1"),
             (2, 7, 1, 1, d(21), 5, d(21), None, None, "su-v2")],
        ),
        "obs": T(
            "obs_id int, person_id int, concept_id int, encounter_id int,"
            "location_id int, obs_group_id int, previous_version int,"
            "value_numeric double, creator int, voided_by int,"
            "date_created string, uuid string",
            [
                (1, 20, 100, None, 2, None, None, 1.0, 10, None, d(20), "su-o1"),
                (2, 20, 101, None, 2, 1, None, None, 10, None, d(20), "su-o2"),
                (3, 20, 102, None, None, 4, None, 3.0, 11, None, d(21), "su-o3"),
                (4, 20, 103, None, 2, None, None, 4.0, 11, None, d(21), "su-o4"),
            ],
        ),
        "program": T(
            "program_id int, concept_id int, name string, retired boolean,"
            "creator int, date_created string, changed_by int, uuid string",
            [(1, 100, "HIV Care", False, 5, d(1), None, "su-pg1"),
             (2, 300, "TB", False, 5, d(2), None, "su-pg2")],
        ),
        "program_workflow": T(
            "program_workflow_id int, program_id int, concept_id int,"
            "retired boolean, creator int, date_created string,"
            "changed_by int, uuid string",
            [(1, 1, 200, False, 5, d(1), None, "su-pw1"),
             (2, 2, 400, False, 5, d(2), None, "su-pw2")],
        ),
    }
    return src, dst


@pytest.fixture(scope="module")
def merge_result(spark):
    src, dst = build_fixture(spark)
    pipe = MergePipeline(spark, generate_new_uuids=True, source_tag="locA")
    res = pipe.run(src, dst)
    return src, dst, res


def _rows(df, *cols):
    return [tuple(r[c] for c in cols) for r in df.collect()]


def test_reconciliations_all_ok(merge_result):
    _, _, res = merge_result
    assert res.reconciliations and all(r.ok for r in res.reconciliations)


def test_user_mappings(merge_result):
    _, _, res = merge_result
    m = dict(_rows(res.mappings["users"], "src_id", "dest_id"))
    # admin/daemon collapse onto dst admin; disjunctive matches; movers fresh
    assert m[5] == 1 and m[6] == 1          # excluded -> dst admin
    assert m[7] == 3                        # (system_id, username) match
    assert m[8] == 4                        # uuid match
    assert m[10] == 5 and m[11] == 6 and m[12] == 7  # fresh contiguous


def test_person_mappings_and_counts(merge_result):
    _, dst, res = merge_result
    m = dict(_rows(res.mappings["person"], "src_id", "dest_id"))
    assert m[5] == 1 and m[6] == 1 and m[7] == 3 and m[8] == 4
    assert m[10] == 5 and m[11] == 6 and m[12] == 7 and m[20] == 8 and m[21] == 9
    assert res.merged["person"].count() == 4 + 5
    assert res.moved_counts["person"] == 5


def test_creator_chain_without_recursion(merge_result):
    """Three-level creator hierarchy resolves in one pass (no user tree,
    person-users.js:568-601 made obsolete by two-phase mapping)."""
    _, _, res = merge_result
    users = {r["user_id"]: r for r in res.merged["users"].collect()}
    assert users[5]["creator"] == 1   # u10's creator admin(5) -> 1
    assert users[6]["creator"] == 5   # u11's creator u10 -> 5
    assert users[7]["creator"] == 6   # u12's creator u11 -> 6
    assert users[5]["person_id"] == 5 and users[7]["person_id"] == 7


def test_consolidation_dedups_metadata(merge_result):
    _, _, res = merge_result
    vt = res.merged["visit_type"]
    names = [r["name"] for r in vt.collect()]
    assert sorted(names) == ["Emergency", "Lab Visit", "Outpatient"]
    m = dict(_rows(res.mappings["visit_type"], "src_id", "dest_id"))
    assert m[1] == 1 and m[2] == 3
    pat = res.merged["person_attribute_type"]
    assert sorted(r["name"] for r in pat.collect()) == ["NID", "Phone"]


def test_visit_fk_rewrite(merge_result):
    _, _, res = merge_result
    visits = {r["uuid"]: r for r in res.merged["visit"].collect()}
    # uuids regenerated -> find moved visits by pk instead
    byid = {r["visit_id"]: r for r in res.merged["visit"].collect()}
    assert set(byid) == {1, 2, 3}
    v2, v3 = byid[2], byid[3]  # src visits got ids 2,3 (base=2)
    assert {v2["visit_type_id"], v3["visit_type_id"]} == {3, 1}
    lab_visit = v2 if v2["visit_type_id"] == 3 else v3
    hq_visit = v3 if lab_visit is v2 else v2
    assert lab_visit["patient_id"] == 8 and lab_visit["location_id"] == 3
    assert hq_visit["patient_id"] == 3 and hq_visit["location_id"] == 1


def test_location_forward_self_fk(merge_result):
    _, _, res = merge_result
    locs = {r["name"]: r for r in res.merged["location"].collect()}
    m = dict(_rows(res.mappings["location"], "src_id", "dest_id"))
    assert m[1] == 1 and m[2] == 3 and m[3] == 4 and m[4] == 5
    assert locs["Lab Wing"]["parent_location"] == 1
    assert locs["Depot"]["parent_location"] == 5  # forward ref resolved
    assert locs["Warehouse"]["parent_location"] is None


def test_obs_forward_self_fk(merge_result):
    _, _, res = merge_result
    obs = {r["obs_id"]: r for r in res.merged["obs"].collect()}
    assert set(obs) == {1, 2, 3, 4, 5}
    assert obs[3]["obs_group_id"] == 2      # src obs2 -> 3; group 1 -> 2
    assert obs[4]["obs_group_id"] == 5      # src obs3 -> 4; group 4 -> 5 (fwd)
    assert obs[4]["location_id"] is None    # NULL FK stays NULL


def test_patient_pk_mapped(merge_result):
    _, _, res = merge_result
    pks = sorted(r["patient_id"] for r in res.merged["patient"].collect())
    assert pks == [3, 4, 8]  # dst 4; src 7 -> person map 3; src 20 -> 8


def test_roles_privileges_links(merge_result):
    _, _, res = merge_result
    assert sorted(r["role"] for r in res.merged["role"].collect()) == [
        "Admin", "Clerk", "Lab"]
    assert sorted(r["privilege"] for r in res.merged["privilege"].collect()) == [
        "lab:run", "read", "write"]
    rp = _rows(res.merged["role_privilege"], "role", "privilege")
    assert len(rp) == 4 and ("Lab", "lab:run") in rp
    ur = sorted(_rows(res.merged["user_role"], "user_id", "role"))
    assert ur == [(1, "Admin"), (3, "Clerk"), (5, "Lab")]


def test_program_workflow_premapped_consolidation(merge_result):
    _, _, res = merge_result
    m = dict(_rows(res.mappings["program_workflow"], "src_id", "dest_id"))
    assert m[1] == 1    # (mapped program 1, concept 200) matches dst wf 1
    assert m[2] == 2    # fresh
    wf = {r["program_workflow_id"]: r for r in res.merged["program_workflow"].collect()}
    assert wf[2]["program_id"] == 2  # src program 2 ('TB') -> fresh id 2


def test_uuid_uniqueness_and_regeneration(merge_result):
    _, _, res = merge_result
    for t in ("person", "users", "visit", "obs", "location"):
        df = res.merged[t]
        assert df.select("uuid").distinct().count() == df.count(), t


def test_fk_closure_on_merged(merge_result):
    """The merged output must satisfy every spec-declared FK — the
    reference's integrity checker re-used as a post-condition."""
    _, _, res = merge_result
    available = set(res.merged)
    for child, fk, parent, ref in fk_pairs(available):
        bad = orphan_check(res.merged[child], res.merged[parent], fk, ref).count()
        assert bad == 0, f"{child}.{fk} -> {parent}.{ref}: {bad} orphans"


def test_keep_uuids_fixpoint(spark):
    src, dst = build_fixture(spark)
    pipe = MergePipeline(spark, generate_new_uuids=False, source_tag="locB")
    res = pipe.run(src, dst)
    persons = res.merged["person"]
    assert persons.select("uuid").distinct().count() == persons.count()
    # non-colliding uuids survive verbatim
    kept = {r["uuid"] for r in persons.collect()}
    assert "su-p20" in kept and "uu-p4" in kept


def test_idempotency_guard(spark):
    src, dst = build_fixture(spark)
    prov = spark.createDataFrame([("locA",)], "source string")
    pipe = MergePipeline(spark, source_tag="locA")
    with pytest.raises(AlreadyMergedError):
        pipe.run(src, dst, provenance=prov)


def test_integrity_gate_aborts(spark):
    src, dst = build_fixture(spark)
    # dangling obs.person_id (FIXTURES.md property 5)
    bad_obs = src["obs"].unionByName(
        spark.createDataFrame(
            [(99, 999, 100, None, None, None, None, 1.0, 10, None, d(22), "su-o99")],
            src["obs"].schema,
        )
    )
    src = dict(src, obs=bad_obs)
    pipe = MergePipeline(spark, source_tag="locC")
    with pytest.raises(IntegrityError) as ei:
        pipe.run(src, dst)
    assert "obs.person_id->person.person_id" in str(ei.value)


def test_publish_staged(spark, tmp_path):
    src, dst = build_fixture(spark)
    pipe = MergePipeline(spark, source_tag="locD")
    res = pipe.run(src, dst, out_dir=str(tmp_path))
    assert res.published_to == str(tmp_path / "merged")
    back = spark.read.parquet(str(tmp_path / "merged" / "users"))
    assert back.count() == 7


def test_dry_run_no_publish(spark, tmp_path):
    src, dst = build_fixture(spark)
    pipe = MergePipeline(spark, source_tag="locE")
    res = pipe.run(src, dst, dry_run=True, out_dir=str(tmp_path))
    assert res.published_to is None
    assert not (tmp_path / "merged").exists()
