"""Semantics tests for operators/profiling.py (profile_table, run_checks).

The oracle parity tests (profile_orders, dq_audit_orders) pin cross-engine
agreement on the fixture; these pin the operator SEMANTICS on adversarial
local data — nulls, duplicates, dangling references, violated predicates —
and the plan shape (one aggregation pass for the profile)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_routing_spark.operators.profiling import Check, profile_table, run_checks


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [
            (1, "ann", 10.0),
            (2, "bob", 20.0),
            (2, None, -5.0),
            (3, "cal", None),
        ],
        "id int, name string, score double",
    )


def test_profile_counts_nulls_distincts_and_bounds(people):
    rows = {r["column_name"]: r for r in profile_table(people).collect()}
    assert set(rows) == {"id", "name", "score"}
    assert all(r["n_rows"] == 4 for r in rows.values())
    assert rows["name"]["n_nulls"] == 1
    assert rows["score"]["n_nulls"] == 1
    assert rows["id"]["n_distinct"] == 3  # 1,2,3 (2 duplicated)
    assert rows["id"]["min_num"] == 1.0 and rows["id"]["max_num"] == 3.0
    assert rows["score"]["min_num"] == -5.0 and rows["score"]["max_num"] == 20.0
    # strings: lexicographic bounds + avg length over NON-NULL values
    assert rows["name"]["min_str"] == "ann" and rows["name"]["max_str"] == "cal"
    assert rows["name"]["avg_len"] == pytest.approx(3.0)
    assert rows["name"]["min_num"] is None  # numeric slots null for strings
    assert rows["id"]["min_str"] is None  # string slots null for numerics


def test_profile_is_one_aggregation_pass(people):
    plan = profile_table(people, exact_distinct=False)._jdf.queryExecution().executedPlan().toString()
    # approx mode: no Expand (the exact-distinct rewrite), one agg pair
    assert "Expand" not in plan
    assert plan.count("Exchange") == 1  # the single one-row shuffle


def test_profile_approx_distinct_close(people):
    rows = {r["column_name"]: r for r in profile_table(people, exact_distinct=False).collect()}
    assert rows["id"]["n_distinct"] in (2, 3, 4)  # HLL estimate of 3


def test_checks_count_violations(spark, people):
    ref = spark.createDataFrame([(1,), (2,)], "k int")
    out = {
        r["check_name"]: r
        for r in run_checks(
            people,
            [
                Check("id_unique", "unique", key_cols=("id",)),
                Check("name_not_null", "not_null", expr="name"),
                Check("score_positive", "predicate", expr="score > 0"),
                Check("id_resolves", "reference", expr="id", ref=ref, ref_col="k"),
            ],
        ).collect()
    }
    # id=2 appears twice -> ONE excess row
    assert out["id_unique"]["n_violations"] == 1 and not out["id_unique"]["passed"]
    assert out["name_not_null"]["n_violations"] == 1
    # score > 0 violated by -5.0 AND by the NULL score (NULL predicate = violation)
    assert out["score_positive"]["n_violations"] == 2
    # id=3 dangles
    assert out["id_resolves"]["n_violations"] == 1
    assert not any(r["passed"] for r in out.values())


def test_checks_all_green(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 6.0)], "id int, v double")
    out = run_checks(
        df,
        [
            Check("id_unique", "unique", key_cols=("id",)),
            Check("v_positive", "predicate", expr="v > 0"),
        ],
    ).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in out)


def test_checks_unknown_kind_raises(people):
    with pytest.raises(ValueError, match="unknown kind"):
        run_checks(people, [Check("x", "nope")]).collect()


def test_reference_check_ignores_null_fks(spark):
    df = spark.createDataFrame([(None,), (7,)], "fk int")
    ref = spark.createDataFrame([(7,)], "k int")
    out = run_checks(df, [Check("fk", "reference", expr="fk", ref=ref, ref_col="k")]).collect()
    assert out[0]["n_violations"] == 0 and out[0]["passed"]


def test_k_anonymity_flags_small_groups_only(spark):
    from duckdb_routing_spark.operators.profiling import k_anonymity_report

    df = spark.createDataFrame(
        [(1, "en", "web"), (2, "en", "web"), (3, "en", "web"), (4, "de", "web"), (5, "de", "books")],
        "id long, lang string, src string",
    )
    out = {(r["lang"], r["src"]): r for r in
           k_anonymity_report(df, ["lang", "src"], k=3, id_col="id").collect()}
    # (en, web) has 3 rows -> k-anonymous at k=3; the two singletons violate
    assert set(out) == {("de", "web"), ("de", "books")}
    assert out[("de", "web")]["group_size"] == 1 and out[("de", "web")]["sample_id"] == 4


def test_k_anonymity_empty_result_certifies(spark):
    from duckdb_routing_spark.operators.profiling import k_anonymity_report

    df = spark.createDataFrame([(1, "en"), (2, "en")], "id long, lang string")
    assert k_anonymity_report(df, ["lang"], k=2).count() == 0
