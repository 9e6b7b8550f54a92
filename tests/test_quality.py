"""Unit tests for the data-quality rule suite and FK audits."""

from __future__ import annotations

from revtron_utils_spark.operators import quality as Q


def _report(df, rules):
    return {
        (r["rule"], r["column"]): (r["violations"], r["n_rows"])
        for r in Q.check(df, rules).collect()
    }


def test_rules_single_pass_counts(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "A", "a@x.io"),
            (2, -5.0, "A", "bad"),
            (3, None, "Z", None),
            (None, 200.0, "B", "c@y.io"),
        ],
        "id bigint, amount double, code string, email string",
    )
    rep = _report(
        df,
        [
            Q.not_null("id"),
            Q.in_range("amount", 0.0, 100.0),
            Q.accepted_values("code", ["A", "B"]),
            Q.matches("email", r"^[^@]+@[^@]+$"),
            Q.non_negative("amount"),
        ],
    )
    assert rep[("not_null", "id")] == (1, 4)
    # -5 out of range, 200 out of range, NULL counts as violation
    assert rep[("in_range", "amount")] == (3, 4)
    assert rep[("accepted_values", "code")] == (1, 4)
    # "bad" fails the regex; NULL email is a violation too
    assert rep[("matches", "email")] == (2, 4)
    assert rep[("non_negative", "amount")] == (2, 4)


def test_fk_violations(spark):
    parent = spark.createDataFrame([(1,), (2,), (3,)], "k bigint")
    child = spark.createDataFrame(
        [(1,), (3,), (99,), (None,), (99,)], "fk bigint"
    )
    assert Q.fk_violations(child, "fk", parent, "k") == 2  # the two 99s; NULL exempt


def test_engine_fk_registry_and_audit(engine):
    from revtron_utils_spark import ColumnModel

    engine.create_table(
        "cities",
        [
            ColumnModel("city_id", "bigint", primary_key=True),
            ColumnModel(
                "region_key", "bigint", foreign_key="region.r_regionkey"
            ),
        ],
    )
    engine.upsert(
        "cities",
        [
            {"city_id": 1, "region_key": 0},
            {"city_id": 2, "region_key": 4},
            {"city_id": 3, "region_key": 777},
            {"city_id": 4, "region_key": None},
        ],
    )
    assert engine.validate_foreign_keys("cities") == {"region_key": 1}


def test_compression_ratio_matches_direct_zlib(spark, sf_dir):
    """Differential vs direct python zlib over the real corpus slice —
    the value contract for the rows-only `compression_ratio` gate."""
    import zlib

    from revtron_utils_spark.io import read_parquet
    from revtron_utils_spark.operators.curation import compression_filter

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet").select("doc_id", "text")
    got = {r["doc_id"]: r["ratio"] for r in compression_filter(docs).collect()}
    for row in docs.limit(50).collect():
        b = row["text"].encode("utf-8")
        assert got[row["doc_id"]] == round(len(zlib.compress(b, 6)) / len(b), 6)


def test_compression_filter_flags_repetitive_and_handles_nulls(spark):
    from revtron_utils_spark.operators.curation import compression_filter

    df = spark.createDataFrame(
        [
            (1, "spam " * 200),          # template/repeat -> ratio << 0.3
            (2, "The quick brown fox jumps over the lazy dog near the bank."),
            (3, None),
            (4, ""),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: (r["ratio"], r["kept"]) for r in compression_filter(df).collect()}
    assert out[1][1] is False and out[1][0] < 0.1
    assert out[2][1] is True
    assert out[3] == (None, None) and out[4] == (None, None)


def test_fk_audit_counts_orphans_per_edge(spark):
    from revtron_utils_spark.operators.quality import fk_audit

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], ["id", "fk"]
    )
    parent = spark.createDataFrame([(10,), (20,)], ["pk"])
    got = fk_audit([("child.fk->parent", child, "fk", parent, "pk")]).collect()
    r = got[0]
    # NULL keys are excluded from the denominator; 99 is the one orphan
    assert (r["fk"], r["n_child"], r["orphans"]) == ("child.fk->parent", 3, 1)
    assert abs(r["orphan_rate"] - 1 / 3) < 1e-6


def test_fk_audit_multiple_edges_and_clean_edge(spark):
    from revtron_utils_spark.operators.quality import fk_audit

    c1 = spark.createDataFrame([(1, 5), (2, 5)], ["id", "fk"])
    p1 = spark.createDataFrame([(5,)], ["pk"])
    c2 = spark.createDataFrame([(1, 7)], ["id", "fk"])
    p2 = spark.createDataFrame([(8,)], ["pk"])
    got = {
        r["fk"]: r
        for r in fk_audit(
            [
                ("clean", c1, "fk", p1, "pk"),
                ("broken", c2, "fk", p2, "pk"),
            ]
        ).collect()
    }
    assert got["clean"]["orphans"] == 0 and got["clean"]["orphan_rate"] == 0.0
    assert got["broken"]["orphans"] == 1 and got["broken"]["orphan_rate"] == 1.0
