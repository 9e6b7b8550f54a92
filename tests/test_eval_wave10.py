"""Round-10 evaluation/annotation wave: NDCG@k (shared-literal DCG
weights), per-query Average Precision, Matthews correlation, and
Cronbach's alpha (complete-case reliability)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- ndcg_at_k


def test_ndcg_perfect_ranking(spark):
    """Scores already ordered by relevance: DCG = IDCG, ndcg = 1."""
    from revtron_utils_spark.operators.evaluation import ndcg_at_k

    rows = [("q", i, 100 - i, 5 - i) for i in range(5)]
    df = spark.createDataFrame(rows, "q string, id long, s long, rel long")
    r = ndcg_at_k(df, "q", "id", "s", "rel", k=10).collect()[0]
    assert r["ndcg"] == 1.0


def test_ndcg_hand_checked_inversion(spark):
    """Two docs, rel {0, 1}, the relevant one ranked SECOND:
    DCG = 1/log2(3), IDCG = 1/log2(2) = 1 → ndcg = 1/log2(3)."""
    from revtron_utils_spark.operators.evaluation import ndcg_at_k

    rows = [("q", 1, 10, 0), ("q", 2, 5, 1)]
    df = spark.createDataFrame(rows, "q string, id long, s long, rel long")
    r = ndcg_at_k(df, "q", "id", "s", "rel", k=10).collect()[0]
    assert abs(r["ndcg"] - round(1.0 / math.log2(3.0), 6)) < 1e-9


def test_ndcg_no_relevant_null(spark):
    from revtron_utils_spark.operators.evaluation import ndcg_at_k

    rows = [("q", 1, 10, 0), ("q", 2, 5, 0)]
    df = spark.createDataFrame(rows, "q string, id long, s long, rel long")
    r = ndcg_at_k(df, "q", "id", "s", "rel", k=10).collect()[0]
    assert r["ndcg"] is None and r["idcg"] == 0.0


def test_ndcg_matches_oracle(spark):
    from revtron_utils_spark.operators.evaluation import (
        ndcg_at_k,
        ndcg_at_k_oracle_sql,
    )

    rows = [
        ("q" + str(i % 7), i, (i * 13) % 41, (i * i) % 4) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "q string, id long, s long, rel long")
    got = sorted(map(tuple, ndcg_at_k(df, "q", "id", "s", "rel", k=5).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE t (q VARCHAR, id BIGINT, s BIGINT, rel BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    want = sorted(
        map(
            tuple,
            con.execute(
                ndcg_at_k_oracle_sql("SELECT * FROM t", "q", "id", "s", "rel", k=5)
            ).fetchall(),
        )
    )
    assert got == want


# ------------------------------------------------------- mean_avg_precision


def test_ap_hand_checked(spark):
    """Ranking (by score desc): rel pattern [1, 0, 1] → hits at p=1,3;
    AP = (1/1 + 2/3) / 2 = 5/6."""
    from revtron_utils_spark.operators.evaluation import mean_avg_precision

    rows = [("q", 1, 30, 1), ("q", 2, 20, 0), ("q", 3, 10, 1)]
    df = spark.createDataFrame(rows, "q string, id long, s long, rel int")
    r = mean_avg_precision(df, "q", "id", "s", "rel").collect()[0]
    assert r["n_candidates"] == 3 and r["n_relevant"] == 2
    assert abs(r["ap"] - round(5.0 / 6.0, 6)) < 1e-9


def test_ap_no_relevant_null(spark):
    from revtron_utils_spark.operators.evaluation import mean_avg_precision

    rows = [("q", 1, 30, 0), ("q", 2, 20, 0)]
    df = spark.createDataFrame(rows, "q string, id long, s long, rel int")
    r = mean_avg_precision(df, "q", "id", "s", "rel").collect()[0]
    assert r["ap"] is None


def test_ap_matches_oracle(spark):
    from revtron_utils_spark.operators.evaluation import (
        mean_avg_precision,
        mean_avg_precision_oracle_sql,
    )

    rows = [
        ("q" + str(i % 5), i, (i * 17) % 53, 1 if (i * 7) % 3 == 0 else 0)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "q string, id long, s long, rel int")
    got = sorted(
        map(tuple, mean_avg_precision(df, "q", "id", "s", "rel").collect())
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (q VARCHAR, id BIGINT, s BIGINT, rel INTEGER)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    want = sorted(
        map(
            tuple,
            con.execute(
                mean_avg_precision_oracle_sql(
                    "SELECT * FROM t", "q", "id", "s", "rel"
                )
            ).fetchall(),
        )
    )
    assert got == want


# ------------------------------------------------------------ matthews_corr


def test_mcc_perfect_and_inverse(spark):
    from revtron_utils_spark.operators.evaluation import matthews_corr

    rows = [(True, True)] * 3 + [(False, False)] * 5
    df = spark.createDataFrame(rows, "a boolean, p boolean")
    assert matthews_corr(df, "a", "p").collect()[0]["mcc"] == 1.0
    inv = df.select("a", (~F.col("p")).alias("p"))
    assert matthews_corr(inv, "a", "p").collect()[0]["mcc"] == -1.0


def test_mcc_hand_checked(spark):
    """tp=2 fp=1 tn=3 fn=1: MCC = (6-1)/sqrt(3*3*4*4) = 5/12."""
    from revtron_utils_spark.operators.evaluation import matthews_corr

    rows = (
        [(True, True)] * 2 + [(False, True)] + [(False, False)] * 3
        + [(True, False)]
    )
    df = spark.createDataFrame(rows, "a boolean, p boolean")
    r = matthews_corr(df, "a", "p").collect()[0]
    assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (2, 1, 3, 1)
    assert abs(r["mcc"] - round(5.0 / 12.0, 6)) < 1e-9


def test_mcc_zero_marginal_null(spark):
    """All predictions positive: the TN+FN marginal is 0 → NULL."""
    from revtron_utils_spark.operators.evaluation import matthews_corr

    rows = [(True, True), (False, True)]
    df = spark.createDataFrame(rows, "a boolean, p boolean")
    assert matthews_corr(df, "a", "p").collect()[0]["mcc"] is None


def test_mcc_matches_oracle_grouped(spark):
    from revtron_utils_spark.operators.evaluation import (
        matthews_corr,
        matthews_corr_oracle_sql,
    )

    rows = [
        ("g" + str(i % 3), (i * 7) % 5 < 2, (i * 11) % 3 < 1)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, a boolean, p boolean")
    got = [tuple(r) for r in matthews_corr(df, "a", "p", by=["g"]).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, a BOOLEAN, p BOOLEAN)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = con.execute(
        matthews_corr_oracle_sql("SELECT * FROM t", "a", "p", by=["g"])
    ).fetchall()
    assert got == want


# ----------------------------------------------------------- cronbach_alpha


def test_cronbach_hand_checked(spark):
    """2 items, 3 complete subjects: x1={1,2,3}, x2={2,4,6} (T={3,6,9}):
    var1=1, var2=4, varT=9 → α = 2·(1 − 5/9) = 8/9."""
    from revtron_utils_spark.operators.annotation import cronbach_alpha

    rows = [(s, i, v) for s, (a, b) in enumerate([(1, 2), (2, 4), (3, 6)])
            for i, v in (("i1", a), ("i2", b))]
    df = spark.createDataFrame(rows, "subj long, item string, v long")
    r = cronbach_alpha(df, "subj", "item", "v").collect()[0]
    assert r["k_items"] == 2 and r["n_subjects"] == 3 and r["n_dropped"] == 0
    assert abs(r["alpha"] - round(8.0 / 9.0, 6)) < 1e-9


def test_cronbach_drops_incomplete_subjects(spark):
    from revtron_utils_spark.operators.annotation import cronbach_alpha

    rows = [(s, i, v) for s, (a, b) in enumerate([(1, 2), (2, 4), (3, 6)])
            for i, v in (("i1", a), ("i2", b))]
    rows += [(99, "i1", 7)]  # missing i2 -> dropped
    rows += [(98, "i1", 1), (98, "i1", 2), (98, "i2", 3)]  # dup cell -> dropped
    df = spark.createDataFrame(rows, "subj long, item string, v long")
    r = cronbach_alpha(df, "subj", "item", "v").collect()[0]
    assert r["n_subjects"] == 3 and r["n_dropped"] == 2
    assert abs(r["alpha"] - round(8.0 / 9.0, 6)) < 1e-9


def test_cronbach_matches_oracle(spark):
    from revtron_utils_spark.operators.annotation import (
        cronbach_alpha,
        cronbach_alpha_oracle_sql,
    )

    rows = [
        (s, "i" + str(i), ((s * 7 + i * 13) % 10) + (s % 4))
        for s in range(60)
        for i in range(4)
        if not (s % 11 == 0 and i == 2)  # some incomplete subjects
    ]
    df = spark.createDataFrame(rows, "subj long, item string, v long")
    got = tuple(cronbach_alpha(df, "subj", "item", "v").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE t (subj BIGINT, item VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = con.execute(
        cronbach_alpha_oracle_sql("SELECT * FROM t", "subj", "item", "v")
    ).fetchone()
    assert got == want


def test_cronbach_guard_trips(spark):
    from revtron_utils_spark.operators.annotation import cronbach_alpha

    df = spark.range(3000).select(
        F.lit(1).alias("subj"), F.col("id").alias("item"), F.lit(1).alias("v")
    )
    with pytest.raises(Exception, match="cronbach_alpha"):
        cronbach_alpha(df, "subj", "item", "v", max_items=100).collect()
