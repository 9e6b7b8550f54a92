"""Tests for operators/graph.py (connected components) and
operators/curation.py (split/sample/chunk/pack/PII/decontaminate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from revtron_utils_spark.operators import curation as C
from revtron_utils_spark.operators.graph import cluster_dedup, connected_components


# ---------------------------------------------------------------- graph


def _cc_dict(spark, edges, **kw):
    """Run BOTH implementations — driver union-find fast path (default
    for small edge lists) and the distributed star-contraction loop
    (driver_threshold=0) — and assert they agree before returning."""
    df = spark.createDataFrame(edges, ["src", "dst"])
    fast = {
        r.node: r.component for r in connected_components(df, **kw).collect()
    }
    loop = {
        r.node: r.component
        for r in connected_components(df, driver_threshold=0, **kw).collect()
    }
    assert fast == loop, "fast-path vs distributed-loop label mismatch"
    return fast


def test_cc_chain_merges_transitively(spark):
    # a-b, b-c, c-d is the case one-round "keep smaller of each pair"
    # under-merges: the chain must collapse to a single component.
    got = _cc_dict(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_cc_multiple_components_and_selfloops(spark):
    got = _cc_dict(spark, [(5, 6), (6, 5), (7, 7), (10, 9), (20, 21)])
    assert got[5] == 5 and got[6] == 5
    assert got[9] == 9 and got[10] == 9
    assert got[20] == 20 and got[21] == 20
    # pure self-loop node still appears, as its own root
    assert got[7] == 7


def test_cc_long_path_converges(spark):
    # path graph of 40 nodes: worst case for label propagation; the
    # star-contraction rounds must still converge well under max_iter.
    got = _cc_dict(spark, [(i, i + 1) for i in range(40)])
    assert set(got.values()) == {0}
    assert len(got) == 41


def test_cc_isolated_nodes_via_node_set(spark):
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    nodes = spark.createDataFrame([(n,) for n in (1, 2, 3, 4)], ["id"])
    got = {
        r.node: r.component
        for r in connected_components(edges, nodes=nodes, node_col="id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 3, 4: 4}


def test_cc_against_networkx_style_union_find(spark):
    # random-ish deterministic graph, checked against a python union-find
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    parent = list(range(60))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    want = {}
    touched = {n for e in edges for n in e if e[0] != e[1]}
    # min-id per component, only over nodes that have a real edge
    comp_min: dict[int, int] = {}
    for n in touched:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    for n in touched:
        want[n] = comp_min[find(n)]
    got = _cc_dict(spark, edges)
    assert got == want


def test_cluster_dedup_keeps_one_per_cluster(spark):
    docs = spark.createDataFrame([(i, f"d{i}") for i in range(6)], ["doc_id", "text"])
    pairs = spark.createDataFrame([(0, 3), (3, 5), (1, 2)], ["id_a", "id_b"])
    kept = sorted(r.doc_id for r in cluster_dedup(docs, pairs).collect())
    assert kept == [0, 1, 4]


# ------------------------------------------------------------- curation


def test_hash_split_deterministic_and_partitions(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    out = C.hash_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 5000
    assert 0.75 < counts["train"] / 5000 < 0.85
    # stable across invocations
    again = C.hash_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.exceptAll(again).count() == 0


def test_hash_split_stable_under_corpus_growth(spark):
    small = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    w = {"train": 0.9, "test": 0.1}
    s = {r.doc_id: r.split for r in C.hash_split(small, "doc_id", w).collect()}
    b = {r.doc_id: r.split for r in C.hash_split(big, "doc_id", w).collect()}
    assert all(b[k] == v for k, v in s.items())


def test_hash_sample_fraction_and_join_stability(spark):
    df = spark.range(0, 10000).withColumnRenamed("id", "k")
    kept = C.hash_sample(df, "k", 0.25, seed=3)
    n = kept.count()
    assert 0.2 * 10000 < n < 0.3 * 10000
    # same ids survive when sampling a second table with the same seed
    other = df.withColumn("payload", F.col("k") * 2)
    kept2 = C.hash_sample(other, "k", 0.25, seed=3)
    assert kept.join(kept2, "k").count() == n


def test_stratified_hash_sample(spark):
    df = spark.range(0, 8000).select(
        F.col("id").alias("k"), (F.col("id") % 2 == 0).cast("string").alias("s")
    )
    out = C.stratified_hash_sample(df, "k", "s", {"true": 0.5, "false": 0.1})
    counts = {r["s"]: r["n"] for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert 0.4 < counts["true"] / 4000 < 0.6
    assert 0.05 < counts["false"] / 4000 < 0.15


def test_chunk_documents_windows_and_coverage(spark):
    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame(
        [(1, text), (2, "a b c"), (3, None)], "doc_id long, text string"
    )
    out = C.chunk_documents(df, chunk_tokens=64, stride=48).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc1: chunks start at 1 and 49; chunk 2 (tokens 49-100) already
    # reaches the end, so NO redundant third chunk is emitted
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.n_tokens for r in c1] == [64, 52]
    assert c1[0].chunk_text.split()[0] == "t0"
    assert c1[1].chunk_text.split()[0] == "t48"
    assert c1[1].chunk_text.split()[-1] == "t99"  # full coverage
    # short doc → exactly one chunk with all tokens
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_tokens == 3
    # NULL text → one empty chunk, zero tokens (not chunk_tokens!)
    assert len(by_doc[3]) == 1
    assert by_doc[3][0].n_tokens == 0 and by_doc[3][0].chunk_text == ""


def test_pack_sequences_budget_boundaries(spark):
    rows = [(i, 30) for i in range(10)]  # 300 tokens, budget 100
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = {r.doc_id: r.pack_id for r in C.pack_sequences(df, "doc_id", "n_tokens", 100).collect()}
    # cum_before: 0,30,60,90,120,... → packs 0,0,0,0,1,1,1,2,2,2
    assert [out[i] for i in range(10)] == [0, 0, 0, 0, 1, 1, 1, 2, 2, 2]


def test_pack_sequences_partitioned(spark):
    rows = [(s, i, 60) for s in ("a", "b") for i in range(4)]
    df = spark.createDataFrame(rows, ["shard", "doc_id", "n_tokens"])
    out = C.pack_sequences(df, "doc_id", "n_tokens", 100, partition_cols=["shard"])
    packs = {(r.shard, r.doc_id): r.pack_id for r in out.collect()}
    for s in ("a", "b"):
        assert [packs[(s, i)] for i in range(4)] == [0, 0, 1, 1]


def test_pii_stats_and_redact(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@corp.example.com or call 555-123-4567"),
            (2, "ssn 123-45-6789 twice 123-45-6789"),
            (3, "clean text"),
        ],
        ["doc_id", "text"],
    )
    stats = {r.doc_id: (r.n_email, r.n_phone, r.n_ssn) for r in C.pii_stats(df).collect()}
    assert stats[1] == (1, 1, 0)
    assert stats[2] == (0, 0, 2)
    assert stats[3] == (0, 0, 0)
    red = {r.doc_id: r.text for r in C.pii_redact(df).collect()}
    assert "[EMAIL]" in red[1] and "[PHONE]" in red[1]
    assert red[2].count("[SSN]") == 2
    assert red[3] == "clean text"


def test_decontaminate_removes_overlap(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    train = spark.createDataFrame(
        [(1, base + " extra tail tokens here"), (2, "totally unrelated words " * 3)],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame([(100, base)], ["doc_id", "text"])
    kept = sorted(r.doc_id for r in C.decontaminate(train, eval_df, ngram_n=8).collect())
    assert kept == [2]


def test_decontaminate_short_docs_survive(spark):
    train = spark.createDataFrame([(1, "too short to have an 8gram")], ["doc_id", "text"])
    eval_df = spark.createDataFrame([(2, "also short")], ["doc_id", "text"])
    assert C.decontaminate(train, eval_df, ngram_n=8).count() == 1


def test_embedding_decontaminate(spark):
    # near-copy of an eval vector is dropped; the orthogonal-ish
    # survivor and the anti-correlated one stay; eval side never leaks
    # into the output
    train = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),        # exact copy of eval -> dropped
            (2, [0.99, 0.1, 0.0]),       # near copy -> dropped
            (3, [0.0, 1.0, 0.0]),        # orthogonal -> kept
            (4, [-1.0, 0.0, 0.0]),       # anti-correlated -> kept
        ],
        "vec_id long, embedding array<double>",
    )
    eval_df = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = C.embedding_decontaminate(train, eval_df, threshold=0.95)
    assert sorted(r.vec_id for r in out.collect()) == [3, 4]
    # helper columns are dropped; original schema survives
    assert out.columns == ["vec_id", "embedding"]
    # empty eval set removes nothing
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert C.embedding_decontaminate(train, empty, threshold=0.5).count() == 4
    # zero-norm embeddings (all elements quantize to 0) have undefined
    # cosine: they must neither crash (ANSI DIVIDE_BY_ZERO) nor be
    # dropped, on either side of the join
    zn = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [1e-9, -1e-9])],
        "vec_id long, embedding array<double>",
    )
    ev = spark.createDataFrame(
        [(9, [1.0, 0.0]), (10, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    kept = sorted(r.vec_id for r in C.embedding_decontaminate(zn, ev, threshold=0.9).collect())
    assert kept == [2, 3]


def test_top_ngram_stats_and_dup_ratio(spark):
    from revtron_utils_spark.functions.text import dup_token_ratio, top_ngram_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b a b c"),       # "a b" x3 is the top 2-gram
            (2, "x y z"),               # all 2-grams unique -> count 1, smallest first
            (3, "solo"),                # fewer than 2 tokens -> null/0
        ],
        ["doc_id", "text"],
    )
    top = top_ngram_stats("text", 2)
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            top["top_gram"].alias("g"),
            top["top_count"].alias("n"),
            dup_token_ratio("text").alias("dr"),
        ).collect()
    }
    assert (rows[1].g, rows[1].n) == ("a b", 3)
    assert rows[2].n == 1 and rows[2].g == "x y"  # lexicographic tiebreak
    assert rows[3].g is None and rows[3].n == 0
    # doc 1: 7 tokens, 3 distinct -> dup ratio 4/7
    assert abs(rows[1].dr - 4 / 7) < 1e-9
    assert rows[2].dr == 0.0


def test_weighted_hash_sample_extremes(spark):
    from pyspark.sql import functions as F
    from revtron_utils_spark.operators.curation import weighted_hash_sample

    df = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 1000, 1.0).otherwise(0.0).alias("w"),
    )
    kept = weighted_hash_sample(df, "k", "w")
    ks = {r.k for r in kept.collect()}
    # weight 1.0 rows always kept, weight 0.0 rows never
    assert ks == set(range(1000))


def test_cc_empty_edges_with_node_set(spark):
    """Zero edges: every supplied node is its own component; no crash in
    the star-contraction loop."""
    edges = spark.createDataFrame([], "src long, dst long")
    nodes = spark.createDataFrame([(1,), (2,)], ["id"])
    got = {
        r.node: r.component
        for r in connected_components(edges, nodes=nodes, node_col="id").collect()
    }
    assert got == {1: 1, 2: 2}


def test_hash_sample_seeds_decorrelated(spark):
    """Different seeds must give (near-)independent samples: overlap of
    two 20% samples should be ~4%, nowhere near 20%."""
    df = spark.range(0, 20000).withColumnRenamed("id", "k")
    a = {r.k for r in C.hash_sample(df, "k", 0.2, seed=1).collect()}
    b = {r.k for r in C.hash_sample(df, "k", 0.2, seed=99999).collect()}
    overlap = len(a & b) / 20000
    assert 0.01 < overlap < 0.1  # ≈ 0.2*0.2 = 0.04 if independent


def test_hash_ops_reject_string_ids(spark):
    df = spark.createDataFrame([("a",), ("b",)], ["k"])
    with pytest.raises(TypeError, match="integral"):
        C.hash_sample(df, "k", 0.5)
    with pytest.raises(TypeError, match="integral"):
        C.hash_split(df, "k", {"x": 1.0})


def test_cc_reliable_checkpoint_identical_labels(spark, tmp_path):
    # checkpoint_dir switches per-round lineage cuts to reliable
    # checkpoint() storage (the real-cluster path, where an executor
    # loss must not kill the loop); labels must be identical to the
    # localCheckpoint default, and checkpoint files must actually land
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    base = {r.node: r.component for r in connected_components(df).collect()}
    ckdir = str(tmp_path / "cc_ck")
    # driver_threshold=0 forces the iterative loop — otherwise this
    # small graph would take the union-find fast path and never write
    # a checkpoint at all
    reliable = {
        r.node: r.component
        for r in connected_components(
            df, checkpoint_dir=ckdir, driver_threshold=0
        ).collect()
    }
    assert reliable == base
    import os

    assert any(files for _, _, files in os.walk(ckdir)), "no checkpoint written"


def test_mixture_sample_binding_domain_fully_kept(spark):
    from revtron_utils_spark.operators.curation import mixture_sample

    # A: 400 rows at p=0.1, B: 100 rows at p=0.9 -> B binds (T=100/0.9),
    # B keeps everything, A keeps ~11 rows (p_A*T ≈ 11.1)
    rows = [(i, "A") for i in range(400)] + [(1000 + i, "B") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, dom string")
    out = mixture_sample(df, "id", "dom", {"A": 0.1, "B": 0.9}).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["dom"], 0)
        by_dom[r["dom"]] += 1
    assert by_dom["B"] == 100
    assert 5 <= by_dom["A"] <= 20  # ~11 expected, hash-sample variance


def test_mixture_sample_drops_unlisted_domains(spark):
    from revtron_utils_spark.operators.curation import mixture_sample

    rows = [(i, "A") for i in range(50)] + [(100 + i, "C") for i in range(50)]
    df = spark.createDataFrame(rows, "id long, dom string")
    out = mixture_sample(df, "id", "dom", {"A": 1.0}).collect()
    assert {r["dom"] for r in out} == {"A"}
    assert len(out) == 50  # single listed domain binds itself -> rate 1


def test_mixture_sample_missing_domain_raises(spark):
    from revtron_utils_spark.operators.curation import mixture_sample

    df = spark.createDataFrame([(1, "A")], "id long, dom string")
    import pytest as _pytest

    with _pytest.raises(Exception, match="no rows available"):
        mixture_sample(df, "id", "dom", {"A": 0.5, "ZZZ": 0.5}).collect()


def test_mixture_sample_deterministic(spark):
    from revtron_utils_spark.operators.curation import mixture_sample

    rows = [(i, "A" if i % 3 else "B") for i in range(300)]
    df = spark.createDataFrame(rows, "id long, dom string")
    a = sorted(r["id"] for r in mixture_sample(df, "id", "dom", {"A": 0.4, "B": 0.6}).collect())
    b = sorted(r["id"] for r in mixture_sample(df, "id", "dom", {"A": 0.4, "B": 0.6}).collect())
    assert a == b


def test_mixture_proportion_rates_math():
    from revtron_utils_spark.operators.curation import (
        HASH_MOD,
        mixture_proportion_rates,
    )

    thr = mixture_proportion_rates({"A": 400, "B": 100}, {"A": 0.1, "B": 0.9})
    # T = min(400/0.1, 100/0.9) = 111.11; rate_B ~= 1.0 (binding domain,
    # up to one ulp of double round-trip), rate_A = 0.02777...
    assert HASH_MOD - 2 <= thr["B"] <= HASH_MOD
    t = min(400 / 0.1, 100 / 0.9)
    assert thr["A"] == int(((0.1 * t) / 400) * HASH_MOD)


def test_cap_per_domain_exact_and_margin_independent(spark):
    from pyspark.sql import Window as W
    from revtron_utils_spark.operators.curation import cap_per_domain, id_hash

    rows = [(i, "big") for i in range(500)] + [(1000 + i, "small") for i in range(4)]
    df = spark.createDataFrame(rows, "id long, dom string")
    # plain-window reference (what the oracle computes)
    w = W.partitionBy("dom").orderBy(id_hash("id").asc(), F.col("id").asc())
    ref = sorted(
        (r["id"], r["dom"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .collect()
    )
    for margin in (1.05, 2.0, 50.0):
        got = sorted(
            (r["id"], r["dom"])
            for r in cap_per_domain(df, "id", "dom", n=10, margin=margin).collect()
        )
        assert got == ref, f"margin={margin}"
    by_dom = {}
    for _, d in ref:
        by_dom[d] = by_dom.get(d, 0) + 1
    assert by_dom == {"big": 10, "small": 4}  # min(n, domain size)


def test_take_token_budget_inclusive_running_sum(spark):
    from revtron_utils_spark.operators.curation import id_hash, take_token_budget

    rows = [(i, "A", "one two three") for i in range(20)]  # 3 tokens each
    df = spark.createDataFrame(rows, "id long, dom string, text string")
    out = take_token_budget(df, "id", "dom", budget=10)
    # 3 docs fit (9 tokens); the 4th would reach 12 > 10
    assert out.count() == 3
    # kept rows are exactly the 3 smallest by hash order
    order = sorted(
        (r["b"], r["id"])
        for r in df.select("id", id_hash("id").alias("b")).collect()
    )
    expect = {i for _, i in order[:3]}
    assert {r["id"] for r in out.collect()} == expect


def test_take_token_budget_precomputed_token_col(spark):
    from revtron_utils_spark.operators.curation import take_token_budget

    rows = [(1, "A", 600), (2, "A", 300), (3, "A", 300), (4, "B", 1000)]
    df = spark.createDataFrame(rows, "id long, dom string, ntok int")
    out = take_token_budget(df, "id", "dom", budget=900, token_col="ntok")
    got = {r["id"] for r in out.collect()}
    # per-domain: A keeps rows until 900 inclusive in hash order; B's
    # single 1000-token row exceeds the budget outright
    assert 4 not in got and got  # B dropped, some of A kept


def test_take_token_budget_margin_independent(spark):
    from revtron_utils_spark.operators.curation import take_token_budget

    # hot domain with far more tokens than the budget; small domain under it
    rows = [(i, "hot", 40) for i in range(400)] + [(1000 + i, "small", 40) for i in range(3)]
    df = spark.createDataFrame(rows, "id long, dom string, ntok int")
    ref = None
    for margin in (1.05, 2.0, 100.0):
        got = sorted(
            (r["id"], r["dom"])
            for r in take_token_budget(
                df, "id", "dom", budget=400, token_col="ntok", margin=margin
            ).collect()
        )
        if ref is None:
            ref = got
        assert got == ref, f"margin={margin}"
    by_dom = {}
    for _, d in ref:
        by_dom[d] = by_dom.get(d, 0) + 1
    assert by_dom["hot"] == 10   # 10 x 40 = 400 tokens, exactly the budget
    assert by_dom["small"] == 3  # whole small domain fits


def test_importance_weights_favor_target_distribution(spark, sf_dir):
    import pyspark.sql.functions as F
    from revtron_utils_spark.operators.curation import importance_weights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = importance_weights(docs, target=F.col("lang") == "en")
    joined = w.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r.lang: r.mw
        for r in joined.groupBy("lang").agg(F.avg("weight").alias("mw")).collect()
    }
    # English docs must look more target-like than any other language
    assert all(means["en"] > v for k, v in means.items() if k != "en"), means
    # weights are importance ratios around 1: sane range, no blowups
    mn, mx = w.agg(F.min("weight"), F.max("weight")).first()
    assert 0.0 < mn and mx < 100.0
    # deterministic
    a = sorted(map(tuple, w.collect()))
    b = sorted(map(tuple, importance_weights(docs, target=F.col("lang") == "en").collect()))
    assert a == b


def test_deterministic_shuffle_is_permutation_and_stable(spark, sf_dir):
    import pyspark.sql.functions as F
    from revtron_utils_spark.operators.curation import deterministic_shuffle
    from revtron_utils_spark.operators.dedup import release_caches

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    out = deterministic_shuffle(docs, "doc_id", seed=3, partitions=7)
    rows = {r.doc_id: r.shuffle_rank for r in out.select("doc_id", "shuffle_rank").collect()}
    release_caches()
    assert sorted(rows.values()) == list(range(n))  # exact permutation
    # independent of partition count, stable across runs
    out2 = deterministic_shuffle(docs, "doc_id", seed=3, partitions=13)
    rows2 = {r.doc_id: r.shuffle_rank for r in out2.select("doc_id", "shuffle_rank").collect()}
    release_caches()
    assert rows == rows2
    # a different seed is a different permutation
    out3 = deterministic_shuffle(docs, "doc_id", seed=4, partitions=7)
    rows3 = {r.doc_id: r.shuffle_rank for r in out3.select("doc_id", "shuffle_rank").collect()}
    release_caches()
    assert rows != rows3


def test_leakage_safe_split_keeps_clusters_together(spark, sf_dir):
    import pyspark.sql.functions as F
    from revtron_utils_spark.operators.curation import leakage_safe_split
    from revtron_utils_spark.operators.dedup import ngram_jaccard_pairs
    from revtron_utils_spark.operators.dedup import release_caches

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text", "lang", "source")
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", block_cols=("lang", "source"), shingle_n=3, threshold=0.2
    )
    out = leakage_safe_split(docs, pairs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    # every component maps to exactly one split; no doc lost
    agg = out.groupBy("component").agg(F.count_distinct("split").alias("k")).collect()
    release_caches()
    assert all(r.k == 1 for r in agg)
    assert out.count() == docs.count()
    # paired docs share a split
    viol = (
        pairs.alias("p")
        .join(out.alias("x"), F.col("p.id_a") == F.col("x.doc_id"))
        .join(out.alias("y"), F.col("p.id_b") == F.col("y.doc_id"))
        .where(F.col("x.split") != F.col("y.split"))
        .count()
    )
    release_caches()
    assert viol == 0


# ------------------------------------------------------- pagerank


def _py_pagerank(edges, iterations=5, num=85, den=100, scale=10**9):
    """Pure-Python twin of operators.graph.pagerank's integer recurrence."""
    e = sorted(set(edges))
    nodes = sorted({x for p in e for x in p})
    n = len(nodes)
    outdeg = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = ((den - num) * scale) // den
    r = {x: scale for x in nodes}
    for _ in range(iterations):
        contrib = {x: 0 for x in nodes}
        for s, d in e:
            contrib[d] += r[s] // outdeg[s]
        dang = sum(r[x] for x in nodes if x not in outdeg) // n
        r = {x: base + (num * (contrib[x] + dang)) // den for x in nodes}
    return r


def test_pagerank_matches_python_reference_with_dangling(spark):
    from revtron_utils_spark.operators.graph import pagerank

    # 1->2, 1->3, 2->3, 3 dangling, 4<->5 separate cycle
    edges = [(1, 2), (1, 3), (2, 3), (4, 5), (5, 4)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.rank_int for r in pagerank(df).collect()}
    assert got == _py_pagerank(edges)
    # within its component the dangling sink accumulated the most mass
    assert got[3] > got[2] > got[1]


def test_pagerank_random_graph_and_duplicate_edges(spark):
    import random

    from revtron_utils_spark.operators.graph import pagerank

    rng = random.Random(11)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(120)]
    edges = [(s, d) for s, d in edges if s != d]
    # feed duplicates on the Spark side; the operator dedups internally
    df = spark.createDataFrame(edges + edges[:10], ["src", "dst"])
    got = {r.node: r.rank_int for r in pagerank(df, iterations=4).collect()}
    assert got == _py_pagerank(edges, iterations=4)


def test_pagerank_oracle_sql_matches_spark(spark, tmp_path):
    import duckdb

    from revtron_utils_spark.operators.graph import pagerank, pagerank_oracle_sql

    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (4, 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = sorted(
        (r.node, r.rank_int) for r in pagerank(df, iterations=3).collect()
    )
    vals = ", ".join(f"({s}, {d})" for s, d in edges)
    sql = pagerank_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", iterations=3
    )
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == want


# ------------------------------------------------- triangle counts


def test_triangle_counts_toy_graphs(spark):
    from revtron_utils_spark.operators.graph import triangle_counts

    # K4 on {1..4}: every node is in C(3,2)=3 triangles; node 5 hangs off
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    df = spark.createDataFrame(k4 + [(4, 5)], ["src", "dst"])
    got = {r.node: r.triangles for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_matches_bruteforce(spark):
    import itertools
    import random

    from revtron_utils_spark.operators.graph import triangle_counts

    rng = random.Random(3)
    edges = {
        (min(a, b), max(a, b))
        for a, b in (
            (rng.randrange(20), rng.randrange(20)) for _ in range(80)
        )
        if a != b
    }
    adj = set(edges)
    want = {}
    for a, b, c in itertools.combinations(sorted({x for p in edges for x in p}), 3):
        if (a, b) in adj and (b, c) in adj and (a, c) in adj:
            for x in (a, b, c):
                want[x] = want.get(x, 0) + 1
    # duplicate + reversed edges must not change counts
    noisy = list(edges) + [(b, a) for a, b in list(edges)[:15]]
    df = spark.createDataFrame(noisy, ["src", "dst"])
    got = {r.node: r.triangles for r in triangle_counts(df).collect()}
    assert got == want


# ------------------------------------------- bloom decontamination


def test_decontaminate_bloom_matches_exact_at_default_size(spark, sf_dir):
    from revtron_utils_spark.io import read_table
    from revtron_utils_spark.operators.curation import decontaminate, decontaminate_bloom

    docs = read_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    tr = docs.filter(F.col("doc_id") % 97 != 0)
    kept_b = {r.doc_id for r in decontaminate_bloom(tr, ev).select("doc_id").collect()}
    kept_e = {r.doc_id for r in decontaminate(tr, ev).select("doc_id").collect()}
    # at 2^18 bits the theoretical FP mass here is ~1e-9 per gram:
    # the bloom result must equal the exact broadcast-set result
    assert kept_b == kept_e


def test_decontaminate_bloom_fp_is_failsafe_and_deterministic(spark):
    from revtron_utils_spark.operators.curation import decontaminate, decontaminate_bloom

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(10))) for i in range(40)],
        "doc_id long, text string",
    )
    ev = docs.filter(F.col("doc_id") >= 35)
    tr = docs.filter(F.col("doc_id") < 35)
    # 64-bit bloom: saturated, so false positives are certain
    kept_tiny = {
        r.doc_id
        for r in decontaminate_bloom(tr, ev, mbits=64).select("doc_id").collect()
    }
    kept_exact = {r.doc_id for r in decontaminate(tr, ev).select("doc_id").collect()}
    # fail-safe: FPs only ever over-remove (kept set shrinks, never grows)
    assert kept_tiny <= kept_exact
    assert len(kept_tiny) < len(kept_exact)
    # deterministic: the same saturated filter drops the same docs
    again = {
        r.doc_id
        for r in decontaminate_bloom(tr, ev, mbits=64).select("doc_id").collect()
    }
    assert again == kept_tiny


def test_decontaminate_bloom_rejects_too_many_hashes(spark):
    from revtron_utils_spark.operators.curation import decontaminate_bloom

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        decontaminate_bloom(docs, docs, num_hashes=9)


def test_decontaminate_bloom_rejects_bad_mbits(spark):
    from revtron_utils_spark.operators.curation import decontaminate_bloom

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    for bad in (0, 32, 100, -64):
        with pytest.raises(ValueError):
            decontaminate_bloom(docs, docs, mbits=bad)


def test_decontaminate_bloom_arrow_expr_parity(spark, sf_dir):
    from revtron_utils_spark.io import read_table
    from revtron_utils_spark.operators.curation import decontaminate_bloom

    docs = read_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    tr = docs.filter(F.col("doc_id") % 97 != 0)
    arrow = {r.doc_id for r in decontaminate_bloom(tr, ev).select("doc_id").collect()}
    expr = {
        r.doc_id
        for r in decontaminate_bloom(tr, ev, use_arrow=False).select("doc_id").collect()
    }
    assert arrow == expr


def _py_ppr(edges, seeds, iterations=5, num=85, den=100, scale=10**9):
    """Pure-Python twin of personalized pagerank's integer recurrence."""
    e = sorted(set(edges))
    nodes = sorted({x for p in e for x in p})
    n, seeds = len(nodes), sorted(set(seeds) & set(nodes))
    s = len(seeds)
    outdeg = {}
    for a, _ in e:
        outdeg[a] = outdeg.get(a, 0) + 1
    base_seed = ((den - num) * scale * n) // den // s
    r = {x: scale for x in nodes}
    for _ in range(iterations):
        contrib = {x: 0 for x in nodes}
        for a, b in e:
            contrib[b] += r[a] // outdeg[a]
        dang = sum(r[x] for x in nodes if x not in outdeg) // s
        r = {
            x: (base_seed if x in seeds else 0)
            + (num * (contrib[x] + (dang if x in seeds else 0))) // den
            for x in nodes
        }
    return r


def test_personalized_pagerank_matches_python_and_oracle(spark):
    import duckdb

    from revtron_utils_spark.operators.graph import pagerank, pagerank_oracle_sql

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (6, 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([(1,), (4,)], ["node"])
    got = {
        r.node: r.rank_int
        for r in pagerank(df, iterations=4, seeds=seeds).collect()
    }
    assert got == _py_ppr(edges, [1, 4], iterations=4)
    vals = ", ".join(f"({a}, {b})" for a, b in edges)
    sql = pagerank_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)",
        iterations=4,
        seed_pred="node IN (1, 4)",
    )
    want = dict(duckdb.sql(sql).fetchall())
    assert got == want
    # mass concentrates near the seeds: both seeds outrank the
    # never-teleported sink-free node 6
    assert got[1] > got[6] and got[4] > got[6]


def test_personalized_pagerank_empty_seed_raises(spark):
    from revtron_utils_spark.operators.graph import pagerank

    df = spark.createDataFrame([(1, 2)], ["src", "dst"])
    seeds = spark.createDataFrame([(99,)], ["node"])  # disjoint from graph
    with pytest.raises(ValueError):
        pagerank(df, seeds=seeds)


def test_uniform_pagerank_unchanged_by_seed_param_absence(spark):
    from revtron_utils_spark.operators.graph import pagerank

    edges = [(1, 2), (2, 1), (2, 3)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.rank_int for r in pagerank(df, iterations=3).collect()}
    assert got == _py_pagerank(edges, iterations=3)


def test_personalized_pagerank_with_dangling_nodes(spark):
    """The seeded-dangling redistribution path (dangling mass div
    n_seeds, credited to seeds only): previously only reachable on
    graphs no gate or test produced."""
    import duckdb

    from revtron_utils_spark.operators.graph import pagerank, pagerank_oracle_sql

    # 3 and 5 are dangling (no out-edges); seeds = {1, 5}
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (2, 5)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([(1,), (5,)], ["node"])
    got = {
        r.node: r.rank_int
        for r in pagerank(df, iterations=4, seeds=seeds).collect()
    }
    assert got == _py_ppr(edges, [1, 5], iterations=4)
    vals = ", ".join(f"({a}, {b})" for a, b in edges)
    sql = pagerank_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)",
        iterations=4,
        seed_pred="node IN (1, 5)",
    )
    assert got == dict(duckdb.sql(sql).fetchall())
    # the dangling mass teleports to seeds only: non-seed dangling node
    # 3 keeps draining, seed 5 (also dangling) accumulates
    assert got[5] > got[3]


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge: LP separates them (CC
    would merge); labels inside each clique agree."""
    from revtron_utils_spark.operators.graph import label_propagation

    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    bridge = [(3, 10)]
    edges = spark.createDataFrame(c1 + c2 + bridge, "src: long, dst: long")
    out = {r.node: r.label for r in label_propagation(edges, iterations=4).collect()}
    l1 = {out[n] for n in range(4)}
    l2 = {out[n] for n in range(10, 14)}
    assert len(l1) == 1 and len(l2) == 1  # each clique coherent
    assert l1 != l2  # the bridge did not merge the communities


def test_label_propagation_matches_python_replay(spark):
    """Bit-equal to a synchronous python replay with the same
    (count desc, min label) tie-break."""
    import random

    from revtron_utils_spark.operators.graph import label_propagation

    rng = random.Random(5)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(60)})
    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = {r.node: r.label for r in label_propagation(df, iterations=3).collect()}

    und = {}
    for a, b in edges:
        if a == b:
            continue
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
    labels = {v: v for v in und}
    for _ in range(3):
        new = {}
        for v, nbrs in und.items():
            counts = {}
            for u in nbrs:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            new[v] = min(counts, key=lambda l: (-counts[l], l))
        labels = new
    assert got == labels


def test_top_session_paths_planted(spark):
    from datetime import datetime, timedelta

    from revtron_utils_spark.operators.funnel import top_session_paths

    t0 = datetime(2024, 3, 1)
    rows = []
    eid = 0
    for u in range(5):  # five users take the same journey
        for i, t in enumerate(["view", "click", "purchase"]):
            rows.append((eid, u, t0 + timedelta(minutes=i), t))
            eid += 1
    rows.append((eid, 9, t0, "error"))  # singleton path
    df = spark.createDataFrame(
        rows, "event_id: long, user_id: long, ts: timestamp, event_type: string"
    )
    out = top_session_paths(df, k=5).collect()
    assert out[0].path == "view>click>purchase" and out[0].n_sessions == 5
    assert ("error", 1) in [(r.path, r.n_sessions) for r in out]


def test_label_propagation_string_ids_and_self_loops(spark):
    """ADVICE r5: the old (cnt, −label) tie-break negated the label —
    impossible for string node ids — and self-loop-only nodes vanished.
    String ids must work, ties must break to the smallest label, and a
    node whose only edge is a self-loop must keep its own label."""
    from revtron_utils_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("a", "c"),      # clique 1
            ("x", "y"), ("y", "z"), ("x", "z"),      # clique 2
            ("solo", "solo"),                         # self-loop only
        ],
        ["src", "dst"],
    )
    out = {r.node: r.label for r in label_propagation(edges, iterations=4).collect()}
    assert out["solo"] == "solo"
    assert out["a"] == out["b"] == out["c"] == "a"
    assert out["x"] == out["y"] == out["z"] == "x"
    assert len(out) == 7


def test_label_propagation_oracle_includes_self_loop_nodes(spark):
    """The unrolled-CTE oracle must replay the same universe as the
    Spark side: its final union re-adds nodes that never entered the
    propagation rounds, and every label matches bit-for-bit."""
    import duckdb

    from revtron_utils_spark.operators.graph import (
        label_propagation,
        label_propagation_oracle_sql,
    )

    pairs = [(1, 2), (2, 3), (1, 3), (5, 6), (7, 7)]
    sql = label_propagation_oracle_sql(
        "SELECT * FROM (VALUES " + ", ".join(f"({a}, {b})" for a, b in pairs)
        + ") t(a, b)",
        iterations=3,
    )
    got = dict(duckdb.sql(sql).fetchall())
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    want = {r.node: r.label for r in label_propagation(edges, iterations=3).collect()}
    assert got[7] == 7
    assert got == want


def test_k_core_peels_pendants_keeps_clique(spark):
    """4-clique + pendant chain: the 2-core (and 3-core) is exactly the
    clique — pendants peel iteratively (6-5 falls only after 5-4 does,
    so a single-round degree filter would get this wrong)."""
    from revtron_utils_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6), (7, 7)],
        ["src", "dst"],
    )
    core2 = {r["node"]: r["degree"] for r in k_core(edges, k=2, rounds=5).collect()}
    assert core2 == {1: 3, 2: 3, 3: 3, 4: 3}
    core3 = {r["node"]: r["degree"] for r in k_core(edges, k=3, rounds=5).collect()}
    assert core3 == {1: 3, 2: 3, 3: 3, 4: 3}
    assert k_core(edges, k=4, rounds=5).count() == 0


def test_k_core_converged_fixpoint(spark):
    """One extra round on a converged peel is a no-op, and the oracle
    replays the identical rounds."""
    import duckdb

    from revtron_utils_spark.operators.graph import k_core, k_core_oracle_sql

    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 3), (6, 1)]
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    a = sorted(map(tuple, k_core(edges, k=2, rounds=4).collect()))
    b = sorted(map(tuple, k_core(edges, k=2, rounds=5).collect()))
    assert a == b
    sql = k_core_oracle_sql(
        "SELECT * FROM (VALUES " + ", ".join(f"({x}, {y})" for x, y in pairs)
        + ") t(a, b)",
        k=2,
        rounds=4,
    )
    assert sorted(duckdb.sql(sql).fetchall()) == a


def test_distribution_match_quotas_and_determinism(spark):
    from revtron_utils_spark.operators.curation import distribution_match

    rows = [(i, "en") for i in range(400)] + [(i + 1000, "de") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    kept = distribution_match(df, "doc_id", "lang", {"en": 1, "de": 1}, 200)
    got = kept.groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in got}
    # quota 100 each; the hash draw lands within binomial jitter
    assert 70 <= by["en"] <= 130
    assert 70 <= by["de"] <= 130
    # deterministic: identical second run
    again = distribution_match(df, "doc_id", "lang", {"en": 1, "de": 1}, 200)
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_distribution_match_drops_unlisted_buckets_and_caps(spark):
    from revtron_utils_spark.operators.curation import distribution_match

    rows = [(i, "en") for i in range(50)] + [(i + 500, "xx") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    kept = distribution_match(df, "doc_id", "lang", {"en": 1}, 50).collect()
    assert all(r["lang"] == "en" for r in kept)
    # quota == population: the threshold keeps everything (h·c < c·MOD always)
    assert len(kept) == 50


def test_distribution_match_largest_remainder_quota_sums(spark):
    from revtron_utils_spark.operators.curation import distribution_match

    # 3-way split of 100 by weights 1:1:1 → quotas 34/33/33 (tie → asc bucket)
    rows = [(i + o * 10000, b) for o, b in enumerate("abc") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    kept = distribution_match(df, "doc_id", "lang", {"a": 1, "b": 1, "c": 1}, 100)
    n = kept.count()
    # E[kept] = 100; binomial jitter over 3 quotas stays well inside ±40
    assert 60 <= n <= 140
