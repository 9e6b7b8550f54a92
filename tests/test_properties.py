"""Property-based tests (SURVEY.md §5.4): random where-DSL trees compiled
to Spark vs an independently-rendered SQL predicate in DuckDB; merge
idempotence and null-preservation invariants."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from revtron_utils_spark.dsl import compile_where
from revtron_utils_spark.operators.merge import upsert_merge
from tests.conftest import SF_DIR, duck

# --- DSL term strategies over real lineitem columns ------------------------

_NUM_COL = st.sampled_from(["l_quantity", "l_extendedprice", "l_discount", "l_tax"])
_STR_COL = st.sampled_from(["l_returnflag", "l_linestatus"])
_STR_VAL = st.sampled_from(["A", "N", "R", "O", "F", "zzz"])
_NUM_VAL = st.one_of(
    st.integers(min_value=-5, max_value=60),
    st.floats(min_value=0.0, max_value=60.0, allow_nan=False, width=32),
)


def _term_eq():
    return st.one_of(
        st.tuples(_STR_COL, _STR_VAL).map(lambda t: {t[0]: t[1]}),
        st.tuples(_NUM_COL, _NUM_VAL).map(lambda t: {t[0]: t[1]}),
    )


def _term_op():
    num_ops = st.sampled_from([">", "<", ">=", "<=", "!="])
    return st.one_of(
        st.tuples(_NUM_COL, num_ops, _NUM_VAL).map(
            lambda t: {t[0]: {"operator": t[1], "value": t[2]}}
        ),
        st.tuples(_STR_COL, st.lists(_STR_VAL, min_size=1, max_size=3)).map(
            lambda t: {t[0]: {"operator": "in", "value": t[1]}}
        ),
        st.tuples(_STR_COL, st.lists(_STR_VAL, min_size=1, max_size=3)).map(
            lambda t: {t[0]: {"operator": "not in", "value": t[1]}}
        ),
        st.tuples(_NUM_COL, _NUM_VAL, _NUM_VAL).map(
            lambda t: {t[0]: {"operator": "between", "value": sorted([t[1], t[2]])}}
        ),
        st.tuples(_NUM_COL, _NUM_VAL, _NUM_VAL).map(
            lambda t: {t[0]: {"operator": "not between", "value": sorted([t[1], t[2]])}}
        ),
        _STR_COL.map(lambda c: {c: {"operator": "is not null"}}),
        _STR_COL.map(lambda c: {c: {"operator": "is null"}}),
    )


DSL = st.lists(st.one_of(_term_eq(), _term_op()), min_size=1, max_size=4)


def _sql_literal(v):
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(float(v)) if isinstance(v, float) else str(v)


def _render_sql(where) -> str:
    """Independent DSL→SQL renderer (NOT the code under test)."""
    parts = []
    for term in where:
        for col, spec in term.items():
            if not isinstance(spec, dict):
                parts.append(f"{col} = {_sql_literal(spec)}")
                continue
            op, v = spec["operator"], spec.get("value")
            if op in ("in", "not in"):
                lst = ", ".join(_sql_literal(x) for x in v)
                parts.append(f"{col} {op.upper()} ({lst})")
            elif op in ("between", "not between"):
                parts.append(f"{col} {op.upper()} {_sql_literal(v[0])} AND {_sql_literal(v[1])}")
            elif op in ("is null", "is not null"):
                parts.append(f"{col} {op.upper()}")
            else:
                parts.append(f"{col} {op} {_sql_literal(v)}")
    return " AND ".join(parts)


@pytest.fixture(scope="module")
def lineitem_cached(spark):
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def duck_con():
    return duck()


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(where=DSL)
def test_dsl_differential(lineitem_cached, duck_con, where):
    got = lineitem_cached.filter(compile_where(where)).count()
    sql = f"SELECT count(*) FROM lineitem WHERE {_render_sql(where)}"
    want = duck_con.execute(sql).fetchone()[0]
    assert got == want, f"{where} -> spark={got} duck={want}"


# --- merge invariants -------------------------------------------------------

RECORDS = st.lists(
    st.builds(
        lambda k, name, bal: {"c_custkey": k, "c_name": name, "c_acctbal": bal},
        st.integers(min_value=1, max_value=40),
        st.one_of(st.none(), st.text(alphabet="abcXYZ", min_size=1, max_size=6)),
        st.one_of(st.none(), st.floats(min_value=-100, max_value=100, allow_nan=False)),
    ),
    min_size=1,
    max_size=6,
    unique_by=lambda r: r["c_custkey"],
)


@pytest.fixture(scope="module")
def customer_small(spark):
    df = spark.read.parquet(f"{SF_DIR}/customer.parquet").limit(20).cache()
    df.count()
    return df


def _snapshot(df):
    return sorted(map(str, (tuple(r) for r in df.collect())))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(records=RECORDS)
def test_upsert_idempotent_and_null_preserving(spark, customer_small, records):
    src = spark.createDataFrame(
        records, "c_custkey bigint, c_name string, c_acctbal double"
    )
    once = upsert_merge(customer_small, src, ["c_custkey"])
    twice = upsert_merge(once, src, ["c_custkey"])
    assert _snapshot(once) == _snapshot(twice)  # idempotence

    before = {r.c_custkey: r for r in customer_small.collect()}
    after = {r.c_custkey: r for r in once.collect()}
    for rec in records:
        k = rec["c_custkey"]
        if k in before:
            # null-preservation: None in source must not clobber
            for col in ("c_name", "c_acctbal"):
                if rec[col] is None:
                    assert getattr(after[k], col) == getattr(before[k], col)
                else:
                    assert getattr(after[k], col) == rec[col] or (
                        isinstance(rec[col], float)
                        and abs(getattr(after[k], col) - rec[col]) < 1e-9
                    )
        else:
            assert k in after  # inserted


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(records=RECORDS)
def test_upsert_overwrite_clobbers(spark, customer_small, records):
    src = spark.createDataFrame(
        records, "c_custkey bigint, c_name string, c_acctbal double"
    )
    out = {
        r.c_custkey: r
        for r in upsert_merge(
            customer_small, src, ["c_custkey"], overwrite_with_null=True
        ).collect()
    }
    for rec in records:
        got = out[rec["c_custkey"]]
        assert got.c_name == rec["c_name"]

# --- curation invariants ----------------------------------------------------


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(min_value=1, max_value=400),
    seed=st.integers(min_value=0, max_value=10_000),
    frac=st.floats(min_value=0.05, max_value=0.95),
)
def test_hash_split_sample_consistency(spark, n, seed, frac):
    """hash_sample(f) keeps exactly the ids whose split under
    weights {keep: f, drop: 1-f} (same seed) is 'keep' — the two
    operators share one hash, so samples and splits compose."""
    from revtron_utils_spark.operators.curation import hash_sample, hash_split

    df = spark.range(0, n).withColumnRenamed("id", "k")
    kept = {r.k for r in hash_sample(df, "k", frac, seed=seed).collect()}
    split = {
        r.k: r.split
        for r in hash_split(df, "k", {"keep": frac, "drop": 1 - frac}, seed=seed).collect()
    }
    assert kept == {k for k, s in split.items() if s == "keep"}


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_toks=st.integers(min_value=0, max_value=300),
    chunk=st.integers(min_value=4, max_value=64),
    stride_frac=st.floats(min_value=0.3, max_value=1.0),
)
def test_chunk_documents_reconstruction(spark, n_toks, chunk, stride_frac):
    """Every token of the document appears in at least one chunk, chunk
    sizes are within [1, chunk_tokens], and stride-aligned prefixes
    reconstruct the document exactly when stride == chunk."""
    from revtron_utils_spark.operators.curation import chunk_documents

    stride = max(1, int(chunk * stride_frac))
    text = " ".join(f"w{i}" for i in range(n_toks))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_tokens=chunk, stride=stride).collect(),
        key=lambda r: r.chunk_id,
    )
    if n_toks == 0:
        # a single empty-ish chunk (split of '' yields [''])
        assert len(rows) == 1
        return
    covered = set()
    for r in rows:
        toks = r.chunk_text.split()
        assert 1 <= len(toks) <= chunk
        assert len(toks) == r.n_tokens
        covered.update(toks)
    assert covered == {f"w{i}" for i in range(n_toks)}
    # chunks tile the doc: chunk k starts at token k*stride
    for r in rows:
        assert r.chunk_text.split()[0] == f"w{r.chunk_id * stride}"


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=600), min_size=1, max_size=60),
    budget=st.integers(min_value=64, max_value=1024),
)
def test_pack_sequences_offset_invariants(spark, sizes, budget):
    """pack_id is nondecreasing in order, starts at 0, and every pack's
    preceding-token offset stays within one document of the budget
    boundary (the defining property of offset packing)."""
    from revtron_utils_spark.operators.curation import pack_sequences

    df = spark.createDataFrame(list(enumerate(sizes)), ["doc_id", "n_tokens"])
    out = sorted(
        pack_sequences(df, "doc_id", "n_tokens", budget).collect(),
        key=lambda r: r.doc_id,
    )
    assert out[0].pack_id == 0
    cum = 0
    for r in out:
        assert r.pack_id == cum // budget
        cum += sizes[r.doc_id]
    assert [r.pack_id for r in out] == sorted(r.pack_id for r in out)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["red", "rad", "rod", "blue", "blues"]),
            st.sampled_from(["widget", "gadget"]),
        ),
        min_size=2,
        max_size=12,
    ),
    max_dist=st.integers(min_value=1, max_value=3),
)
def test_fuzzy_self_pairs_matches_bruteforce(spark, data, max_dist):
    """The value-canonicalized blocked fuzzy join must equal the naive
    per-row brute force (same blocks, same threshold)."""
    from revtron_utils_spark.operators.fuzzy import fuzzy_self_pairs

    rows = [(i, f"{a} {b}", b) for i, (a, b) in enumerate(data)]
    df = spark.createDataFrame(rows, ["id", "t", "blk"])
    got = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy_self_pairs(df, "t", "id", ["blk"], max_dist=max_dist).collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if rows[i][2] != rows[j][2]:
                continue
            d = lev(rows[i][1], rows[j][1])
            if d <= max_dist:
                want[(i, j)] = d
    assert got == want


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=6),
                st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
                st.one_of(st.none(), st.floats(min_value=0, max_value=9, allow_nan=False)),
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=4,
    ),
    own=st.booleans(),
)
def test_upsert_merge_many_matches_iterated_random(spark, batches, own):
    """Random batch sequences (with duplicate keys removed per batch —
    the documented precondition): the one-shuffle fold must equal the
    pairwise iterated merge in both null modes."""
    from revtron_utils_spark import upsert_merge, upsert_merge_many

    dfs = []
    for b in batches:
        dedup = {}
        for k, name, v in b:
            dedup[k] = (k, name, v)
        dfs.append(
            spark.createDataFrame(
                list(dedup.values()), "k long, name string, v double"
            )
        )
    folded = upsert_merge_many(dfs, ["k"], overwrite_with_null=own)
    it = dfs[0]
    for d in dfs[1:]:
        it = upsert_merge(it, d, ["k"], overwrite_with_null=own)
    assert folded.exceptAll(it).count() == 0
    assert it.exceptAll(folded).count() == 0


# ---- exact_quantiles differential property --------------------------------

_QVALS = st.lists(
    st.one_of(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        st.sampled_from([0.0, 1.0, -1.0, 7.5, 1000.0001, 1000.0002]),
    ),
    min_size=1,
    max_size=80,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=_QVALS, probs=st.lists(st.floats(0.0, 1.0), min_size=1, max_size=3))
def test_exact_quantiles_differential(spark, vals, probs):
    """Any value distribution (ties, near-ties, negatives, constants)
    and any probability list must match the built-in percentile to
    1e-9 — including with a tiny collect cap that forces the
    refinement loop."""
    from pyspark.sql import functions as F

    from revtron_utils_spark.operators.quantiles import exact_quantiles

    probs = sorted(set(round(p, 6) for p in probs))
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    names = [f"p{100 * p:g}".replace(".", "_") for p in probs]
    mine = exact_quantiles(
        df, "v", probs, by=["g"], collect_cap=4, refine_bins=8, max_refine=30
    ).collect()[0]
    ref = (
        df.groupBy("g")
        .agg(F.percentile("v", F.lit(list(probs))).alias("p"))
        .collect()[0]["p"]
    )
    for n, want in zip(names, ref):
        assert abs(mine[n] - want) < 1e-9, (vals, probs, n, mine[n], want)
