"""Product-quantization ANN: the memory-footprint scale path for
similarity search over massive embedding tables.

The reference has no vector surface (its query layer is SQL/SOQL
generation, ``/root/reference/revtron/database/main.py``); this extends
the repo's similarity family (brute-force ``cosine_topk``, bucketed
``IVFIndex``) with the technique that makes billion-vector search fit in
memory at all: each d-dim float vector is split into ``m`` subvectors and
each subvector replaced by the id of its nearest centroid from a
per-subspace codebook (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI'11). A 64-dim float32 vector (256 bytes) becomes
``m`` = 8 single-byte codes — a 32× compression — and query-time scoring
is ``m`` table lookups per vector instead of ``d`` multiplies
(asymmetric distance computation, ADC).

100 TB posture
--------------
- Codebook training is a bounded random driver sample + numpy Lloyd —
  the standard recipe (Faiss trains on ≤1M samples regardless of corpus
  size); the full corpus is never collected.
- Encoding is one Arrow-vectorized ``pandas_udf`` pass (numpy argmin per
  subspace over the whole batch), embarrassingly parallel, no shuffle.
- The encoded table is what you persist: 100 TB of raw vectors become
  ~3 TB of codes, which is what makes re-ranking pipelines (PQ shortlist
  → exact re-rank of survivors) feasible.
- ADC scoring is pure JVM: the per-query lookup table is ``m·k`` double
  literals unrolled into a fixed-order sum (whole-stage codegen — no
  interpreted higher-order functions, no Python in the scoring path),
  and top-k compiles to ``TakeOrderedAndProject``.
- Composes with ``IVFIndex``: coarse-quantize into partitions, PQ-encode
  residuals within each — the classic IVF-PQ layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class PQIndex:
    """Trained product quantizer: ``codebooks[j]`` is the k×subdim
    centroid table for subspace ``j``."""

    def __init__(self, codebooks, dim: int, normalize: bool = True):
        self.codebooks = codebooks  # list[m] of list[k] of list[subdim]
        self.m = len(codebooks)
        self.k = len(codebooks[0])
        self.dim = dim
        self.subdim = dim // self.m
        # spherical PQ: vectors are L2-normalized before sub-splitting, so
        # ADC's squared-L2 ordering equals the cosine ordering
        # (|x−q|² = 2 − 2cos on the unit sphere) — aligned with the rest
        # of the similarity family, which ranks by cosine
        self.normalize = normalize

    # ------------------------------------------------------------ train
    @staticmethod
    def train(
        df: DataFrame,
        vec_col: str = "embedding",
        *,
        id_col: str = "vec_id",
        m: int = 8,
        k: int = 16,
        seed: int = 42,
        iters: int = 15,
        max_train: int = 50_000,
        normalize: bool = True,
    ) -> "PQIndex":
        """Fit per-subspace codebooks with deterministic k-means++/Lloyd
        on a bounded random sample (see module docstring for why a
        sample is the correct posture, not a distributed fit).

        The sample is selected from data VALUES, not partition layout:
        rows are ranked by a seeded hash of ``id_col`` and the smallest
        ``max_train`` win (``df.sample`` is per-partition Bernoulli, so
        its output — and therefore the codebooks — would change with
        partitioning and cluster size despite the fixed seed). The final
        ``orderBy(id_col)`` pins the row order the k-means++ RNG walks."""
        import numpy as np

        n_rows = df.count()
        sample = df
        if n_rows > max_train:
            sample = (
                df.orderBy(
                    F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)), F.col(id_col)
                ).limit(max_train)
            )
        rows = sample.select(id_col, vec_col).orderBy(id_col).limit(max_train).collect()
        X = np.array([r[1] for r in rows], dtype=np.float64)
        if normalize:
            norms = np.linalg.norm(X, axis=1, keepdims=True)
            X = X / np.where(norms == 0, 1.0, norms)
        dim = X.shape[1]
        if dim % m != 0:
            raise ValueError(f"vector dim {dim} not divisible by m={m}")
        sub = dim // m
        codebooks = []
        for j in range(m):
            Xj = X[:, j * sub : (j + 1) * sub]
            rng = np.random.default_rng(seed * 1_000_003 + j)
            kj = min(k, len(Xj))
            # k-means++ seeding
            centers = [Xj[rng.integers(len(Xj))]]
            d2 = ((Xj - centers[0]) ** 2).sum(axis=1)
            for _ in range(1, kj):
                tot = d2.sum()
                idx = rng.choice(len(Xj), p=d2 / tot) if tot > 0 else rng.integers(len(Xj))
                centers.append(Xj[idx])
                d2 = np.minimum(d2, ((Xj - centers[-1]) ** 2).sum(axis=1))
            C = np.stack(centers)
            Xn = (Xj**2).sum(axis=1)[:, None]
            for _ in range(iters):
                d = Xn + (C**2).sum(axis=1)[None, :] - 2.0 * (Xj @ C.T)
                assign = d.argmin(axis=1)
                C = np.stack(
                    [
                        Xj[assign == c].mean(axis=0) if (assign == c).any() else C[c]
                        for c in range(kj)
                    ]
                )
            codebooks.append([[float(v) for v in row] for row in C])
        return PQIndex(codebooks, dim, normalize=normalize)

    # ----------------------------------------------------------- encode
    def encode(
        self,
        df: DataFrame,
        vec_col: str = "embedding",
        code_col: str = "pq_codes",
    ) -> DataFrame:
        """Append ``code_col``: array<int> of length ``m`` — each entry
        the nearest codebook row for that subspace. One Arrow batch pass,
        numpy-vectorized, no shuffle."""
        import numpy as np
        from pyspark.sql.functions import pandas_udf

        CB = [np.array(cb, dtype=np.float64) for cb in self.codebooks]
        m, sub, normalize = self.m, self.subdim, self.normalize

        # hint-free signature (module uses `from __future__ import annotations`)
        def enc(vecs):
            import pandas as pd

            out = []
            for batch_start in range(0, len(vecs), 8192):
                chunk = vecs.iloc[batch_start : batch_start + 8192]
                X = np.array([np.asarray(v, dtype=np.float64) for v in chunk])
                if len(X) == 0:
                    continue
                if normalize:
                    norms = np.linalg.norm(X, axis=1, keepdims=True)
                    X = X / np.where(norms == 0, 1.0, norms)
                codes = np.empty((len(X), m), dtype=np.int32)
                for j in range(m):
                    Xj = X[:, j * sub : (j + 1) * sub]
                    C = CB[j]
                    d = (
                        (Xj**2).sum(axis=1)[:, None]
                        + (C**2).sum(axis=1)[None, :]
                        - 2.0 * (Xj @ C.T)
                    )
                    codes[:, j] = d.argmin(axis=1)
                out.extend(codes.tolist())
            return pd.Series(out)

        return df.withColumn(code_col, pandas_udf(enc, "array<int>")(F.col(vec_col)))

    # ------------------------------------------------------------- topk
    def adc_distance(self, query_vec, code_col: str = "pq_codes") -> Column:
        """Asymmetric squared-L2 distance column: per-subspace lookup
        tables built driver-side from the query, unrolled into a
        fixed-order sum of ``m`` array-literal lookups — whole-stage
        codegen, no Python, no interpreted HOFs in the scoring path."""
        import numpy as np

        q = np.asarray(query_vec, dtype=np.float64)
        if q.shape[0] != self.dim:
            raise ValueError(f"query dim {q.shape[0]} != index dim {self.dim}")
        if self.normalize:
            n = np.linalg.norm(q)
            if n > 0:
                q = q / n
        sub = self.subdim
        terms = []
        for j in range(self.m):
            qj = q[j * sub : (j + 1) * sub]
            C = np.array(self.codebooks[j], dtype=np.float64)
            lut = ((C - qj[None, :]) ** 2).sum(axis=1)
            arr = F.array(*[F.lit(float(v)) for v in lut])
            terms.append(F.element_at(arr, F.col(code_col).getItem(j) + 1))
        dist = terms[0]
        for t in terms[1:]:
            dist = dist + t
        return dist

    def topk(
        self,
        encoded: DataFrame,
        query_vec,
        k: int = 10,
        id_col: str = "vec_id",
        code_col: str = "pq_codes",
    ) -> DataFrame:
        """Top-k by ADC distance (ascending), ties broken by id —
        ``TakeOrderedAndProject`` at any corpus size. Returns
        ``(id_col, approx_dist)``."""
        return (
            encoded.select(
                F.col(id_col),
                F.round(self.adc_distance(query_vec, code_col), 6).alias("approx_dist"),
            )
            .orderBy(F.col("approx_dist").asc(), F.col(id_col))
            .limit(k)
        )

    def rerank_topk(
        self,
        encoded: DataFrame,
        query_vec,
        k: int = 10,
        shortlist: int = 50,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        code_col: str = "pq_codes",
    ) -> DataFrame:
        """The production retrieval shape: PQ-ADC shortlist (cheap scan
        over codes) → exact quantized-cosine re-rank of the ``shortlist``
        survivors. The exact arithmetic only ever touches ``shortlist``
        rows, so the expensive part is O(shortlist·d) regardless of
        corpus size; with an adequate shortlist the output equals exact
        brute-force top-k (recall-tested). Returns ``(id_col, cosine)``."""
        from .similarity import cosine_topk

        ids = self.topk(encoded, query_vec, shortlist, id_col, code_col).select(id_col)
        survivors = encoded.join(F.broadcast(ids), id_col, "left_semi").select(
            id_col, vec_col
        )
        return cosine_topk(survivors, list(query_vec), k, vec_col=vec_col, id_col=id_col)


def pq_adc_exact(
    df,
    query_vec,
    k: int = 10,
    shortlist: int = 50,
    m: int = 4,
    n_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1_000_000,
):
    """PQ ADC search with DETERMINISTIC INTEGER codebooks — the
    hash-gateable twin of :class:`PQIndex` (whose k-means++ codebook
    training is iterative numpy and therefore rows-only-gated). Same
    pipeline shape — per-subspace encode, ADC shortlist, exact re-rank
    of the survivors — but the per-subspace codebooks are the
    subvectors of the ``n_codes`` smallest-id data vectors
    (deterministic), every distance is an exact int64 over quantized
    components, and every tie breaks on integers (code index, then id),
    so a SQL oracle reproduces encode → ADC → shortlist → re-rank
    bit-for-bit.

    Physical shape: codebooks collected once (``n_codes`` rows, bounded
    by contract) and unrolled as literals; encode + ADC is ONE per-row
    projection (no join, no shuffle, whole-stage codegen), the
    shortlist and final top-k both plan as TakeOrderedAndProject. The
    re-rank re-reads only the shortlist's own rows (the distances ride
    along in the struct — no second scan, no self-join).
    """
    from pyspark.sql import functions as F

    from ..functions import vectors as VX
    from .similarity import _int_dist2, _quant_ints

    qe = df.select(
        F.col(id_col).alias("id"),
        F.transform(VX.quantize(vec_col, scale), lambda x: x.cast("long")).alias(
            "qv"
        ),
    )
    seed_rows = qe.orderBy("id").limit(n_codes).collect()
    if len(seed_rows) < n_codes:
        raise ValueError(
            f"pq_adc_exact: corpus has only {len(seed_rows)} rows but the "
            f"deterministic codebooks need n_codes={n_codes} seed vectors — "
            "lower n_codes (and mirror it in the oracle) or grow the corpus"
        )
    dim = len(seed_rows[0]["qv"])
    if dim % m:
        raise ValueError(f"pq_adc_exact: dim {dim} not divisible by m={m}")
    sub = dim // m
    # codebooks[s][t] = subvector s of seed t (python ints)
    books = [
        [list(r["qv"])[s * sub : (s + 1) * sub] for r in seed_rows]
        for s in range(m)
    ]
    qints = _quant_ints(query_vec, scale)
    qsubs = [qints[s * sub : (s + 1) * sub] for s in range(m)]
    # per-subspace: argmin over the literal codebook → (code, adc term)
    # where the ADC term is the exact int distance from the QUERY's
    # subvector to the chosen CODE vector (classic asymmetric lookup:
    # dist(q_s, c_s(code)) — precomputed per (s, t) as a literal).
    #
    # Built as ONE SQL string per subspace (F.expr), not nested Column
    # ops: the old python loop issued ~m·n_codes·sub py4j round-trips
    # constructing lambda expressions, which the r12 split-timing put at
    # 12-14 s of DRIVER wall per call — 6× the 2 s the query spends
    # executing (guide §1.2: fix the dominant cost; §7.3 driver-side
    # work). The expressions are semantically identical (same
    # aggregate/zip_with fold, same struct argmin tie order, same
    # BIGINT types), so the oracle hash is unchanged.
    def _lits(vals):
        return "array(" + ",".join(f"{int(v)}L" for v in vals) + ")"

    adc_parts = []
    for s in range(m):
        lo = s * sub + 1
        lut = [
            sum((a - b) * (a - b) for a, b in zip(qsubs[s], books[s][t]))
            for t in range(n_codes)
        ]
        books_sql = (
            "array(" + ",".join(_lits(books[s][t]) for t in range(n_codes)) + ")"
        )
        best_sql = (
            f"array_min(transform(sequence(0, {n_codes - 1}), t -> "
            f"named_struct('d', aggregate(zip_with(slice(qv, {lo}, {sub}), "
            f"element_at({books_sql}, t + 1), (x, y) -> (x - y) * (x - y)), "
            f"0L, (acc, x) -> acc + x), 't', CAST(t AS BIGINT))))"
        )
        adc_parts.append(
            f"element_at({_lits(lut)}, CAST({best_sql}.t + 1 AS INT))"
        )
    adc = F.expr(" + ".join(adc_parts))
    dist2 = F.expr(
        f"aggregate(zip_with(qv, {_lits(qints)}, (x, y) -> (x - y) * (x - y)), "
        f"0L, (acc, x) -> acc + x)"
    )
    scored = qe.select(
        "id",
        adc.alias("adc_dist2"),
        dist2.alias("dist2"),
    )
    short = scored.orderBy(F.col("adc_dist2").asc(), F.col("id").asc()).limit(
        shortlist
    )
    return (
        short.orderBy(F.col("dist2").asc(), F.col("id").asc())
        .limit(k)
        .select(F.col("id").alias(id_col), "adc_dist2", "dist2")
    )


def pq_adc_exact_oracle_sql(
    k: int = 10,
    shortlist: int = 50,
    m: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of :func:`pq_adc_exact` over the ``embeddings``
    view: same smallest-id codebooks, same exact-integer encode/ADC/
    shortlist/re-rank with identical tie order."""
    sub = dim // m
    quant = (
        "list_transform(CAST(embedding AS DOUBLE[]), "
        f"x -> CAST(round(x * {scale}) AS BIGINT))"
    )

    def d2(a, b, lo, n):
        return (
            f"list_sum(list_transform(range({lo}, {lo + n}), i -> "
            f"({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
        )

    # per-subspace encode: cross join e × codes, keep the argmin code
    # per (vector, subspace); the ADC term is the query→code distance
    enc_selects = []
    for s in range(m):
        lo = s * sub + 1
        enc_selects.append(
            f"""
enc{s} AS (
  SELECT e.vec_id,
         {d2("c.qv", "q.qv", lo, sub)} AS adc_term
  FROM e CROSS JOIN codes c CROSS JOIN q
  QUALIFY row_number() OVER (
    PARTITION BY e.vec_id
    ORDER BY {d2("e.qv", "c.qv", lo, sub)}, c.t) = 1
)"""
        )
    joins = " ".join(f"JOIN enc{s} USING (vec_id)" for s in range(1, m))
    adc_sum = " + ".join(
        f"enc{s}.adc_term" if m > 1 else "enc0.adc_term" for s in range(m)
    )
    return f"""
WITH e AS MATERIALIZED (
  SELECT vec_id, {quant} AS qv FROM embeddings
),
codes AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS t, qv
  FROM e ORDER BY vec_id LIMIT {n_codes}
),
q AS MATERIALIZED (SELECT qv FROM e WHERE vec_id = (SELECT min(vec_id) FROM e)),
{", ".join(enc_selects)},
scored AS (
  SELECT enc0.vec_id, CAST({adc_sum} AS BIGINT) AS adc_dist2
  FROM enc0 {joins}
),
short AS (
  SELECT s.vec_id, s.adc_dist2,
         CAST({d2("e.qv", "q.qv", 1, dim)} AS BIGINT) AS dist2
  FROM scored s JOIN e USING (vec_id) CROSS JOIN q
  ORDER BY s.adc_dist2, s.vec_id LIMIT {shortlist}
)
SELECT vec_id, adc_dist2, dist2
FROM short ORDER BY dist2, vec_id LIMIT {k}
"""
