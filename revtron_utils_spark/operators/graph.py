"""Distributed connected components — the transitive-closure step that
turns pair-wise near-duplicate candidates (minhash/simhash/jaccard pairs)
into whole dedup *clusters*.

The reference has no graph surface at all (its dedup story is Postgres
``ON CONFLICT`` upserts, revtron/database/main.py:88-117); at 100 TB the
near-dup pair list is itself a multi-billion-edge graph, and "keep the
smaller id of each pair" (one propagation round) under-merges any cluster
that isn't star-shaped: a chain a-b, b-c leaves b and c both claiming
different representatives.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) expressed as
DataFrame joins + partial-aggregating ``groupBy``s. Converges in
O(log^2 n) rounds on any graph (typically 2-4 on dedup graphs, whose
components are small and dense). Each round is two shuffles on the node
id; a checkpoint truncates lineage so the plan doesn't grow with
iterations. By default that is ``localCheckpoint`` (executor-local
blocks — fine on local[*]); pass ``checkpoint_dir`` to use reliable
``checkpoint`` storage instead, which survives executor loss mid-loop
on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Drop self-loops, orient each undirected edge as (hi, lo), dedup."""
    u, v = F.col("u"), F.col("v")
    return (
        edges.select(F.greatest(u, v).alias("u"), F.least(u, v).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node, link every *strictly larger* neighbor to the
    minimum of its neighborhood (including itself)."""
    sym = edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node (edges oriented hi→lo), link all smaller-or-equal
    neighbors — and the node itself — to the neighborhood minimum."""
    e = edges.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    nbr = e.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    self_ = mins.select("u", F.col("m").alias("v"))
    return nbr.unionByName(self_)


def _driver_union_find(
    e0: DataFrame,
    edges_local: list,
    endpoints: DataFrame,
    nodes: DataFrame | None,
    node_col: str | None,
) -> DataFrame:
    """Small-graph fast path: min-root union-find over the collected
    canonical edge list, labels broadcast-joined onto the vertex set.
    Identical output contract to the distributed loop (component = min
    node id; isolated vertices label themselves) — differentially
    tested against it."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in edges_local:
        ra, rb = find(r["u"]), find(r["v"])
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo  # min id stays the root, matching F.least
    members = {v for r in edges_local for v in (r["u"], r["v"])}
    labels = [(x, find(x)) for x in members]

    spark = e0.sparkSession
    ntype = e0.schema["u"].dataType.simpleString()
    lab_df = spark.createDataFrame(labels, f"node {ntype}, component {ntype}")

    all_nodes = endpoints.select(F.col("u").alias("node"))
    if nodes is not None:
        nc = node_col or nodes.columns[0]
        all_nodes = all_nodes.unionByName(
            nodes.select(F.col(nc).alias("node"))
        ).distinct()
    return all_nodes.join(F.broadcast(lab_df), "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_col: str | None = None,
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Label every node with the minimum node id of its connected
    component. Returns ``(node, component)``.

    ``edges`` is undirected (each pair listed once is enough).  ``nodes``
    optionally supplies the full vertex set so isolated vertices appear
    in the output with ``component == node``.

    ``checkpoint_dir``: when set, per-round lineage cuts use reliable
    ``checkpoint`` storage rooted there (HDFS/S3 path on a cluster)
    instead of ``localCheckpoint`` — executor loss mid-loop then replays
    from the checkpoint instead of killing the job.

    ``driver_threshold``: if the canonical edge set has at most this
    many edges (probed with a bounded ``limit(k+1).collect()`` — never
    an unbounded collect), components are solved by driver union-find
    and broadcast back, skipping the iterative rounds entirely. Dedup
    graphs are proportional to the duplicate rate, not the corpus, so
    even 100-TB corpora routinely produce edge lists this small; the
    star-contraction loop remains the path for genuinely large graphs.
    Pass 0 to disable.

    Convergence is detected by a (count, xor-of-hashes) checksum of the
    canonical edge set — one cheap aggregate per round instead of a full
    set comparison.
    """
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def _cut(df: DataFrame, eager: bool) -> DataFrame:
            return df.checkpoint(eager=eager)

    else:

        def _cut(df: DataFrame, eager: bool) -> DataFrame:
            return df.localCheckpoint(eager=eager)

    # materialize the edge input ONCE: it is referenced by the canonical
    # edge set, the endpoint universe, and the final isolated-node
    # anti-join — without this an expensive upstream (e.g. a pair-mining
    # self-join) would be recomputed at every reference
    e0 = _cut(edges.select(F.col(src).alias("u"), F.col(dst).alias("v")), True)
    endpoints = e0.select("u").unionByName(e0.select(F.col("v").alias("u"))).distinct()
    cur = _canon(e0)

    if driver_threshold:
        # gate on the RAW edge count first — counting the checkpointed
        # e0 is shuffle-free, while probing the canonical set directly
        # would run _canon's full distinct over a possibly-huge edge
        # list only to discard it. raw ≥ canonical, so raw ≤ k proves
        # the canonical set fits; heavily-duplicated big edge lists
        # just miss the fast path and take the loop, which is correct.
        if e0.count() <= driver_threshold:
            sample = cur.collect()
            return _driver_union_find(e0, sample, endpoints, nodes, node_col)

    prev_sig = None
    converged = False
    for _ in range(max_iter):
        # lazy checkpoint: the signature aggregate right below is the
        # round's one action — it materializes the checkpoint AND reads
        # the convergence signature in a single job (eager=True would
        # run a second job per round just to materialize)
        cur = _cut(_canon(_small_star(_large_star(cur))), False)
        n, h = cur.agg(
            F.count(F.lit(1)), F.bit_xor(F.xxhash64("u", "v"))
        ).first()
        sig = (n, h)
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components: edge set still changing after {max_iter} "
            "rounds — labels may split components; raise max_iter",
            stacklevel=2,
        )
    # at the fixpoint every edge is (member, root): the labels are the
    # edges themselves plus a self-label per root
    labels = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = cur.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    out = labels.unionByName(roots)
    # vertices that only appeared in self-loops (dropped by _canon) or in
    # the caller-supplied node set label themselves
    all_nodes = endpoints.select(F.col("u").alias("node"))
    if nodes is not None:
        nc = node_col or nodes.columns[0]
        all_nodes = all_nodes.unionByName(nodes.select(F.col(nc).alias("node"))).distinct()
    isolated = all_nodes.join(out, "node", "left_anti").withColumn(
        "component", F.col("node")
    )
    return out.unionByName(isolated)


def cluster_dedup(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Keep one representative (the minimum id) per connected cluster of
    near-duplicate pairs — the exact transitive generalisation of
    ``dedup.minhash_lsh_dedup``'s single-round heuristic."""
    comp = connected_components(pairs, src=id_a, dst=id_b)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
