"""Iterative PageRank as a DataFrame fixed-point loop.

Reference semantics (``/root/reference/src/PageRank/PageRank.java``):

* 8 fixed iterations driven from ``main`` (``PageRank.java:473-488``);
  each Hadoop iteration re-reads and rewrites the full graph+rank state
  from/to HDFS. Here the loop body is a lazy
  ``join → explode → groupBy.agg`` plan over cached DataFrames — state
  never leaves memory; ``localCheckpoint`` every few iterations bounds
  lineage/plan growth (the Spark-idiomatic replacement for the
  reference's per-iteration disk materialization).
* iteration-0 seeding: every page starts at ``1/N``
  (``PageRank.java:258-264``).
* update rule: ``rank' = 0.15/N + 0.85 * Σ incoming rank/outdeg``
  (``PageRank.java:305,316``). Every page receives the ``0.15/N``
  baseline even with no in-links, because the reference ships each
  page's adjacency row to itself (``PageRank.java:281``).
* **parity mode** (default ``parity=True``) reproduces the reference's
  dangling-node behavior exactly: rank mass flowing into pages with no
  outlinks is LOST (never redistributed), so ranks do not sum to 1.
  ``parity=False`` redistributes dangling mass uniformly (textbook
  PageRank; ranks sum to 1).

Scale notes (100 TB posture):

* The per-iteration join ``adjacency ⋈ ranks`` shuffles both sides on
  ``id``. We ``repartition(id)`` the static adjacency ONCE and cache
  it; ranks come out of the previous iteration's ``groupBy(id)`` with
  the same hash partitioning, so Catalyst/AQE reuses the exchange
  instead of re-shuffling the big adjacency every iteration.
* The contribution explode is map-side; the following ``groupBy(dst)``
  does partial (map-side) aggregation before the shuffle — the
  Spark equivalent of the reference's hand-rolled HashSet combiner
  (``PageRank.java:91-93``), for free.
* No ``collect()`` of rank state; the only driver-side scalar is N
  (same round-trip the reference does via a Hadoop counter,
  ``PageRank.java:470-471``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pagerank_hadoop_spark import runtime_counters

DAMPING = 0.85
TELEPORT = 0.15

# target vertices per task in iterative loops: small graphs collapse to
# a handful of partitions (32 near-empty tasks per iteration is pure
# scheduler overhead — measured 2x on the sf0.1 bench); a 1e9-vertex
# graph still fans out to ~10k tasks, far above any shuffle_partitions
# default, and AQE coalesces from there
ROWS_PER_ITER_TASK = 100_000


def _iter_partitions(n: int, shuffle_parts: int) -> int:
    """Partition count for iterative state: ~ROWS_PER_ITER_TASK rows
    per task, never more than the session's shuffle partitions for
    small graphs, never fewer than shuffle partitions for big ones."""
    need = -(-n // ROWS_PER_ITER_TASK)
    return max(1, min(shuffle_parts, need)) if need < shuffle_parts else shuffle_parts


def adjacency_from_edges(edges: DataFrame, dedup: bool = True) -> DataFrame:
    """Edges ``(src, dst)`` → adjacency ``(id, outlinks array)``.

    The Spark form of the reference's tab-packed adjacency build
    (``RedLinksReducer``, ``PageRank.java:175-200``): a first-class
    ``array<>`` column instead of a tab-joined string. ``sort_array``
    makes the result deterministic (the reference inherits arbitrary
    shuffle order).
    """
    e = edges.select("src", "dst")
    if dedup:
        # per-src dedup, as the reference's HashSet (PageRank.java:91-93)
        agg = F.array_sort(F.collect_set("dst"))
    else:
        agg = F.array_sort(F.collect_list("dst"))
    return e.groupBy(F.col("src").alias("id")).agg(agg.alias("outlinks"))


def _with_dangling(adjacency: DataFrame, vertices: DataFrame | None) -> DataFrame:
    """Ensure every vertex has an adjacency row (possibly empty array).

    The reference guarantees this structurally: every page emits a
    ``(title,"!")`` marker (``PageRank.java:80``) so dangling pages
    still appear with an empty outlink list (``PageRank.java:196-197``).
    """
    if vertices is None:
        return adjacency
    v = vertices.select(F.col(vertices.columns[0]).alias("id")).distinct()
    return (
        v.join(adjacency, "id", "left")
        .select("id", F.coalesce("outlinks", F.array().cast("array<string>")).alias("outlinks"))
    )


_FANOUT_SALTS = 8


def _chunked_adjacency(
    adjacency: DataFrame, max_fanout: int, parts: int
) -> DataFrame:
    """Split each vertex's outlinks into rows of ≤ ``max_fanout``
    elements, keeping the TRUE out-degree in ``outdeg`` (the contrib
    divisor). A hub holding 20 % of all edges otherwise fans out all
    its messages from ONE task — explode output stays in the
    producing task's partition, so no downstream setting can spread
    it; splitting must happen at layout time. Rows carry
    ``__chunk`` (0..k-1; chunk 0 doubles as the unique-vertex marker
    for final joins) and a bounded ``__salt`` the persistent
    partitioning AND the per-round join key include, so hub chunks
    land on ``_FANOUT_SALTS`` different partitions and stay there
    across rounds (rank frames replicate once per salt — (id, double)
    pairs, cheap against the hot key's edge volume)."""
    # Empty-chunk literal must match the caller's element type — a
    # pre-built adjacency may carry non-string vertex ids, and a
    # hardcoded array<string> makes when/otherwise raise an opaque
    # AnalysisException.
    outlinks_type = adjacency.schema["outlinks"].dataType.simpleString()
    chunks = F.when(
        F.size("outlinks") > 0,
        F.transform(
            F.sequence(
                F.lit(0),
                F.ceil(F.size("outlinks") / F.lit(max_fanout)).cast("int")
                - 1,
            ),
            lambda i: F.slice("outlinks", i * max_fanout + 1, max_fanout),
        ),
        # guard: sequence(0, -1) generates DESCENDING; empty outlink
        # rows (dangling) keep exactly one empty chunk
    ).otherwise(F.array(F.array().cast(outlinks_type)))
    return (
        adjacency.select(
            "id",
            F.size("outlinks").alias("outdeg"),
            F.posexplode(chunks).alias("__chunk", "outlinks"),
        )
        .withColumn(
            "__salt",
            F.pmod(F.xxhash64("id", "__chunk"), F.lit(_FANOUT_SALTS)),
        )
        .repartition(parts, "id", "__salt")
        .localCheckpoint(eager=True)
    )


def _with_salt_replicas(ranks: DataFrame) -> DataFrame:
    return ranks.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(_FANOUT_SALTS - 1)))
    )


def pagerank(
    edges: DataFrame,
    *,
    vertices: DataFrame | None = None,
    n_iter: int = 8,
    damping: float = DAMPING,
    parity: bool = True,
    checkpoint_interval: int = 4,
    max_fanout: int | None = None,
) -> DataFrame:
    """Run ``n_iter`` PageRank iterations; returns ``(id, rank)``."""
    ranks, _ = pagerank_with_n(
        edges,
        vertices=vertices,
        n_iter=n_iter,
        damping=damping,
        parity=parity,
        checkpoint_interval=checkpoint_interval,
        max_fanout=max_fanout,
    )
    return ranks


def pagerank_with_n(
    edges: DataFrame,
    *,
    vertices: DataFrame | None = None,
    n_iter: int = 8,
    damping: float = DAMPING,
    parity: bool = True,
    checkpoint_interval: int = 4,
    init_ranks: DataFrame | None = None,
    max_fanout: int | None = None,
) -> tuple[DataFrame, int]:
    """Run ``n_iter`` PageRank iterations; returns ``((id, rank), N)``.

    ``edges`` must have string-ish columns ``src, dst``. ``vertices``
    (optional, single column) adds rank-holding nodes with no outgoing
    edges; when omitted, the vertex set is all nodes appearing as a
    ``src`` or ``dst`` (so dangling link targets still hold rank, as in
    the reference where the semi-join restricts dsts to real pages).
    N (the vertex count) is computed once as part of the run — callers
    needing it for thresholds (rank > k/N) should use this instead of
    re-counting.

    ``init_ranks`` (optional ``(id, rank)``) RESUMES the recurrence
    from a saved state instead of the uniform 1/N seed — the
    checkpoint/restart path an hours-long 100 TB run needs: persist
    ranks every K iterations with ``df.write.parquet``, and on
    preemption resume with the remaining iteration budget. Resuming
    is exact: iterations are a pure function of (adjacency, ranks),
    so k iterations from a saved state after j iterations equal
    j + k straight iterations (unit-pinned and oracle-gated as
    ``pagerank_resume``).

    ``max_fanout`` (off by default): cap outlinks-per-adjacency-row by
    chunking hot rows at layout time (``_chunked_adjacency``) — the
    hub-skew escape hatch. A vertex holding 20 % of all edges
    otherwise fans its messages out of ONE task per iteration
    (explode output never leaves the producing task), which bounds
    stage wall at any cluster size. Chunked mode keys the
    per-iteration join on (id, salt) against salt-replicated rank
    frames, so results can differ from the unsalted run in the last
    ulp (partial sums regroup); the registry entries run unchunked.
    """
    spark = edges.sparkSession
    if vertices is None:
        vertices = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    adjacency = _with_dangling(adjacency_from_edges(edges), vertices)

    # Static side of every iteration's join: partition once on id, keep hot.
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    adjacency = adjacency.repartition(shuffle_parts, "id").cache()
    n = adjacency.count()  # driver-side scalar, as PageRank.java:470-471
    if n == 0:
        return spark.createDataFrame([], "id string, rank double"), 0
    # Now that N is known, right-size the iteration partitioning: for a
    # graph far smaller than shuffle_parts x ROWS_PER_ITER_TASK, re-lay
    # the (tiny, already-materialized) adjacency onto fewer partitions
    # so the 8-iteration loop isn't dominated by empty-task scheduling.
    # (The rank-side shuffles stay at shuffle_parts and AQE coalesces
    # them at runtime; what AQE can NOT fix is the partition count of
    # the cached static side, which sets the task count of every
    # iteration's join.)
    parts = _iter_partitions(n, shuffle_parts)
    if max_fanout:
        # hub fan-out skew: split hot adjacency rows at layout time
        # (see _chunked_adjacency) — the default path is untouched
        old = adjacency
        adjacency = _chunked_adjacency(old, max_fanout, parts)
        old.unpersist()
    elif parts < shuffle_parts:
        old = adjacency
        adjacency = (
            old.withColumn("outdeg", F.size("outlinks"))
            .repartition(parts, "id")
            .localCheckpoint(eager=True)
        )
        old.unpersist()
    else:
        adjacency = adjacency.withColumn("outdeg", F.size("outlinks"))
    return _pagerank_loop(
        adjacency,
        n,
        n_iter,
        damping,
        parity,
        checkpoint_interval,
        init_ranks,
        salted=bool(max_fanout),
    ), n


def _pagerank_loop(
    adjacency: DataFrame,
    n: int,
    n_iter: int,
    damping: float,
    parity: bool,
    checkpoint_interval: int,
    init_ranks: DataFrame | None = None,
    salted: bool = False,
) -> DataFrame:

    teleport = (1.0 - damping) / n
    outdeg = F.col("outdeg")
    # unique-vertex frame for seeding and final joins: chunked
    # adjacencies repeat hot ids, so chunk 0 is the one-row-per-vertex
    # marker (no distinct — co-partitioned filter, not a shuffle)
    ids = (
        adjacency.where(F.col("__chunk") == 0).select("id")
        if salted
        else adjacency.select("id")
    )

    def _rank_join(ranks: DataFrame, how: str) -> DataFrame:
        """adjacency ⋈ ranks on id — with the salt in the key when
        chunked, so the persistent (id, __salt) layout is the join
        layout and hub chunks never re-co-locate."""
        if salted:
            return adjacency.join(
                _with_salt_replicas(ranks), ["id", "__salt"], how
            )
        return adjacency.join(ranks, "id", how)

    if parity:
        # Sparse-rank loop: `ranks_sparse` holds only vertices that
        # received messages; every other vertex's rank is exactly the
        # teleport baseline (0.15/N — the self-shipped structure row of
        # PageRank.java:281,305), restored by coalesce at the next
        # join. One join per iteration instead of two (no dense
        # left-join-back), and the shuffle carries only message
        # receivers.
        # iteration-0: uniform 1/N, or a saved state when resuming (a
        # dense restart frame rides the same left-join/coalesce path a
        # sparse message frame does — absent ids read as teleport)
        ranks_sparse: DataFrame | None = (
            init_ranks.select("id", "rank") if init_ranks is not None else None
        )
        for i in range(n_iter):
            if ranks_sparse is None:
                src_ranks = adjacency.select(
                    "id", "outlinks", "outdeg", F.lit(1.0 / n).alias("rank")
                )
            else:
                src_ranks = _rank_join(ranks_sparse, "left").select(
                    "id",
                    "outlinks",
                    "outdeg",
                    F.coalesce("rank", F.lit(teleport)).alias("rank"),
                )
            contribs = src_ranks.select(
                F.explode("outlinks").alias("id"),
                (F.col("rank") / outdeg).alias("contrib"),
            )
            ranks_sparse = (
                contribs.groupBy("id")
                .agg(F.sum("contrib").alias("insum"))
                .select(
                    "id",
                    (F.lit(teleport) + F.lit(damping) * F.col("insum")).alias("rank"),
                )
            )
            runtime_counters.note_round()
            if (i + 1) % checkpoint_interval == 0 and i + 1 < n_iter:
                # truncate lineage so the plan doesn't grow unboundedly;
                # LAZY: the final action materializes the chain in order
                # anyway, and an eager barrier here costs one extra
                # synchronous job round-trip per interval
                ranks_sparse = ranks_sparse.localCheckpoint(eager=False)
        if ranks_sparse is None:
            return ids.select("id", F.lit(1.0 / n).alias("rank"))
        return ids.join(ranks_sparse, "id", "left").select(
            "id", F.coalesce("rank", F.lit(teleport)).alias("rank")
        )

    # Corrected mode: dangling mass is redistributed uniformly each
    # iteration. The mass is a 1-row aggregate broadcast back via
    # crossJoin — kept lazy (a per-iteration collect() would re-execute
    # the whole lineage from scratch every iteration).
    #
    # Unlike the parity loop, each iteration consumes `ranks` TWICE
    # (contribution fan-out + dangling-mass sum), so without a barrier
    # the lineage doubles per iteration (2^k plan blowup between
    # checkpoints — measured as a 100-exchange final plan at k=4).
    # A lazy localCheckpoint per iteration bounds the plan to one
    # iteration's shape; the final action materializes the chain in
    # order, which is exactly the per-iteration work anyway.
    # The dangling-vertex set is a static property of the adjacency —
    # compute the id list once, not from the per-iteration join.
    dangling = adjacency.where(outdeg == 0).select("id")
    if init_ranks is not None:
        ranks = init_ranks.select("id", "rank")
    else:
        ranks = ids.select("id", F.lit(1.0 / n).alias("rank"))
    for i in range(n_iter):
        contribs = _rank_join(ranks, "inner").select(
            F.explode("outlinks").alias("id"),
            (F.col("rank") / outdeg).alias("contrib"),
        )
        extra_df = ranks.join(dangling, "id", "left_semi").agg(
            (F.lit(damping) * F.coalesce(F.sum("rank"), F.lit(0.0)) / n).alias("extra")
        )
        summed = contribs.groupBy("id").agg(F.sum("contrib").alias("insum"))
        ranks = (
            ids
            .join(summed, "id", "left")
            .crossJoin(F.broadcast(extra_df))
            .select(
                "id",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("insum"), F.lit(0.0))
                    + F.col("extra")
                ).alias("rank"),
            )
        )
        runtime_counters.note_round(ranks)
        if i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=False)

    return ranks


def top_ranks(
    ranks: DataFrame,
    n: int,
    *,
    threshold: float | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Reference job 12/13: filter ``rank > 5/N`` then global desc sort.

    ``FlipComparator`` (``PageRank.java:399-419``) exists only to make
    Hadoop's shuffle sort descending; in Spark this is
    ``orderBy(desc)`` (range-partitioned total sort), and with a
    ``limit`` Catalyst plans ``TakeOrderedAndProject`` — no full sort
    at all.
    """
    out = ranks
    if threshold is not None:
        out = out.where(F.col("rank") > threshold)  # PageRank.java:336,346
    out = out.orderBy(F.desc("rank"), F.asc("id"))
    if limit is not None:
        out = out.limit(limit)
    return out


def personalized_pagerank(
    edges: DataFrame,
    source: str,
    *,
    n_iter: int = 8,
    damping: float = DAMPING,
    checkpoint_interval: int = 4,
) -> DataFrame:
    """Personalized PageRank: the teleport mass returns to ``source``
    instead of spreading uniformly — GraphX's
    ``personalizedPageRank`` surface, the relevance-to-a-seed ranking
    used for related-item and local-community queries.

    Update rule (dangling mass lost, matching parity-mode semantics):
    ``r_{i+1}(v) = (1-d)·[v = source] + d·Σ_{u→v} r_i(u)/deg(u)``,
    seeded ``r_0 = [v = source]``. Ranks are SPARSE throughout: a
    vertex untouched by propagation holds exactly 0 and never enters
    the iteration shuffle — on a 100 TB graph the frontier grows from
    1 vertex outward, so early iterations ship only the seed's
    neighborhood instead of the whole vertex set (the uniform variant
    cannot do this; its baseline is nonzero everywhere).
    """
    spark = edges.sparkSession
    vertices = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    adjacency = _with_dangling(adjacency_from_edges(edges), vertices)
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    adjacency = adjacency.repartition(shuffle_parts, "id").cache()
    n = adjacency.count()
    if n == 0:
        return spark.createDataFrame([], "id string, rank double")
    parts = _iter_partitions(n, shuffle_parts)
    if parts < shuffle_parts:
        old = adjacency
        adjacency = old.repartition(parts, "id").localCheckpoint(eager=True)
        old.unpersist()

    outdeg = F.size("outlinks")
    seed = spark.createDataFrame([(source,)], "id string")
    ranks = seed.select("id", F.lit(1.0).alias("rank"))
    base = seed.select("id", F.lit(1.0 - damping).alias("rank"))
    for i in range(n_iter):
        contribs = (
            adjacency.join(ranks, "id")
            .select(
                F.explode("outlinks").alias("id"),
                (F.col("rank") / outdeg * damping).alias("rank"),
            )
        )
        # teleport lands only on the source; propagated mass unions in
        # and the per-vertex sum collapses both — still sparse
        ranks = (
            base.unionByName(contribs)
            .groupBy("id")
            .agg(F.sum("rank").alias("rank"))
        )
        runtime_counters.note_round()
        if (i + 1) % checkpoint_interval == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def weighted_pagerank(
    edges: DataFrame,
    *,
    n_iter: int = 8,
    damping: float = DAMPING,
    checkpoint_interval: int = 4,
) -> DataFrame:
    """PageRank over WEIGHTED edges ``(src, dst, weight)`` — GraphX
    normalizes outgoing edge weights and ships rank proportionally
    (``r(v) = (1-d)/N + d·Σ r(u)·w(u,v)/W(u)``); the uniform variant
    is the special case of all-equal weights. Natural weights at
    corpus scale: link multiplicity, click counts, co-occurrence
    frequencies.

    Same scale posture as the uniform loop: the weighted adjacency
    (id → array<struct<dst, wfrac>>) is built once with weights
    pre-normalized (the per-iteration join never re-aggregates W(u)),
    partitioned on id, and cached; dangling mass is lost
    (parity-mode semantics)."""
    spark = edges.sparkSession
    w_edges = edges.groupBy("src", "dst").agg(
        F.sum("weight").alias("w")
    )
    # aliased self-derived join: tot shares w_edges' lineage, so bare
    # column refs to `w` would resolve ambiguously
    tot = w_edges.groupBy("src").agg(F.sum("w").alias("W"))
    adjacency = (
        w_edges.alias("we")
        .join(tot.alias("tt"), F.col("we.src") == F.col("tt.src"))
        .select(
            F.col("we.src").alias("id"),
            F.struct(
                F.col("we.dst").alias("dst"),
                (F.col("we.w") / F.col("tt.W")).alias("wfrac"),
            ).alias("out"),
        )
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("out")).alias("outs"))
    )
    vertices = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    adjacency = vertices.join(adjacency, "id", "left").select(
        "id", F.coalesce("outs", F.array()).alias("outs")
    )
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    adjacency = adjacency.repartition(shuffle_parts, "id").cache()
    n = adjacency.count()
    if n == 0:
        return spark.createDataFrame([], "id string, rank double")
    parts = _iter_partitions(n, shuffle_parts)
    if parts < shuffle_parts:
        old = adjacency
        adjacency = old.repartition(parts, "id").localCheckpoint(eager=True)
        old.unpersist()

    # Sparse-rank loop, as the parity-mode uniform loop: a vertex with
    # no incoming weighted mass holds exactly the teleport baseline,
    # so `ranks_sparse` carries only message receivers and each
    # iteration is ONE join (state onto adjacency) instead of a join
    # plus a dense left-join-back. Identical values (oracle-pinned).
    teleport = (1.0 - damping) / n
    ranks_sparse: DataFrame | None = None
    for i in range(n_iter):
        if ranks_sparse is None:
            src_ranks = adjacency.select(
                "id", "outs", F.lit(1.0 / n).alias("rank")
            )
        else:
            src_ranks = adjacency.join(ranks_sparse, "id", "left").select(
                "id",
                "outs",
                F.coalesce("rank", F.lit(teleport)).alias("rank"),
            )
        contribs = src_ranks.select(
            F.explode("outs").alias("o"), "rank"
        ).select(
            F.col("o.dst").alias("id"),
            (F.col("rank") * F.col("o.wfrac")).alias("contrib"),
        )
        ranks_sparse = (
            contribs.groupBy("id")
            .agg(F.sum("contrib").alias("insum"))
            .select(
                "id",
                (F.lit(teleport) + F.lit(damping) * F.col("insum")).alias(
                    "rank"
                ),
            )
        )
        runtime_counters.note_round()
        if (i + 1) % checkpoint_interval == 0 and i + 1 < n_iter:
            ranks_sparse = ranks_sparse.localCheckpoint(eager=False)
    if ranks_sparse is None:
        return adjacency.select("id", F.lit(1.0 / n).alias("rank"))
    return adjacency.select("id").join(ranks_sparse, "id", "left").select(
        "id", F.coalesce("rank", F.lit(teleport)).alias("rank")
    )
