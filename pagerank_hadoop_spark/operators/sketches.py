"""Mergeable-sketch aggregation operators.

The reference's only distinct-count is the global vertex count N
(``PageRank.java:211-238``, a map-to-("N",1) + single reducer). At
100 TB the interesting versions of that job are *re-aggregatable*
summaries: a sketch computed once per shard/partition and merged later
without touching the raw data again — the shape every incremental
ingestion pipeline needs (today's shard's sketch ∪ yesterday's stored
sketch, no rescan of yesterday's 100 TB).

Three tiers, all built on Spark 4 built-in aggregates (JVM-side,
partial-aggregation friendly — no UDFs, no driver loops):

* :func:`bitmap_distinct` — **exact** distinct counts via RoaringBitmap-
  style bucketed bitmaps (``bitmap_construct_agg``). Memory is
  ~1 bit per present key within 32k-wide buckets; merge is bitwise OR.
  The scale path for dense integral key spaces (user ids, row ids).
* :func:`hll_distinct` — Apache DataSketches HLL
  (``hll_sketch_agg`` / ``hll_union_agg``): fixed ~2^lgk bytes per
  group regardless of cardinality, sketches stored per shard and
  unioned later. Estimate is order- and partition-insensitive
  (register-wise max), so results are deterministic for a dataset.
* :func:`cms_frequencies` — Count-Min frequency sketch
  (``count_min_sketch``): sub-linear heavy-hitter estimation; the
  merged sketch is a plain byte blob any later job (or the driver) can
  query. Estimates only over-count, never under-count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def bitmap_distinct(
    df: DataFrame, key: Column | str, groups: list[str]
) -> DataFrame:
    """Exact ``COUNT(DISTINCT key)`` per group via mergeable bitmaps.

    Two-level plan::

        groupBy(groups, bitmap_bucket_number(k))
            .agg(bitmap_construct_agg(bitmap_bit_position(k)))   # per bucket
        groupBy(groups).agg(sum(bitmap_count(bitmap)))           # roll up

    Each 32768-key-wide bucket becomes one ≤4 KB bitmap; buckets (not
    keys) shuffle, so a billion distinct ids per group moves as ~30k
    bitmap rows instead of 1e9 key rows. Unlike ``countDistinct`` the
    intermediate per-bucket bitmaps are storable and OR-mergeable
    across ingestion increments (``bitmap_or_agg``); unlike
    ``approx_count_distinct`` the result is exact.

    ``key`` must be integral and non-negative (ids, surrogate keys).
    Values are shifted +1 because ``bitmap_bit_position`` is 1-based
    (0 would land at position -1 of bucket 0 and silently drop).
    """
    k = (F.col(key) if isinstance(key, str) else key).cast("long") + F.lit(1)
    per_bucket = df.groupBy(
        *groups, F.bitmap_bucket_number(k).alias("__bucket")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position(k)).alias("__bm"))
    return per_bucket.groupBy(*groups).agg(
        F.sum(F.bitmap_count("__bm")).alias("n_distinct")
    )


def hll_distinct(
    df: DataFrame,
    key: Column | str,
    groups: list[str],
    shard: Column | str | None = None,
    lgk: int = 12,
) -> DataFrame:
    """DataSketches-HLL distinct estimate per group, built shard-first.

    When ``shard`` is given the plan materializes one sketch per
    (group, shard) and then ``hll_union_agg``-merges them per group —
    the exact dataflow of an incremental pipeline that persists
    per-shard sketches and never rescans old shards. With
    ``shard=None`` it is a single-level sketch aggregation.

    ``lgk=12`` → 4 KB sketches, ~1.6% standard error. The estimate is
    rounded to a long; it is deterministic for a given dataset (the
    sketch is an order-insensitive register-max), but not
    SQL-expressible, so the registry exposes it rows-only with
    error-bound unit tests.
    """
    k = F.col(key) if isinstance(key, str) else key
    if shard is not None:
        sh = F.col(shard) if isinstance(shard, str) else shard
        per_shard = df.groupBy(*groups, sh.alias("__shard")).agg(
            F.hll_sketch_agg(k, F.lit(lgk)).alias("__sk")
        )
        merged = per_shard.groupBy(*groups).agg(
            F.hll_union_agg("__sk").alias("__sk")
        )
    else:
        merged = df.groupBy(*groups).agg(
            F.hll_sketch_agg(k, F.lit(lgk)).alias("__sk")
        )
    return merged.select(
        *groups,
        F.round(F.hll_sketch_estimate("__sk")).cast("long").alias(
            "approx_distinct"
        ),
    )


def cms_frequencies(
    df: DataFrame,
    key: Column | str,
    eps: float = 0.0001,
    confidence: float = 0.999,
    seed: int = 42,
) -> tuple[bytes, "object"]:
    """Build a merged Count-Min sketch over ``key`` and return
    ``(serialized_bytes, jvm_sketch)``.

    ``count_min_sketch`` does partial aggregation: each task sketches
    its partition and Spark merges sketches (element-wise counter
    add), so the driver receives one ~``O(d·w)`` blob no matter how
    many rows were scanned. Width ``w = ceil(e/eps)``, depth
    ``d = ceil(ln(1/(1-confidence)))``.

    The returned JVM handle answers ``estimateCount(item)`` point
    queries; the bytes round-trip through
    ``CountMinSketch.readFrom`` for storage/merge in later jobs.
    """
    k = F.col(key) if isinstance(key, str) else key
    blob = bytes(
        df.agg(
            F.count_min_sketch(
                k, F.lit(eps), F.lit(confidence), F.lit(seed)
            ).alias("cms")
        ).head()[0]
    )
    jvm = df.sparkSession._jvm
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(blob)
    return blob, sketch


def cms_group_estimates(
    df: DataFrame,
    key: str,
    eps: float = 0.0001,
    confidence: float = 0.999,
    seed: int = 42,
    max_candidates: int = 100_000,
) -> DataFrame:
    """Per-value frequency estimates from one merged Count-Min sketch.

    The candidate set (distinct values of ``key``) is assumed small —
    heavy-hitter candidates in practice; here the exact distinct list,
    so the sketch's answers can be compared 1:1 against exact
    ``COUNT(*)``. With width ``ceil(e/eps)`` ≫ candidates the
    collision probability is ~(c²/w)^depth — vanishing, and
    deterministic for a fixed seed — so estimates equal exact counts
    on the test corpora (verified against the DuckDB oracle).

    Scale shape: the 100 TB scan compresses to one ~100 KB blob
    driver-side; only the (tiny) candidate list is collected —
    ``max_candidates`` makes that assumption a hard contract: a
    mis-chosen high-cardinality key fails loudly instead of OOMing
    the driver.
    """
    _, sketch = cms_frequencies(df, key, eps, confidence, seed)
    cand_rows = df.select(key).distinct().limit(max_candidates + 1).collect()
    if len(cand_rows) > max_candidates:
        raise ValueError(
            f"cms_group_estimates: key '{key}' has more than "
            f"{max_candidates} distinct values — Count-Min per-value "
            "readout is for bounded candidate sets (heavy hitters); "
            "pass an explicit candidate list column or raise "
            "max_candidates deliberately."
        )
    values = [r[0] for r in cand_rows]
    rows = [(v, sketch.estimateCount(v)) for v in values]
    key_type = df.schema[key].dataType.simpleString()
    return df.sparkSession.createDataFrame(
        rows, f"{key} {key_type}, est_count long"
    )


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
    shard_col: Column | None = None,
) -> DataFrame:
    """Equi-width histogram sketch: ``(shard?, bin, cnt)`` with
    ``bin = clamp(floor((x - lo) / (hi - lo) * n_bins))`` — the
    fourth mergeable tier: per-shard histograms merge by summing bin
    counts (:func:`merge_histograms`), so yesterday's stored
    histogram folds with today's shard without rescanning anything,
    and any quantile is then answered from ``n_bins`` integers.
    Integer bin ids and counts → bit-portable across engines, no
    float discipline needed (the bin-edge arithmetic is the same
    IEEE expression on both sides). Values outside [lo, hi) clamp to
    the edge bins, the standard sketch convention."""
    x = F.col(value_col).cast("double")
    bin_ = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((x - F.lit(lo)) / F.lit(hi - lo) * n_bins).cast("int"),
        ),
    ).alias("bin")
    keys = ([shard_col.alias("shard")] if shard_col is not None else []) + [bin_]
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))


def merge_histograms(hists: DataFrame) -> DataFrame:
    """Merge per-shard histograms: drop the shard key, sum counts per
    bin — one vocabulary-sized (n_bins) shuffle."""
    return hists.groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def histogram_quantile_micro(
    hist: DataFrame, q: float, lo: float, hi: float, n_bins: int
) -> DataFrame:
    """Quantile estimate from a merged histogram, in micro-units:
    find the bin where the running count crosses ``q·total``, linear-
    interpolate inside it. One n_bins-row window — the answer comes
    from the sketch, never the data. Returns 1 row ``(q_micro)``."""
    from pyspark.sql.window import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    width = (hi - lo) / n_bins
    run = hist.select(
        "bin",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("total"),
    )
    target = F.col("total") * F.lit(q)
    first_cross = (
        run.where(F.col("cum") >= target)
        .orderBy("bin")
        .limit(1)
        .select(
            F.floor(
                (
                    F.lit(lo)
                    + (
                        F.col("bin")
                        + (target - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
                    )
                    * F.lit(width)
                )
                * 1e6
            )
            .cast("long")
            .alias("q_micro")
        )
    )
    return first_cross


# ---------------------------------------------------------------------------
# Bloom-filter ingestion screen (mergeable bit-array, broadcast probe)
# ---------------------------------------------------------------------------

def bloom_build(
    seen: DataFrame,
    key: Column | str,
    bits_per_key: int = 8,
    k_hashes: int = 3,
    portable: bool = False,
) -> tuple[DataFrame, int]:
    """Build a Bloom filter over ``key`` as a relational bit-array:
    ``(word_idx, word)`` rows of packed 64-bit words, plus the sized
    bit count ``m``. The ingestion-screen artifact for a 100 TB store:
    yesterday's corpus reduces to ``m/64`` longs (mergeable across
    shards with ``bit_or`` — associative/commutative, so per-shard
    filters union without rescanning any shard), and a new batch is
    screened by broadcast-joining its probe positions against the
    words — no shuffle of either corpus or batch.

    Spark's own ``BloomFilterAggregate`` exists only as a Catalyst-
    internal runtime-filter expression (not SQL-registered in 4.1), so
    the bit-array is built from first principles with plain aggregates
    — which also keeps it engine-portable: with ``portable=True`` the
    probe positions are md5-derived (``('0x'||substr(md5(i||':'||key)
    ,1,15))::BIGINT % m`` — identical in DuckDB), so a DuckDB oracle
    replays the filter EXACTLY, false positives included. Production
    keeps ``portable=False`` (xxhash64, same layout).

    ``m`` is sized from the corpus count (``bits_per_key`` bits per
    seen key, rounded up to whole words) — one tiny count() job, the
    same bounded driver action the trained-k SemDeDup sizing uses.
    """
    if k_hashes < 1:
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes}")
    if bits_per_key < 1:
        raise ValueError(f"bits_per_key must be >= 1, got {bits_per_key}")
    kcol = F.col(key) if isinstance(key, str) else key
    n = seen.count()
    m = 64 * ((bits_per_key * max(n, 1) + 63) // 64)
    pos = F.array(*_bloom_positions(kcol, m, k_hashes, portable))
    # no distinct() before the groupBy: bit_or is idempotent, so
    # duplicate positions are absorbed by the map-side partial
    # aggregate — a pre-dedup would be a second full shuffle of the
    # position stream for nothing
    words = (
        seen.select(F.explode(pos).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    return words, m


def _bloom_positions(
    kcol: Column, m: int, k_hashes: int, portable: bool
) -> list[Column]:
    """List of ``k_hashes`` bit-position columns for one key. The md5
    form parses 15 hex chars (60 bits, non-negative) so ``% m`` agrees
    between engines; the xxhash64 form uses ``pmod`` for the same
    reason."""
    out = []
    for i in range(1, k_hashes + 1):
        if portable:
            h = F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}:"), kcol)), 1, 15
                ),
                16,
                10,
            ).cast("long")
            out.append(h % m)
        else:
            out.append(F.pmod(F.xxhash64(F.lit(i), kcol), F.lit(m)))
    return out


def bloom_probe(
    batch: DataFrame,
    key: Column | str,
    words: DataFrame,
    m: int,
    k_hashes: int = 3,
    portable: bool = False,
) -> DataFrame:
    """Screen ``batch`` against a built filter: adds ``bloom_new``
    (1 = definitely unseen — Bloom filters have NO false negatives;
    0 = possibly seen, send to the exact verify stage).

    The probe is ``k_hashes`` broadcast-hash left joins against the
    ``m/64``-row word table — one per probe position, each a map-side
    BroadcastHashJoin, so the batch itself is NEVER shuffled and
    exact-duplicate batch rows keep their multiplicity (an ingestion
    stream legitimately contains byte-identical rows; an earlier
    draft collapsed them through a groupBy on every batch column,
    which was both a silent dedup and a wide exchange). All working
    columns are ``__bloom_``-prefixed; the batch schema must not
    already use that prefix."""
    if k_hashes < 1:
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes}")
    if m < 64 or m % 64:
        raise ValueError(f"m must be a positive multiple of 64, got {m}")
    clash = [c for c in batch.columns if c.startswith("__bloom_")]
    if clash:
        raise ValueError(
            f"batch columns collide with bloom_probe internals: {clash}"
        )
    kcol = F.col(key) if isinstance(key, str) else key
    positions = _bloom_positions(kcol, m, k_hashes, portable)
    out = batch
    hits = []
    for i, p in enumerate(positions):
        pos_c, widx_c = f"__bloom_pos_{i}", f"__bloom_widx_{i}"
        word_c, mask_c = f"__bloom_word_{i}", f"__bloom_mask_{i}"
        out = (
            out.withColumn(pos_c, p)
            .withColumn(widx_c, (F.col(pos_c) / 64).cast("long"))
            .withColumn(
                mask_c,
                F.expr(f"shiftleft(1L, cast({pos_c} % 64 as int))"),
            )
            .join(
                F.broadcast(
                    words.select(
                        F.col("word_idx").alias(widx_c),
                        F.col("word").alias(word_c),
                    )
                ),
                widx_c,
                "left",
            )
        )
        hits.append(
            F.coalesce(F.col(word_c).bitwiseAND(F.col(mask_c)), F.lit(0))
            != 0
        )
    all_hit = hits[0]
    for h in hits[1:]:
        all_hit = all_hit & h
    return out.select(
        *batch.columns, F.when(all_hit, 0).otherwise(1).alias("bloom_new")
    )
