"""Corpus-curation operators for training-data pipelines ([EXT]).

The reference ends at ranked pages; a modern 100 TB corpus pipeline
also needs deterministic dataset splits, context-window packing, and
benchmark-contamination screening. All three are pure Column/Window
expressions — no Python in the hot path — and every one is
oracle-checkable in ANSI SQL (see ``queries.py``).

Scale posture:

* ``split_bucket`` is a stateless hash of the document id — no RNG
  state, no driver coordination, stable across retries/backfills.
  Re-running the pipeline on a grown corpus never moves an existing
  document between splits.
* ``pack_bins`` windows are partitioned by a stream column (``lang``
  here) — never a single global ORDER BY, which would serialize 100 TB
  through one task. Each stream packs independently; at cluster scale
  add a coarser stream key (e.g. ``(lang, shard)``) to bound any one
  window partition.
* ``ngram_keys`` shuffles 8-byte gram keys (hex-truncated md5 —
  engine-portable, unlike xxhash64), never the gram text; the
  contamination check is a semi-join on those keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

TRAIN, VALIDATION, TEST = "train", "validation", "test"


def split_bucket(id_col: Column, n_buckets: int = 100) -> Column:
    """Deterministic hash bucket in ``[0, n_buckets)`` for dataset
    splits: first 4 hex digits of md5 of the id's decimal string.

    md5-hex is bit-identical across engines (Spark, DuckDB, Python),
    so split membership can be verified — and reproduced by a
    downstream consumer — without sharing any engine-specific hash.
    """
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 4), 16, 10)
        .cast("long")
        % n_buckets
    )


def split_name(
    id_col: Column, train_pct: int = 90, validation_pct: int = 5
) -> Column:
    """Map a hash bucket to train/validation/test split labels."""
    b = split_bucket(id_col)
    return (
        F.when(b < train_pct, F.lit(TRAIN))
        .when(b < train_pct + validation_pct, F.lit(VALIDATION))
        .otherwise(F.lit(TEST))
    )


def with_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    validation_pct: int = 5,
) -> DataFrame:
    """Add a deterministic ``split`` column (90/5/5 by default)."""
    return docs.withColumn(
        "split", split_name(F.col(id_col), train_pct, validation_pct)
    )


def pack_bins(
    docs: DataFrame,
    tokens_col: str,
    context_len: int,
    stream_col: str | list[str] = "lang",
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign each document to a context-window bin (GPT-style
    concatenate-and-cut packing).

    Documents are laid end-to-end in ``order_col`` order within each
    ``stream_col`` stream; a document belongs to the bin its FIRST
    token lands in: ``bin = floor(start_offset / context_len)``. Adds
    ``start_offset`` and ``bin`` columns.

    The window is a running sum of token counts — partitioned by
    stream so no global sort exists. Map-side nothing shuffles but
    ``(stream, order, n_tokens)``.
    """
    streams = [stream_col] if isinstance(stream_col, str) else list(stream_col)
    w = (
        Window.partitionBy(*streams)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return docs.withColumn("start_offset", start).withColumn(
        "bin", F.floor(F.col("start_offset") / context_len)
    )


def word_ngrams(text: Column, n: int = 5) -> Column:
    """Whitespace word ``n``-grams as an array of strings (empty when
    the document has fewer than ``n`` words)."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - (n - 1)),
        lambda i: F.array_join(F.slice(words, i, n), " "),
    )
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def ngram_key(gram: Column) -> Column:
    """Engine-portable 60-bit integer key for an n-gram: first 15 hex
    digits of md5. Joins shuffle this 8-byte key, not the gram text."""
    return F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")


def ngram_keys(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 5
) -> DataFrame:
    """Explode documents to distinct ``(id, gram_key)`` rows."""
    return (
        docs.select(
            F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
        )
        .select(F.col(id_col), ngram_key(F.col("gram")).alias("gram_key"))
        .distinct()
    )


def contaminated_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Documents in ``corpus`` sharing at least one word ``n``-gram
    with any ``benchmark`` document — the standard decontamination
    screen before training.

    Shape: explode both sides to 8-byte gram keys, LEFT SEMI join
    corpus grams against the (small) benchmark gram set — Catalyst
    broadcasts the benchmark side when it fits, so the 100 TB corpus
    side never shuffles its grams at all. Returns distinct ids.
    """
    bench_keys = ngram_keys(benchmark, text_col, id_col, n).select("gram_key").distinct()
    corpus_keys = ngram_keys(corpus, text_col, id_col, n)
    return (
        corpus_keys.join(F.broadcast(bench_keys), "gram_key", "left_semi")
        .select(id_col)
        .distinct()
    )


def rendezvous_assign(
    df: DataFrame, id_col: str, shards: list[str]
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment: each key
    goes to ``argmax_s md5(s || '|' || id)`` — adds a ``shard``
    column. Unlike modulo sharding (``split_bucket``), removing or
    adding one shard remaps ONLY the keys that scored that shard
    highest (~1/n of them), never reshuffling the rest — the property
    that makes incremental cluster resizes cheap on a 100 TB corpus.

    Map-only Column arithmetic: per row an array of (weight, shard)
    structs and one array_max; weights are md5-derived 60-bit ints,
    so the DuckDB twin replays the exact assignment. Ties are broken
    by the struct's shard field (lexicographic), deterministically —
    though a 60-bit tie needs colliding md5 prefixes first.
    """
    cands = F.array(
        *[
            F.struct(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(s),
                                F.lit("|"),
                                F.col(id_col).cast("string"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                )
                .cast("long")
                .alias("w"),
                F.lit(s).alias("s"),
            )
            for s in shards
        ]
    )
    return df.withColumn("shard", F.array_max(cands)["s"])


def k_anonymity_violations(
    df: DataFrame, quasi_cols: list, k: int = 5
) -> DataFrame:
    """Privacy audit before a data release: quasi-identifier
    combinations held by FEWER than ``k`` rows (Sweeney's
    k-anonymity — small groups re-identify individuals by join with
    an external dataset). Returns the violating combinations with
    their population ``n``; a release pipeline either suppresses
    those rows or coarsens the offending attribute until the table
    is k-anonymous.

    One partial-aggregated groupBy over the quasi columns — the
    group table is combination-cardinality-sized, never row-sized;
    at 100 TB the HAVING filter ships only violators to the driver/
    sink. Generalization (bucketing a continuous column) happens in
    the caller's column expressions, where Catalyst can still push
    scans."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") < k)
    )


def fuzzy_contaminated_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    num_hashes: int = 32,
    bands: int = 4,
    shingle_n: int = 5,
    threshold: float = 0.7,
) -> DataFrame:
    """FUZZY decontamination (r12): corpus documents NEAR-duplicating
    a benchmark document — the screen exact n-gram matching
    (:func:`contaminated_ids`) cannot provide, since a lightly
    rephrased or re-formatted benchmark leak shares few exact word
    5-grams but high shingle Jaccard. Shape: portable-hash MinHash
    signatures on both sides (``md5_shingle_hashes`` →
    ``minhash_signature``, the oracle-replayable family), LSH band
    join with the BENCHMARK side broadcast (the corpus — the 100 TB
    side — computes signatures map-side and never shuffles its
    shingles; only candidate id pairs move), then exact shingle-
    Jaccard verification of the candidates (LSH recall is what it
    is — both engines derive the same candidate set, so misses are
    honest, identical, and bounded by the band calculus documented
    at dedup.minhash_lsh_candidates). Returns verified
    ``(doc_id, bench_id, jaccard)`` rows."""
    from pagerank_hadoop_spark.operators.dedup import (
        _band_cols,
        _minhash_sig_arrow,
        _spread,
        md5_shingle_hashes,
    )

    sig_kernel = _minhash_sig_arrow(num_hashes)

    def sigs(df, out_id, in_id):
        # the md5-per-shingle projection is the CPU-heavy stage of the
        # screen and inherits the scan's split count — a small corpus
        # arrives as 1-2 parquet splits and serializes ~|corpus| md5
        # rounds onto as many cores (measured 12.6 s → 1.9 s for the
        # 5000-doc signature stage at sf0.1/local[32]); _spread
        # repartitions small inputs to the default parallelism and is
        # a no-op on scans past one split per core (100 TB posture
        # unchanged: no shuffle of document text at scale).
        df = _spread(df)
        return (
            df.select(
                F.col(in_id).alias(out_id),
                md5_shingle_hashes(F.col(text_col), shingle_n).alias("sh"),
            )
            .select(
                out_id,
                "sh",
                # Arrow kernel over the PORTABLE md5 hash family —
                # bit-identical to minhash_signature (same constants,
                # same pmod convention) at ~10x the interpreted-HOF
                # Column path, so the oracle replay stands unchanged
                sig_kernel(F.col("sh")).alias("sig"),
            )
            .localCheckpoint(eager=True)  # consumed by band join AND
            # verify join (repo double-consumption rule)
        )

    corp = sigs(corpus, "doc_id", id_col)
    bench = sigs(benchmark, bench_id_col, id_col)
    bcols = _band_cols(num_hashes, bands)
    banded_c = corp.select(
        "doc_id", F.posexplode(F.array(*bcols)).alias("band", "bh")
    )
    banded_b = bench.select(
        bench_id_col, F.posexplode(F.array(*bcols)).alias("band", "bh")
    )
    cand = (
        banded_c.join(F.broadcast(banded_b), ["band", "bh"])
        .select("doc_id", bench_id_col)
        .distinct()
    )
    verified = (
        cand.join(corp.select("doc_id", "sh"), "doc_id")
        .join(
            F.broadcast(
                bench.select(bench_id_col, F.col("sh").alias("sh_b"))
            ),
            bench_id_col,
        )
        .select(
            "doc_id",
            bench_id_col,
            F.size(F.array_intersect("sh", "sh_b")).alias("__i"),
            F.size("sh").alias("__na"),
            F.size("sh_b").alias("__nb"),
        )
        .select(
            "doc_id",
            bench_id_col,
            (
                F.col("__i").cast("double")
                / (F.col("__na") + F.col("__nb") - F.col("__i"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return verified
