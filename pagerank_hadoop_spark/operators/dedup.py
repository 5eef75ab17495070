"""Deduplication operators for LLM training-data pipelines ([EXT] E1/E2).

All shapes are shuffle-aware for 100 TB corpora:

* exact dedup hashes the key column first so the shuffle carries a
  64-bit key + doc id, never the full document text;
* MinHash/LSH shuffles (band, band-hash) pairs — corpus size ×
  n_bands rows of a few bytes — then joins only within buckets
  (candidate pairs ≪ n²);
* SimHash buckets on the 64-bit fingerprint split into k bands for
  Hamming-distance candidates.

No Python UDFs: shingling, hashing, and min-reduction are Spark
built-ins (xxhash64, transform, aggregate), all whole-stage-codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


# ---------------------------------------------------------------------------
# E1: exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, key: str, id_col: str) -> DataFrame:
    """Keep one row per distinct ``key`` (the lowest ``id_col``).

    Hash-groupBy on ``xxhash64(key)`` (cheap 8-byte shuffle key), then
    a min-id window inside each hash bucket with a full-key equality
    check to survive hash collisions.
    """
    hashed = df.withColumn("__h", F.xxhash64(F.col(key)))
    w = Window.partitionBy("__h", key).orderBy(id_col)
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__h", "__rn")
    )


def exact_dedup_groups(df: DataFrame, key: str, id_col: str) -> DataFrame:
    """Duplicate-group summary: per distinct ``key``, the kept id and
    the copy count. Oracle-checkable shape of :func:`exact_dedup`."""
    return df.groupBy(key).agg(
        F.min(id_col).alias("keeper"), F.count(F.lit(1)).alias("copies")
    ).select("keeper", "copies")


# ---------------------------------------------------------------------------
# E2: MinHash + LSH near-dup
# ---------------------------------------------------------------------------

def shingles(text: Column, n: int = 5) -> Column:
    """Character n-gram shingle hash set (array<bigint>, distinct).

    ``sequence`` + ``transform`` + ``xxhash64`` — pure codegen; the
    text column itself never leaves the row.
    """
    cleaned = F.lower(F.trim(text))
    count = F.greatest(F.length(cleaned) - F.lit(n - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), count), lambda i: F.xxhash64(F.substring(cleaned, i, n))
    )
    return F.array_distinct(grams)


def minhash_signature(shingle_hashes: Column, num_hashes: int = 32) -> Column:
    """MinHash signature (array<bigint> of length ``num_hashes``).

    Universal-hash family h_i(x) = (a_i*x + b_i) mod p over the shingle
    hashes; min per i. Constants are fixed primes → deterministic
    across runs/engines. p is a 33-bit prime so (p-1)*a_i + b_i stays
    far inside int64 (ANSI mode overflow-checks long arithmetic), and
    pmod (not abs%) keeps Long.MIN_VALUE safe.
    """
    p = 4294967311  # smallest prime > 2^32
    max_h = F.lit(p).cast("long")

    def one_hash(i: int) -> Column:
        a = 2 * i + 1
        b = 104729 * (i + 1)
        return F.aggregate(
            shingle_hashes,
            max_h,
            lambda acc, x: F.least(acc, (F.pmod(x, F.lit(p)) * a + b) % p),
        )

    return F.array(*[one_hash(i) for i in range(num_hashes)])


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    rows → (id, band, band_signature) → groupBy bucket → intra-bucket
    pairs. Output: ``(id_a, id_b)`` with ``id_a < id_b``, distinct.
    The join is bucket-local: at 100 TB the shuffle carries only ids +
    band hashes, and skewed mega-buckets are split by AQE.
    """
    rows = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(shingles(F.col(text_col), shingle_n), num_hashes).alias("sig"),
    )
    banded = sig.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(F.slice("sig", b * rows + 1, rows).cast("string")).alias("bh"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bh")
    left = banded.select("band", "bh", F.col("id").alias("id_a"))
    right = banded.select("band", "bh", F.col("id").alias("id_b"))
    return (
        left.join(right, ["band", "bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (verification stage).

    ``|A∩B| / |A∪B|`` over shingle-hash sets via array expressions.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (inter.cast("double") / union).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
) -> DataFrame:
    """Full near-dup removal: LSH candidates → exact Jaccard filter →
    drop the higher id of each confirmed pair (greedy union toward the
    lowest id)."""
    cands = minhash_lsh_candidates(df, id_col, text_col, num_hashes, bands, shingle_n)
    confirmed = jaccard_pairs(df, cands, id_col, text_col, shingle_n, jaccard_threshold)
    losers = confirmed.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# E2b: SimHash
# ---------------------------------------------------------------------------

def simhash(text: Column, shingle_n: int = 5) -> Column:
    """64-bit SimHash fingerprint from shingle hashes (pure codegen).

    For each bit b: sign(Σ_shingles ±1 by bit b of the shingle hash).
    """
    sh = shingles(text, shingle_n)
    bits = [
        F.when(
            F.aggregate(
                sh,
                F.lit(0).cast("long"),
                lambda acc, x: acc
                + F.when(F.shiftright(x, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
            )
            > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for b in range(64)
    ]
    out = F.lit(0).cast("long")
    for b, bit in enumerate(bits):
        out = out + F.shiftleft(bit, b)
    return out


def simhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup candidates: equal 16-bit SimHash band → candidate;
    verify by full Hamming distance <= ``max_hamming``."""
    fp = df.select(F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("fp"))
    width = 64 // bands
    banded = fp.select(
        "id",
        "fp",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright("fp", b * width).bitwiseAND(F.lit((1 << width) - 1)).alias("bh"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "fp", "bb.band", "bb.bh")
    left = banded.select("band", "bh", F.col("id").alias("id_a"), F.col("fp").alias("fp_a"))
    right = banded.select("band", "bh", F.col("id").alias("id_b"), F.col("fp").alias("fp_b"))
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        left.join(right, ["band", "bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# E2c: embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dups(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 16,
) -> DataFrame:
    """Near-duplicate vectors: random-hyperplane LSH bucket (sign
    sketch over fixed pseudo-random planes) → intra-bucket exact
    cosine >= threshold. Deterministic planes derived from xxhash64 of
    (plane, dim) — no stored model needed."""
    from pagerank_hadoop_spark.functions.vectors import cosine_similarity

    v = F.col(vec_col).cast("array<double>")
    # sign bit per pseudo-random plane: sum_d vec[d] * u(plane, d),
    # u in [-1, 1) from a hash of (plane, dim)
    def plane_bit(p: int) -> Column:
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda x, d: x
                * (
                    (F.xxhash64(F.lit(p), d).cast("double") / F.lit(float(2**63)))
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")

    sketch = F.lit(0).cast("long")
    for p in range(n_planes):
        sketch = sketch + F.shiftleft(plane_bit(p), p)

    sk = emb.select(F.col(id_col).alias("id"), v.alias("v"), sketch.alias("bucket"))
    a = sk.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), "bucket")
    b = sk.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), "bucket")
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_similarity(F.col("v_a"), F.col("v_b")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .distinct()
    )
