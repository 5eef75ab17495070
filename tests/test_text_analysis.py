"""Text-analysis operator tests ([EXT] E4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_hadoop_spark.operators.text_analysis import (
    doc_fingerprint,
    lang_id,
    quality_score,
    text_profile,
    token_count,
    word_tokens,
)


@pytest.fixture(scope="module")
def samples(spark):
    rows = [
        (1, "the cat and the dog sat in the garden and that is that"),
        (2, "der Hund ist nicht ein Tier und das ist gut"),
        (3, "le chat et le chien est dans un jardin et les fleurs"),
        (4, "zzzz qqqq xxxx"),
        (5, "  spaced   out    tokens  "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_token_count(samples):
    got = {r["doc_id"]: r["n"] for r in
           samples.select("doc_id", token_count(F.col("text")).alias("n")).collect()}
    assert got[5] == 3
    assert got[4] == 3
    assert got[1] == 13


def test_word_tokens_splits_symbols(spark):
    df = spark.createDataFrame([("Hello, world! 42x",)], "text string")
    toks = df.select(word_tokens(F.col("text")).alias("t")).collect()[0]["t"]
    assert toks == ["hello", ",", "world", "!", "42", "x"]


def test_lang_id(samples):
    got = {r["doc_id"]: r["lang"] for r in
           samples.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "und"


def test_quality_score_ranges(samples):
    got = {r["doc_id"]: r["q"] for r in
           samples.select("doc_id", quality_score(F.col("text")).alias("q")).collect()}
    assert all(0.0 <= v <= 1.0 for v in got.values())
    assert got[1] > got[4]  # real text beats consonant soup


def test_fingerprint_stable_and_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "some document body here"), (2, "some document body here"),
         (3, "a different document body")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fp"] for r in
          df.select("doc_id", doc_fingerprint(F.col("text")).alias("fp")).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


def test_text_profile_schema(samples):
    prof = text_profile(samples)
    assert prof.columns == ["doc_id", "n_tokens", "n_chars", "lang_guess",
                            "quality", "fingerprint"]
    assert prof.count() == 5
