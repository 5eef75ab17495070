"""Multimodal column plumbing tests ([EXT] E5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_hadoop_spark.operators.multimodal import (
    attach_media,
    decode_media,
    frame_sample,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    return attach_media(docs.select("doc_id", "text"),
                        F.encode("text", "utf-8")).cache()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "payload", "media_type", "n_bytes", "sha"]
    row = media.first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["n_bytes"] == len(row["payload"])
    assert len(row["sha"]) == 64


def test_decode_stub_is_deterministic(media):
    d1 = {r["media_id"]: (r["width"], r["height"], r["n_frames"])
          for r in decode_media(media).collect()}
    d2 = {r["media_id"]: (r["width"], r["height"], r["n_frames"])
          for r in decode_media(media).collect()}
    assert d1 == d2
    assert all(64 <= w < 256 and 64 <= h < 256 and 1 <= f <= 16
               for (w, h, f) in d1.values())


def test_decode_strict_raises(media):
    import py4j.protocol
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, py4j.protocol.Py4JJavaError)):
        decode_media(media, strict=True).collect()


def test_frame_sampling(media):
    decoded = decode_media(media)
    frames = frame_sample(decoded, every_n=4)
    per = {r["media_id"]: 0 for r in frames.collect()}
    joined = {r["media_id"]: r["n_frames"] for r in decoded.collect()}
    for r in frames.collect():
        per[r["media_id"]] += 1
    for mid, nf in joined.items():
        assert per[mid] == (nf + 3) // 4


def test_resize_media_fits_target_and_preserves_aspect(spark):
    from pagerank_hadoop_spark.operators.multimodal import (
        attach_media,
        decode_media,
        resize_media,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, b"payload-one"), (2, b"another-payload")], ["id", "payload"]
    )
    decoded = decode_media(attach_media(docs, F.col("payload")), strict=False)
    for r in resize_media(decoded, 224, 224).collect():
        assert r.out_width <= 224 and r.out_height <= 224
        assert max(r.out_width, r.out_height) == 224  # fit, not shrink-to-nothing
        got = r.out_width / r.out_height
        want = r.width / r.height
        assert abs(got - want) / want < 0.05  # aspect preserved within floor()


def test_extract_features_deterministic_shape(spark):
    from pagerank_hadoop_spark.operators.multimodal import attach_media, extract_features
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, b"payload-one"), (2, b"another-payload")], ["id", "payload"]
    )
    media = attach_media(docs, F.col("payload"))
    a = {r.media_id: r.embedding for r in extract_features(media).collect()}
    b = {r.media_id: r.embedding for r in extract_features(media).collect()}
    assert a == b  # digest-derived: deterministic across runs
    assert all(len(v) == 16 for v in a.values())
    assert a[1] != a[2]
